"""Bucketed co-located join (SURVEY §4 'partitioning & shuffle'):
pre-bucketing both fact tables on the join key removes the join-time
shuffle entirely — the canonical 100 TB strategy for repeated
fact-to-fact joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.plans.explain import physical_plan

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = table(spark, SF_SMALL, "lineitem")
    o = table(spark, SF_SMALL, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    return "li_bucketed", "o_bucketed"


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        # and it computes the right thing
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_avoids_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also skips the shuffle."""
    li = spark.table(bucketed_tables[0])
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = physical_plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan
