"""P9 robustness sweep: every registered query must run (not crash)
against schema-only empty tables — the empty-partition case a 100 TB
deployment hits constantly (new day, empty source, pruned-to-nothing
filter)."""

from __future__ import annotations

import pytest

from poet_cloud_cost_etl_spark.queries import QUERIES

from conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SMALL}/{t}.parquet").limit(0)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def test_every_query_survives_empty_input(spark, empty_sf):
    failures = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            fn(spark, empty_sf).count()
        except Exception as exc:  # collect all, report once
            failures[name] = str(exc).splitlines()[0][:120]
    assert not failures, failures
