"""Golden end-to-end (SURVEY §5.3): CUR-shaped synthetic input through
the full sync pipeline; the costs view and the four documented
reference queries (README.md:124-141) must produce exactly the
expected literal values. Also: re-running sync is idempotent."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.operators.normalize import AWS_CUR_PRIMARY, normalize
from poet_cloud_cost_etl_spark.operators.union_view import create_costs_view
from poet_cloud_cost_etl_spark.pipeline import sync
from poet_cloud_cost_etl_spark.sources.base import make_source

TS = datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def golden_costs(spark):
    """Two CUR-shaped raw frames (primary names / alternative names),
    normalized and unioned — the reference's whole data model in
    miniature."""
    primary = spark.createDataFrame(
        [
            ("2024-01-01 05:00:00", "111", "AmazonEC2", "us-east-1", "10.00", "USD"),
            ("2024-01-01 09:00:00", "111", "AmazonS3", "us-east-1", "2.50", "USD"),
            ("2024-01-02 05:00:00", "222", "AmazonEC2", "eu-west-1", "7.25", "USD"),
            ("2024-01-03 05:00:00", "222", "AmazonEC2", "eu-west-1", "bogus", "USD"),
        ],
        [
            "line_item_usage_start_date",
            "line_item_usage_account_id",
            "product_servicename",
            "product_region",
            "line_item_unblended_cost",
            "line_item_currency_code",
        ],
    )
    alt = spark.createDataFrame(
        [
            ("2024-01-02 00:00:00", "333", "AmazonRDS", "US West", 100.0, "USD"),
        ],
        [
            "lineitem_usagestartdate",
            "bill_payeraccountid",
            "lineitem_productcode",
            "product_location",
            "lineitem_unblendedcost",
            "currency_code",
        ],
    )
    normalized = {
        "cup_primary": normalize(primary, "cup_primary", TS),
        "cup_alt": normalize(alt, "cup_alt", TS),
    }
    return create_costs_view(spark, normalized, view_name="golden_costs")


def test_golden_total_cost_by_service(spark, golden_costs):
    """README.md:125-130: SELECT service, SUM(cost) ... GROUP BY
    service ORDER BY total DESC."""
    got = [
        (r.service, r.total)
        for r in spark.sql(
            "SELECT service, ROUND(SUM(cost), 2) AS total FROM golden_costs "
            "GROUP BY service ORDER BY total DESC"
        ).collect()
    ]
    assert got == [("AmazonRDS", 100.0), ("AmazonEC2", 17.25), ("AmazonS3", 2.5)]


def test_golden_cost_by_account(spark, golden_costs):
    got = {
        r.account_id: r.total
        for r in spark.sql(
            "SELECT account_id, ROUND(SUM(cost), 2) AS total FROM golden_costs "
            "GROUP BY account_id"
        ).collect()
    }
    assert got == {"111": 12.5, "222": 7.25, "333": 100.0}


def test_golden_daily_trend(spark, golden_costs):
    got = [
        (str(r.date), r.total)
        for r in spark.sql(
            "SELECT date, ROUND(SUM(cost), 2) AS total FROM golden_costs "
            "GROUP BY date ORDER BY date"
        ).collect()
    ]
    # 2024-01-03's only row is the 'bogus' cost → SUM over all-NULL
    # group is NULL (the date still appears — rows are never dropped)
    assert got == [
        ("2024-01-01", 12.5),
        ("2024-01-02", 107.25),
        ("2024-01-03", None),
    ]


def test_golden_null_on_error_row_survives(spark, golden_costs):
    """The 'bogus' cost row must exist with NULL cost (N5), not be
    dropped — row counts are part of the contract."""
    assert golden_costs.count() == 5
    nulls = golden_costs.filter(F.col("cost").isNull()).collect()
    assert len(nulls) == 1 and nulls[0].account_id == "222"


def test_sync_rerun_is_idempotent(spark, tmp_path):
    """Replace-mode sinks: running sync twice leaves identical data
    (exactly-once semantics the reference's drop+recreate provides)."""
    from poet_cloud_cost_etl_spark.catalog import table as cat_table
    from tests.conftest import SF_SMALL

    src = make_source(
        "events",
        read=lambda s: cat_table(s, SF_SMALL, "events"),
        mapping=lambda: {
            "date": F.col("ts").cast("date"),
            "account_id": F.col("user_id").cast("string"),
            "service": F.col("event_type"),
            "region": F.lit(None),
            "cost": F.col("value"),
            "currency": F.lit("USD"),
        },
        provider="aws",
    )
    out = str(tmp_path / "w")
    r1 = sync(spark, [src], out, sync_timestamp=TS)
    total1 = spark.sql("SELECT ROUND(SUM(cost), 2) AS t FROM costs").collect()[0].t
    r2 = sync(spark, [src], out, sync_timestamp=TS)
    total2 = spark.sql("SELECT ROUND(SUM(cost), 2) AS t FROM costs").collect()[0].t
    assert r1.tables == r2.tables == {"events": 1000}
    assert total1 == total2
