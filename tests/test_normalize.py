"""Normalize operator family (N1-N5) against the CUR-shaped fixtures
of FIXTURES.md §B: primary names, alternatives precedence, NULL-fill,
name canonicalization, null-on-error casts."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.operators.normalize import (
    NORMALIZED_COLUMNS,
    canonical_name,
    canonicalize_columns,
    normalize,
    resolve_column,
    AWS_CUR_PRIMARY,
    AWS_CUR_ALTERNATIVES,
)

TS = datetime(2026, 1, 1)


def test_canonical_name():
    # reference normalize.py:66 + postgresql.py:109-123 semantics
    assert canonical_name("Special/Chars:Col") == "special_chars_col"
    assert canonical_name("A B-C.D") == "a_b_c_d"
    assert canonical_name("123starts_with_digit") == "_123starts_with_digit"
    assert canonical_name("already_clean") == "already_clean"
    # idempotent
    for raw in ["Special/Chars:Col", "123x", "a b"]:
        assert canonical_name(canonical_name(raw)) == canonical_name(raw)


def test_primary_mapping(spark):
    """raw_cur_primary: primary CUR names present; cost is a string on
    purpose (exercises N5 null-on-error numeric cast)."""
    raw = spark.createDataFrame(
        [
            ("2024-01-05 10:00:00", "acc1", "EC2", "us-east-1", "12.50", "USD", "x"),
            ("2024-01-06 11:00:00", "acc2", "S3", "eu-west-1", "not-a-number", "USD", "y"),
        ],
        [
            "Line_Item_Usage_Start_Date",
            "line_item_usage_account_id",
            "product_servicename",
            "product_region",
            "line_item_unblended_cost",
            "line_item_currency_code",
            "Special/Chars:Col",
        ],
    )
    out = normalize(raw, "cup_data", TS)
    assert out.columns == NORMALIZED_COLUMNS
    rows = {r.account_id: r for r in out.collect()}
    assert rows["acc1"].cost == 12.50
    assert rows["acc2"].cost is None  # null-on-error (normalize.py:106)
    assert str(rows["acc1"].date) == "2024-01-05"
    assert rows["acc1"].cloud_provider == "aws"
    assert rows["acc1"].source_table == "cup_data"


def test_alternatives_precedence(spark):
    """raw_cur_alt: only alternative names present; ordered resolution
    (normalize.py:34-41 — order is load-bearing: unblended before
    blended)."""
    raw = spark.createDataFrame(
        [("2024-02-01", "payer9", "AmazonEC2", "US East", 7.25, 99.0, "USD")],
        [
            "lineitem_usagestartdate",
            "bill_payeraccountid",
            "lineitem_productcode",
            "product_location",
            "lineitem_unblendedcost",
            "lineitem_blendedcost",  # must lose to unblended
            "currency_code",
        ],
    )
    r = normalize(raw, "alt", TS).collect()[0]
    assert r.account_id == "payer9"
    assert r.service == "AmazonEC2"
    assert r.region == "US East"
    assert r.cost == 7.25  # unblended won
    assert r.currency == "USD"


def test_missing_columns_null_fill(spark):
    """raw_cur_missing: no service/region → NULL fill, all 9 columns
    present (normalize.py:88-90)."""
    raw = spark.createDataFrame(
        [("2024-03-01", "a1", 5.0)],
        ["usage_start_date", "usage_account_id", "unblended_cost"],
    )
    out = normalize(raw, "missing", TS)
    assert out.columns == NORMALIZED_COLUMNS
    r = out.collect()[0]
    assert r.service is None and r.region is None
    assert r.cost == 5.0


def test_resolution_is_driver_side(spark):
    """N2 is schema resolution, not row-wise coalesce: the physical
    plan must be a bare projection over the scan (no CASE/COALESCE
    chains over 100 columns)."""
    cols = resolve_column(
        ["lineitem_blendedcost", "lineitem_unblendedcost"],
        "cost",
        AWS_CUR_PRIMARY,
        AWS_CUR_ALTERNATIVES,
    )
    assert cols == "lineitem_unblendedcost"


def test_canonicalize_columns_no_shuffle(spark):
    df = spark.createDataFrame([(1, 2)], ["A B", "C/D"])
    out = canonicalize_columns(df)
    assert out.columns == ["a_b", "c_d"]
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_normalize_total_on_arbitrary_columns(spark):
    """Property (SURVEY §5.4): normalize never throws and always emits
    exactly the 9 normalized columns, whatever the input schema."""
    import itertools

    weird_schemas = [
        ["x"],
        ["Date", "Cost"],
        ["line_item_unblended_cost"],
        ["123a", "b c", "D/E:F"],
    ]
    for cols in weird_schemas:
        df = spark.createDataFrame([tuple("v" for _ in cols)], cols)
        out = normalize(df, "t", TS)
        assert out.columns == NORMALIZED_COLUMNS
        assert out.count() == 1


def test_cost_type_default_is_double(spark):
    df = spark.createDataFrame(
        [("2026-01-01", "1.50")], ["line_item_usage_start_date", "line_item_unblended_cost"]
    )
    out = normalize(df, "t", sync_timestamp=TS)
    assert dict(out.dtypes)["cost"] == "double"


def test_cost_type_decimal_roundtrips_sink(spark, tmp_path):
    """DECIMAL(10,2) override (reference sql/init.sql:19): exact values
    survive the parquet sink round-trip, and bad strings still coerce
    to NULL (N5) under the non-ANSI session."""
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [("2026-01-01", "12.34"), ("2026-01-02", "not-a-number")],
        ["line_item_usage_start_date", "line_item_unblended_cost"],
    )
    out = normalize(df, "t", sync_timestamp=TS, cost_type=T.DecimalType(10, 2))
    assert dict(out.dtypes)["cost"] == "decimal(10,2)"
    p = str(tmp_path / "dec")
    out.write.parquet(p)
    back = spark.read.parquet(p)
    assert dict(back.dtypes)["cost"] == "decimal(10,2)"
    vals = {str(r.cost) for r in back.select("cost").collect()}
    assert vals == {"12.34", "None"}


def test_normalize_mapped_decimal_cost(spark):
    """cost_type=DecimalType (reference sql/init.sql:19 DECIMAL
    parity): the money column lands as exact decimal and sums with no
    floating error — 0.1 added 100 times is exactly 10."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from poet_cloud_cost_etl_spark.operators.normalize import normalize_mapped

    df = spark.range(100).select(F.lit("0.1").alias("amount"))
    out = normalize_mapped(
        df,
        source_table="t",
        mapping={"cost": F.col("amount")},
        cloud_provider="aws",
        sync_timestamp=datetime(2026, 1, 1),
        cost_type=T.DecimalType(38, 10),
    )
    assert out.schema["cost"].dataType == T.DecimalType(38, 10)
    total = out.agg(F.sum("cost").alias("s")).collect()[0].s
    assert total == Decimal("10.0")
    # null-on-error coercion (N5) still holds for decimal under the
    # pinned non-ANSI session
    bad = normalize_mapped(
        spark.createDataFrame([("x",)], ["amount"]),
        source_table="t",
        mapping={"cost": F.col("amount")},
        cloud_provider="aws",
        sync_timestamp=datetime(2026, 1, 1),
        cost_type=T.DecimalType(38, 10),
    )
    assert bad.collect()[0].cost is None
