"""Test-data catalog: register the driver parquet tables as temp views.

Mirrors the reference's implicit catalog (one DuckDB relation per S3
report path, ``/root/reference/src/main.py:75-122``) as Spark temp
views so every query is runnable through ``spark.sql`` as well as the
DataFrame API. At scale these would be external tables over
``provider=/year=/month=`` partition layouts; the fixtures are single
parquet files, so registration is a plain read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Event-time columns whose physical parquet type has varied across
# fixture generations: TIMESTAMP(NANOS) (read as long ns under
# spark.sql.legacy.parquet.nanosAsLong) or naive TIMESTAMP(MICROS)
# (read as TIMESTAMP_NTZ). Either way we normalize to session-zoned
# TIMESTAMP so downstream integer time arithmetic (``unix_micros``)
# is valid; with the session pinned to UTC the NTZ→LTZ cast is
# value-preserving and matches DuckDB's naive-timestamp semantics.
EVENT_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine's semantics depend on, set defensively
    so queries behave identically under a caller-provided session
    (e.g. the driver's): ns-parquet handling, UTC timestamp↔date
    casts (matches the DuckDB oracle's naive-timestamp semantics),
    and non-ANSI (null-on-error) casts per reference normalize.py:106.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every fixture table and register it as a temp view."""
    ensure_session_confs(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (no view side-effect)."""
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in EVENT_TS_COLUMNS.get(name, []):
        dtype = dict(df.dtypes).get(c)
        if c not in df.columns:
            continue
        if dtype == "bigint":  # TIMESTAMP(NANOS) under nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":  # naive micros; UTC session tz
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
