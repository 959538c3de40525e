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


def spread_small_scan(df: DataFrame, current_partitions: int | None = None) -> DataFrame:
    """Scale-adaptive compute spreading (r14, guide §2 — partitioning
    must not be tuned for either local mode or the cluster).

    The fixture tables are single-row-group parquet files, so every
    scan is ONE input split at any SF — and Spark evaluates the whole
    scan-stage expression chain (regex tokenization, shingling, per-
    shingle md5 banks, per-row quantization/pair explodes) inside that
    one task while the other cores idle.  The same shape appears in
    production whenever a heavy derivation reads few/unsplittable
    files (guide §2.5 "input skew").

    When the frame has fewer estimated input splits than the cluster
    parallelism, spread it round-robin BEFORE the heavy per-row work;
    when the scan already has ≥ parallelism splits (any real 100 TB
    layout), this is a NO-OP — no extra exchange.  Round-robin
    repartition is deterministic under task retry
    (sortBeforeRepartition, SPARK-23207) and every downstream operator
    is partition-invariant by construction
    (tests/test_partition_invariance.py), so results are unchanged.

    The split estimate comes from the ``_sg_scan_est_splits`` attribute
    ``table()`` stamps on the frames it returns (file bytes ÷
    maxPartitionBytes — zero Spark round-trips; both
    ``rdd.getNumPartitions()`` (counts EMPTY byte-range splits of a
    single-row-group file) and plan-stats probes (~0.12 s per query
    construction) were measured and rejected).  Frames without the
    stamp (derived/filtered inputs) are returned unchanged — the
    conservative choice at scale.

    Placement rule (measured, r14): only spread a chain that is
    consumed by ONE materializing job (or checkpoint it immediately) —
    an un-materialized repartition below a multi-job consumer (the CC
    chains) re-executes its exchange once per driver-synced job, which
    benched 1–2 s SLOWER per CC query when the spread sat in table()
    unconditionally."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    n = (
        current_partitions
        if current_partitions is not None
        else getattr(df, "_sg_scan_est_splits", None)
    )
    if n is not None and n < p:
        return df.repartition(p)
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (no view side-effect)."""
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in EVENT_TS_COLUMNS.get(name, []):
        dtype = dict(df.dtypes).get(c)
        if c not in df.columns:
            continue
        if dtype == "bigint":  # TIMESTAMP(NANOS) under nanosAsLong
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtype == "timestamp_ntz":  # naive micros; UTC session tz
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    # Stamp the estimated input-split count (file bytes ÷
    # maxPartitionBytes — no Spark round-trip) for spread_small_scan;
    # single files below the split size are exactly the 1-task case it
    # exists to fix.  A plain Python attribute: it survives only on
    # this frame object, so operators receiving derived/filtered
    # frames conservatively skip spreading.
    try:
        max_split = int(
            spark.conf.get(
                "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
            ).rstrip("b")
        )
    except (TypeError, ValueError):
        max_split = 128 * 1024 * 1024
    df._sg_scan_est_splits = max(1, -(-os.path.getsize(path) // max_split))
    return df
