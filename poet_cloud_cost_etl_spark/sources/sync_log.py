"""The ``sync_log`` audit table (reference
``/root/reference/sql/init.sql:12-24`` — schema defined there but
never written by the reference code, a latent gap this engine closes).

One append-mode parquet row per (run, table): status, row/column
counts, duration, error. The id is a deterministic surrogate
(xxhash64 of run key) rather than SERIAL — monotonic sequences are a
single-node concept; at scale an idempotent surrogate key is what you
want for exactly-once re-runs.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SYNC_LOG_SCHEMA = (
    "sync_timestamp timestamp, table_name string, status string, "
    "records_synced bigint, columns_count int, error_message string, "
    "duration_seconds double"
)


def log_entry(
    spark: SparkSession,
    sync_timestamp: datetime,
    table_name: str,
    status: str,
    records_synced: int,
    columns_count: int,
    duration_seconds: float,
    error_message: str | None = None,
) -> DataFrame:
    df = spark.createDataFrame(
        [
            (
                sync_timestamp,
                table_name,
                status,
                records_synced,
                columns_count,
                error_message,
                float(duration_seconds),
            )
        ],
        SYNC_LOG_SCHEMA,
    )
    return df.select(
        F.xxhash64("sync_timestamp", "table_name").alias("id"), "*"
    )


def append_sync_log(entry: DataFrame, path: str) -> None:
    entry.write.mode("append").parquet(path)


def read_sync_log(spark: SparkSession, path: str) -> DataFrame:
    """Most-recent-first, the reference's descending-index access
    pattern (init.sql:23-24)."""
    return spark.read.parquet(path).orderBy(F.desc("sync_timestamp"))
