"""SparkSession factory with scale-appropriate defaults.

Design notes (100 TB posture):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic join-strategy selection replace the reference's manual
  chunking (``/root/reference/src/sources/aws_cur.py:174-223``).
- ANSI off: preserves the reference's null-on-error cast semantics
  (``/root/reference/src/transforms/normalize.py:106`` uses
  ``pd.to_numeric(errors="coerce")``). Spark 4 defaults ANSI on, so we
  set it explicitly; casts in operators additionally use ``try_*``
  forms where the intent is "coerce, never fail".
- UTC session timezone: the reference mints ``sync_timestamp`` with
  ``datetime.utcnow()`` (``/root/reference/src/main.py:72``); pinning
  UTC also makes timestamp→date casts match the DuckDB oracle.
- Broadcast threshold raised: dimension tables (region/nation/
  supplier/customer/part, the accounts registry) are broadcast so fact
  scans never shuffle for enrichment joins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "poet-cloud-cost-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # AQE: coalesce shuffle partitions, split skewed joins, pick
        # broadcast at runtime when post-shuffle stats allow it.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Dims up to 64 MiB broadcast — avoids shuffling the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Arrow for any pandas-UDF path (the sanctioned Python escape hatch).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Input split sizing; at 100 TB this keeps ~128 MiB tasks.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Fixture parquet carries TIMESTAMP(NANOS) (events.ts), which
        # Spark's parquet reader rejects natively; read as long ns and
        # convert via exact integer division (catalog.py) — matches
        # DuckDB's own ns→µs truncation.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.ui.enabled", "false")
        # Keep catalog-table data out of the source tree (tests/tools
        # that saveAsTable land here unless overridden).
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
