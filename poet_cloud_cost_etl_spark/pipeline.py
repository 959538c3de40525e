"""The ``sync`` pipeline — the reference's flagship entry point
(``/root/reference/src/main.py:37-145``) re-expressed Spark-first.

Reference lifecycle: per report path, extract (DuckDB→pandas), load
raw to PG, normalize (pandas), load normalized to PG, then create the
UNION ALL view. Every stage materializes in driver RAM — the
documented 16 GB OOM (CLAUDE.md:128-129).

Here each stage stays a lazy DataFrame; the only actions are the
sink writes. Raw and normalized tables land as parquet (partitioned
for the costs layout) or JDBC (when a URL is configured); the costs
view is registered in the session catalog. A sync_log row is appended
per table (closing the reference's latent gap — init.sql defines the
table but never writes it).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession

from .config import EngineConfig
from .operators.normalize import normalize_mapped
from .operators.union_view import create_costs_view
from .sources.base import Source
from .sources.sinks import write_costs_partitioned, write_jdbc, write_parquet_partitioned
from .sources.sync_log import append_sync_log, log_entry


@dataclass
class SyncReport:
    tables: dict[str, int] = field(default_factory=dict)
    failures: dict[str, str] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.failures


def sync_window_start(ts: datetime, months: int) -> date:
    """First day of the calendar month ``months - 1`` months before
    ``ts``'s month — ``--months 1`` means "the current month", like
    the reference's default (``src/main.py:39``)."""
    if months < 1:
        raise ValueError(f"months must be >= 1, got {months}")
    total = ts.year * 12 + (ts.month - 1) - (months - 1)
    return date(total // 12, total % 12 + 1, 1)


def sync(
    spark: SparkSession,
    sources: list[Source],
    output_root: str | None = None,
    sync_timestamp: datetime | None = None,
    dry_run: bool = False,
    write_raw: bool = True,
    config: "EngineConfig | None" = None,
    months: int | None = None,
) -> SyncReport:
    """Run the full extract→normalize→view pipeline.

    ``dry_run`` prints the plan without touching data
    (main.py:41,60-63 parity); failures are isolated per source
    (main.py:119-122 swallows per-path errors and continues).

    ``config`` (config.EngineConfig, reference src/config.py:32-61)
    supplies the output root when ``output_root`` is None and, when
    ``config.jdbc_url`` is set, additionally lands each normalized
    table via the JDBC sink (S6) — the reference's PostgreSQL load.

    ``months`` (reference ``--months N``, src/main.py:39): keep only
    records dated on/after the start of the calendar month N-1 months
    before ``sync_timestamp``. The cutoff is computed driver-side and
    compared as a plain literal against the source's declared
    ``date_column()``, so it reaches the parquet scan as a pushed
    filter (or a partition filter on date-partitioned layouts)
    instead of a post-scan Filter over the full history."""
    if output_root is None:
        if config is None:
            raise ValueError("sync() needs output_root or config")
        output_root = config.output_root
    ts = sync_timestamp or datetime.utcnow()
    report = SyncReport()
    normalized: dict[str, DataFrame] = {}

    start = sync_window_start(ts, months) if months is not None else None

    for src in sources:
        t0 = time.time()
        try:
            raw = src.read(spark)
            if start is not None:
                dc = getattr(src, "date_column", lambda: None)()
                if dc is not None:
                    from pyspark.sql import functions as F

                    raw = raw.filter(F.col(dc) >= F.lit(start))
            if dry_run:
                print(f"[dry-run] {src.name}: schema={raw.schema.simpleString()}")
                continue
            if raw.isEmpty():  # P9 empty-input guard (main.py:99-101)
                report.tables[src.name] = 0
                continue
            if write_raw:
                write_parquet_partitioned(
                    raw, f"{output_root}/raw_{src.name}", if_exists="replace"
                )
            norm = normalize_mapped(
                raw,
                source_table=src.name,
                mapping=src.cost_mapping(),
                cloud_provider=src.cloud_provider(),
                sync_timestamp=ts,
            )
            write_costs_partitioned(
                norm, f"{output_root}/{src.name}_normalized", if_exists="replace"
            )
            # re-read the sink so the view is backed by the committed data
            normalized[src.name] = (
                spark.read.parquet(f"{output_root}/{src.name}_normalized")
                .select(
                    "date",
                    "account_id",
                    "service",
                    "region",
                    "cost",
                    "currency",
                    "cloud_provider",
                    "source_table",
                    "sync_timestamp",
                )
            )
            if config is not None and config.jdbc_url:
                write_jdbc(
                    normalized[src.name],
                    config.jdbc_url,
                    config.jdbc_table(f"{src.name}_normalized"),
                    if_exists="replace",
                    properties=config.jdbc_properties,
                )
            n = normalized[src.name].count()
            report.tables[src.name] = n
            append_sync_log(
                log_entry(
                    spark, ts, src.name, "success", n,
                    len(normalized[src.name].columns), time.time() - t0,
                ),
                f"{output_root}/sync_log",
            )
        except Exception as exc:  # per-source isolation (main.py:119-122)
            # a source that failed mid-landing (e.g. the JDBC write
            # after the parquet write) must not leak into the unified
            # view — nor into the success report — as if it succeeded
            normalized.pop(src.name, None)
            report.tables.pop(src.name, None)
            report.failures[src.name] = str(exc)[:500]
            # the failure log is itself a sink write — if the original
            # failure IS the sink/storage, logging would re-raise and
            # break the per-source isolation contract
            try:
                append_sync_log(
                    log_entry(
                        spark, ts, src.name, "failed", 0, 0, time.time() - t0,
                        error_message=str(exc)[:500],
                    ),
                    f"{output_root}/sync_log",
                )
            except Exception:
                pass

    if normalized and not dry_run:
        create_costs_view(spark, normalized)
    return report
