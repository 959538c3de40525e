"""Batch sessionization and time-weighted aggregation — the batch
twins of the streaming session window (ST3), for backfills and
reprocessing where the corpus is at rest.

Reference parity: the reference has no sessionization; this extends
the events-analytics family (SURVEY §2.10-2.11) the same way
``events_session_window`` does on the streaming side.

Scale notes (100 TB):

- ``sessionize`` is ONE shuffle (hash-partition by user) feeding two
  window passes over the same partitioning (lag→flag, running sum)
  plus the final per-session aggregate — Spark keeps all three in one
  exchange because the partition keys agree (the group-by key set
  contains the window partition key).
- All arithmetic is integer microseconds (``unix_micros``), so the
  output is bit-stable across engines, partitionings, and re-runs —
  no float time math.
- Per-user state is bounded by that user's event count; a pathological
  single hot user is an AQE skew-split away, and the window itself is
  O(events) memory because row_number-style frames stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based sessions per user and aggregate one row per
    session: ``(user, session_idx, n_events, start_us, end_us,
    duration_us)``. A new session starts when the gap to the previous
    event exceeds ``gap_minutes``; ``session_idx`` is 1-based in time
    order (ties broken by ``id_col``), so ids are deterministic and
    engine-independent — no monotonically_increasing_id.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    order = Window.partitionBy(user_col).orderBy("__us", id_col)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        events.withColumn("__us", us)
        .withColumn(
            "__new_session",
            F.when(
                F.lag("__us").over(order).isNull()
                | (F.col("__us") - F.lag("__us").over(order) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_idx", F.sum("__new_session").over(running))
    )
    return flagged.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__us").alias("start_us"),
        F.max("__us").alias("end_us"),
        (F.max("__us") - F.min("__us")).alias("duration_us"),
    )


def time_weighted_avg(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user time-weighted average of ``value_col``: each value is
    held until the next event and weighted by that holding time. The
    weighted sum runs in exact integers (cents × microseconds), so
    only the final single division is floating point — deterministic
    across engines and partitionings. The last event of each user has
    no holding interval and is excluded (standard left-continuous
    step-function convention)."""
    order = Window.partitionBy(user_col).orderBy("__us", id_col)
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    stepped = (
        events.withColumn("__us", F.unix_micros(F.col(ts_col)))
        .withColumn("__cents", cents)
        .withColumn("__dt_us", F.lead("__us").over(order) - F.col("__us"))
        .filter(F.col("__dt_us").isNotNull())
    )
    return (
        stepped.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("__cents") * F.col("__dt_us")).alias("__wv"),
            F.sum("__dt_us").alias("__w"),
        )
        .select(
            user_col,
            "n_intervals",
            F.round(
                F.col("__wv").cast("double") / F.col("__w").cast("double") / 100.0, 6
            ).alias("twa_value"),
        )
    )
