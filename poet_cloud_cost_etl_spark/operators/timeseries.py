"""Time-series operators: EWMA smoothing, rolling-window distinct
counts, forward fill, SCD-2 interval construction, inter-arrival
statistics.

Reference parity: the reference's analytics surface stops at plain
daily GROUP BY trends (``/root/reference/src/main.py:137-160``); these
are the standard next-step time-series transforms a cost/observability
warehouse needs (smoothing, active-entity windows, slowly-changing
dimensions).

Cross-engine determinism: every accumulation here is exact-integer
(cents, microseconds, bit-shifted EWMA weights); floats appear only in
one final division, so Spark and DuckDB agree bit-for-bit regardless
of partitioning or evaluation order.

Scale notes (100 TB):

- ``ewma`` is ONE window pass (K lag expressions over a single window
  spec — Spark evaluates all lags in one sort/scan per partition); no
  self-join, no K-row fan-out.
- ``rolling_distinct_count`` fans each (day, key) pair out to at most
  ``window_days`` grid days before the distinct-agg — a bounded
  explode that shuffles ``window_days × |day-key pairs|`` rows, NOT
  ``window_days × |events|``, because the per-day distinct projection
  runs first (map-side combine applies).
- ``scd2_intervals`` and ``forward_fill`` are single hash-partitioned
  window passes per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    lookback: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average with decay 1/2 over a
    bounded ``lookback`` window, in exact integer arithmetic.

    Weight for the row ``off`` steps back is the integer
    ``2^(lookback-1-off)`` — a power-of-two ladder, so the weighted
    sum and the weight normalizer are exact BIGINT sums; the single
    final division is the only float op. Missing history (series head)
    simply drops those weights from the normalizer, which is the
    standard "adjusted" EWMA initialization.

    Adds ``ewma_<value_col>`` (double) next to the raw value.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    wsum = None
    wnorm = None
    for off in range(lookback):
        weight = 1 << (lookback - 1 - off)
        lagged = F.lag(F.col(value_col), off).over(w)
        term = F.coalesce(lagged * F.lit(weight), F.lit(0))
        norm = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        wsum = term if wsum is None else wsum + term
        wnorm = norm if wnorm is None else wnorm + norm
    return series.withColumn(
        f"ewma_{value_col}", wsum.cast("double") / wnorm.cast("double")
    )


def rolling_distinct_count(
    pairs: DataFrame,
    day_col: str,
    entity_col: str,
    window_days: int = 7,
    impl: str = "exact",
) -> DataFrame:
    """Rolling N-day distinct-entity count (e.g. weekly active
    users): for each day in the observed span, the number of distinct
    entities seen in ``[day - window_days + 1, day]``.

    ``impl="exact"``: exact rolling COUNT(DISTINCT) cannot be a
    window frame (distinct state doesn't subtract); the scalable
    exact formulation is the bounded fan-out join — each distinct
    (day, entity) pair lands in at most ``window_days`` output days.

    ``impl="hll"``: the sketch twin for when even the fanned-out
    pair volume is the bottleneck (billions of entities/day). Each
    day collapses to ONE DataSketches HLL sketch first
    (``hll_sketch_agg``, map-side partial like any agg), and only
    the tiny per-day sketch table (n_days rows) goes through the
    range fan-out; the window merge is ``hll_union_agg`` — so join
    volume drops from |distinct pairs|·w to n_days·w regardless of
    entity cardinality, the exact property that makes sketch
    rollups the standard at 100 TB. Estimate error is the HLL
    default (~1.6% at lgConfigK=12); counts are NOT bit-exact,
    which is why exact stays the oracle-pinned default.
    """
    if impl not in ("exact", "hll"):
        raise ValueError(f"impl must be exact|hll, got {impl!r}")
    out_col = f"rolling{window_days}d_{entity_col}s"
    if impl == "hll":
        sketches = pairs.groupBy(day_col).agg(
            F.hll_sketch_agg(entity_col).alias("__sk")
        )
        days = sketches.select(F.col(day_col).alias("__d"))
        joined = days.join(
            sketches,
            (F.col(day_col) <= F.col("__d"))
            & (F.col(day_col) >= F.date_sub(F.col("__d"), window_days - 1)),
        )
        return joined.groupBy(F.col("__d").alias(day_col)).agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias(out_col)
        )
    distinct_pairs = pairs.select(day_col, entity_col).distinct()
    days = distinct_pairs.select(F.col(day_col).alias("__d")).distinct()
    joined = days.join(
        distinct_pairs,
        (F.col(day_col) <= F.col("__d"))
        & (F.col(day_col) >= F.date_sub(F.col("__d"), window_days - 1)),
    )
    return joined.groupBy(F.col("__d").alias(day_col)).agg(
        F.countDistinct(entity_col).alias(out_col)
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build SCD-2 validity intervals from an event/change log: per
    key, consecutive runs of the same ``attr_col`` collapse to one row
    with ``valid_from_us`` / ``valid_to_us`` (microseconds; open
    interval end is NULL for the current segment) and a 1-based
    ``segment_idx``.

    The standard warehouse "dimension history from CDC feed" builder.
    One hash partition per key, two window passes over the same
    partitioning (change-flag via lag, then interval close via lead).
    """
    order = Window.partitionBy(key_col).orderBy("__us", tiebreak_col)
    flagged = (
        events.withColumn("__us", F.unix_micros(F.col(ts_col)))
        .withColumn(
            "__chg",
            F.when(
                F.lag(attr_col).over(order).isNull()
                | (F.col(attr_col) != F.lag(attr_col).over(order)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .filter(F.col("__chg") == 1)
    )
    seg = Window.partitionBy(key_col).orderBy("__us", tiebreak_col)
    return flagged.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("__us").alias("valid_from_us"),
        F.lead("__us").over(seg).alias("valid_to_us"),
        F.row_number().over(seg).alias("segment_idx"),
    )


def forward_fill(
    grid: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Carry the last non-null ``value_col`` forward along
    ``order_col`` within each key — the standard as-of/LOCF repair for
    densified series (twin of zero-fill gapfill). One window pass;
    rows before the first observation stay NULL."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.withColumn(
        f"ffill_{value_col}", F.last(value_col, ignorenulls=True).over(w)
    )


def inter_arrival_gaps(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key inter-arrival gaps in integer microseconds (row i's gap
    is to the previous event of the same key; first event has none and
    is dropped). Feed to an aggregate for arrival-rate stats."""
    order = Window.partitionBy(key_col).orderBy("__us", tiebreak_col)
    return (
        events.withColumn("__us", F.unix_micros(F.col(ts_col)))
        .withColumn("gap_us", F.col("__us") - F.lag("__us").over(order))
        .filter(F.col("gap_us").isNotNull())
    )
