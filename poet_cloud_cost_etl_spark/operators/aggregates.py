"""A-family helpers beyond plain groupBy (SURVEY §2.5) — the
skew-management patterns that matter at 100 TB.

Spark's hash aggregate already does map-side partial aggregation, so
a plain ``groupBy().sum()`` rarely skews. The patterns here cover the
cases it doesn't:

- ``salted_agg``: two-phase aggregation over an explicit salt. Needed
  when per-key *state* is large (collect_set / count-distinct /
  UDAF accumulators), where one hot key concentrates memory on one
  reducer. Phase 1 aggregates (key, salt) partials across ``n_salts``
  reducers; phase 2 merges the per-key partials. Result-identical to
  the direct aggregation for any commutative+associative measure.
- ``two_phase_count_distinct``: exact distinct via (key, value)
  pre-dedup, the shuffle-friendly expansion of COUNT(DISTINCT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    measures: dict[str, Column],
    salt_col: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation. ``measures`` maps output name →
    phase-1 aggregate expression; phase 2 SUMs the partials (valid for
    sum/count-shaped measures). ``salt_col`` must be deterministic per
    row (e.g. a hash of a row id) so re-runs agree."""
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(n_salts)))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[F.sum(name).alias(name) for name in measures]
    )


def two_phase_count_distinct(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without a single-reducer
    distinct: dedup on (key, value) first (partial-aggregatable), then
    count — two well-distributed shuffles instead of one skewed one."""
    return (
        df.select(*key_cols, value_col)
        .distinct()
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{value_col}"))
    )
