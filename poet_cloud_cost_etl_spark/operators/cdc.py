"""Change-data-capture primitives: snapshot diffing and
latest-by-key compaction — the two halves of keeping a mutable
operational table in sync with an analytical store, which is exactly
the loop the reference drives by hand with drop-and-reload
(/root/reference/src/loaders/postgresql.py:46-107 replaces the whole
table every sync). These operators make the sync incremental.

Scale notes (100 TB):

- ``snapshot_diff`` is ONE full-outer sort-merge join hash-partitioned
  on the key — the canonical shape; AQE handles skewed keys. Columns
  are compared with null-safe equality (``eqNullSafe``), so
  NULL→value and value→NULL transitions are real updates.
- ``latest_by_key`` is one shuffle + a streaming row_number — the
  standard log-compaction plan. The ordering columns must form a
  total order per key (ties broken by a unique id) or "latest" would
  be engine-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Diff two snapshots of the same keyed table. Returns one row per
    changed key: ``key_cols..., change_type ('insert'|'delete'|
    'update'), <col>_old, <col>_new`` for each compare col. Unchanged
    keys are dropped (the common case at scale — the diff is small
    even when the snapshots are huge)."""
    o = old.select(*key_cols, *[F.col(c).alias(f"{c}_old") for c in compare_cols])
    n = new.select(*key_cols, *[F.col(c).alias(f"{c}_new") for c in compare_cols])
    # presence markers survive the outer join even when every payload
    # column is legitimately NULL
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))
    joined = o.join(n, list(key_cols), "full_outer")

    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .drop("__in_old", "__in_new")
    )


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Log compaction: keep exactly the newest row per key, newest =
    greatest ``order_cols`` tuple (descending). ``order_cols`` must be
    a total order within each key — include a unique id as the final
    tie-break."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
