"""W-family scale path: distributed global ranking.

A global ``Window.orderBy(...)`` with no ``partitionBy`` moves every
row through ONE task — fine for bounded inputs (daily aggregates),
fatal at 100 TB. This operator computes the same exact global rank in
two passes, all rows staying distributed:

1. bucket rows by range on the leading sort column (boundaries from
   ``approxQuantile`` — only the *balance* of buckets depends on the
   approximation, never the result);
2. rank locally inside each bucket (Window partitioned by bucket),
   then add per-bucket offsets (prefix sums over the tiny bucket-count
   table).

Rows with equal leading-column values always land in the same bucket,
so cross-bucket order is total; the in-bucket window applies the
remaining tie-break columns. ntile / percent_rank / cume_dist are then
pure arithmetic on (rank, n) — exactly the built-ins' semantics when
the ordering is unique.

Skew note: a single hot leading value collapses into one bucket (the
same limit any range partitioning has); add a finer tie-break column
to the *bucketing* key if that happens in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "global_rank",
    n_buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """Append an exact 1-based global rank over ``order_cols``
    (which must define a unique total order) without a single-task
    global window.

    ``total_col``: also attach the total row count as a column — it
    falls out of the per-bucket counts this function already computes
    (no extra scan), which is what ntile/percent_rank/cume_dist
    consumers need.

    Degenerate-prefix guard (r8 advisor finding): the range buckets
    come from approxQuantile on the FIRST order column, so a leading
    column that is constant over the whole input (e.g. a templated
    corpus where every packed key prefix is identical) collapses to
    one bucket and silently re-creates the single-task sort this
    function exists to remove.  Bucketing on a LATER order column is
    order-preserving iff every earlier column is constant — exactly
    the collapse condition — so we peel constant leading numeric
    columns and bucket on the first non-constant one.  The peel scan
    (one min/max agg per peeled column) only runs on degenerate
    data; the normal path is the same single approxQuantile as
    before.  If peeling reaches a non-numeric column the function
    degrades to the pre-existing single-bucket behavior — callers
    that range-bucket on packed string prefixes should supply enough
    packed levels to make that practically unreachable (see
    sorted_neighborhood_pairs: 3 levels = 24 shared chars)."""
    bucket = _range_bucket_expr(df, order_cols, n_buckets)
    bucketed = df.withColumn("__bucket", bucket)

    # Both windows share the one hash-partition-by-bucket shuffle; the
    # per-bucket count rides along, so no second scan/aggregation pass
    # over the input is needed to build the offsets.
    w_local = Window.partitionBy("__bucket").orderBy(*order_cols)
    w_cnt = Window.partitionBy("__bucket")
    local = bucketed.withColumn("__rn", F.row_number().over(w_local)).withColumn(
        "__cnt", F.count(F.lit(1)).over(w_cnt)
    )

    # offsets: exclusive prefix sum over the (tiny, ≤ n_buckets-row)
    # distinct (bucket, count) table — the only single-task step, and
    # it touches n_buckets rows regardless of data scale.
    counts = local.select("__bucket", "__cnt").distinct()
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    if total_col is not None:
        total = counts.agg(F.sum("__cnt").cast("long").alias(total_col))
        offsets = offsets.crossJoin(total)

    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(rank_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__bucket", "__rn", "__cnt", "__off")
    )


def _range_bucket_expr(
    df: DataFrame, order_cols: list[str], n_buckets: int
) -> Column:
    """The order-preserving range-bucket expression shared by
    ``with_global_rank`` and ``with_global_cumsum``: boundaries from
    ``approxQuantile`` on the first non-constant numeric order column
    (constant leading columns peeled — see the degenerate-prefix
    guard in ``with_global_rank``'s docstring), NULLs to bucket 0
    (NULLS-FIRST ascending order).  Only bucket *balance* depends on
    the approximation, never any result."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bucket_col, bounds = order_cols[0], []
    if probs:
        from pyspark.errors import AnalysisException, IllegalArgumentException

        for c in order_cols:
            try:
                cand = sorted(set(df.stat.approxQuantile(c, probs, 0.001)))
            except (AnalysisException, IllegalArgumentException):
                # non-numeric order column (approxQuantile's
                # requirement check raises IllegalArgumentException;
                # AnalysisException covers resolution variants):
                # can't range-bucket past here; keep whatever the
                # previous level gave us. Genuine RUNTIME failures
                # (executor loss, codegen errors) propagate instead
                # of silently degrading every caller to the
                # single-bucket single-task sort this function
                # exists to avoid (r9 ADVICE item 3).
                break
            bucket_col = c
            if len(cand) > 1:
                bounds = cand
                break
            # single distinct quantile: either the column is constant
            # (peel and try the next level) or it is merely skewed
            # (keep the single bound — 2 buckets, order-safe).
            # "Constant" must mean constant over EVERY row: min/max
            # (and approxQuantile) ignore NULLs, so a column mixing
            # NULLs with one non-null value would otherwise be
            # peeled — but its order (NULLS FIRST, then the value)
            # is NOT constant, and bucketing on a later column would
            # interleave the NULL rows' ranks (r9 review finding).
            # Such a column falls through to the single-bound path,
            # which is order-safe: the bucket expression sends NULL
            # to bucket 0, exactly where NULLS FIRST ascending
            # ordering needs it.
            mm = df.agg(
                F.min(c).alias("mn"),
                F.max(c).alias("mx"),
                F.count(c).alias("nn"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            if mm.nn == 0 or (mm.nn == mm.n and mm.mn == mm.mx):
                continue
            bounds = cand
            break

    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        return F.size(F.filter(barr, lambda b: F.col(bucket_col) > b))
    return F.lit(0)


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    cum_col: str = "global_cumsum",
    total_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Append the exact inclusive running SUM of ``weight_col`` over
    the global ``order_cols`` order — ``with_global_rank`` generalized
    from weight-1 rows to weighted rows — without a single-task global
    window (r13 verdict "what's wrong #1": the X179 value-lattice
    cumulative count ran ``Window.orderBy(v)`` unpartitioned, a
    user-cardinality single-task sort for exact-cents lattices).

    Same two-phase shape as ``with_global_rank``: range-bucket on the
    leading order column, one hash-partition-by-bucket shuffle carries
    BOTH the in-bucket running sum and the per-bucket weight total,
    then a ≤ ``n_buckets``-row exclusive prefix sum (the only
    single-task step, constant-size at any data scale) is broadcast
    back as the bucket offset.  ``total_col``: also attach the global
    weight total (falls out of the per-bucket totals, no extra scan).
    Exact: pure integer/decimal sums, no approximation anywhere in
    the result — ``approxQuantile`` only balances the buckets.
    ``order_cols`` must define a unique total order (as for
    ``with_global_rank``): the inclusive frame makes tied rows'
    running sums order-dependent."""
    bucket = _range_bucket_expr(df, order_cols, n_buckets)
    bucketed = df.withColumn("__bucket", bucket)

    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_cnt = Window.partitionBy("__bucket")
    local = bucketed.withColumn(
        "__lcum", F.sum(weight_col).over(w_local)
    ).withColumn("__bsum", F.sum(weight_col).over(w_cnt))

    counts = local.select("__bucket", "__bsum").distinct()
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off"),
    )
    if total_col is not None:
        total = counts.agg(F.sum("__bsum").alias(total_col))
        offsets = offsets.crossJoin(total)

    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(cum_col, F.col("__off") + F.col("__lcum"))
        .drop("__bucket", "__lcum", "__bsum", "__off")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """ntile(k) reconstructed from a unique global rank: the first
    (n % k) tiles get ceil(n/k) rows, the rest floor(n/k) — Spark's
    and DuckDB's NTILE distribution."""
    q = (n / k).cast("long")  # floor(n/k)
    r = n - q * k  # n % k
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rank - big - 1) / q).cast("long") + 1)
        .cast("int")
    )


def percent_rank_from_rank(rank: Column, n: Column) -> Column:
    """percent_rank for a unique ordering: (rank-1)/(n-1)."""
    return F.when(n == 1, F.lit(0.0)).otherwise(
        (rank - 1).cast("double") / (n - 1).cast("double")
    )


def cume_dist_from_rank(rank: Column, n: Column) -> Column:
    """cume_dist for a unique ordering: rank/n."""
    return rank.cast("double") / n.cast("double")


def with_grouped_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    weight_col: str,
    cum_col: str = "grouped_cumsum",
    total_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact inclusive running sum of ``weight_col`` over
    ``order_cols`` WITHIN each ``group_cols`` group — the grouped
    sibling of ``with_global_cumsum``, for the few-huge-groups regime
    where ``Window.partitionBy(group)`` funnels an entire group
    through one task (e.g. a per-event-type gap-value lattice: 5
    groups, each potentially near-corpus-cardinality).

    Same two-phase shape: range-bucket on the leading (numeric) ORDER
    column globally — group values share bucket boundaries, which is
    fine because the running sum is per-(group, bucket) — the local
    window partitions by (group, bucket), and the offsets table is
    the per-(group, bucket) totals' exclusive prefix WITHIN group
    (≤ |G|·n_buckets rows, broadcast).  ``total_col`` attaches the
    per-GROUP weight total (falls out of the same bucket totals).
    ``order_cols`` must be unique within each group; exact integer/
    decimal sums, approxQuantile only balances buckets."""
    bucket = _range_bucket_expr(df, order_cols, n_buckets)
    bucketed = df.withColumn("__bucket", bucket)

    w_local = (
        Window.partitionBy(*group_cols, "__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_cnt = Window.partitionBy(*group_cols, "__bucket")
    local = bucketed.withColumn(
        "__lcum", F.sum(weight_col).over(w_local)
    ).withColumn("__bsum", F.sum(weight_col).over(w_cnt))

    counts = local.select(*group_cols, "__bucket", "__bsum").distinct()
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__bucket",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off"),
    )
    if total_col is not None:
        totals = counts.groupBy(*group_cols).agg(
            F.sum("__bsum").alias(total_col)
        )
        offsets = offsets.join(totals, list(group_cols))

    return (
        local.join(F.broadcast(offsets), [*group_cols, "__bucket"])
        .withColumn(cum_col, F.col("__off") + F.col("__lcum"))
        .drop("__bucket", "__lcum", "__bsum", "__off")
    )
