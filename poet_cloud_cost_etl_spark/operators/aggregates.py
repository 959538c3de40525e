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


def skew_audit(
    df: DataFrame, key_col: str, partitions: int = 32, top_k: int = 256
) -> DataFrame:
    """X106: join/shuffle-key skew audit — the one-row panel you read
    BEFORE keying a 100 TB join or aggregate on a column: key count,
    hot-key concentration (share of rows held by the top 1 / 16 /
    ``top_k`` keys), key-distribution entropy, and the salt factor a
    ``partitions``-way shuffle on this key needs (ceil(max_count /
    ceil(n_rows / partitions)) — 1 means no salting, n means split
    the hot key n ways, the dial ``salted_agg`` and AQE skew-join
    both turn).  The sibling of X77's LSH banding planner: corpus-
    grounded numbers instead of rules of thumb.

    Exactness: counts are exact BIGINTs; shares are ppm integer
    divisions; entropy uses the X99 scaled-integer convention.

    Scale: one map-side-combinable count aggregate over the keyspace;
    the top-``top_k`` ranks come from a single-partition window over
    the |keys|-row COUNT table (bounded by distinct keys, and
    WindowGroupLimit caps what reaches it at top_k per map
    partition); everything else is a 1-row aggregate.  The corpus
    itself is scanned once."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy(F.col("c").desc(), F.col("k").asc())
    ranked = counts.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= top_k
    )
    tops = ranked.agg(
        F.max(F.when(F.col("__r") == 1, F.col("c"))).alias("max_count"),
        F.sum(F.when(F.col("__r") <= 1, F.col("c")).otherwise(0)).alias("__t1"),
        F.sum(F.when(F.col("__r") <= 16, F.col("c")).otherwise(0)).alias(
            "__t16"
        ),
        F.sum(F.col("c")).alias("__tk"),
    )
    base = counts.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.col("c") * F.round(F.log("c") * 1_000_000.0).cast("long")
        ).alias("__s"),
    )
    return (
        base.crossJoin(F.broadcast(tops))
        .select(
            "n_rows",
            "n_keys",
            "max_count",
            F.expr("(1000000 * __t1) div n_rows").alias("top1_ppm"),
            F.expr("(1000000 * __t16) div n_rows").alias("top16_ppm"),
            F.expr("(1000000 * __tk) div n_rows").alias(f"top{top_k}_ppm"),
            (
                F.round(F.log("n_rows") * 1_000_000.0).cast("long")
                - F.expr("__s div n_rows")
            ).alias("key_entropy_nats_e6"),
            # pure-integer ceil-div chain: target rows/partition,
            # then how many ways the hot key must split to fit it
            F.expr(
                f"(max_count + (n_rows + {partitions} - 1) div {partitions} - 1)"
                f" div ((n_rows + {partitions} - 1) div {partitions})"
            ).alias("salt_factor"),
        )
    )


def range_partition_plan(
    df: DataFrame, value_col: str, n_partitions: int = 8
) -> DataFrame:
    """X107: equi-depth range-partition planner — exact split
    boundaries for an ``n_partitions``-way range partitioning of
    ``value_col``, with the REALIZED row count each partition would
    receive.  Spark's RangePartitioner samples to estimate exactly
    these boundaries; this computes them exactly and, crucially,
    reports the realized balance: with duplicated values every tie
    lands in one partition, so realized_rows ≠ n/N is precisely the
    skew a sampled partitioner cannot see.  balance_x_ppm = 10⁶
    means perfect balance; a partition at 3·10⁶ holds 3× its share
    and is the straggler-to-be.

    Boundary i is the SMALLEST value whose cumulative count reaches
    ceil(i·n/N) — the textbook equi-depth histogram bound, all
    integer arithmetic.

    Scale: one map-side-combinable count aggregate over the VALUE
    keyspace, then a single-partition cumulative window over the
    |values|-row count table — bounded by distinct values, never
    corpus rows (plan over a deterministic X9 sample or a pre-bucket
    when the value domain is itself corpus-sized, e.g. raw doubles).
    The boundary pick is an N × |values| bounded join."""
    from pyspark.sql.window import Window

    vc = df.groupBy(F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select(
        "v", "c", F.sum("c").over(w).alias("cum")
    ).withColumn("prev_cum", F.col("cum") - F.col("c"))
    tot = cum.agg(F.max("cum").alias("n_rows"))
    targets = tot.select(
        "n_rows",
        F.explode(F.expr(f"sequence(1, {n_partitions})")).alias("pidx"),
    ).select(
        "n_rows",
        "pidx",
        F.expr(f"(pidx * n_rows + {n_partitions} - 1) div {n_partitions}").alias(
            "__t"
        ),
    )
    bounds = (
        targets.join(
            F.broadcast(cum),
            (F.col("__t") > F.col("prev_cum")) & (F.col("__t") <= F.col("cum")),
        )
        .select(
            "pidx",
            "n_rows",
            F.col("v").alias("boundary_value"),
            F.col("cum").alias("cum_rows"),
        )
    )
    wlag = Window.orderBy("pidx")
    return (
        bounds.withColumn(
            "realized_rows",
            F.col("cum_rows") - F.coalesce(F.lag("cum_rows").over(wlag), F.lit(0)),
        )
        .select(
            "pidx",
            "boundary_value",
            "cum_rows",
            "realized_rows",
            F.expr(
                f"(1000000 * realized_rows * {n_partitions}) div n_rows"
            ).alias("balance_x_ppm"),
        )
        .orderBy("pidx")
    )


# Benford expected first-digit shares, ppm: round(1e6*log10(1 + 1/d))
# for d = 1..9 — hardcoded constants so neither engine evaluates a
# log at query time (libm log10 boundary cases like log10(1000)
# differ across runtimes; literals cannot).
BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """X108: Benford first-significant-digit audit (Newcomb 1881 /
    Benford 1938) — the classic fabricated-or-truncated-numbers
    screen for any multi-scale positive quantity (costs, usage
    counters, file sizes).  Organic data spanning orders of magnitude
    follows P(d) = log10(1+1/d); capped, synthesized, or
    unit-mangled feeds don't, and the per-digit deltas point at the
    digit range that was tampered with.  A curation engine runs this
    on ingested numeric feeds for the same reason auditors run it on
    ledgers.

    The first digit is taken from the DECIMAL STRING of the
    integer-cents value (exact in every engine) — never from
    floor(log10(x)), whose libm boundary behavior (log10(1000) <
    3.0 on some runtimes) would misbin exact powers of ten.  Zeros
    are excluded (no first significant digit).

    Output: one row per digit 1-9 with exact counts, observed ppm,
    the hardcoded Benford ppm, and delta_ppm.  Digits that never
    occur still report a row (0 observed vs expected).

    Scale: one narrow map + one 9-row aggregate, then a 9×9-bounded
    fill join.  Nothing else touches the corpus."""
    cents = F.expr(f"abs(CAST(round({value_col} * 100) AS BIGINT))")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    obs = (
        df.select(cents.alias("__c"), digit.alias("digit"))
        .filter(F.col("__c") > 0)
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("__nt"))
    exp_rows = ", ".join(
        f"struct({d + 1} AS digit, {p}L AS benford_ppm)"
        for d, p in enumerate(BENFORD_PPM)
    )
    grid = (
        df.sparkSession.range(1)
        .select(F.explode(F.expr(f"array({exp_rows})")).alias("e"))
        .select("e.digit", "e.benford_ppm")
    )
    return (
        grid.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("(1000000 * coalesce(n, 0)) div __nt").alias("observed_ppm"),
            "benford_ppm",
            (
                F.expr("(1000000 * coalesce(n, 0)) div __nt")
                - F.col("benford_ppm")
            ).alias("delta_ppm"),
        )
        .orderBy("digit")
    )


def signal_correlation_matrix(
    df: DataFrame, signal_cols: list[str]
) -> DataFrame:
    """X111: exact Pearson correlation matrix over integer-valued
    quality signals — the redundancy audit for a filter ensemble:
    two signals correlating at r ≈ 1 vote twice for the same thing
    (X102's rank fusion then double-counts them), and a signal
    correlating with nothing may be noise.  Read this panel before
    weighting any multi-signal gate.

    Exactness: all five accumulators (n, Σx, Σy, Σxy, Σx², Σy²) run
    in DECIMAL(38,0) (the X60/X104 convention — BIGINT overflows at
    n·Σx² scale), so numerator and both variance terms are EXACT
    integers; the only floating step is the final
    num / sqrt(d1·d2), identical IEEE ops in any engine, rounded to
    r_e6.  Zero-variance signals yield NULL (degenerate marginal,
    the X91 convention), never a fabricated 0.

    Scale: ONE corpus scan — a single hash aggregate computes every
    pairwise accumulator (k signals → k(k−1)/2 literal product
    columns inside codegen, k is single-digit); the reshape to pair
    rows explodes a bounded literal array on the 1-row result."""
    k = len(signal_cols)
    aggs = []
    for i, c in enumerate(signal_cols):
        v = F.col(c).cast("decimal(38,0)")
        aggs.append(F.sum(v).alias(f"__s{i}"))
        aggs.append(F.sum(v * v).alias(f"__q{i}"))
    for i in range(k):
        for j in range(i + 1, k):
            vi = F.col(signal_cols[i]).cast("decimal(38,0)")
            vj = F.col(signal_cols[j]).cast("decimal(38,0)")
            aggs.append(F.sum(vi * vj).alias(f"__p{i}_{j}"))
    one = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    pairs = []
    for i in range(k):
        for j in range(i + 1, k):
            num = f"(__n * __p{i}_{j} - __s{i} * __s{j})"
            d1 = f"(__n * __q{i} - __s{i} * __s{i})"
            d2 = f"(__n * __q{j} - __s{j} * __s{j})"
            pairs.append(
                f"struct('{signal_cols[i]}' AS sig_a, "
                f"'{signal_cols[j]}' AS sig_b, "
                f"CASE WHEN {d1} = 0 OR {d2} = 0 THEN NULL "
                f"ELSE CAST(round(1000000 * CAST({num} AS DOUBLE) / "
                f"sqrt(CAST({d1} AS DOUBLE) * CAST({d2} AS DOUBLE))) "
                f"AS BIGINT) END AS r_e6)"
            )
    return (
        one.select(
            F.col("__n").cast("long").alias("n_rows"),
            F.explode(F.expr("array(" + ", ".join(pairs) + ")")).alias("__p"),
        )
        .select("n_rows", "__p.sig_a", "__p.sig_b", "__p.r_e6")
        .orderBy("sig_a", "sig_b")
    )


def spearman_rank_correlation(
    df: DataFrame, group_col: str, col_x: str, col_y: str
) -> DataFrame:
    """X112: exact Spearman rank correlation per group — the
    monotone-association twin of X111's Pearson: rank-based, so one
    Zipf-tail outlier cannot fake (or hide) an association between
    two signals.  The standard question it answers: does the LM
    score actually ORDER documents the same way the heuristic gate
    does, across each source?

    Exactness trick: Spearman needs AVERAGE ranks for ties
    (fractional), so the operator computes DOUBLED average ranks —
    2·avg_rank = 2·RANK() + ties − 1, an exact INTEGER (RANK gives
    the min rank of the tie run, a count-over-value window gives the
    run length) — and feeds them to the exact Pearson machinery
    (Pearson is scale/shift-invariant, so rho is unchanged).  All
    accumulators DECIMAL(38,0); one final IEEE division rounded to
    rho_e6; constant columns yield NULL.

    Scale: two rank windows + one tie-count window, all sharing the
    group partitioning (one shuffle), then a |G|-row aggregate."""
    from pyspark.sql.window import Window

    wx = Window.partitionBy(group_col).orderBy(col_x)
    wy = Window.partitionBy(group_col).orderBy(col_y)
    tx = Window.partitionBy(group_col, col_x)
    ty = Window.partitionBy(group_col, col_y)
    r = df.select(
        F.col(group_col).alias("grp"),
        (
            2 * F.rank().over(wx) + F.count(F.lit(1)).over(tx) - 1
        ).cast("decimal(38,0)").alias("__rx"),
        (
            2 * F.rank().over(wy) + F.count(F.lit(1)).over(ty) - 1
        ).cast("decimal(38,0)").alias("__ry"),
    )
    agg = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
    )
    num = "(__n * __sxy - __sx * __sy)"
    d1 = "(__n * __sxx - __sx * __sx)"
    d2 = "(__n * __syy - __sy * __sy)"
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("__n").cast("long").alias("n_rows"),
        F.expr(
            f"CASE WHEN {d1} = 0 OR {d2} = 0 THEN NULL "
            f"ELSE CAST(round(1000000 * CAST({num} AS DOUBLE) / "
            f"sqrt(CAST({d1} AS DOUBLE) * CAST({d2} AS DOUBLE))) AS BIGINT) "
            "END"
        ).alias("rho_e6"),
    ).orderBy(group_col)


def join_size_estimate(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    broadcast_threshold_rows: int = 1_000_000,
) -> DataFrame:
    """X113: exact pre-join cardinality estimate — |A ⋈ B| =
    Σ_k cA(k)·cB(k) computed from the two per-key count tables, plus
    the hot-pair fanout (max cA·cB over matching keys) and a join-
    strategy recommendation.  The planning companion to X106: the
    skew audit says whether ONE side's key is concentrated; this says
    what the join itself will produce — the difference between a
    10⁹-row result you partition for and a 10¹³-row fanout you
    redesign around, discovered BEFORE the shuffle instead of as a
    dying executor.  (Catalyst estimates this from column stats when
    they exist; on raw parquet ingest they usually don't.)

    Exactness: per-key counts and the Σ cA·cB products are exact
    integers (DECIMAL(38,0) for the products — two Zipf keysides can
    push past BIGINT).

    Scale: one count aggregate per side (map-side combine), one
    equi-join of the two KEY tables (bounded by distinct keys), one
    1-row aggregate."""
    ca = df_a.groupBy(F.col(key_a).alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = df_b.groupBy(F.col(key_b).alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    sa = ca.agg(
        F.sum("ca").alias("rows_a"), F.count(F.lit(1)).alias("keys_a")
    )
    sb = cb.agg(
        F.sum("cb").alias("rows_b"), F.count(F.lit(1)).alias("keys_b")
    )
    prod = F.col("ca").cast("decimal(38,0)") * F.col("cb").cast("decimal(38,0)")
    j = ca.join(cb, "k").agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.coalesce(F.sum(prod), F.lit(0).cast("decimal(38,0)")).alias(
            "__est"
        ),
        F.max(prod).alias("__maxp"),
    )
    return (
        j.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            "rows_a",
            "keys_a",
            "rows_b",
            "keys_b",
            "matched_keys",
            F.col("__est").cast("long").alias("est_join_rows"),
            F.coalesce(F.col("__maxp").cast("long"), F.lit(0)).alias(
                "max_key_fanout"
            ),
            F.expr(
                f"CASE WHEN rows_b <= {broadcast_threshold_rows} "
                "THEN 'broadcast_b' "
                f"WHEN rows_a <= {broadcast_threshold_rows} "
                "THEN 'broadcast_a' "
                "ELSE 'shuffle' END"
            ).alias("strategy"),
        )
    )


def constraint_suite(df: DataFrame, checks: list[dict]) -> DataFrame:
    """X115: declarative data-quality constraint suite compiled into
    ONE aggregate scan — the Deequ pattern (Schelter et al., "Unit
    Tests for Data", VLDB 2018): a 100 TB ingest cannot afford one
    pass per check, so every metric the suite needs becomes one
    aggregate column of a single hash aggregate and the corpus is
    read exactly once.  This is the admission gate a curation
    pipeline runs on every new source drop before any downstream
    operator sees it.

    Check kinds (each a dict with ``name``, ``kind``, and bounds
    ``lo``/``hi`` as inclusive integers; NULL bound = unbounded):

    - ``row_count``: COUNT(*) between lo and hi.
    - ``completeness``: non-null ppm of ``col``.
    - ``distinctness``: exact COUNT(DISTINCT col) ppm of COUNT(*) —
      1_000_000 means the column is a key.  Exact, not approximate:
      multiple distincts still plan as ONE scan (Spark rewrites them
      through a single Expand).
    - ``match``: ppm of non-null values rlike ``pattern`` (keep
      patterns in the portable character-class subset).
    - ``in_set``: ppm of non-null values in ``allowed`` (strings).
    - ``min`` / ``max``: the column extremum itself (integer cents
      convention for money; raw integer otherwise).

    Metric exactness: every ppm is an integer division by
    greatest(count, 1) — the X40 clamp, so an empty input yields
    metric 0 rather than an engine-divergent division by zero — and
    every verdict is pure integer comparison.  Output one row per
    check: (check, kind, metric, lo, hi, status 'pass'/'fail'),
    ordered by check name.  An empty input fails row_count-with-lo
    checks and passes vacuous bound checks — deliberate: the suite,
    not the engine, decides emptiness via its row_count check.

    Scale: ONE corpus scan (a single agg row carries every metric),
    then the verdict table explodes a bounded per-check literal
    array on that 1-row result.  Nothing else touches the corpus."""
    metric_exprs: list[Column] = []
    for i, c in enumerate(checks):
        kind = c["kind"]
        if kind == "row_count":
            e = "count(1)"
        elif kind == "completeness":
            e = f"(1000000 * count({c['col']})) div greatest(count(1), 1)"
        elif kind == "distinctness":
            e = (
                f"(1000000 * count(DISTINCT {c['col']})) "
                "div greatest(count(1), 1)"
            )
        elif kind == "match":
            e = (
                f"(1000000 * count(CASE WHEN {c['col']} rlike "
                f"'{c['pattern']}' THEN 1 END)) "
                f"div greatest(count({c['col']}), 1)"
            )
        elif kind == "in_set":
            vals = ", ".join(f"'{v}'" for v in c["allowed"])
            e = (
                f"(1000000 * count(CASE WHEN {c['col']} IN ({vals}) "
                f"THEN 1 END)) div greatest(count({c['col']}), 1)"
            )
        elif kind in ("min", "max"):
            e = f"CAST({kind}({c['col']}) AS BIGINT)"
        else:
            raise ValueError(f"unknown check kind {kind!r}")
        metric_exprs.append(F.expr(e).cast("long").alias(f"__m{i}"))
    one = df.agg(*metric_exprs)

    def _b(v) -> str:
        return "CAST(NULL AS BIGINT)" if v is None else f"{int(v)}L"

    rows = ", ".join(
        f"struct('{c['name']}' AS check, '{c['kind']}' AS kind, "
        f"__m{i} AS metric, {_b(c.get('lo'))} AS lo, "
        f"{_b(c.get('hi'))} AS hi)"
        for i, c in enumerate(checks)
    )
    return (
        one.select(F.explode(F.expr(f"array({rows})")).alias("c"))
        .select("c.check", "c.kind", "c.metric", "c.lo", "c.hi")
        .withColumn(
            "status",
            F.expr(
                "CASE WHEN (lo IS NULL OR coalesce(metric, lo) >= lo) "
                "AND (hi IS NULL OR coalesce(metric, hi) <= hi) "
                "THEN 'pass' ELSE 'fail' END"
            ),
        )
        .orderBy("check")
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """X118: exact Mann-Whitney U rank-sum test (Mann & Whitney
    1947) — "is source A's length/quality distribution shifted
    relative to source B's?", asked without assuming normality and
    immune to the Zipf-tail outliers that invalidate a t-test on
    corpus data.  The AUC reading of U (P(a > b) + ½P(a = b)) is
    the same common-language effect size classifier evals use.

    Exactness: ranks come from a VALUE-KEYED count aggregate — the
    corpus collapses to its distinct-value lattice (the X81
    argument: the lattice, not the corpus, is what the cumulative
    window walks), so there is no corpus-wide sort anywhere.  The
    doubled-average-rank identity (X112): a value run with L
    smaller values and t ties has 2·avg_rank = 2L + t + 1, an exact
    integer; the doubled rank sum gives U2_a = R2_a − n_a(n_a+1)
    exactly.  auc_ppm = (10⁶·U2_a) div (2·n_a·n_b).  The normal
    approximation carries the full tie correction: z = (U2_a −
    n_a·n_b) / (2·sqrt(A/B)) with A = n_a·n_b·((N+1)·N·(N−1) −
    Σ(t³−t)) and B = 12·N·(N−1) both DECIMAL(38,0)-exact integers
    (X111); the sqrt and one division are the only floating steps,
    rounded to z_e6.  Degenerate inputs (either group empty, or all
    values tied so A = 0) yield NULL z (X91).

    Scale: one (group ∈ {a,b}) filtered value-keyed hash aggregate
    with map-side combine, a cumulative window over the bounded
    distinct-value table, and a 1-row final aggregate."""
    v = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("ca"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("cb"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = v.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)
        ).alias("lss"),
    )
    s = ranked.agg(
        F.sum("ca").cast("decimal(38,0)").alias("na"),
        F.sum("cb").cast("decimal(38,0)").alias("nb"),
        F.sum(F.expr("ca * (2 * lss + t + 1)"))
        .cast("decimal(38,0)")
        .alias("r2a"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).alias(
            "ties3"
        ),
    )
    u = s.select(
        "na",
        "nb",
        "ties3",
        F.expr("CAST(r2a - na * (na + 1) AS DECIMAL(38,0))").alias("__u2a"),
    )
    return u.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr("CAST(__u2a AS BIGINT)").alias("u2_a"),
        F.expr("CAST(2 * na * nb - __u2a AS BIGINT)").alias("u2_b"),
        F.expr(
            "CASE WHEN na > 0 AND nb > 0 THEN "
            "CAST((1000000 * __u2a) div (2 * na * nb) AS BIGINT) END"
        ).alias("auc_ppm"),
        F.expr(
            "CASE WHEN na > 0 AND nb > 0 AND "
            "na * nb * ((na + nb + 1) * (na + nb) * (na + nb - 1) - ties3) "
            "> 0 THEN "
            "CAST(round(1000000 * CAST(__u2a - na * nb AS DOUBLE) / "
            "(2 * sqrt(CAST(na * nb * ((na + nb + 1) * (na + nb) * "
            "(na + nb - 1) - ties3) AS DOUBLE) / "
            "CAST(12 * (na + nb) * (na + nb - 1) AS DOUBLE)))) AS BIGINT) "
            "END"
        ).alias("z_e6"),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """X119: exact two-sample Kolmogorov-Smirnov statistic — the
    SHAPE-shift companion to X118's location test: D = max |F_a −
    F_b| sees variance changes, bimodality, truncation — anything
    that moves the CDFs apart — where a rank test only sees
    stochastic dominance.  Run both: a source whose new crawl
    passes the rank test but fails KS changed shape, not center.

    Exactness: the corpus collapses to its distinct-value lattice
    (X81/X118); empirical CDFs are cumulative integer counts, and D
    is kept as the EXACT cross-multiplied integer d_num =
    max |cum_a·n_b − cum_b·n_a| (denominator n_a·n_b) — no floating
    CDF anywhere.  d_ppm = (10⁶·d_num) div (n_a·n_b).  The argmax
    location reported is the SMALLEST value achieving the max
    (deterministic tie-break), with the sign of F_a − F_b there.
    The one floating step is the asymptotic lambda = D·sqrt(n_a·n_b
    / (n_a+n_b)) (the Kolmogorov-distribution argument; lambda ≳
    1.36 rejects at 5%), rounded to lambda_e6.  Either group empty
    → NULLs (X91).

    Scale: one filtered value-keyed hash aggregate, a cumulative
    window over the bounded lattice, a broadcast 1-row max, and a
    lattice-bounded argmax filter."""
    v = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.count(F.when(F.col(group_col) == group_a, 1)).alias("ca"),
            F.count(F.when(F.col(group_col) == group_b, 1)).alias("cb"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = v.select(
        "v",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
        F.sum("ca").over(tot).alias("na"),
        F.sum("cb").over(tot).alias("nb"),
    ).select(
        "v",
        "na",
        "nb",
        F.expr("cuma * nb - cumb * na").alias("diff"),
    )
    mx = cum.agg(F.max(F.abs("diff")).alias("d_num"))
    at = (
        cum.crossJoin(F.broadcast(mx))
        .filter(F.abs(F.col("diff")) == F.col("d_num"))
        .groupBy("na", "nb", "d_num")
        .agg(
            F.min("v").alias("d_at_value"),
            F.expr("CAST(signum(min_by(diff, v)) AS INT)").alias("d_sign"),
        )
    )
    return at.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("d_num").cast("long").alias("d_num"),
        F.expr(
            "CASE WHEN na > 0 AND nb > 0 THEN "
            "CAST((1000000 * d_num) div (na * nb) AS BIGINT) END"
        ).alias("d_ppm"),
        "d_at_value",
        "d_sign",
        F.expr(
            "CASE WHEN na > 0 AND nb > 0 THEN "
            "CAST(round(1000000 * CAST(d_num AS DOUBLE) / "
            "CAST(na * nb AS DOUBLE) * "
            "sqrt(CAST(na * nb AS DOUBLE) / CAST(na + nb AS DOUBLE))) "
            "AS BIGINT) END"
        ).alias("lambda_e6"),
    )


def conformal_threshold(
    df: DataFrame,
    group_col: str,
    score_col: str,
    alpha_ppm: int = 100000,
) -> DataFrame:
    """X123: split-conformal calibration bound per group (Vovk et
    al.; Angelopoulos & Bates 2023 tutorial form) — the
    distribution-free threshold with a finite-sample guarantee: if
    q̂ is the ceil((n+1)(1−α))-th smallest calibration score, then
    a fresh exchangeable score exceeds q̂ with probability ≤ α.
    This is how a quality/anomaly gate gets an honest operating
    point per source: X81's PR curve picks a threshold for
    accuracy, this one guarantees COVERAGE — and on a small stratum
    it says "impossible" (NULL) instead of fabricating certainty
    (when ceil((n+1)(1−α)) > n no finite threshold delivers the
    guarantee — the X91 degenerate convention).

    Exactness: the rank is the pure-integer ceil
    ((n+1)·(10⁶−alpha_ppm) + 10⁶ − 1) div 10⁶; q̂ is an exact order
    statistic — the SMALLEST score whose cumulative count reaches
    the rank (the X107 boundary pick, value-lattice cumulative
    counts, no percentile interpolation); achieved_ppm re-reports
    the realized calibration coverage (10⁶·cum at q̂) div n.

    Scale: one (group, score) hash aggregate with map-side combine;
    the cumulative window walks each group's distinct-score lattice
    (X81/X118 argument), and the boundary pick is a lattice-bounded
    aggregate.  One shuffle on the group key."""
    from pyspark.sql.window import Window

    vc = df.groupBy(
        F.col(group_col).alias("grp"), F.col(score_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy("grp")
    cum = vc.select(
        "grp",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wg).alias("n"),
    ).withColumn(
        "rank_needed",
        F.expr(
            f"((n + 1) * (1000000 - {alpha_ppm}) + 999999) div 1000000"
        ),
    )
    return (
        cum.groupBy("grp", "n", "rank_needed")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("rank_needed"), F.col("v"))).alias(
                "q_hat"
            ),
            F.min(
                F.when(F.col("cum") >= F.col("rank_needed"), F.col("cum"))
            ).alias("__cum_at_q"),
        )
        .select(
            "grp",
            F.col("n").cast("long").alias("n"),
            F.col("rank_needed").cast("long").alias("rank_needed"),
            "q_hat",
            F.expr("(1000000 * __cum_at_q) div n").alias("achieved_ppm"),
            F.lit(1000000 - alpha_ppm).cast("long").alias("target_ppm"),
        )
        .orderBy("grp")
    )


def output_file_plan(
    df: DataFrame,
    group_col: str,
    text_col: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """X135: output-file sizing plan — the write-side twin of X107's
    read-side range planner.  Small-file storms (thousands of KB-
    scale parquet files from an over-partitioned write) and
    monster-file stragglers are the two classic sink failures at
    100 TB; this op computes, per output partition group, the exact
    byte mass and the file count a ``target_file_bytes`` budget
    implies (ceil division — what a repartitionByRange(n) before the
    write should use), plus the oversize-row diagnostics (a single
    row larger than the target can never fit the budget; it needs a
    row-level split upstream, not more files).

    Exactness: byte counts are exact BIGINT sums of octet_length;
    file counts and per-file averages are integer ceil/floor
    divisions.

    Scale: one map-side-combinable aggregate over the write key —
    the plan costs one scan of the data it sizes, and the output is
    one row per group."""
    b = F.expr(f"octet_length({text_col})")
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(b).cast("long").alias("total_bytes"),
            F.max(b).cast("long").alias("max_row_bytes"),
            F.sum(F.when(b > target_file_bytes, 1).otherwise(0))
            .cast("long")
            .alias("n_oversize_rows"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            "total_bytes",
            F.expr(
                f"(total_bytes + {target_file_bytes} - 1) div "
                f"{target_file_bytes}"
            ).alias("n_files"),
            F.expr(
                f"total_bytes div ((total_bytes + {target_file_bytes} - 1) "
                f"div {target_file_bytes})"
            ).alias("avg_file_bytes"),
            F.expr(
                f"(n_rows + (total_bytes + {target_file_bytes} - 1) div "
                f"{target_file_bytes} - 1) div ((total_bytes + "
                f"{target_file_bytes} - 1) div {target_file_bytes})"
            ).alias("rows_per_file"),
            "max_row_bytes",
            "n_oversize_rows",
        )
        .orderBy(group_col)
    )


def zorder_locality(
    df: DataFrame,
    dim1_col: str,
    dim2_col: str,
    bits: int = 4,
) -> DataFrame:
    """X136: Z-order (Morton) clustering-key locality evaluation —
    the multi-dimensional data-skipping layout (Z-ordering is what
    Delta/Iceberg OPTIMIZE implements; Morton 1966): quantize two
    columns to ``bits``-bit grid cells, interleave their bits into
    one sort key, and measure what clustering BY that key buys a
    scan that filters on EITHER dimension — per Z-range, the min/max
    envelope of each source dimension (the file-skipping statistics
    a lakehouse keeps) and its coverage of the dimension's full
    range in ppm (low coverage ⇒ most files skip).

    Quantization is exact integer: cell = (v − min)·2^bits div
    (max − min + 1) over the true (aggregated) min/max; the
    interleave is pure div/mod bit arithmetic, portable to any SQL
    engine — no native bit-op dialect dependence.

    Scale: one 1-row min/max aggregate broadcast back (the only
    exchange besides the final per-Z-range aggregate); the Morton
    key itself is a zero-shuffle narrow map — exactly how you'd
    stamp the key on 100 TB before a repartitionByRange write."""
    n_cells = 1 << bits
    mm = df.agg(
        F.min(F.col(dim1_col).cast("long")).alias("__mn1"),
        F.max(F.col(dim1_col).cast("long")).alias("__mx1"),
        F.min(F.col(dim2_col).cast("long")).alias("__mn2"),
        F.max(F.col(dim2_col).cast("long")).alias("__mx2"),
    )
    cells = df.crossJoin(F.broadcast(mm)).select(
        F.expr(
            f"(({dim1_col} - __mn1) * {n_cells}) div (__mx1 - __mn1 + 1)"
        ).alias("__c1"),
        F.expr(
            f"(({dim2_col} - __mn2) * {n_cells}) div (__mx2 - __mn2 + 1)"
        ).alias("__c2"),
        F.col(dim1_col).cast("long").alias("__v1"),
        F.col(dim2_col).cast("long").alias("__v2"),
        "__mn1",
        "__mx1",
        "__mn2",
        "__mx2",
    )
    z = " + ".join(
        f"((__c1 div {1 << i}) % 2) * {1 << (2 * i + 1)} + "
        f"((__c2 div {1 << i}) % 2) * {1 << (2 * i)}"
        for i in range(bits)
    )
    keyed = cells.withColumn("zkey", F.expr(z).cast("long"))
    # Z-ranges: group the 2^(2*bits) Morton cells into 2^bits ranges
    # (consecutive zkey div 2^bits) — the "file" granularity.
    return (
        keyed.withColumn("zrange", F.expr(f"zkey div {n_cells}"))
        .groupBy("zrange")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__v1").alias("min_d1"),
            F.max("__v1").alias("max_d1"),
            F.min("__v2").alias("min_d2"),
            F.max("__v2").alias("max_d2"),
            F.first("__mn1").alias("__g_mn1"),
            F.first("__mx1").alias("__g_mx1"),
            F.first("__mn2").alias("__g_mn2"),
            F.first("__mx2").alias("__g_mx2"),
        )
        .select(
            "zrange",
            "n_rows",
            "min_d1",
            "max_d1",
            "min_d2",
            "max_d2",
            F.expr(
                "(1000000 * (max_d1 - min_d1 + 1)) div "
                "(__g_mx1 - __g_mn1 + 1)"
            ).alias("d1_coverage_ppm"),
            F.expr(
                "(1000000 * (max_d2 - min_d2 + 1)) div "
                "(__g_mx2 - __g_mn2 + 1)"
            ).alias("d2_coverage_ppm"),
        )
        .orderBy("zrange")
    )


def freshness_decay_weights(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_cents: Column,
    half_life_days: int = 30,
) -> DataFrame:
    """X145: exponential-decay freshness weighting over event time —
    the recency-weighted aggregate every monitoring/training-mix
    dashboard wants ("weight last month ~2×  the month before"),
    computed EXACTLY: the decay is quantized to half-life steps, so
    weight_ppm = 10⁶ div 2^(age_days div half_life_days) is pure
    integer arithmetic (a true exp() decay is engine-unportable
    through doubles; the power-of-2 staircase is the deterministic
    convention, and ages beyond 20 half-lives round to 0).  Age is
    measured from the corpus max timestamp (exact, data-derived) so
    the result is reproducible regardless of wall clock.

    Scale: one 1-row max aggregate broadcast back + one
    map-side-combinable group aggregate; the weight stamp is a
    zero-shuffle narrow map."""
    mx = df.agg(F.max(F.col(ts_col)).alias("__mx"))
    aged = df.crossJoin(F.broadcast(mx)).select(
        F.col(group_col).alias("grp"),
        F.expr(f"datediff(CAST(__mx AS DATE), CAST({ts_col} AS DATE))").alias(
            "__age"
        ),
        value_cents.alias("__cents"),
    )
    steps = F.expr(f"__age div {half_life_days}")
    w = F.when(steps >= 20, F.lit(0)).otherwise(
        F.expr(f"1000000 div CAST(pow(2, __age div {half_life_days}) AS LONG)")
    )
    return (
        aged.withColumn("__w", w.cast("long"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("__w").cast("long").alias("weight_sum_ppm"),
            F.expr("sum(__w) div count(1)").cast("long").alias(
                "mean_weight_ppm"
            ),
            # sign-symmetric division (the X41 convention): Spark div
            # truncates toward zero, DuckDB // floors — abs then
            # re-sign so negative money values (credits/refunds)
            # agree across engines (r9 ADVICE item 2). __w >= 0.
            F.sum(
                F.expr(
                    "CASE WHEN __cents < 0 THEN "
                    "-(((-__cents) * __w) div 1000000) "
                    "ELSE (__cents * __w) div 1000000 END"
                )
            )
            .cast("long")
            .alias("weighted_cents"),
            F.sum("__cents").cast("long").alias("raw_cents"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_events",
            "weight_sum_ppm",
            "mean_weight_ppm",
            "weighted_cents",
            "raw_cents",
        )
        .orderBy(group_col)
    )


def quantile_sample_error(
    df: DataFrame,
    key_col: str,
    value_col: str,
    sample_mod: int = 16,
    percents: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """X141: sampled-quantile rank-error evaluation — the sketch-
    accuracy eval for the cheapest quantile estimator there is (a
    deterministic 1/``sample_mod`` hash sample): for each requested
    percentile, the exact order statistic over the FULL data, the
    same statistic over the sample, and the realized rank error of
    the sampled estimate measured against the full distribution —
    the number that tells you whether approxQuantile-class shortcuts
    are safe for this column's shape (uniform: tiny error;
    Zipf-tailed p99: blows up — measure, don't guess).  The X45/X62
    eval-the-estimator discipline applied to quantiles.

    EXACT semantics: order statistics are values at rank
    ⌈p·n/100⌉ in (value, key) order, computed on the distinct-value
    lattice (value → exact cumulative count; no per-row global
    window); the achieved rank of the estimate is the full-data
    cumulative count at the estimated value; rank_err_ppm =
    |achieved − target| · 1e6 div n.

    Scale: two value-keyed count aggregates (full + sample), one
    bounded lattice window each (distinct values, not rows), one
    |percents|-row join.

    Empty-sample convention (r9 ADVICE item 4): when no key hashes
    to 0 mod ``sample_mod`` the exact-side rows still emit, with
    NULL ``est_value``/``achieved_rank``/``rank_err_ppm`` — an empty
    sample is a loud eval result, not an empty table."""
    from pyspark.sql.window import Window

    from .sampling import unit_hash

    base = df.select(
        F.col(value_col).cast("long").alias("v"), F.col(key_col).alias("k")
    )
    pcts = [int(p) for p in percents]

    def _lattice(src: DataFrame) -> DataFrame:
        counts = src.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        return counts.withColumn("cum", F.sum("c").over(w)).crossJoin(
            F.broadcast(counts.agg(F.sum("c").alias("n")))
        )

    full = _lattice(base).localCheckpoint(eager=True)
    samp = _lattice(
        base.filter(unit_hash("k") % sample_mod == 0)
    ).localCheckpoint(eager=True)
    p_arr = F.array(*[F.lit(p) for p in pcts])
    targets = (
        full.select(F.col("n").alias("__n"))
        .limit(1)
        .select(F.explode(p_arr).alias("pct"), "__n")
        .select(
            "pct", "__n", F.expr("(pct * __n + 99) div 100").alias("__tr")
        )
    )
    exact = (
        targets.join(full.drop("n"), F.col("cum") >= F.col("__tr"))
        .groupBy("pct", "__n", "__tr")
        .agg(F.min("v").alias("exact_value"))
    )
    s_targets = (
        samp.select(F.col("n").alias("__sn"))
        .limit(1)
        .select(F.explode(p_arr).alias("pct"), "__sn")
        .select("pct", F.expr("(pct * __sn + 99) div 100").alias("__str"))
    )
    est = (
        s_targets.join(samp, F.col("cum") >= F.col("__str"))
        .groupBy("pct")
        .agg(F.min("v").alias("est_value"))
    )
    achieved = (
        est.join(
            full.select(
                F.col("v").alias("__fv"), F.col("cum").alias("__fc")
            ),
            F.col("__fv") <= F.col("est_value"),
            "left",
        )
        .groupBy("pct", "est_value")
        .agg(F.coalesce(F.max("__fc"), F.lit(0)).alias("__ach"))
    )
    return (
        exact.join(achieved, "pct", "left")
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("__n").cast("long").alias("n_rows"),
            "exact_value",
            "est_value",
            F.col("__ach").cast("long").alias("achieved_rank"),
            F.col("__tr").cast("long").alias("target_rank"),
            F.expr("(1000000 * abs(__ach - __tr)) div __n").alias(
                "rank_err_ppm"
            ),
        )
        .orderBy("pct")
    )
