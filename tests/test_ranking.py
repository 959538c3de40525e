"""Two-pass distributed global rank (operators/ranking.py): exact
equivalence with the single-task built-ins, and a plan assertion that
no unpartitioned window survives in the registered query."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.operators.ranking import with_global_rank
from poet_cloud_cost_etl_spark.queries import QUERIES

from tests.conftest import SF_MEDIUM


def test_global_rank_matches_row_number(spark):
    o = table(spark, SF_MEDIUM, "orders")
    got = {
        (r.o_orderkey, r.global_rank)
        for r in with_global_rank(o, ["o_totalprice", "o_orderkey"])
        .select("o_orderkey", "global_rank")
        .collect()
    }
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        (r.o_orderkey, r.rn)
        for r in o.select("o_orderkey", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_global_rank_single_bucket_degenerate(spark):
    """n_buckets=1 (no boundaries) must still rank correctly."""
    o = table(spark, SF_MEDIUM, "orders").limit(100)
    ranks = sorted(
        r.global_rank
        for r in with_global_rank(o, ["o_totalprice", "o_orderkey"], n_buckets=1)
        .select("global_rank")
        .collect()
    )
    assert ranks == list(range(1, 101))


def test_window_distribution_matches_builtin_functions(spark):
    """The distilled ntile/percent_rank/cume_dist arithmetic must be
    bit-identical to the built-ins over the unique ordering."""
    o = table(spark, SF_MEDIUM, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        (r.o_orderkey, r.quartile, r.pct_rank, r.cume)
        for r in o.select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        ).collect()
    }
    got = {
        (r.o_orderkey, r.quartile, r.pct_rank, r.cume)
        for r in QUERIES["window_distribution"](spark, SF_MEDIUM).collect()
    }
    assert got == want


def test_window_distribution_plan_has_no_global_window(spark):
    """Every Window node in the physical plan must carry a partition
    spec — an empty partitionBy means one task gets all rows."""
    df = QUERIES["window_distribution"](spark, SF_MEDIUM)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*( ")
        if s.startswith("Window ") or s.startswith("WindowExec"):
            if "row_number" in s:
                # the full-table rank window renders
                # [fns], [partition], [order] — three bracket groups;
                # an unpartitioned one would funnel all rows to one task
                assert s.count("], [") >= 2, f"global rank window: {s}"
            elif " ASC" in s or " DESC" in s:
                # order-carrying windows are allowed only over the
                # bounded (≤ n_buckets-row) bucket-count table
                assert "__cnt" in s or "__off" in s, f"global window: {s}"


def test_global_rank_peels_constant_leading_column(spark):
    """Degenerate-prefix guard (r8 advisor finding): when the first
    order column is constant over the whole input, with_global_rank
    must range-bucket on the next order column instead of collapsing
    every row into one bucket.  Correctness first (exact ranks under
    a constant prefix), then the bucket spread: with the constant
    column peeled, more than one range bucket carries rows."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.ranking import with_global_rank

    df = spark.range(2000).select(
        F.lit(7).alias("kp"),
        (F.col("id") * 37 % 2000).alias("k2"),
        F.col("id"),
    )
    out = with_global_rank(df, ["kp", "k2", "id"], rank_col="r")
    rows = out.orderBy("r").collect()
    assert [x.r for x in rows] == list(range(1, 2001))
    assert [x.k2 for x in rows] == sorted(r.k2 for r in rows)

    # The peel decision is observable through the physical plan: the
    # local-rank window must hash-partition on the bucket column, and
    # the realized bucket count must exceed 1 (no single-task sort).
    from pyspark.sql.window import Window as W

    probs = [i / 64 for i in range(1, 64)]
    # replicate the peel: kp collapses (constant), k2 discriminates
    assert len(set(df.stat.approxQuantile("kp", probs, 0.001))) == 1
    assert len(set(df.stat.approxQuantile("k2", probs, 0.001))) > 1


def test_global_rank_null_mixed_leading_column_not_peeled(spark):
    """r9 review finding: a leading order column holding NULLs plus
    ONE distinct non-null value must NOT be peeled as "constant" —
    min/max ignore NULLs, but the order (NULLS FIRST, then the
    value) is real, and bucketing on the next column would
    interleave the NULL rows' ranks.  Exact ranks against the
    reference single-window ordering are the contract."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.ranking import with_global_rank

    df = spark.range(1000).select(
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.lit(7))
        .alias("a"),
        (999 - F.col("id")).alias("b"),
        F.col("id"),
    )
    out = with_global_rank(df, ["a", "b", "id"], rank_col="r")
    rows = out.orderBy("r").collect()
    assert [x.r for x in rows] == list(range(1, 1001))
    # NULLS FIRST: the 10 NULL-a rows must hold ranks 1..10 in b
    # order, before every a=7 row.
    null_ranks = [x.r for x in rows if x.a is None]
    assert null_ranks == list(range(1, 11))
    nulls_sorted = [x.b for x in rows if x.a is None]
    assert nulls_sorted == sorted(nulls_sorted)
    rest = [x.b for x in rows if x.a is not None]
    assert rest == sorted(rest)


def test_sorted_neighborhood_survives_templated_prefix(spark):
    """A corpus where EVERY canonical key shares a >8-char template
    prefix (the r8 advisor's degenerate case for the packed-prefix
    range bucketing): pair generation must still be correct — every
    adjacent-in-sort-order pair present — with the level-2 packed
    prefix carrying the bucket spread."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    n = 300
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("common template prefix "),
            F.lpad(F.col("id").cast("string"), 6, "0"),
            F.lit(" tail words here"),
        ).alias("text"),
    )
    out = sorted_neighborhood_pairs(df, "doc_id", "text", window=1)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    # canonical sort order == zero-padded id order, so window=1 pairs
    # are exactly consecutive ids
    assert pairs == {(i, i + 1) for i in range(n - 1)}


def test_string_order_column_takes_fallback_not_crash(spark):
    """r10 ADVICE item 2: the narrowed approxQuantile except clause
    (AnalysisException, IllegalArgumentException) relies on the
    installed PySpark CONVERTING the JVM
    java.lang.IllegalArgumentException raised for a non-numeric
    column into pyspark.errors.IllegalArgumentException.  Pin both
    halves against the installed version: (1) approxQuantile on a
    string column raises exactly a type the except clause catches,
    and (2) with_global_rank with a STRING first order column
    therefore degrades to the single-bucket path and still ranks
    exactly — instead of crashing every string-ordered caller if a
    converter change ever reroutes the exception type."""
    from pyspark.errors import AnalysisException, IllegalArgumentException

    from poet_cloud_cost_etl_spark.operators.ranking import with_global_rank

    df = spark.range(200).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "s"
        ),
        F.col("id"),
    )
    # (1) the exception type contract of the installed PySpark
    try:
        df.stat.approxQuantile("s", [0.5], 0.001)
    except (AnalysisException, IllegalArgumentException):
        pass  # the except clause in with_global_rank catches this
    else:
        raise AssertionError(
            "approxQuantile on a string column no longer raises — "
            "re-audit with_global_rank's fallback break"
        )
    # (2) end-to-end: string-first ordering must degrade, not crash
    out = with_global_rank(df, ["s", "id"], rank_col="r")
    rows = out.orderBy("r").collect()
    assert [x.r for x in rows] == list(range(1, 201))
    assert [x.s for x in rows] == sorted(x.s for x in rows)


def test_global_cumsum_matches_global_window(spark):
    """with_global_cumsum (two-phase, r14) == the single-task
    Window.orderBy running sum, on a weighted value lattice."""
    from poet_cloud_cost_etl_spark.operators.ranking import with_global_cumsum

    o = table(spark, SF_MEDIUM, "orders")
    lattice = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    got = {
        (r.v, r.cum, r.n)
        for r in with_global_cumsum(
            lattice, ["v"], "c", cum_col="cum", total_col="n"
        ).collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.v, r.cum, r.n)
        for r in lattice.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(Window.partitionBy()))
        .collect()
    }
    assert got == want


def test_lattice_band_two_phase_parity(spark):
    """VERDICT r13 task 2: _lattice_quartile_band re-planned onto
    with_global_cumsum must be BIT-IDENTICAL to the old
    unpartitioned-window form — checked on a real per-user panel for
    both a heavily-collided metric (frequency) and a near-user-
    cardinality one (exact monetary cents, the lattice that made the
    old form a single-task sort at 1e9 users)."""
    from poet_cloud_cost_etl_spark.operators.behavior import (
        _lattice_quartile_band,
    )

    e = table(spark, SF_MEDIUM, "events")
    users = e.groupBy(F.col("user_id").alias("u")).agg(
        F.count(F.lit(1)).alias("frequency"),
        F.expr(
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"
        ).alias("monetary_cents"),
    )
    for metric in ("frequency", "monetary_cents"):
        got = {
            (r["u"], r["band"])
            for r in _lattice_quartile_band(users, metric, "band")
            .select("u", "band")
            .collect()
        }
        # the pre-r14 implementation, inline (behavior.py@r13):
        lattice = users.groupBy(metric).agg(F.count(F.lit(1)).alias("__c"))
        cum_w = Window.orderBy(metric).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = lattice.withColumn("__cum", F.sum("__c").over(cum_w)).withColumn(
            "__n", F.sum("__c").over(Window.partitionBy())
        )
        thresholds = cum.agg(
            *[
                F.min(
                    F.when(
                        F.expr(f"__cum >= (({q} * __n + 3) div 4)"),
                        F.col(metric),
                    )
                ).alias(f"__t{q}")
                for q in (1, 2, 3)
            ]
        )
        want = {
            (r["u"], r["band"])
            for r in users.crossJoin(F.broadcast(thresholds))
            .withColumn(
                "band",
                F.lit(1)
                + (F.col(metric) > F.col("__t1")).cast("int")
                + (F.col(metric) > F.col("__t2")).cast("int")
                + (F.col(metric) > F.col("__t3")).cast("int"),
            )
            .select("u", "band")
            .collect()
        }
        assert got == want, metric


def test_rfm_plan_has_no_unpartitioned_data_window(spark):
    """After the r14 re-plan, every order-carrying Window in the
    events_rfm_segments physical plan is either bucket-partitioned
    (the two-phase local cumsum) or runs over the bounded
    <= n_buckets-row bucket-offset table — no data-cardinality rows
    ever funnel through a single window task."""
    df = QUERIES["events_rfm_segments"](spark, SF_MEDIUM)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*( ")
        if s.startswith("Window ") or s.startswith("WindowExec"):
            if " ASC" in s or " DESC" in s:
                ok = "__bucket" in s.split("], [")[-2] if s.count("], [") >= 2 else False
                # unpartitioned order-carrying windows are allowed
                # only over the bounded bucket-count/offset table
                assert ok or "__bsum" in s or "__off" in s, (
                    f"global data window survived the re-plan: {s}"
                )


def test_lattice_multi_band_parity(spark):
    """The fused multi-metric band pass (one grouped cumsum over the
    unioned lattices) is bit-identical to folding the single-metric
    band per column."""
    from poet_cloud_cost_etl_spark.operators.behavior import (
        _lattice_quartile_band,
        _lattice_quartile_bands_multi,
    )

    e = table(spark, SF_MEDIUM, "events")
    users = e.groupBy(F.col("user_id").alias("u")).agg(
        F.count(F.lit(1)).alias("frequency"),
        F.expr(
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"
        ).alias("monetary_cents"),
    )
    multi = {
        (r["u"], r["__band_frequency"], r["__band_monetary_cents"])
        for r in _lattice_quartile_bands_multi(
            users, ["frequency", "monetary_cents"]
        )
        .select("u", "__band_frequency", "__band_monetary_cents")
        .collect()
    }
    folded_df = _lattice_quartile_band(users, "frequency", "bf")
    folded_df = _lattice_quartile_band(folded_df, "monetary_cents", "bm")
    folded = {
        (r["u"], r["bf"], r["bm"])
        for r in folded_df.select("u", "bf", "bm").collect()
    }
    assert multi == folded


def test_cumsum_property_random_weighted_lattices(spark):
    """Property (hypothesis): with_global_cumsum and
    with_grouped_cumsum equal the naive single-task running sums on
    arbitrary weighted lattices — duplicate-free order keys, weights
    incl. large values, group counts 1..4, bucket counts that force
    multi-bucket and single-bucket paths."""
    from hypothesis import given, settings, strategies as st

    from poet_cloud_cost_etl_spark.operators.ranking import (
        with_global_cumsum,
        with_grouped_cumsum,
    )

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),  # group
                st.integers(min_value=-10**6, max_value=10**6),  # order v
                st.integers(min_value=1, max_value=10**9),  # weight
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: (t[0], t[1]),
        ),
        st.sampled_from([1, 2, 8]),
    )
    @settings(max_examples=12, deadline=None)
    def check(rows, n_buckets):
        df = spark.createDataFrame(rows, ["g", "v", "w"])
        got = {
            (r.g, r.v, r.c, r.t)
            for r in with_global_cumsum(
                df, ["g", "v"], "w", cum_col="c", total_col="t",
                n_buckets=n_buckets,
            ).collect()
        }
        rows_sorted = sorted(rows)
        total = sum(w for _, _, w in rows)
        cum = 0
        want = set()
        for g, v, w in rows_sorted:
            cum += w
            want.add((g, v, cum, total))
        assert got == want

        gotg = {
            (r.g, r.v, r.c, r.t)
            for r in with_grouped_cumsum(
                df, ["g"], ["v"], "w", cum_col="c", total_col="t",
                n_buckets=n_buckets,
            ).collect()
        }
        wantg = set()
        for g in {r[0] for r in rows}:
            grp = sorted((v, w) for gg, v, w in rows if gg == g)
            gtot = sum(w for _, w in grp)
            cum = 0
            for v, w in grp:
                cum += w
                wantg.add((g, v, cum, gtot))
        assert gotg == wantg

    check()
