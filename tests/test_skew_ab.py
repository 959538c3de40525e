"""Timed skew A/B (round-4 ask #7): prove the salted two-phase
aggregation actually shortens the straggler task on a skewed key, not
just that it compiles to the right plan shape (test_plans.py pins the
shape).

The hazard salting addresses is LARGE PER-KEY STATE (collect_set /
count-distinct-shaped accumulators — operators/aggregates.py module
docstring): map-side partial aggregation cannot collapse a hot key's
distinct values, so the naive plan funnels the hot key's entire state
build through one reducer task. The A/B below builds a deliberately
skewed fixture (95% of rows on one key, all values distinct), runs
the naive single-exchange plan and the salted two-phase plan, and
compares the MAX TASK DURATION of each job via Spark's app-status
store — the per-task metric the round-4 ask names, measured on the
real executor clock, not wall-time (which local-mode scheduling
noise pollutes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.operators.aggregates import salted_agg

N_ROWS = 1_500_000
HOT_SHARE = 95  # percent of rows on the single hot key
N_SALTS = 8


def _skewed_df(spark):
    """95% of rows carry key 'hot'; values are globally distinct longs
    so collect_set state grows with row count (the skew hazard)."""
    # 16 input splits keep every scan/partial task well under the hot
    # reducer's cost, so the A/B isolates the reduce-side straggler.
    return (
        spark.range(0, N_ROWS, 1, 16)
        .select(
            F.when(F.pmod("id", F.lit(100)) < HOT_SHARE, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.pmod("id", F.lit(40)).cast("string")))
            .alias("key"),
            F.col("id").alias("value"),
        )
    )


def _max_task_ms(spark, group: str) -> float:
    """Max task duration (ms) across all stages of all jobs in the
    given job group, read from the AppStatusStore (works with the UI
    disabled; statusTracker alone exposes no task durations)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    worst = 0.0
    for jid in sc.statusTracker().getJobIdsForGroup(group):
        info = sc.statusTracker().getJobInfo(jid)
        for sid in info.stageIds:
            for attempt in (0, 1):
                try:
                    tl = store.taskList(sid, attempt, 10_000)
                except Exception:
                    continue
                for i in range(tl.size()):
                    d = tl.apply(i).duration()
                    if d.isDefined():
                        worst = max(worst, float(d.get()))
    return worst


def test_aqe_splits_skewed_join(spark):
    """The OTHER half of the skew story: joins don't need salting —
    session.py turns on AQE skew-join, and this proves the runtime
    split actually fires on a skewed key rather than being a config
    we merely set. The executed adaptive plan must show the join
    running with skew=true over a skewed AQEShuffleRead."""
    conf = spark.conf
    overrides = {
        # test-sized thresholds: the hot partition (~95% of rows) must
        # count as skewed next to the advisory size
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            conf.set(k, v)
        left = spark.range(0, 400_000, 1, 8).select(
            F.when(F.pmod("id", F.lit(100)) < 95, F.lit(7))
            .otherwise(F.pmod("id", F.lit(50)))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = left.join(right.hint("shuffle_merge"), "k")
        assert len(j.collect()) == 400_000  # inner join, every row kept
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
        assert "AQEShuffleRead" in final, final
    finally:
        for k, v in prev.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_salted_agg_beats_naive_max_task_on_skew(spark):
    df = _skewed_df(spark).localCheckpoint(eager=True)  # isolate agg cost

    sc = spark.sparkContext

    # Naive: one exchange on the bare key — the hot key's entire
    # distinct-set build lands on a single reducer task.
    naive = df.groupBy("key").agg(F.size(F.collect_set("value")).alias("nd"))

    # Salted: salt on the VALUE hash, so equal values share a salt and
    # the per-(key, salt) distinct sets are disjoint — summing their
    # sizes in phase 2 is exact, while the hot key's state build
    # spreads over N_SALTS reducer tasks.
    salted = salted_agg(
        df,
        key_cols=["key"],
        measures={"nd": F.size(F.collect_set("value"))},
        salt_col=F.xxhash64("value"),
        n_salts=N_SALTS,
    )

    # Two trials per side, best (min) max-task per side: a single GC
    # pause or JIT-cold task on a shared test JVM would otherwise
    # flip the comparison (observed flaking under the full suite).
    def _measure(plan, tag: str, trial: int):
        group = f"skew_{tag}_{trial}"
        sc.setJobGroup(group, tag)
        rows = {r["key"]: r["nd"] for r in plan.collect()}
        sc.setJobGroup(f"skew_idle_{tag}_{trial}", "")
        return rows, _max_task_ms(spark, group)

    naive_rows, naive_ms = _measure(naive, "naive", 0)
    salted_rows, salted_ms = _measure(salted, "salted", 0)
    for trial in (1,):
        _, ms = _measure(naive, "naive", trial)
        naive_ms = min(naive_ms, ms)
        _, ms = _measure(salted, "salted", trial)
        salted_ms = min(salted_ms, ms)

    # Result-identical (the correctness half of the A/B).
    assert salted_rows == naive_rows
    assert naive_rows["hot"] == N_ROWS * HOT_SHARE // 100

    # The timed half: the salted plan's worst task must be strictly
    # shorter. The theoretical ratio is ~N_SALTS on the reduce stage;
    # scan/partial tasks and constant overheads dilute it, so assert a
    # conservative 1.3x win that still fails if salting stops
    # spreading the hot key (ratio collapses to ~1.0 then).
    assert salted_ms > 0 and naive_ms > 0, (naive_ms, salted_ms)
    assert salted_ms * 1.3 < naive_ms, (
        f"salted max task {salted_ms}ms not meaningfully faster than "
        f"naive {naive_ms}ms — skew spreading regressed"
    )
