"""Partition-count invariance: the determinism contract that the
whole float strategy (integer cents, scaled-integer sums, rounded
folds) exists to guarantee. A 1000-executor run differs from
local[4] precisely in scan split sizes and shuffle widths — so every
result must be bit-identical when both knobs change. The oracle
parity sweep pins results at ONE partitioning; this test pins the
invariance itself on the queries whose arithmetic would drift first
if a float summation-order dependence crept in."""

from __future__ import annotations

import pytest

# The float-heaviest representatives of each family: money aggregate,
# windowed running math, scaled-integer vector means, GEMM cosine
# kernel, corpus-LM rationals, Lloyd-refined IVF (iterative + floats).
QUERIES_UNDER_TEST = [
    "costs_by_service_30d",
    "window_moving_avg",
    "embedding_label_centroids",
    "dedup_embedding_cosine",
    "text_bigram_lm_score",
    "ann_ivf_refined",
    "dataset_fingerprint",  # XOR-digest order-independence is its whole claim
]

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    from poet_cloud_cost_etl_spark.queries import QUERIES

    df = QUERIES[name](spark, SF)
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_result_invariant_under_partitioning(spark, name):
    """Same query, three (shuffle width, scan split) settings —
    including a 2-partition setting that forces different partial-
    aggregation groupings and a 64/tiny-split setting that fragments
    the scans — must collect identical rows."""
    conf = spark.conf
    baseline = _rows(spark, name)
    settings = [
        ("2", str(512 * 1024 * 1024)),  # wide tasks, narrow shuffle
        ("64", str(256 * 1024)),  # tiny scan splits, wide shuffle
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows(spark, name) == baseline, (
                f"{name} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


# The r11-queue staged wrappers (not yet in QUERIES): the float/
# aggregation shapes that would drift first are the DECIMAL dot/norm
# accumulations (tfidf, drift), the collect_list-ordered chunk hash
# (cdc), and the lattice window (gini).
R11_UNDER_TEST = [
    "_r11q_tfidf_cosine_pairs",
    "_r11q_cdc_chunk_stats",
    "_r11q_embedding_drift_by_label",
    "_r11q_duplication_gini",
]


def _rows_r11(spark, wrapper):
    from poet_cloud_cost_etl_spark import queries as Q

    df = getattr(Q, wrapper)(spark, SF)
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("wrapper", R11_UNDER_TEST)
def test_r11_result_invariant_under_partitioning(spark, wrapper):
    conf = spark.conf
    baseline = _rows_r11(spark, wrapper)
    settings = [
        ("2", str(512 * 1024 * 1024)),
        ("64", str(256 * 1024)),
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows_r11(spark, wrapper) == baseline, (
                f"{wrapper} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


# The r12-queue staged wrappers (not yet in QUERIES): the shapes that
# would drift first are the window-function selection (winnow — lead
# over a doc-keyed sort), the HUGEINT/DECIMAL ln-product sums
# (crossentropy), the global first-occurrence min-struct (line
# rewrite), and the sweep-rank recall (nprobe curve).
R12_UNDER_TEST = [
    "_r12q_winnow_fingerprints",
    "_r12q_source_crossentropy_matrix",
    "_r12q_line_dedup_rewrite",
    "_r12q_ivf_nprobe_recall_curve",
]


@pytest.mark.parametrize("wrapper", R12_UNDER_TEST)
def test_r12_result_invariant_under_partitioning(spark, wrapper):
    conf = spark.conf
    baseline = _rows_r11(spark, wrapper)
    settings = [
        ("2", str(512 * 1024 * 1024)),
        ("64", str(256 * 1024)),
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows_r11(spark, wrapper) == baseline, (
                f"{wrapper} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


# The r13-queue staged wrappers (not yet in QUERIES): the shapes that
# would drift first are the per-user lag/last windows over
# micro-second ties (markov, attribution), the lattice cumulative
# window + broadcast thresholds (rfm), the register MAX + DECIMAL
# harmonic sum (hll), and the dual-candidate full-outer union with
# round-6 cosine membership (paradigm agreement).
R13_UNDER_TEST = [
    "_r13q_events_markov_transitions",
    "_r13q_purchase_attribution_last_touch",
    "_r13q_events_rfm_segments",
    "_r13q_vocab_hll_estimate",
    "_r13q_neardup_paradigm_agreement",
]


@pytest.mark.parametrize("wrapper", R13_UNDER_TEST)
def test_r13_result_invariant_under_partitioning(spark, wrapper):
    conf = spark.conf
    baseline = _rows_r11(spark, wrapper)
    settings = [
        ("2", str(512 * 1024 * 1024)),
        ("64", str(256 * 1024)),
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows_r11(spark, wrapper) == baseline, (
                f"{wrapper} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


# The r14-queue staged wrappers (not yet in QUERIES): the shapes that
# would drift first are the session-flag running sum under tied
# micro-second orders (path trigrams), the cohort-keyed cumulative
# cents window (ltv), the double-pow rounding + DECIMAL sums (design
# effect), the SRP sign folds + acos rounding (srp calibration), and
# the recursive-CC min-label fixpoint over mutual edges (knn
# clusters).
R14_UNDER_TEST = [
    "_r14q_session_path_trigrams",
    "_r14q_cohort_ltv_curves",
    "_r14q_mixture_design_effect",
    "_r14q_srp_cosine_calibration",
    "_r14q_mutual_knn_clusters",
]


@pytest.mark.parametrize("wrapper", R14_UNDER_TEST)
def test_r14_result_invariant_under_partitioning(spark, wrapper):
    conf = spark.conf
    baseline = _rows_r11(spark, wrapper)
    settings = [
        ("2", str(512 * 1024 * 1024)),
        ("64", str(256 * 1024)),
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows_r11(spark, wrapper) == baseline, (
                f"{wrapper} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


# The r15-queue staged wrappers (not yet in QUERIES): the shapes that
# would drift first are the truth/candidate set intersections under
# re-partitioned pair generation (pareto), the per-threshold CC
# fixpoints (sweep), the bounded-fan-out join + two rank windows +
# largest-remainder split (attribution), the broadcast-moments fold
# (ood), and the salted join's partitioning-independence claim
# itself.
R15_UNDER_TEST = [
    "_r15q_blocking_scheme_pareto",
    "_r15q_dedup_threshold_sweep",
    "_r15q_attribution_model_compare",
    "_r15q_embedding_ood_mahalanobis",
    "_r15q_join_salted_skew",
]


@pytest.mark.parametrize("wrapper", R15_UNDER_TEST)
def test_r15_result_invariant_under_partitioning(spark, wrapper):
    conf = spark.conf
    baseline = _rows_r11(spark, wrapper)
    settings = [
        ("2", str(512 * 1024 * 1024)),
        ("64", str(256 * 1024)),
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows_r11(spark, wrapper) == baseline, (
                f"{wrapper} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


# The r16-queue staged wrappers (not yet in QUERIES): the shapes that
# would drift first are the co-partitioned min-ts funnel chain
# (funnel), the range-bucketed grouped cumsum over the gap lattice
# (gaps — the with_grouped_cumsum bucket boundaries come from
# approxQuantile, so invariance IS the claim that bucket balance
# never leaks into results), the md5-ordered global cumsum + interval
# pick join (wss), and the double-leading-key ranked revenue cumsum
# (abc — decimal->double monotone-collapse ordering must not drift
# under re-bucketing).
R16_UNDER_TEST = [
    "_r16q_funnel_steps_conversion",
    "_r16q_inter_event_gap_quantiles",
    "_r16q_weighted_systematic_sample",
    "_r16q_part_revenue_abc",
    "_r16q_market_basket_pairs",
]


@pytest.mark.parametrize("wrapper", R16_UNDER_TEST)
def test_r16_result_invariant_under_partitioning(spark, wrapper):
    conf = spark.conf
    baseline = _rows_r11(spark, wrapper)
    settings = [
        ("2", str(512 * 1024 * 1024)),
        ("64", str(256 * 1024)),
    ]
    prev_sp = conf.get("spark.sql.shuffle.partitions")
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for sp, mpb in settings:
            conf.set("spark.sql.shuffle.partitions", sp)
            conf.set("spark.sql.files.maxPartitionBytes", mpb)
            assert _rows_r11(spark, wrapper) == baseline, (
                f"{wrapper} drifted at shuffle_partitions={sp}, "
                f"maxPartitionBytes={mpb}"
            )
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
