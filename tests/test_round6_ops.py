"""Unit-level contracts for the round-6 extension operators, beyond
the oracle parity sweep: algebraic invariants on synthetic inputs
where the expected value is known by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.operators.embeddings import norm_outliers_by_label
from poet_cloud_cost_etl_spark.operators.sampling import split_balance_tvd
from poet_cloud_cost_etl_spark.operators.textstats import bigram_cond_prob_score


def test_bigram_score_is_probability(spark):
    """Scores are valid probabilities, and a fully repetitive corpus
    (every bigram deterministic given its context) scores exactly 1."""
    det = spark.createDataFrame(
        [(i, "a b a b a b a b") for i in range(4)], ["doc_id", "text"]
    )
    rows = bigram_cond_prob_score(det, "doc_id", "text").collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_bigrams == 7
        assert r.avg_cond_prob == 1.0  # P(b|a)=P(a|b)=1 everywhere


def test_bigram_score_ranks_fluent_above_salad(spark):
    """A document assembled from the corpus's dominant pattern must
    outscore one made of bigrams that occur nowhere else."""
    docs = [(i, "the cat sat on the mat") for i in range(9)]
    docs.append((99, "mat the on sat cat zzz"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    scores = {
        r.doc_id: r.avg_cond_prob
        for r in bigram_cond_prob_score(df, "doc_id", "text").collect()
    }
    assert scores[0] > scores[99]
    assert 0.0 <= scores[99] <= 1.0


def test_tvd_zero_for_identical_and_one_for_disjoint(spark):
    """TVD bounds by construction: size distributions identical across
    splits → 0 for every pair; to exercise the disjoint bound the
    bucket column itself is checked (0 ≤ tvd ≤ 1 always)."""
    # 300 docs, constant size: every split sees the same 1-bucket
    # distribution, so all three pair TVDs are exactly 0.
    df = spark.createDataFrame(
        [(i, 100) for i in range(300)], ["doc_id", "n_chars"]
    )
    rows = split_balance_tvd(df, "doc_id", "n_chars").collect()
    assert len(rows) == 3
    for r in rows:
        assert r.tvd == 0.0
        assert r.n_a > 0 and r.n_b > 0


def test_tvd_detects_injected_size_skew(spark):
    """If sizes are made to depend on the split hash (simulating a
    correlated splitter), the TVD must move away from 0."""
    from poet_cloud_cost_etl_spark.operators.sampling import split_assign

    base = spark.createDataFrame([(i,) for i in range(600)], ["doc_id"])
    skewed = split_assign(base, "doc_id").select(
        "doc_id",
        F.when(F.col("split") == "train", F.lit(40))
        .otherwise(F.lit(900))
        .alias("n_chars"),
    )
    rows = {
        (r.split_a, r.split_b): r.tvd
        for r in split_balance_tvd(skewed, "doc_id", "n_chars").collect()
    }
    assert rows[("train", "val")] == 1.0  # fully disjoint buckets
    assert rows[("train", "test")] == 1.0
    assert rows[("val", "test")] == 0.0  # both entirely in the 900 bucket


def test_mixture_weights_sqrt_upweights_small_domains(spark):
    """alpha=0.5 on a 900/100 split: the small domain's weight must
    exceed its proportional share (0.1 → 0.25 at sqrt temperature),
    weights sum to ~1, and floor shares never exceed the budget."""
    from poet_cloud_cost_etl_spark.operators.sampling import (
        source_mixture_weights,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        ["doc_id", "source"],
    )
    rows = {
        r.source: r
        for r in source_mixture_weights(df, "source", budget=1000).collect()
    }
    assert rows["small"].n_docs == 100 and rows["big"].n_docs == 900
    # sqrt temperature: 10/(30+10) = 0.25 exactly
    assert rows["small"].weight == 0.25 and rows["big"].weight == 0.75
    assert rows["small"].weight > 100 / 1000  # upweighted vs proportional
    total_sampled = rows["small"].n_sampled + rows["big"].n_sampled
    assert total_sampled <= 1000  # floor shares never oversubscribe
    assert rows["small"].n_sampled == 250


def test_norm_outliers_uniform_norms_flag_nothing(spark):
    """All vectors on the unit sphere → mean norm 1.0, zero outliers
    in the ±20% band."""
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0], i % 3) for i in range(60)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = norm_outliers_by_label(df, "vec_id", "embedding", "label").collect()
    assert len(rows) == 3
    for r in rows:
        assert r.mean_norm == 1.0 and r.n_low == 0 and r.n_high == 0
        assert r.min_norm == r.max_norm == 1.0


def test_norm_outliers_flags_collapsed_and_exploded(spark):
    """One near-zero and one oversized vector among unit vectors must
    land in n_low / n_high respectively."""
    rows_in = [(i, [1.0, 0.0], 0) for i in range(20)]
    rows_in.append((100, [0.01, 0.0], 0))  # collapsed
    rows_in.append((101, [5.0, 0.0], 0))  # exploded
    df = spark.createDataFrame(
        rows_in, "vec_id long, embedding array<float>, label int"
    )
    r = norm_outliers_by_label(df, "vec_id", "embedding", "label").collect()[0]
    assert r.n_vecs == 22
    assert r.n_low == 1 and r.n_high == 1
