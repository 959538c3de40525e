"""Unit-level contracts for the round-7c training-pipeline operators
(X33 DSIR importance weights, X34 source-token TVD, X35 curriculum
ramp sampling, X36 tokenizer fertility, X37 dedup-effective mixture
weights), beyond the oracle parity sweep: algebraic invariants on
synthetic inputs where the expected value is known by construction."""

from __future__ import annotations

from poet_cloud_cost_etl_spark.operators.sampling import (
    UNIT_DENOM,
    effective_mixture_weights,
    score_ramp_sample,
    unit_hash,
)
from poet_cloud_cost_etl_spark.operators.textstats import (
    importance_weights,
    source_token_tvd,
    token_fertility,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_importance_weights_target_tokens_score_higher(spark):
    """Docs made purely of target-slice vocabulary must outscore docs
    made purely of non-target vocabulary (the two vocabularies are
    disjoint, so their hash buckets' target ratios separate)."""
    target = [(i, "alpha beta gamma delta", "en", "s") for i in range(8)]
    other = [(100 + i, "uno dos tres cuatro", "es", "s") for i in range(8)]
    df = _docs(spark, target + other)
    out = {
        r.doc_id: r.importance
        for r in importance_weights(df, "doc_id", "text", "lang", "en").collect()
    }
    assert len(out) == 16
    assert min(out[i] for i in range(8)) > max(out[100 + i] for i in range(8))


def test_importance_weights_uniform_when_target_is_everything(spark):
    """If every doc is in the target slice, t_cnt == r_cnt per bucket
    and (with equal totals) every token's ratio is ~1, so all docs
    score the same."""
    rows = [(i, "aa bb cc dd ee", "en", "s") for i in range(6)]
    out = importance_weights(
        _docs(spark, rows), "doc_id", "text", "lang", "en"
    ).collect()
    vals = {r.importance for r in out}
    assert len(vals) == 1


def test_source_token_tvd_identical_and_disjoint(spark):
    """Identical sources → TVD 0; disjoint-vocabulary sources →
    TVD ~1 (exactly 1 up to ppm truncation). Pair count = C(n,2)
    including zero-overlap pairs."""
    rows = (
        [(i, "x y z", "en", "a") for i in range(4)]
        + [(10 + i, "x y z", "en", "b") for i in range(4)]
        + [(20 + i, "p q r", "en", "c") for i in range(4)]
    )
    out = {
        (r.source_a, r.source_b): r.tvd
        for r in source_token_tvd(_docs(spark, rows), "source", "text").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == 0.0
    assert out[("a", "c")] > 0.99
    assert out[("b", "c")] > 0.99


def test_score_ramp_sample_best_decile_fully_kept(spark):
    """Every row of the best (highest) decile survives: its threshold
    is the full hash range. Also: kept rows are a subset of input and
    the keep rule matches the hash threshold exactly."""
    rows = [(i, "en", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
    kept = score_ramp_sample(df, "doc_id", "score", "lang").collect()
    by_decile = {}
    for r in kept:
        by_decile.setdefault(r.decile, []).append(r.doc_id)
    # decile 10 = scores 90..99, all kept
    assert sorted(by_decile[10]) == list(range(90, 100))
    # every kept row satisfies the hash rule
    hashes = {
        r.doc_id: r.h
        for r in df.select("doc_id", unit_hash("doc_id").alias("h")).collect()
    }
    for r in kept:
        assert hashes[r.doc_id] < r.decile * UNIT_DENOM // 10


def test_token_fertility_exact_counts(spark):
    """Hand-computable corpus: 'ab cd' = 2 ws tokens, 2 BPE tokens,
    5 chars per doc."""
    rows = [(1, "ab cd", "en", "s"), (2, "ab cd", "en", "s")]
    out = token_fertility(_docs(spark, rows), "text", "lang").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.n_ws_tokens, r.n_bpe_tokens, r.n_chars) == (2, 4, 4, 10)
    assert r.bpe_per_word == 1.0
    assert r.chars_per_bpe == 2.5


def test_effective_mixture_weights_attribution_and_shares(spark):
    """Source 'a': 4 rows, 2 distinct texts. Source 'b': 2 rows, one
    of which duplicates an 'a' text with a HIGHER doc id → that mass
    is attributed to 'a' (min-id survivor), leaving b with 1
    effective doc. Weights are shares of total effective mass."""
    rows = [
        (1, "t one", "en", "a"),
        (2, "t one", "en", "a"),
        (3, "t two", "en", "a"),
        (4, "t two", "en", "a"),
        (5, "t one", "en", "b"),  # dup of a's text, higher id
        (6, "t three", "en", "b"),
    ]
    out = {
        r.source: r
        for r in effective_mixture_weights(
            _docs(spark, rows), "doc_id", "text", "source"
        ).collect()
    }
    assert out["a"].n_raw == 4 and out["a"].n_effective == 2
    assert out["b"].n_raw == 2 and out["b"].n_effective == 1
    assert out["a"].weight == 0.666666  # (1e6*2) div 3 / 1e6
    assert out["b"].weight == 0.333333
