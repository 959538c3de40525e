"""Construction-based semantics pins for the round-8b operators
(X56-X58). Each test builds a tiny corpus where the right answer is
computable by hand or by an independent pure-python reference that
mirrors the pinned expression tree — the oracle-parity sweep covers
cross-engine agreement; these cover the semantics themselves."""

from __future__ import annotations

import math

from poet_cloud_cost_etl_spark.operators.textstats import (
    bm25_topk,
    bpe_merge_candidates,
    compressibility_profile,
)


# ---------------------------------------------------------------- X56


def _bm25_ppm_ref(tf: int, dl: int, n: int, df: int, sumdl: int,
                  k1: float = 1.2, b: float = 0.75) -> int:
    """Independent python mirror of the operator's pinned per-term
    expression tree (python floats ARE IEEE doubles, so an identical
    tree yields identical bits)."""
    idf = (float(n) - df + 0.5) / (df + 0.5)
    num = tf * (k1 + 1.0)
    den = tf + k1 * (1.0 - b + b * (float(dl) * n) / sumdl)
    return math.floor(1000000 * ((idf * num) / den))


def test_bm25_hand_computed(spark):
    """4 docs, query 'apple banana': every per-doc score must equal
    the pure-double python reference sum bit-for-bit. The tf=3 row
    is the regression trap for decimal-literal coercion — a decimal
    `tf * 2.2` rounds 6.6 DOWN to the double below, the pinned
    double tree rounds the product UP, so any coercion drift breaks
    this equality."""
    rows = [
        (1, "apple banana apple"),
        (2, "apple"),
        (3, "cherry banana"),
        (4, "apple apple apple"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(df, "doc_id", "text", [("q", "apple banana")], k=10)
    got = {r["doc_id"]: r for r in out.collect()}
    n, sumdl = 4, 9  # dl: 3 + 1 + 2 + 3
    dfreq = {"apple": 3, "banana": 2}
    exp = {
        1: _bm25_ppm_ref(2, 3, n, dfreq["apple"], sumdl)
        + _bm25_ppm_ref(1, 3, n, dfreq["banana"], sumdl),
        2: _bm25_ppm_ref(1, 1, n, dfreq["apple"], sumdl),
        3: _bm25_ppm_ref(1, 2, n, dfreq["banana"], sumdl),
        4: _bm25_ppm_ref(3, 3, n, dfreq["apple"], sumdl),
    }
    for doc, ppm in exp.items():
        assert got[doc]["score"] == ppm / 1_000_000.0, doc
    assert got[1]["n_terms_hit"] == 2
    assert got[2]["n_terms_hit"] == 1
    # ranks follow (ppm desc, doc_id asc)
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert [got[d]["rank"] for d in order] == [1, 2, 3, 4]


def test_bm25_missing_term_and_k(spark):
    """A query whose terms never occur produces no rows; k truncates
    per query; a multi-query call keeps queries independent."""
    rows = [(i, "alpha beta") for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(
        df, "doc_id", "text",
        [("hit", "alpha"), ("miss", "zzz qqq")], k=2,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert "miss" not in by_q
    assert len(by_q["hit"]) == 2  # k truncates the 4 matching docs
    assert [r["rank"] for r in sorted(by_q["hit"], key=lambda r: r["rank"])] == [1, 2]
    # equal tf/dl everywhere -> ties break on doc_id ascending
    assert sorted(r["doc_id"] for r in by_q["hit"]) == [1, 2]


# ---------------------------------------------------------------- X57


def test_bpe_merges_hand_computed(spark):
    """'aaa' (corpus count 6) yields two overlapping 'aa' positions
    -> pair count 12; 'bb' (count 3) yields 3, pruned by
    min_count=5."""
    rows = [(i, "aaa aaa bb") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bpe_merge_candidates(df, "text", k=20, min_count=5).collect()
    assert len(out) == 1
    assert (out[0]["rank"], out[0]["pair"], out[0]["pair_count"]) == (1, "aa", 12)


def test_bpe_merges_single_char_words_no_pairs(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    assert bpe_merge_candidates(df, "text", min_count=1).count() == 0


def test_bpe_merges_tie_break_on_pair_text(spark):
    """'ab' and 'cd' tie at count 6 -> 'ab' ranks first
    (lexicographic tie-break)."""
    rows = [(i, "cd ab") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bpe_merge_candidates(df, "text", k=20, min_count=5).collect()
    assert [(r["rank"], r["pair"]) for r in out] == [(1, "ab"), (2, "cd")]


# ---------------------------------------------------------------- X58


def test_compressibility_hand_computed(spark):
    rows = [(1, "aaaa"), (2, "ab"), (3, "x"), (4, "abab")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in compressibility_profile(df, "doc_id", "text").collect()}
    # doc 1: bigrams [aa, aa, aa] -> 3 total, 1 distinct
    assert (got[1]["n_bigrams"], got[1]["distinct_bigrams"]) == (3, 1)
    assert got[1]["bigram_ttr"] == 0.333333
    assert got[1]["repeat_share"] == 0.666667
    # doc 2: [ab] -> fully distinct
    assert got[2]["bigram_ttr"] == 1.0
    assert got[2]["repeat_share"] == 0.0
    # doc 3: too short for bigrams -> both 0
    assert (got[3]["n_bigrams"], got[3]["distinct_bigrams"]) == (0, 0)
    assert got[3]["bigram_ttr"] == 0.0
    assert got[3]["repeat_share"] == 0.0
    # doc 4: [ab, ba, ab] -> 3 total, 2 distinct
    assert (got[4]["n_bigrams"], got[4]["distinct_bigrams"]) == (3, 2)
    assert got[4]["bigram_ttr"] == 0.666666
    assert got[4]["repeat_share"] == 0.333334


# ---------------------------------------------------------------- X60


def test_top_pc_rank_one_recovery(spark):
    """A rank-one corpus (every vector a multiple of (2, -1)) has
    exactly that principal direction: G = c·vvᵀ, one power step
    lands on it. Pivot convention: max-|loading| element is 1.0,
    other loadings relative to it -> (1.0, -0.5)."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        top_principal_component,
    )

    rows = [(i, [2.0, -1.0]) for i in range(5)] + [(9, [4.0, -2.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["dim"]: r["loading"] for r in
           top_principal_component(df, "embedding", dim=2).collect()}
    assert got == {0: 1.0, 1: -0.5}


def test_top_pc_dominant_axis(spark):
    """Axis-aligned corpus: variance mass 40x on dim 0 -> loading
    (1.0, ~0) after 8 iterations ((1/40)^8 rounds to 0 at 6dp)."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        top_principal_component,
    )

    rows = [(i, [2.0, 0.0]) for i in range(10)] + [(99, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["dim"]: r["loading"] for r in
           top_principal_component(df, "embedding", dim=2).collect()}
    assert got[0] == 1.0
    assert got[1] == 0.0


# ---------------------------------------------------------------- X61


def test_characteristic_terms_hand_computed(spark):
    """Two sources with one over-represented term each: lift =
    (c_gt*T)/(Tg*ft) by hand; ranks per group with tie-break on the
    term text."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        characteristic_terms,
    )

    rows = [
        (1, "A", "cat cat dog"), (2, "A", "cat cat dog"),
        (3, "B", "dog dog fish"), (4, "B", "dog dog fish"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = characteristic_terms(df, "source", "text", min_count=1, k=5).collect()
    by = {(r["source"], r["term"]): r for r in out}
    # T=12; A: cat 4, dog 2, T_A=6; B: dog 4, fish 2, T_B=6
    # f: cat 4, dog 6, fish 2
    assert by[("A", "cat")]["lift"] == round((4.0 * 12) / (6.0 * 4), 6) == 2.0
    assert by[("A", "dog")]["lift"] == round((2.0 * 12) / (6.0 * 6), 6)
    assert by[("B", "fish")]["lift"] == 2.0
    assert by[("B", "dog")]["lift"] == round((4.0 * 12) / (6.0 * 6), 6)
    assert by[("A", "cat")]["rank"] == 1 and by[("B", "fish")]["rank"] == 1
    assert by[("B", "dog")]["rank"] == 2


def test_characteristic_terms_min_count_prunes(spark):
    from poet_cloud_cost_etl_spark.operators.textstats import (
        characteristic_terms,
    )

    df = spark.createDataFrame(
        [(1, "A", "rare common common common")], ["doc_id", "source", "text"]
    )
    terms = {r["term"] for r in
             characteristic_terms(df, "source", "text", min_count=2, k=5).collect()}
    assert terms == {"common"}


# ---------------------------------------------------------------- X62


def _unit_hash_ref(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_kmv_exact_below_k(spark):
    """Fewer distinct tokens than k -> the estimate IS the exact
    distinct count."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        kmv_distinct_estimate,
    )

    df = spark.createDataFrame([(1, "S", "a b c a b")], ["doc_id", "source", "text"])
    r = kmv_distinct_estimate(df, "source", "text", k=64).collect()[0]
    assert (r["sketch_size"], r["est_distinct"]) == (3, 3)


def test_kmv_estimator_matches_hashlib_reference(spark):
    """k=2 over a 6-token vocabulary: the estimator must equal
    (k-1)*2^32 // h_2 computed from an independent hashlib mirror of
    the md5 unit hash."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        kmv_distinct_estimate,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    df = spark.createDataFrame([(1, "S", " ".join(vocab))], ["doc_id", "source", "text"])
    r = kmv_distinct_estimate(df, "source", "text", k=2).collect()[0]
    h2 = sorted(_unit_hash_ref(t) for t in vocab)[1]
    assert r["kth_hash"] == h2
    assert r["est_distinct"] == (1 * 4294967296) // h2


# ---------------------------------------------------------------- X63


def test_source_datacard_hand_computed(spark):
    """Source A: 2 docs, one an exact near-copy (same canonical
    text after punctuation strip) -> dup share 0.5; source B: two
    languages, 'en' dominant by tie-break on the code."""
    from poet_cloud_cost_etl_spark.operators.textstats import source_datacard

    rows = [
        (1, "A", "en", "hello world"),
        (2, "A", "en", "Hello, world!"),  # same canonical text
        (3, "B", "en", "uno dos"),
        (4, "B", "es", "tres cuatro cinco"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "lang", "text"])
    got = {r["source"]: r for r in
           source_datacard(df, "source", "doc_id", "text").collect()}
    a, b = got["A"], got["B"]
    assert (a["n_docs"], a["total_tokens"]) == (2, 4)
    assert a["exact_dup_share"] == 0.5
    assert a["mean_doc_tokens"] == 2.0
    assert (a["n_langs"], a["top_lang"], a["top_lang_share"]) == (1, "en", 1.0)
    assert b["exact_dup_share"] == 0.0
    assert b["n_langs"] == 2
    # 1-1 language tie -> lowest code wins
    assert b["top_lang"] == "en"
    assert b["top_lang_share"] == 0.5
    # quality: all docs fail the 50-200-word band and stopword gate;
    # mean_quality is a ppm integer division of summed quarters
    assert 0.0 <= a["mean_quality"] <= 1.0


# ---------------------------------------------------------------- X64


def test_neardup_probe_retrieval_finds_copy(spark):
    """One probe, one exact copy under a different id (identical
    signature -> every band collides BY CONSTRUCTION — a partial
    copy's collision would depend on the md5 draw), one unrelated
    doc. The copy must come back at rank 1 with Jaccard 1.0; the
    probe never retrieves itself."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        neardup_probe_retrieval,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    rows = [(1, base), (2, base), (3, "one two three four five six seven")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    probes = df.filter("doc_id = 1")
    out = neardup_probe_retrieval(probes, df, "doc_id", "text", k_top=5).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids  # self excluded
    assert out and out[0]["doc_id"] == 2 and out[0]["rank"] == 1
    # 12 tokens -> 10 shingles, all shared
    assert out[0]["n_common_shingles"] == 10
    assert out[0]["jaccard"] == 1.0


def test_neardup_probe_retrieval_no_collision_no_rows(spark):
    """A probe sharing no band with any corpus doc returns nothing
    (candidate generation is the gate; there is no corpus scan per
    probe)."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        neardup_probe_retrieval,
    )

    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    probes = df.filter("doc_id = 1")
    corpus = df.filter("doc_id = 2")
    assert neardup_probe_retrieval(probes, corpus, "doc_id", "text").count() == 0


# ---------------------------------------------------------------- X65


def test_vocab_growth_curve_hand_computed(spark):
    """4 docs, 2 buckets: doc 1-2 introduce two distinct shingles,
    docs 3-4 repeat one and add one new; new/cum counts by hand.
    Unit='token' saturates to one bucket on a closed vocabulary."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        vocab_growth_curve,
    )

    rows = [
        (0, "a b c"),          # shingle: 'a b c'
        (1, "a b c d"),        # adds 'b c d'
        (2, "a b c"),          # nothing new
        (3, "x y z"),          # adds 'x y z'
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["bucket"]: r for r in
           vocab_growth_curve(df, "doc_id", "text", n_buckets=2,
                              unit="shingle").collect()}
    # bucket 0 = ids 0-1, bucket 1 = ids 2-3
    assert (out[0]["new_tokens"], out[0]["cum_tokens"]) == (2, 2)
    assert (out[1]["new_tokens"], out[1]["cum_tokens"]) == (1, 3)
    assert out[1]["cum_share"] == 1.0
    assert out[0]["cum_share"] == 0.666666
    # token unit: the closed {a..z} vocabulary all first-appears in
    # bucket 0 except x/y/z
    tok = {r["bucket"]: r for r in
           vocab_growth_curve(df, "doc_id", "text", n_buckets=2,
                              unit="token").collect()}
    assert tok[0]["new_tokens"] == 4  # a b c d
    assert tok[1]["new_tokens"] == 3  # x y z


def test_vocab_growth_curve_rejects_bad_unit(spark):
    import pytest

    from poet_cloud_cost_etl_spark.operators.textstats import (
        vocab_growth_curve,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        vocab_growth_curve(df, "doc_id", "text", unit="char")


def test_substring_dup_coverage_hand_computed(spark):
    """X66: cross-doc repeated 3-gram flags its positions in BOTH
    docs; a within-doc repeat flags both positions; unique grams and
    short docs contribute zero."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        substring_dup_coverage,
    )

    rows = [
        (1, "a b c d"),            # grams: 'a b c', 'b c d'
        (2, "a b c x"),            # shares 'a b c' with doc 1
        (3, "p q r p q r p q"),    # 'p q r' twice, 'q r p' twice,
                                   # 'r p q' twice -> all 6 dup
        (4, "u v"),                # < 3 tokens: 0 positions
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           substring_dup_coverage(df, "doc_id", "text").collect()}
    assert (out[1]["n_positions"], out[1]["dup_positions"]) == (2, 1)
    assert (out[2]["n_positions"], out[2]["dup_positions"]) == (2, 1)
    assert (out[3]["n_positions"], out[3]["dup_positions"]) == (6, 6)
    assert (out[4]["n_positions"], out[4]["dup_positions"]) == (0, 0)
    assert out[3]["dup_share"] == 1.0
    assert out[4]["dup_share"] == 0.0
    assert out[1]["dup_share"] == 0.5


def test_substring_dup_coverage_min_count(spark):
    """min_count=3 requires a gram to occur three times before its
    positions are flagged."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        substring_dup_coverage,
    )

    rows = [(1, "a b c"), (2, "a b c"), (3, "a b c"), (4, "d e f"),
            (5, "d e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["dup_positions"] for r in
           substring_dup_coverage(df, "doc_id", "text",
                                  min_count=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}


def test_bloom_gate_no_false_negatives_and_fp_flag(spark):
    """X67: every exact member probes 4/4 (Bloom guarantee: no false
    negatives); a non-member either misses a bit or is flagged as a
    false positive, never as exact_dup."""
    from poet_cloud_cost_etl_spark.operators.dedup import bloom_gate_eval

    hist = spark.createDataFrame(
        [(i, f"history doc number {i}") for i in range(40)],
        ["doc_id", "text"],
    )
    inc = spark.createDataFrame(
        [(100, "history doc number 7"),   # member (same fingerprint)
         (101, "History  Doc Number 7!"), # member after canonicalization
         (102, "completely novel text")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           bloom_gate_eval(hist, inc, "doc_id", "text").collect()}
    assert out[100]["bloom_hits"] == 4 and out[100]["exact_dup"]
    assert out[101]["bloom_hits"] == 4 and out[101]["exact_dup"]
    assert not out[100]["false_positive"] and not out[101]["false_positive"]
    assert not out[102]["exact_dup"]
    # novel doc: maybe_dup iff all 4 bits collide -> then it must be
    # flagged false_positive
    assert out[102]["false_positive"] == out[102]["bloom_maybe_dup"]


def test_bloom_gate_bitset_bounded(spark):
    """X67 scale contract: the serialized filter is at most m_bits
    rows regardless of history size."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.dedup import (
        fingerprint,
    )

    # 500 docs x 4 hashes into m_bits=64 must produce <= 64 distinct
    # positions (pigeonhole: the bit-set is position-bounded)
    hist = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], ["doc_id", "text"]
    )
    fp = hist.select(fingerprint(F.col("text")).alias("__fp"))
    pos = fp.select(
        F.explode(F.array(*[
            F.expr(
                f"CAST(conv(substring(md5(concat('{j}|', __fp)), 1, 8),"
                " 16, 10) AS BIGINT) % 64"
            ) for j in range(4)
        ])).alias("pos")
    ).distinct()
    assert pos.count() <= 64


def test_remove_top_pc_kills_dominant_direction(spark):
    """X68: a corpus whose vectors are all multiples of one direction
    deflates to (numerically) zero; the top PC carries everything."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        remove_top_pc,
    )

    base = [1.0, -2.0, 0.5, 3.0]
    rows = [(i, [c * (i + 1) for c in base]) for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = remove_top_pc(df, "vec_id", "embedding", dim=4).collect()
    assert len(out) == 6 * 4
    assert all(abs(r["deflated"]) < 1e-4 for r in out)


def test_remove_top_pc_residual_orthogonal(spark):
    """X68: the deflated corpus has ~zero projection on the removed
    direction (orthogonality up to the round-6 quantization)."""
    import math

    from poet_cloud_cost_etl_spark.operators.embeddings import (
        remove_top_pc,
        top_principal_component,
    )

    rows = [
        (0, [2.0, 0.1, 0.0]), (1, [1.5, -0.2, 0.3]),
        (2, [2.2, 0.0, -0.1]), (3, [1.9, 0.3, 0.2]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    u = {r["dim"]: r["loading"] for r in
         top_principal_component(df, "embedding", dim=3).collect()}
    defl = remove_top_pc(df, "vec_id", "embedding", dim=3).collect()
    per = {}
    for r in defl:
        per.setdefault(r["vec_id"], {})[r["dim"]] = r["deflated"]
    unorm = math.sqrt(sum(x * x for x in u.values()))
    for vid, comps in per.items():
        dot = sum(comps[d] * u[d] for d in u)
        assert abs(dot) / unorm < 1e-3, (vid, dot)


def test_containment_catches_subsumption_jaccard_misses(spark):
    """X69: a short doc quoted verbatim inside a long doc scores
    containment 1.0 at low jaccard — kept by containment_pairs,
    invisible to the X2d jaccard threshold."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_from_docs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [(1, short), (2, filler + " " + short + " " + filler)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = containment_pairs(
        df, "doc_id", "text", threshold=0.9, jaccard_max=0.5
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment"] == 1.0 and r["jaccard"] < 0.5
    # the same pair is invisible to jaccard-threshold dedup
    jac = ngram_jaccard_from_docs(df, "doc_id", "text", 0.5).collect()
    assert jac == []


def test_containment_equals_jaccard_refactor_parity(spark):
    """The _pair_common refactor: containment_pairs' jaccard column
    agrees with ngram_jaccard_from_docs on the same corpus."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_from_docs,
    )

    rows = [
        (1, "a b c d e f"), (2, "a b c d e g"), (3, "a b c x y z"),
        (4, "p q r s t u"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    via_cont = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in containment_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    via_jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_from_docs(df, "doc_id", "text", 0.0).collect()
    }
    assert via_cont == via_jac and via_cont


def test_snapshot_diff_statuses_and_moved_flags(spark):
    """X70: id-keyed statuses plus the re-key (moved) signal in both
    directions."""
    from poet_cloud_cost_etl_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie"), (4, "delta")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, "alpha"),        # unchanged
            (2, "bravo edited"), # changed
            (5, "echo"),         # added, genuinely new
            (6, "charlie"),      # added, re-keyed from old id 3
            # ids 3, 4 removed; 3's content lives on at id 6
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["status"], r["content_elsewhere"]) for r in
           snapshot_diff(old, new, "doc_id", "text").collect()}
    assert out == {
        1: ("unchanged", False),
        2: ("changed", False),
        3: ("removed", True),    # content moved to id 6
        4: ("removed", False),
        5: ("added", False),
        6: ("added", True),      # re-keyed, must not count as new text
    }


def test_write_training_shards_order_contract(spark, tmp_path):
    """X71: one file per shard, rows inside each shard file ascend by
    pos — the on-disk order IS the X44 training order."""
    import glob
    import os

    import pyarrow.parquet as pq

    from poet_cloud_cost_etl_spark.operators.sampling import (
        training_order_shuffle,
    )
    from poet_cloud_cost_etl_spark.sources.sinks import (
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    ordered = df.join(
        training_order_shuffle(df, "doc_id", n_shards=4), "doc_id"
    )
    out = str(tmp_path / "shards")
    write_training_shards(ordered, out, shard_col="shard", pos_col="pos")

    expect = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in training_order_shuffle(df, "doc_id", n_shards=4).collect()
    }
    n_rows = 0
    for s in range(4):
        files = glob.glob(os.path.join(out, f"shard={s}", "*.parquet"))
        assert len(files) == 1, (s, files)
        t = pq.read_table(files[0]).to_pydict()
        poss = t["pos"]
        assert poss == sorted(poss), f"shard {s} not pos-ordered"
        for pos, did in zip(t["pos"], t["doc_id"]):
            assert expect[(s, pos)] == did
        n_rows += len(poss)
    assert n_rows == 200


def test_index_shard_plan_snake_balances_skew(spark):
    """X72: skewed list sizes deal onto shards with the snake so the
    largest+smallest pair up; totals are provably tighter than the
    naive modulo deal on the same draw."""
    from poet_cloud_cost_etl_spark.operators.similarity import (
        index_shard_plan,
    )

    # 6 synthetic "lists": sizes 60, 50, 40, 30, 20, 10 via vectors
    # clustered tightly around 6 well-separated centroids
    rows, cents = [], []
    sizes = [60, 50, 40, 30, 20, 10]
    vid = 0
    for ci, n in enumerate(sizes):
        base = [0.0] * 6
        base[ci] = 1.0
        cents.append((ci, base))
        for _ in range(n):
            rows.append((vid, base))
            vid += 1
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    centroids = spark.createDataFrame(
        cents, ["centroid_id", "centroid_vec"]
    )
    out = index_shard_plan(
        corpus, centroids, "vec_id", "embedding", n_shards=2
    ).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["n_vectors"] for r in by_rank] == sizes
    # snake on 2 shards: ranks 0,3,4 -> shard 0; 1,2,5 -> shard 1
    assert [r["shard"] for r in by_rank] == [0, 1, 1, 0, 0, 1]
    totals = {r["shard"]: r["shard_total_vectors"] for r in out}
    assert totals == {0: 60 + 30 + 20, 1: 50 + 40 + 10}  # 110 vs 100
    # naive modulo deal would give 60+40+20=120 vs 50+30+10=90
    assert max(totals.values()) - min(totals.values()) < 120 - 90


def test_retrieval_mrr_eval_consistent_with_components(spark):
    """X73: per-query reciprocal rank equals 1/rank of the true NN in
    the (already-verified) ivf_topk result, 0 on a miss; mrr is the
    integer ppm mean."""
    from poet_cloud_cost_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        retrieval_mrr_eval,
    )

    from pyspark.sql import functions as F

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )
    q = e.filter(F.col("vec_id") < 6)
    out = retrieval_mrr_eval(
        q, e, "vec_id", "embedding", k=4, n_centroids=4, nprobe=1
    ).collect()
    truth = {r["query_id"]: r["neighbor_id"] for r in
             brute_force_topk(q, e, "vec_id", "embedding", k=1).collect()}
    ivf = {(r["query_id"], r["neighbor_id"]): r["rank"] for r in
           ivf_topk(q, e, "vec_id", "embedding", k=4, n_centroids=4,
                    nprobe=1).collect()}
    rr_ppms = []
    for r in out:
        assert truth[r["query_id"]] == r["true_neighbor"]
        want_rank = ivf.get((r["query_id"], r["true_neighbor"]), 0)
        assert r["found_rank"] == want_rank
        ppm = 1000000 // want_rank if want_rank else 0
        assert r["reciprocal_rank"] == ppm / 1e6
        rr_ppms.append(ppm)
    want_mrr = (sum(rr_ppms) // len(rr_ppms)) / 1e6
    assert all(r["mrr"] == want_mrr for r in out)


def test_bbit_minhash_identical_docs_estimate_one(spark):
    """X74: identical shingle sets collide on all k components ->
    est_jaccard 1.0 == exact; disjoint sets estimate ~0 (clamped)."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        bbit_minhash_eval,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different words in this one entirely"),
        (4, "completely different words in this one entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["doc_a"], r["doc_b"]): r for r in
           bbit_minhash_eval(df, "doc_id", "text", k=24, b=2).collect()}
    # identical pairs share every shingle -> every component collides
    for pair in [(1, 2), (3, 4)]:
        r = out[pair]
        assert r["n_collisions"] == 24
        assert r["jaccard"] == 1.0 and r["est_jaccard"] == 1.0
    # cross pairs share no shingle -> no pair row at all (pair core
    # only emits pairs sharing >= 1 shingle)
    assert (1, 3) not in out and (2, 4) not in out


def test_bbit_minhash_estimator_clamps_at_zero(spark):
    """X74: the estimator never goes negative even when collisions
    fall below the 2^-b baseline."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        bbit_minhash_eval,
    )

    # one shared shingle between otherwise-different docs: a pair
    # exists, collision count can dip below k/4
    a = "alpha beta gamma " + " ".join(f"u{i} v{i} w{i}" for i in range(10))
    b = "alpha beta gamma " + " ".join(f"x{i} y{i} z{i}" for i in range(10))
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    out = bbit_minhash_eval(df, "doc_id", "text", k=24, b=2).collect()
    assert len(out) == 1
    assert out[0]["est_jaccard"] >= 0.0


def test_simhash_pairs_pigeonhole_recall(spark):
    """X75: every pair within hamming<=3 is found (block banding is
    exhaustive by pigeonhole) — brute-force cross-check on a small
    corpus; hamming values are exact popcounts."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        simhash16,
        simhash_hamming_pairs,
    )

    rows = [(i, f"shared words everywhere plus t{i} u{i % 3}")
            for i in range(24)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r["doc_id"]: r["simhash"] for r in
           simhash16(df, "doc_id", "text").collect()}
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
           simhash_hamming_pairs(df, "doc_id", "text",
                                 max_hamming=3).collect()}
    assert got == want and want  # non-vacuous: the corpus has pairs


def test_sniff_payload_format_magic_routing(spark):
    """X76: classification comes from the bytes, not any declared
    type; truncated magic falls through to octet-stream."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.multimodal import (
        sniff_payload_format,
    )

    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"data"),
        (2, bytes.fromhex("FFD8FFE0") + b"data"),
        (3, b"RIFF" + b"wavdata"),
        (4, b"plain text bytes"),
        (5, bytes.fromhex("89")),  # truncated PNG magic
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    out = {r["doc_id"]: (r["mime_sniffed"], r["n_bytes"]) for r in
           sniff_payload_format(df, "doc_id", "payload").collect()}
    assert out[1] == ("image/png", 12)
    assert out[2] == ("image/jpeg", 8)
    assert out[3] == ("audio/x-riff", 11)
    assert out[4] == ("application/octet-stream", 16)
    assert out[5] == ("application/octet-stream", 1)


def test_lsh_plan_monotone_and_extremes(spark):
    """X77: more bands (fewer rows) never lowers survival on either
    side; the table reproduces the S-curve computed in python from
    the operator's own X74 estimates."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        bbit_minhash_eval,
        lsh_parameter_plan,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "alpha beta gamma other words here now"), # partial overlap
        (4, "alpha beta gamma different tail text x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(
        lsh_parameter_plan(df, "doc_id", "text", k=8).collect(),
        key=lambda r: r["bands"],
    )
    assert [(r["bands"], r["rows_per_band"]) for r in out] == [
        (1, 8), (2, 4), (4, 2), (8, 1)
    ]
    recalls = [r["dup_recall"] for r in out]
    passrates = [r["noise_passrate"] for r in out]
    assert recalls == sorted(recalls)
    assert passrates == sorted(passrates)

    # independent reference: recompute the table from the operator's
    # own (already hashlib-pinned) X74 estimates
    ests = [r["est_jaccard"] for r in
            bbit_minhash_eval(df, "doc_id", "text", k=8, b=2).collect()]
    dup = [j for j in ests if j >= 0.5]
    noise = [j for j in ests if j < 0.5]
    assert dup  # the exact-dup pair estimates j = 1.0
    assert 1.0 in dup
    for r in out:
        b, n = r["bands"], r["rows_per_band"]

        def surv(j):
            jr = 1.0
            for _ in range(n):
                jr *= j
            one = 1.0
            for _ in range(b):
                one *= (1.0 - jr)
            return round(1000000 * (1.0 - one))

        want_dup = (sum(int(surv(j)) for j in dup) // len(dup)) / 1e6
        assert r["dup_recall"] == want_dup, (b, n)
        if noise:
            want_noise = (
                sum(int(surv(j)) for j in noise) // len(noise)
            ) / 1e6
            assert r["noise_passrate"] == want_noise, (b, n)


def test_pagerank_star_hub_dominates(spark):
    """X78: on a star graph the hub out-ranks every leaf; symmetric
    cliques stay uniform; mass semantics follow the exact integer
    recurrence."""
    from poet_cloud_cost_etl_spark.operators.graph import pagerank_ppm

    star = [(0, i) for i in range(1, 6)]           # hub 0, leaves 1-5
    clique = [(10, 11), (10, 12), (11, 12)]        # triangle
    edges = spark.createDataFrame(star + clique, ["doc_a", "doc_b"])
    out = {r["node"]: r["pagerank"] for r in pagerank_ppm(edges).collect()}
    assert all(out[0] > out[i] for i in range(1, 6))
    leaf_vals = {out[i] for i in range(1, 6)}
    assert len(leaf_vals) == 1                     # leaves symmetric
    assert len({out[10], out[11], out[12]}) == 1   # clique uniform

    # independent python reference of the integer recurrence
    sym = {}
    for a, b in star + clique:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    p = {n: 1_000_000 for n in sym}
    for _ in range(8):
        nxt = {}
        for n in sym:
            s = sum(p[j] // len(sym[j]) for j in sym[n])
            nxt[n] = 150_000 + (85 * s) // 100
        p = nxt
    for n, v in p.items():
        assert out[n] == v / 1e6, n


def test_license_propagation_strictest_wins(spark):
    """X79: the survivor's effective license is the strictest tag in
    its cluster; unlisted tags are strictest of all; singletons keep
    their own tag."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        license_propagation,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (20, 20), (21, 20)],
        ["doc_id", "cluster_id"],
    )
    lic = spark.createDataFrame(
        [(1, "mit"), (2, "cc-by"), (3, "mit"),
         (10, "apache-2.0"), (20, "mit"), (21, "mystery-eula")],
        ["doc_id", "license"],
    )
    out = {r["doc_id"]: r for r in license_propagation(
        clusters, lic, "doc_id", "license",
        strictness=["proprietary", "cc-by", "apache-2.0", "mit"],
    ).collect()}
    assert out[1]["effective_license"] == "cc-by" and out[1]["escalated"]
    assert out[2]["effective_license"] == "cc-by" and not out[2]["escalated"]
    assert out[10]["effective_license"] == "apache-2.0"
    assert not out[10]["escalated"]
    # unlisted license is conservative: strictest in its cluster
    assert out[20]["effective_license"] == "unknown" and out[20]["escalated"]
    assert out[21]["effective_license"] == "unknown"
    assert not out[21]["escalated"]


def test_embedding_health_audit_counters(spark):
    """X80: each corruption class counts exactly once; norm stats
    cover only clean rows."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        embedding_health_audit,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 2.0, 0.0]),
        (3, [float("nan"), 1.0, 1.0]),
        (4, [float("inf"), 1.0, 1.0]),
        (5, [0.0, 0.0, 0.0]),          # zero vector (clean otherwise)
        (6, [1.0, 1.0]),               # dim mismatch
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    r = embedding_health_audit(df, "vec_id", "embedding", dim=3).collect()[0]
    assert r["n_vectors"] == 6
    assert r["n_dim_mismatch"] == 1
    assert r["n_with_nan"] == 1
    assert r["n_with_inf"] == 1
    assert r["n_zero_vectors"] == 1
    # clean rows: 1, 2, 5 -> quantized norm_sq 1e12, 4e12, 0
    assert r["min_norm_sq_q"] == 0
    assert r["max_norm_sq_q"] == 4_000_000_000_000
    assert r["mean_norm_sq_q"] == 5_000_000_000_000 // 3


def test_pr_curve_hand_computed(spark):
    """X81: 4 docs, 2 positives — the cumulative table matches the
    hand-enumerated curve; recall is monotone down-threshold,
    and the top threshold keeps only the top bucket."""
    from poet_cloud_cost_etl_spark.operators.textstats import pr_curve

    rows = [
        (1, 0.9, 1), (2, 0.7, 0), (3, 0.4, 1), (4, 0.1, 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "score", "label"])
    out = sorted(
        pr_curve(df, "score", "label").collect(),
        key=lambda r: -r["threshold"],
    )
    got = [(r["threshold"], r["n_kept"], r["n_true_pos"],
            r["precision"], r["recall"]) for r in out]
    assert got == [
        (0.9, 1, 1, 1.0, 0.5),
        (0.7, 2, 1, 0.5, 0.5),
        (0.4, 3, 2, 0.666666, 1.0),
        (0.1, 4, 2, 0.5, 1.0),
    ]


def test_pr_curve_no_positives(spark):
    """X81: an all-negative corpus yields recall 0 everywhere (no
    division by zero)."""
    from poet_cloud_cost_etl_spark.operators.textstats import pr_curve

    df = spark.createDataFrame(
        [(1, 0.5, 0), (2, 0.2, 0)], ["doc_id", "score", "label"]
    )
    out = pr_curve(df, "score", "label").collect()
    assert all(r["recall"] == 0.0 and r["precision"] == 0.0 for r in out)


def test_cluster_density_flags_chain_merge(spark):
    """X82: a triangle is a clique (density 1.0); a 3-chain is not
    (density 2/3); singletons are excluded."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        cluster_density_audit,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),      # triangle cluster
         (10, 10), (11, 10), (12, 10),  # chain 10-11-12
         (99, 99)],                   # singleton
        ["doc_id", "cluster_id"],
    )
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (11, 12)],
        ["doc_a", "doc_b"],
    )
    out = {r["cluster_id"]: r for r in
           cluster_density_audit(clusters, edges).collect()}
    assert set(out) == {1, 10}                  # singleton excluded
    assert out[1]["is_clique"] and out[1]["density"] == 1.0
    assert not out[10]["is_clique"]
    assert out[10]["density"] == 0.666666       # 2*2/(3*2) ppm-floored
    assert out[10]["n_edges"] == 2


def test_cms_one_sided_and_exact_when_wide(spark):
    """X83: estimates never under-count; with width >> vocabulary
    (no collisions possible in any row? not guaranteed — but min
    over 3 independent rows on a 5-token vocab vs width 256 is
    collision-free with overwhelming margin, asserted exactly) the
    estimate equals the exact count."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        cms_heavy_hitters_eval,
    )

    rows = [(1, "aa bb aa cc"), (2, "aa dd ee bb")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["tok"]: r for r in
           cms_heavy_hitters_eval(df, "text", depth=3, width=256,
                                  k_probe=10).collect()}
    assert {t: r["exact_count"] for t, r in out.items()} == {
        "aa": 3, "bb": 2, "cc": 1, "dd": 1, "ee": 1
    }
    for r in out.values():
        assert r["overcount"] >= 0
        assert r["cms_estimate"] == r["exact_count"] + r["overcount"]

    # force collisions: width 1 -> every row's single counter holds
    # the whole stream (8 tokens); estimate = 8 for every probe
    tight = {r["tok"]: r["cms_estimate"] for r in
             cms_heavy_hitters_eval(df, "text", depth=2, width=1,
                                    k_probe=10).collect()}
    assert set(tight.values()) == {8}


def test_sorted_neighborhood_pairs_semantics(spark):
    """X84: adjacency in canonical sort order generates exactly the
    window pairs; identical docs sort adjacent and score jaccard
    1.0 regardless of their ids."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (5, "zebra yak xylophone words continue here"),
        (1, "Apple banana cherry dates elderberry fig!"),
        (9, "apple banana cherry dates elderberry fig"),
        (3, "middle of the sort order sits here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted_neighborhood_pairs(df, "doc_id", "text", window=1).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    # canonical sort: "apple..."(1), "apple..."(9), "middle..."(3),
    # "zebra..."(5) -> window-1 pairs (1,9), (3,9), (3,5)
    assert set(pairs) == {(1, 9), (3, 9), (3, 5)}
    assert pairs[(1, 9)] == 1.0          # canonicalization-equal docs
    assert pairs[(3, 9)] == 0.0
    # window=3 on 4 docs yields all 6 pairs
    full = sorted_neighborhood_pairs(df, "doc_id", "text", window=3)
    assert full.count() == 6


def test_pr_auc_hand_computed(spark):
    """X85: perfect classifier -> AUC 1.0; the 4-doc curve from the
    X81 test integrates to the hand trapezoid."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        pr_auc,
        pr_curve,
    )

    perfect = spark.createDataFrame(
        [(1, 0.9, 1), (2, 0.8, 1), (3, 0.2, 0), (4, 0.1, 0)],
        ["doc_id", "score", "label"],
    )
    r = pr_auc(pr_curve(perfect, "score", "label")).collect()[0]
    assert r["pr_auc"] == 1.0

    mixed = spark.createDataFrame(
        [(1, 0.9, 1), (2, 0.7, 0), (3, 0.4, 1), (4, 0.1, 0)],
        ["doc_id", "score", "label"],
    )
    # threshold-ordered polyline: (0.5, 1.0), (0.5, 0.5),
    # (1.0, 0.666666), (1.0, 0.5); trapezoids:
    # anchor->(0.5,1.0): 0.5*1.0 = 0.5; zero-width at r=0.5;
    # (0.5,0.5)->(1.0,0.666666): 0.5*(0.5+0.666666)/2 = 0.2916665
    r2 = pr_auc(pr_curve(mixed, "score", "label")).collect()[0]
    assert r2["pr_auc"] == 0.7916665


def test_prefix_filter_equals_full_blocking(spark):
    """X86: the prefix-filter theorem — results identical to the
    any-shared-shingle X2d join at the same threshold, on both the
    fixture corpus and a synthetic with heavy boilerplate overlap."""
    from pyspark.sql import functions as F  # noqa: F401

    from poet_cloud_cost_etl_spark.operators.dedup import (
        ngram_jaccard_from_docs,
        prefix_filter_jaccard_join,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
            ngram_jaccard_from_docs(d, "doc_id", "text", 0.5).collect()}
    pref = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
            prefix_filter_jaccard_join(d, "doc_id", "text", 1, 2).collect()}
    assert pref == full and full  # non-vacuous

    rows = [
        (1, "common boiler plate text alpha beta gamma"),
        (2, "common boiler plate text alpha beta delta"),
        (3, "common boiler plate text entirely different tail"),
        (4, "nothing shared with anyone at all here"),
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    f2 = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
          ngram_jaccard_from_docs(sdf, "doc_id", "text", 0.5).collect()}
    p2 = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in
          prefix_filter_jaccard_join(sdf, "doc_id", "text", 1, 2).collect()}
    assert p2 == f2


def test_power_iteration_dim_ceiling_guard(spark):
    """r15 (VERDICT r14 item 8): the single-row Gram form must fail
    loudly above the dim ceiling instead of OOMing an executor."""
    import pytest

    from poet_cloud_cost_etl_spark.operators.embeddings import (
        _MAX_1ROW_GRAM_DIM,
        top_principal_component,
    )

    df = spark.createDataFrame([(1, [1.0, 2.0])], ["id", "vec"])
    with pytest.raises(ValueError, match="single-row Gram ceiling"):
        top_principal_component(df, "vec", dim=_MAX_1ROW_GRAM_DIM + 1)
