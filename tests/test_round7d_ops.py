"""Unit-level contracts for the round-7d operators (X38 sequence-
length planning, X39 hard-negative mining, X40 length-histogram
drift, X41 hashed-logit classifier, X42 product quantization), beyond
the oracle parity sweep: algebraic invariants on synthetic inputs
where the expected value is known by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.operators.embeddings import (
    pq_codebook,
    pq_encode,
)
from poet_cloud_cost_etl_spark.operators.similarity import hard_negatives
from poet_cloud_cost_etl_spark.operators.textstats import (
    HASH_BUCKETS,
    hashed_logit_scores,
    length_drift_chi2,
    seqlen_plan,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


# ---------------------------------------------------------------- X38


def test_seqlen_percentiles_exact(spark):
    """10 docs of 1..10 tokens: p50 is the 5th sorted value (5),
    p90 the 9th (9), p99 the ceil(9.9)=10th (10)."""
    rows = [(i, " ".join(["w"] * i), "s") for i in range(1, 11)]
    out = seqlen_plan(_docs(spark, rows), "source", "text", context_len=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["p50"], r["p90"], r["p99"]) == (5, 9, 10)
    assert r["n_docs"] == 10 and r["total_tokens"] == 55
    # truncation at 4: kept = 1+2+3+4*7 = 34, over = docs with >4 tokens
    assert r["tokens_kept"] == 34 and r["docs_over"] == 6
    assert abs(r["trunc_loss_ppm"] - ((1_000_000 * 21) // 55) / 1e6) < 1e-12


def test_seqlen_no_truncation_when_context_covers_max(spark):
    rows = [(i, "a b c", "s") for i in range(5)]
    r = seqlen_plan(_docs(spark, rows), "source", "text", context_len=10).collect()[0]
    assert r["docs_over"] == 0 and r["trunc_loss_ppm"] == 0.0
    assert r["tokens_kept"] == r["total_tokens"]


# ---------------------------------------------------------------- X40


def test_length_drift_identical_groups_zero(spark):
    """Two sources with the SAME length histogram: each group's ppm
    shares equal the corpus's, so chi2 is exactly 0."""
    rows = [(i, "x", "a") for i in range(10)] + [(i + 10, "x", "b") for i in range(10)]
    df = spark.createDataFrame(
        [(d, t, s, 100 + (d % 5) * 60) for d, t, s in rows],
        ["doc_id", "text", "source", "n_chars"],
    )
    out = {
        r["source"]: r["chi2_ppm"]
        for r in length_drift_chi2(df, "source", "n_chars", 50).collect()
    }
    assert out == {"a": 0.0, "b": 0.0}


def test_length_drift_shifted_group_positive(spark):
    df = spark.createDataFrame(
        [(i, "x", "short", 10) for i in range(20)]
        + [(i + 20, "x", "long", 500) for i in range(20)],
        ["doc_id", "text", "source", "n_chars"],
    )
    out = {
        r["source"]: r["chi2_ppm"]
        for r in length_drift_chi2(df, "source", "n_chars", 50).collect()
    }
    assert out["short"] > 0 and out["long"] > 0


# ---------------------------------------------------------------- X41


def test_hashed_logit_matches_manual(spark):
    """The logit of a known document equals the hand-computed sum of
    its tokens' bucket weights (md5-hash buckets, Knuth-mix
    weights)."""
    import hashlib

    text = "the quick brown fox the"
    df = _docs(spark, [(1, text, "s")])
    r = hashed_logit_scores(df, "doc_id", "text").collect()[0]

    def weight(tok: str) -> int:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % HASH_BUCKETS
        return ((b * 2654435761) % 1024) - 512

    expected = sum(weight(t) for t in text.split())
    assert r["logit"] == expected
    assert r["n_tokens"] == 5
    assert r["pred_keep"] == (expected > 0)


def test_hashed_logit_no_shuffle_plan(spark):
    """The scoring is a scan-stage fold: no Exchange in the plan."""
    df = _docs(spark, [(i, "alpha beta", "s") for i in range(4)])
    plan = hashed_logit_scores(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- X39


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_hard_negatives_excludes_same_label(spark):
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.99, 0.1], "a"),   # same label: must never appear
            (3, [0.9, 0.2], "b"),
            (4, [0.0, 1.0], "b"),
            (5, [-1.0, 0.0], "c"),
        ],
    )
    anchors = corpus.filter(F.col("vec_id") == 1)
    out = hard_negatives(anchors, corpus, "vec_id", "embedding", "label", k=3).collect()
    labels = {r["neighbor_label"] for r in out}
    assert "a" not in labels
    # nearest cross-label neighbor is vec 3 (cos ~0.976)
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["neighbor_id"] == 3
    assert [r["rank"] for r in by_rank] == [1, 2, 3]


def test_hard_negatives_k_bound(spark):
    corpus = _vecs(
        spark,
        [(i, [float(i), 1.0], "a" if i % 2 else "b") for i in range(1, 9)],
    )
    anchors = corpus.filter(F.col("vec_id") <= 2)
    out = hard_negatives(anchors, corpus, "vec_id", "embedding", "label", k=2)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 2 for r in counts)


def test_hard_negatives_ivf_full_probe_matches_broadcast(spark):
    """candidates="ivf" with nprobe=n_centroids probes every inverted
    list, so the candidate set is ALL cross-label pairs and the output
    must equal the broadcast brute-force path bit-for-bit — the
    documented exact-recovery point of the approximation dial."""
    from tests.conftest import SF_SMALL
    from poet_cloud_cost_etl_spark.catalog import table as _t

    emb = _t(spark, SF_SMALL, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 11 == 0)
    bf = sorted(
        map(tuple, hard_negatives(
            anchors, emb, "vec_id", "embedding", "label", k=3
        ).collect())
    )
    ivf = sorted(
        map(tuple, hard_negatives(
            anchors, emb, "vec_id", "embedding", "label", k=3,
            candidates="ivf", n_centroids=4, nprobe=4,
        ).collect())
    )
    assert bf and bf == ivf


def test_hard_negatives_ivf_partial_probe_is_true_subset(spark):
    """With nprobe < n_centroids the IVF path may MISS neighbors but
    must never invent or mis-score a pair: every emitted
    (query, neighbor, cos) must appear in the full cross-label scored
    set, with identical labels and rounded cosine."""
    from tests.conftest import SF_SMALL
    from poet_cloud_cost_etl_spark.catalog import table as _t

    emb = _t(spark, SF_SMALL, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 11 == 0)
    full = {
        (r.query_id, r.neighbor_id): (
            r.query_label, r.neighbor_label, r.cos_sim
        )
        for r in hard_negatives(
            anchors, emb, "vec_id", "embedding", "label", k=10**6
        ).collect()
    }
    ivf = hard_negatives(
        anchors, emb, "vec_id", "embedding", "label", k=3,
        candidates="ivf", n_centroids=8, nprobe=2,
    ).collect()
    assert ivf
    for r in ivf:
        assert full[(r.query_id, r.neighbor_id)] == (
            r.query_label, r.neighbor_label, r.cos_sim
        )


# ---------------------------------------------------------------- X42


def test_pq_codebook_shape(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(10)], ["vec_id", "embedding"]
    )
    cb = pq_codebook(df, "vec_id", "embedding", m=4, ksub=3).collect()
    assert len(cb) == 12  # m * ksub
    assert all(len(r["codeword"]) == 2 for r in cb)  # 8 dims / 4 subspaces
    assert {r["subspace"] for r in cb} == {0, 1, 2, 3}


def test_pq_encode_selected_vectors_zero_error(spark):
    """A vector whose id was drawn into the codebook quantizes to
    ITSELF in every subspace: dist_sq == 0 and code_id == vec_id
    (ties broken by code id can only matter for duplicate
    codewords, which distinct inputs rule out)."""
    df = spark.createDataFrame(
        [(i, [float(i * j % 7) for j in range(8)]) for i in range(12)],
        ["vec_id", "embedding"],
    )
    cb_ids = {r["code_id"] for r in pq_codebook(df, "vec_id", "embedding", 4, 3).collect()}
    enc = pq_encode(df, "vec_id", "embedding", m=4, ksub=3)
    own = enc.filter(F.col("vec_id").isin(list(cb_ids))).collect()
    zero_rows = [r for r in own if r["dist_sq"] == 0.0]
    # every (selected vector, subspace) pair has an exact codeword
    assert len(zero_rows) == len(cb_ids) * 4

    # every vector gets exactly m rows, codes drawn from the codebook
    per_vec = enc.groupBy("vec_id").count().collect()
    assert all(r["count"] == 4 for r in per_vec)
    assert {r["code_id"] for r in enc.collect()} <= cb_ids


def test_pq_encode_nearest_by_construction(spark):
    """With two well-separated clusters and one codeword in each,
    every vector encodes to its own cluster's codeword. The vec_ids
    (2..6 and 100..104) are chosen so the deterministic md5-order
    draw picks one codeword from EACH cluster (6 and 101) — the
    premise is asserted, not assumed, so a future change to the draw
    cannot silently make this test vacuous."""
    rows = [(2 + i, [0.0 + i * 0.01] * 4) for i in range(5)] + [
        (100 + i, [100.0 + i * 0.01] * 4) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = pq_codebook(df, "vec_id", "embedding", m=2, ksub=2).collect()
    ids = sorted({r["code_id"] for r in cb})
    assert len(ids) == 2 and (ids[0] < 100) != (ids[1] < 100), (
        f"codebook draw {ids} must span both clusters"
    )
    enc = pq_encode(df, "vec_id", "embedding", m=2, ksub=2).collect()
    assert enc
    for r in enc:
        same_cluster = (r["vec_id"] < 100) == (r["code_id"] < 100)
        assert same_cluster, r


def test_pq_encode_indivisible_dim_raises(spark):
    """size(vec) % m != 0 must RAISE (assert_true guard), not
    silently quantize a truncated vector."""
    import pytest

    df = spark.createDataFrame(
        [(i, [float(i)] * 7) for i in range(6)], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="divisible"):
        pq_encode(df, "vec_id", "embedding", m=4, ksub=2).collect()


# ---------------------------------------------------------------- X43


def test_mixture_budget_sample_cut_is_exact(spark):
    """One group, every doc 10 tokens, budget 35: exactly 3 docs
    survive (cum 10/20/30), in unit-hash order."""
    import hashlib

    from poet_cloud_cost_etl_spark.operators.sampling import (
        mixture_budget_sample,
    )

    rows = [(i, "a b c d e f g h i j", "s") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = mixture_budget_sample(df, "doc_id", "text", "source", 35).collect()
    assert len(out) == 3
    assert sorted(r["cum_tokens"] for r in out) == [10, 20, 30]

    def uh(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    expected = sorted(range(10), key=lambda i: (uh(i), i))[:3]
    assert sorted(r["doc_id"] for r in out) == sorted(expected)


def test_mixture_budget_sample_equal_groups_equal_budget(spark):
    from poet_cloud_cost_etl_spark.operators.sampling import (
        mixture_budget_sample,
    )

    rows = [(i, "a b c d e", "g1") for i in range(10)] + [
        (100 + i, "a b c d e", "g2") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = mixture_budget_sample(df, "doc_id", "text", "source", 40)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # equal groups -> equal 20-token budgets -> 4 docs each
    assert per == {"g1": 4, "g2": 4}


def test_mixture_budget_sample_partition_invariant(spark):
    from poet_cloud_cost_etl_spark.operators.sampling import (
        mixture_budget_sample,
    )

    rows = [(i, "w " * (1 + i % 7), f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    a = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in mixture_budget_sample(df, "doc_id", "text", "source", 100).collect()
    )
    b = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in mixture_budget_sample(
            df.repartition(13), "doc_id", "text", "source", 100
        ).collect()
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------- X44


def test_training_order_shuffle_addresses_all_rows(spark):
    from poet_cloud_cost_etl_spark.operators.sampling import (
        training_order_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    out = training_order_shuffle(df, "doc_id", n_shards=4).collect()
    assert len(out) == 100
    addr = {(r["shard"], r["pos"]) for r in out}
    assert len(addr) == 100  # (shard, pos) is a unique address
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_training_order_shuffle_epoch_reshuffles(spark):
    from poet_cloud_cost_etl_spark.operators.sampling import (
        training_order_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(64)], ["doc_id"])
    e0 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in training_order_shuffle(df, "doc_id", 4, epoch=0).collect()}
    e1 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in training_order_shuffle(df, "doc_id", 4, epoch=1).collect()}
    assert e0 != e1          # a new epoch is a different order
    assert set(e0) == set(e1)  # over the same rows


# --------------------------------------------------- X28 tree form


def test_ivf_tree_leaf_count_and_coverage(spark):
    from poet_cloud_cost_etl_spark.operators.similarity import ivf_tree_assign

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(6)]) for i in range(200)],
        ["vec_id", "embedding"],
    )
    t = ivf_tree_assign(df, "vec_id", "embedding", branching=3, depth=2)
    rows = t.collect()
    assert len(rows) == 200  # every vector assigned exactly once
    leaves = {r["leaf_id"] for r in rows}
    assert len(leaves) <= 9  # <= b^depth


def test_ivf_tree_partition_invariant(spark):
    from poet_cloud_cost_etl_spark.operators.similarity import ivf_tree_assign

    df = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 13) for j in range(4)]) for i in range(120)],
        ["vec_id", "embedding"],
    )
    a = {r["vec_id"]: r["leaf_id"]
         for r in ivf_tree_assign(df, "vec_id", "embedding", 3, 2).collect()}
    b = {r["vec_id"]: r["leaf_id"]
         for r in ivf_tree_assign(df.repartition(11), "vec_id", "embedding", 3, 2).collect()}
    assert a == b


def test_semantic_dedup_tree_flags_exact_duplicates(spark):
    """An exact duplicate vector lands in its twin's leaf by
    construction (identical cosine to every centroid, id tie-break
    descends the same path) and must be flagged at any threshold."""
    from poet_cloud_cost_etl_spark.operators.similarity import (
        semantic_dedup_tree,
    )

    base = [(i, [float((i * 7 + j * 3) % 11) + 0.5 for j in range(6)]) for i in range(60)]
    dup = [(1000 + i, vec) for i, vec in base[:5]]  # 5 exact copies
    df = spark.createDataFrame(base + dup, ["vec_id", "embedding"])
    out = semantic_dedup_tree(df, "vec_id", "embedding", 3, 2, threshold=0.999)
    flagged = {r["vec_id"] for r in out.collect() if r["is_dup"]}
    assert {1000 + i for i, _ in base[:5]} <= flagged
    by_id = {r["vec_id"]: r["leaf_id"] for r in out.collect()}
    for i, _ in base[:5]:
        assert by_id[i] == by_id[1000 + i]  # twin shares the leaf


# ---------------------------------------------------------------- X45


def test_lsh_recall_perfect_on_exact_duplicates(spark):
    """Exact-duplicate texts have identical signatures, so every
    band collides: recall over exact-dup truth pairs must be 1.0
    and the counts consistent."""
    from poet_cloud_cost_etl_spark.operators.dedup import lsh_pair_recall

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, text, "s") for i in range(4)] + [
        (100 + i, f"unrelated words here nothing shared {i} one two three", "s")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    r = lsh_pair_recall(df, "doc_id", "text", threshold=0.5).collect()[0]
    assert r["n_true_pairs"] >= 6  # the 4 copies give C(4,2) = 6
    assert r["n_hit"] == r["n_true_pairs"]
    assert r["recall_ppm"] == 1.0


def test_lsh_recall_zero_truth_gives_null(spark):
    from poet_cloud_cost_etl_spark.operators.dedup import lsh_pair_recall

    rows = [
        (1, "completely different words in this one", "s"),
        (2, "nothing shared with anything else here", "s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    r = lsh_pair_recall(df, "doc_id", "text", threshold=0.5).collect()[0]
    assert r["n_true_pairs"] == 0 and r["recall_ppm"] is None


# ---------------------------------------------------------------- X46


def test_random_projection_linearity_and_shape(spark):
    """Projection is linear: proj(2a) = 2·proj(a) (exact: doubling a
    double is exact, the fold is the same order), and the output has
    out_dim rows per vector."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        random_projection,
    )

    base = [(1, [0.5, -1.25, 2.0, 0.75]), (2, [1.0, -2.5, 4.0, 1.5])]  # 2 = 2·1
    df = spark.createDataFrame(base, ["vec_id", "embedding"])
    out = random_projection(df, "vec_id", "embedding", out_dim=4).collect()
    assert len(out) == 8
    p = {(r["vec_id"], r["rp_dim"]): r["val"] for r in out}
    for j in range(4):
        assert abs(p[(2, j)] - 2 * p[(1, j)]) < 2e-6  # rounding 1e-6 each


def test_random_projection_signs_not_degenerate(spark):
    """The sign function must not collapse to parity-of-(i+j) — a
    degenerate matrix maps every even-index-sum cell the same way
    and destroys the JL guarantee. Distinct unit vectors must
    produce distinct projections in most components."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        random_projection,
    )

    rows = [(i, [1.0 if k == i else 0.0 for k in range(8)]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = random_projection(df, "vec_id", "embedding", out_dim=8).collect()
    # unit vector e_i projects to the sign column s(i, ·)/sqrt(m):
    # collect the 8 sign patterns and require them not all equal and
    # not strictly alternating by parity
    pat = {}
    for r in out:
        pat.setdefault(r["vec_id"], {})[r["rp_dim"]] = r["val"] > 0
    patterns = [tuple(pat[i][j] for j in range(8)) for i in range(8)]
    assert len(set(patterns)) > 2, patterns
    parity = [tuple((i + j) % 2 == 0 for j in range(8)) for i in range(8)]
    assert patterns != parity, "sign matrix degenerated to parity"


# ---------------------------------------------------------------- X47


def test_curation_manifest_stages_compose(spark):
    """The manifest contains only quality-passing, dedup-surviving
    docs, and per-source running totals respect the budget
    monotonically."""
    from poet_cloud_cost_etl_spark.queries import QUERIES

    out = QUERIES["curation_manifest"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        cums = [r["cum_tokens"] for r in rows]
        assert cums == sorted(cums)
        # running total is consistent with the per-row token counts
        total = 0
        for r in rows:
            total += r["n_tokens"]
            assert r["cum_tokens"] == total
