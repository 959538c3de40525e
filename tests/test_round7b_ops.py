"""Unit-level contracts for the late-round-7 extension operators
(X28 semantic dedup, X29 source-overlap matrix, X30 quality-gate
ablation, X31 leakage-safe split, X32 best-of-cluster survivorship),
beyond the oracle parity sweep: algebraic invariants on synthetic
inputs where the expected value is known by construction."""

from __future__ import annotations

from poet_cloud_cost_etl_spark.operators.dedup import source_overlap
from poet_cloud_cost_etl_spark.operators.similarity import semantic_dedup
from poet_cloud_cost_etl_spark.operators.textstats import quality_ablation


def test_semantic_dedup_identical_vectors_lowest_id_survives(spark):
    """Three copies of the same vector → the lowest id is kept, the
    other two are duplicates; an orthogonal vector is never a dup.
    All three copies must share a cluster (identical vectors score
    identically against every centroid, same tie-break)."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            df, "vec_id", "embedding", n_centroids=2, threshold=0.95
        ).collect()
    }
    assert len(out) == 4  # one row per vector, no fanout from pairs
    assert not out[1].is_dup
    assert out[2].is_dup and out[3].is_dup
    assert out[2].centroid_id == out[1].centroid_id
    assert not out[4].is_dup


def test_semantic_dedup_threshold_boundary(spark):
    """cos(a, b) = 0.6 exactly: dup at threshold 0.6 (>= semantics),
    kept at 0.61."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    at = {
        r.vec_id: r.is_dup
        for r in semantic_dedup(
            df, "vec_id", "embedding", n_centroids=1, threshold=0.6
        ).collect()
    }
    above = {
        r.vec_id: r.is_dup
        for r in semantic_dedup(
            df, "vec_id", "embedding", n_centroids=1, threshold=0.61
        ).collect()
    }
    assert at == {1: False, 2: True}
    assert above == {1: False, 2: False}


def test_source_overlap_known_jaccard_and_zero_pair(spark):
    """srcA = shingles {x y z, y z w} (from 'x y z w'), srcB shares
    exactly one of them, srcC is disjoint. J(A,B) = 1/4 (|A|=3 from a
    5-token doc), and the (A,C) pair appears with n_common = 0."""
    rows = [
        (1, "x y z w q", "A"),  # shingles: xyz yzw zwq
        (2, "x y z a b", "B"),  # shingles: xyz yza zab
        (3, "m n o p", "C"),  # shingles: mno nop
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        (r.grp_a, r.grp_b): r
        for r in source_overlap(df, "doc_id", "text", "source").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_common) == (3, 3, 1)
    assert ab.jaccard_ppm == 0.2  # 1_000_000 // 5 exactly
    ac = out[("A", "C")]
    assert ac.n_common == 0 and ac.jaccard_ppm == 0.0


def test_source_overlap_counts_distinct_shingles_once(spark):
    """A shingle repeated in many docs of one source counts once in
    the set — overlap is set-Jaccard, not occurrence-weighted."""
    rows = [
        (1, "x y z", "A"),
        (2, "x y z", "A"),  # same shingle again, same source
        (3, "x y z", "B"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    (row,) = source_overlap(df, "doc_id", "text", "source").collect()
    assert (row.n_a, row.n_b, row.n_common) == (1, 1, 1)
    assert row.jaccard_ppm == 1.0


def test_quality_ablation_sole_failure_attribution(spark):
    """One doc passes every rule; one fails ONLY the length band (too
    short but healthy ratios). The length_band row must show the sole
    failure, every other rule must show zero failures, and ANY must
    equal 1."""
    good = " ".join(
        ["the"] * 5 + [f"word{i}" for i in range(55)]
    )  # 60 words, stopwords 8%, mean len ~5.5, all distinct
    short = "the alpha bravo charlie delta echos"  # 6 words, ratios fine
    df = spark.createDataFrame(
        [(1, good), (2, short)], ["doc_id", "text"]
    )
    out = {r.rule: r for r in quality_ablation(df, "doc_id", "text").collect()}
    assert set(out) == {
        "length_band",
        "stopword_ratio",
        "mean_word_len",
        "dup_ratio",
        "ANY",
    }
    assert out["length_band"].n_fail == 1
    assert out["length_band"].n_sole_fail == 1
    for rule in ("stopword_ratio", "mean_word_len", "dup_ratio"):
        assert out[rule].n_fail == 0 and out[rule].n_sole_fail == 0
    assert out["ANY"].n_fail == 1 and out["ANY"].n_sole_fail is None
    assert out["length_band"].removal_ppm == 0.5  # 1 of 2 docs


def test_quality_ablation_sole_counts_never_exceed_fails(spark):
    """On the real fixture corpus: n_sole_fail <= n_fail per rule,
    ANY <= sum of per-rule fails, and ANY >= max per-rule fail."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.rule: r for r in quality_ablation(df, "doc_id", "text").collect()}
    per_rule = [rows[r] for r in rows if r != "ANY"]
    for r in per_rule:
        assert r.n_sole_fail <= r.n_fail
    assert rows["ANY"].n_fail <= sum(r.n_fail for r in per_rule)
    assert rows["ANY"].n_fail >= max(r.n_fail for r in per_rule)


def test_leakage_safe_split_same_cluster_same_split(spark):
    """All members of a cluster get the cluster's split, and n_leaked
    counts exactly the members whose own-id hash disagrees. Checked
    against a direct per-doc recomputation."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.sampling import (
        leakage_safe_split,
        split_assign,
        unit_hash,
    )

    rows = [(i, i // 5) for i in range(100)]  # 20 clusters of 5
    df = spark.createDataFrame(rows, ["doc_id", "cluster_id"])
    out = {r.split: r for r in leakage_safe_split(df, "doc_id", "cluster_id").collect()}
    assert sum(r.n_docs for r in out.values()) == 100
    assert sum(r.n_clusters for r in out.values()) == 20
    # independent recomputation of the leak count
    both = split_assign(df, "cluster_id").withColumn(
        "naive_bucket", unit_hash("doc_id") % 100
    )
    expected_leaked = both.filter(
        (
            F.when(F.col("naive_bucket") < 80, "train")
            .when(F.col("naive_bucket") < 90, "val")
            .otherwise("test")
        )
        != F.col("split")
    ).count()
    assert sum(r.n_leaked for r in out.values()) == expected_leaked
    # every cluster is entirely inside one split by construction:
    # 20 clusters of 5 -> cluster counts * 5 == doc counts
    for r in out.values():
        assert r.n_docs == 5 * r.n_clusters


def test_best_of_cluster_picks_highest_score_then_lowest_id(spark):
    from poet_cloud_cost_etl_spark.operators.dedup import best_of_cluster

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], ["doc_id", "cluster_id"]
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.75), (3, 0.75), (4, 0.25), (5, 0.25)],
        ["doc_id", "quality_score"],
    )
    out = {
        r.cluster_id: r
        for r in best_of_cluster(
            clusters, scores, "doc_id", "cluster_id", "quality_score"
        ).collect()
    }
    assert out[1].best_doc_id == 2  # highest score wins; tie -> lower id
    assert out[1].n_docs == 3 and out[1].best_score == 0.75
    assert out[4].best_doc_id == 4  # pure tie -> lowest id
    assert out[4].n_docs == 2
