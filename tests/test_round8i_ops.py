"""Round-8i operator tests: X125 nDCG retrieval eval, X126
calibration/Brier, X127 leakage-safe k-fold."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_ndcg_discount_lut_matches_closed_form():
    """The precomputed LUT IS round(1e6/log2(r+1)) — the operator and
    the oracle each compute it from this form; drift here is drift
    everywhere."""
    from poet_cloud_cost_etl_spark.operators.similarity import (
        _ndcg_discount_ppm,
    )

    assert _ndcg_discount_ppm(5) == [
        round(1_000_000 / math.log2(r + 1)) for r in range(1, 6)
    ]
    assert _ndcg_discount_ppm(5)[0] == 1_000_000  # rank 1 undiscounted
    d = _ndcg_discount_ppm(10)
    assert all(a > b for a, b in zip(d, d[1:]))  # strictly decreasing


def test_ndcg_perfect_when_index_is_exact(spark):
    """Probing EVERY list makes the IVF candidate set the whole
    corpus, so retrieved order == exact order and nDCG == 1.0 for
    every query — the by-construction calibration point."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.similarity import (
        retrieval_ndcg_eval,
    )

    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    out = retrieval_ndcg_eval(
        q, e, "vec_id", "embedding", k=5, n_centroids=8, nprobe=8
    ).collect()
    assert len(out) == 4
    for r in out:
        assert r["ndcg"] == 1.0
        assert r["mean_ndcg"] == 1.0
        assert r["n_true"] == 5
        # perfect DCG equals the ideal: 5/log2(2)+4/log2(3)+... in ppm
        assert abs(r["dcg"] - 10.271927) < 1e-9


def test_ndcg_degrades_at_nprobe_1(spark):
    """nprobe=1 misses items outside the probed list: nDCG must stay
    in [0, 1] and fall below the exhaustive calibration point for at
    least one query (the regime the metric exists to measure)."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.similarity import (
        retrieval_ndcg_eval,
    )

    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 12)
    rows = retrieval_ndcg_eval(
        q, e, "vec_id", "embedding", k=5, n_centroids=8, nprobe=1
    ).collect()
    assert len(rows) == 12
    assert all(0.0 <= r["ndcg"] <= 1.0 for r in rows)
    assert any(r["ndcg"] < 1.0 for r in rows)
    mean = rows[0]["mean_ndcg"]
    # integer mean of the per-query ppm values
    want = sum(int(round(r["ndcg"] * 1_000_000)) for r in rows) // 12
    assert int(round(mean * 1_000_000)) == want


def test_calibration_brier_hand_computed(spark):
    """Four hand-built docs pinning the affine map, binning, Brier
    and ECE against integer arithmetic done by hand."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        calibration_brier,
    )

    # (logit, n_tokens, label) -> p_ppm = clamp(500000 + 1000*l div n)
    rows = [
        (1, 400, 2, 1),   # +1000*400 div 2 = +200000 -> 700000, bin 7
        (2, -300, 3, 0),  # -100000 -> 400000, bin 4
        (3, 9000, 4, 1),  # clamp -> 1000000, bin 9 (LEAST 999999)
        (4, -9000, 4, 0), # clamp -> 0, bin 0
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "logit", "n_tokens", "label"]
    )
    out = {r["bin"]: r for r in calibration_brier(df, "label").collect()}
    assert set(out) == {0, 4, 7, 9}
    assert out[7]["mean_pred"] == 0.7 and out[7]["frac_pos"] == 1.0
    assert out[4]["mean_pred"] == 0.4 and out[4]["frac_pos"] == 0.0
    assert out[9]["mean_pred"] == 1.0 and out[0]["mean_pred"] == 0.0
    # Brier: ((700000-1e6)^2 + 400000^2 + 0 + 0) // (4*1e6) ppm
    want_brier = (300_000**2 + 400_000**2) // (4 * 1_000_000)
    assert int(round(out[0]["brier"] * 1_000_000)) == want_brier
    # ECE: bins 7 and 4 each gap 3e5/4e5, bins 9/0 gap 0, all n=1
    want_ece = (300_000 + 400_000) // 4
    assert int(round(out[0]["ece"] * 1_000_000)) == want_ece
    # overall columns identical on every row
    assert len({r["brier"] for r in out.values()}) == 1
    assert len({r["ece"] for r in out.values()}) == 1


def test_calibration_brier_nondivisor_bins_stay_in_range(spark):
    """r8 advisor finding: when n_bins does not divide 1e6 (e.g. 7,
    width 142857, and 142857*7 = 999999 exactly) the unclamped bin id
    for a clamped p_ppm of 999999 is 7 — an out-of-range 8th bin.
    The LEAST(n_bins-1, ...) clamp folds it into the last bin."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        calibration_brier,
    )

    rows = [
        (1, 9000, 4, 1),   # clamp -> p_ppm 1000000 -> must land in bin 6
        (2, -9000, 4, 0),  # clamp -> 0 -> bin 0
        (3, 0, 1, 1),      # 500000 -> 500000 div 142857 = 3
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "logit", "n_tokens", "label"]
    )
    out = {r["bin"]: r for r in calibration_brier(df, "label", n_bins=7).collect()}
    assert set(out) == {0, 3, 6}
    assert all(0 <= b <= 6 for b in out)
    assert out[6]["mean_pred"] == 1.0


def test_group_kfold_never_splits_a_cluster(spark):
    """Every member of a cluster shares its fold (leakage-safety by
    construction); shares sum to ~1; singleton corpora leak nothing."""
    from poet_cloud_cost_etl_spark.operators.sampling import (
        group_kfold_plan,
        unit_hash,
    )

    clusters = spark.createDataFrame(
        [(i, i % 7) for i in range(200)], ["doc_id", "cluster_id"]
    )
    # direct invariant: fold is a function of cluster_id alone
    assigned = clusters.select(
        "cluster_id", (unit_hash("cluster_id") % 5).alias("fold")
    )
    assert assigned.groupBy("cluster_id").agg(
        F.countDistinct("fold").alias("nf")
    ).filter("nf > 1").count() == 0

    out = group_kfold_plan(clusters, "doc_id", "cluster_id", k=5).collect()
    assert sum(r["n_docs"] for r in out) == 200
    assert sum(r["n_clusters"] for r in out) == 7
    assert 0.99 <= sum(r["docs_share"] for r in out) <= 1.0

    # singletons: cluster_id == doc_id -> fold == naive, zero leaked
    singles = spark.createDataFrame(
        [(i, i) for i in range(50)], ["doc_id", "cluster_id"]
    )
    out2 = group_kfold_plan(singles, "doc_id", "cluster_id", k=5).collect()
    assert all(r["n_leaked_naive"] == 0 for r in out2)
