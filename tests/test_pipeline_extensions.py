"""Round-2 training-data pipeline extensions: connected-components
clustering, IVF ANN, deterministic sampling, token-budget packing.

Oracle parity at sf0.01 is covered by test_oracle_parity.py; these
tests pin the operator-level contracts the oracle can't see
(convergence behavior, stability under repartitioning, recall
relationships).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.operators.graph import connected_components
from poet_cloud_cost_etl_spark.operators.packing import pack_by_token_budget
from poet_cloud_cost_etl_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from poet_cloud_cost_etl_spark.operators.similarity import brute_force_topk, ivf_topk

from conftest import SF_MEDIUM, SF_SMALL


def test_cc_chain_needs_iterations(spark):
    """A 6-node path graph has diameter 5 — the min label must flow
    across multiple propagation rounds, not just one."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(5)], ["src", "dst"])
    got = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {i: 0 for i in range(6)}


def test_cc_components_and_singletons(spark):
    """Two components + an isolated node; direction of input edges is
    irrelevant (symmetrized internally)."""
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], ["id"])
    edges = spark.createDataFrame([(2, 1), (3, 2), (11, 10)], ["src", "dst"])
    got = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing every list (nprobe = n_centroids) makes IVF exact —
    the approximation comes only from unprobed lists."""
    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    ivf = ivf_topk(q, e, "vec_id", "embedding", k=3, n_centroids=4, nprobe=4)
    bf = brute_force_topk(q, e, "vec_id", "embedding", k=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, bf.collect()))


def test_ivf_partial_probe_is_subset(spark):
    """With nprobe < n_centroids, every returned neighbor must still
    be a true candidate (appears in brute-force scoring with the same
    cosine) — IVF trades recall, never correctness of scores."""
    e = table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    ivf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in ivf_topk(q, e, "vec_id", "embedding", k=3, n_centroids=4, nprobe=1).collect()
    }
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in brute_force_topk(q, e, "vec_id", "embedding", k=50).collect()
    }
    assert ivf, "IVF returned nothing"
    for pair, sim in ivf.items():
        assert bf[pair] == sim


def test_ivf_lloyd_refinement_recall(spark):
    """Lloyd-refined centroids (refine_iters=2) must not lose recall
    vs the raw md5 seed draw, measured against brute-force truth at
    sf0.01 (500×64 vectors, 20 queries). Everything is deterministic
    (md5 seed + scaled-integer means), so the comparison is stable."""
    e = table(spark, SF_MEDIUM, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(q, e, "vec_id", "embedding", k=5).collect()
    }

    def recall(refine_iters):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                q, e, "vec_id", "embedding", k=5, n_centroids=8, nprobe=2,
                refine_iters=refine_iters,
            ).collect()
        }
        return len(got & truth) / len(truth)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0, f"refinement lost recall: {r2} < {r0}"
    # the synthetic embeddings are unclustered uniform noise, so
    # probing 2/8 lists bounds recall well under 1.0 — the floor
    # guards against a broken index (near-zero recall), the r2>=r0
    # assertion above is the real refinement check
    assert r2 >= 0.3, f"refined recall unreasonably low: {r2}"


def test_ivf_recall_monotone_in_nprobe(spark):
    """The recall/shuffle trade IVF claims, measured: recall vs
    brute-force truth must be non-decreasing in nprobe (more lists
    probed → superset candidate pool), and probing ALL lists
    (nprobe == n_centroids) is exhaustive — recall exactly 1.0.
    Deterministic end-to-end (md5 seed, scaled-integer means)."""
    e = table(spark, SF_MEDIUM, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(q, e, "vec_id", "embedding", k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                q, e, "vec_id", "embedding", k=5, n_centroids=8, nprobe=nprobe
            ).collect()
        }
        return len(got & truth) / len(truth)

    recalls = [recall(p) for p in (1, 2, 4, 8)]
    assert recalls == sorted(recalls), f"recall not monotone in nprobe: {recalls}"
    assert recalls[-1] == 1.0, f"nprobe=n_centroids must be exhaustive: {recalls}"


def test_ivf_refined_empty_cluster_keeps_centroid(spark):
    """A centroid whose list goes empty after reassignment must keep
    its previous vector (not drop to k-1 centroids)."""
    from poet_cloud_cost_etl_spark.operators.similarity import ivf_centroids

    e = table(spark, SF_SMALL, "embeddings")
    for it in (1, 2):
        cents = ivf_centroids(e, "vec_id", "embedding", k=8, refine_iters=it)
        rows = cents.collect()
        assert len(rows) == 8
        assert all(r.centroid_vec is not None and len(r.centroid_vec) == 64 for r in rows)


def test_sample_stable_under_repartition(spark):
    """The hash sample is a function of the key alone — identical row
    set for any physical layout (the property df.sample lacks)."""
    d = table(spark, SF_SMALL, "documents")
    a = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(d.repartition(13), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < d.count()


def test_stratified_quota(spark):
    d = table(spark, SF_SMALL, "documents")
    out = stratified_sample(d, "lang", "doc_id", 5)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_lang = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {lang: min(5, n) for lang, n in per_lang.items()}


def test_packing_invariants(spark):
    """Within a shard: pack ids are contiguous from 0, every pack but
    the last STARTS under budget (streaming-chunker semantics), and
    the layout is repartition-invariant."""
    d = table(spark, SF_SMALL, "documents")
    tc = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    out = pack_by_token_budget(tc, "doc_id", "n_tokens", budget=500, n_shards=4)
    rows = out.collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        packs = sorted({r.pack_id for r in shard_rows})
        assert packs == list(range(len(packs)))
        prefix = 0
        for r in shard_rows:
            assert r.pack_id == prefix // 500
            prefix += r.n_tokens
    again = pack_by_token_budget(
        tc.repartition(7), "doc_id", "n_tokens", budget=500, n_shards=4
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_scrub_patterns(spark):
    """Each PII class redacts independently; clean text is untouched."""
    from poet_cloud_cost_etl_spark.operators.scrub import clean_documents

    rows = [
        (1, "mail me at a.b-c_9@ex-ample.co.uk please"),
        (2, "see https://x.yz/path?q=1#f and http://plain.io"),
        (3, "call 555-123-4567 or 800.555.0199 now"),
        (4, "<div class='x'>hello <b>world</b></div>"),
        (5, "nothing to scrub here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.clean_text for r in clean_documents(df, "doc_id", "text").collect()}
    assert got[1] == "mail me at <EMAIL> please"
    assert got[2] == "see <URL> and <URL>"
    assert got[3] == "call <PHONE> or <PHONE> now"
    assert got[4] == "hello world"
    assert got[5] == "nothing to scrub here"


def test_unit_hash_matches_md5_spec(spark):
    """unit_hash must equal int(md5(str(key)).hexdigest()[:8], 16) —
    the documented, engine-portable definition (any component that
    wants to reproduce a sample outside Spark depends on this)."""
    import hashlib

    from poet_cloud_cost_etl_spark.operators.sampling import unit_hash

    keys = [0, 1, 7, 499, 10**12, -3]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r.k: r.h for r in df.select("k", unit_hash("k").alias("h")).collect()}
    for k in keys:
        want = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        assert got[k] == want, k


def test_orc_round_trip(spark, tmp_path):
    """Format breadth: ORC round-trips the normalized costs frame with
    identical values (both columnar formats share the pushdown and
    pruning story)."""
    from poet_cloud_cost_etl_spark.queries import events_as_costs
    from poet_cloud_cost_etl_spark.sources.csv_json import read_orc, write_orc

    costs = events_as_costs(spark, SF_SMALL).drop("sync_timestamp")
    path = str(tmp_path / "costs_orc")
    write_orc(costs, path, partition_by=["cloud_provider"])
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(costs.columns)
    a = costs.agg(F.count("*"), F.sum((F.col("cost") * 100).cast("long"))).collect()[0]
    b = back.agg(F.count("*"), F.sum((F.col("cost") * 100).cast("long"))).collect()[0]
    assert tuple(a) == tuple(b)


def test_cc_raises_when_unconverged(spark):
    """Unconverged labels are wrong labels — the operator must refuse
    to return them."""
    import pytest

    nodes = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(7)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not confirm convergence"):
        connected_components(nodes, edges, max_iter=2)


def test_lsh_max_bucket_caps_hot_buckets(spark):
    """max_bucket drops over-full signature buckets (the skew guard):
    with a cap of 1 no pairs survive, without it duplicates pair up."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "identical boilerplate text repeated many times over") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = minhash_signatures(doc_shingles(df, "doc_id", "text"), "doc_id")
    assert lsh_candidate_pairs(sig, "doc_id").count() == 15  # 6C2
    assert lsh_candidate_pairs(sig, "doc_id", max_bucket=1).count() == 0
