"""Round-8f operator tests: X87+ (canary scan, priority sampling,
bucket-star clustering, k-anonymity audit, classifier agreement)."""

from __future__ import annotations


def test_canary_scan_counts_and_clean_rows(spark):
    """X87: occurrence accounting via the length-difference identity,
    non-overlapping semantics, and zero-hit canaries keeping rows."""
    from poet_cloud_cost_etl_spark.operators.textstats import canary_scan

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # "aa" appears twice non-overlapping
            (2, "xx aa yy aa"),   # twice more, second hit doc
            (3, "nothing here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["canary"]: r
        for r in canary_scan(df, "doc_id", "text", ["aa", "absent!"]).collect()
    }
    assert out["aa"]["n_docs"] == 2
    assert out["aa"]["n_occurrences"] == 4
    assert out["aa"]["first_doc_id"] == 1
    # planted canary with zero hits still reports a clean-audit row
    assert out["absent!"]["n_docs"] == 0
    assert out["absent!"]["n_occurrences"] == 0
    assert out["absent!"]["first_doc_id"] is None


def test_canary_scan_python_reference(spark):
    """X87 vs an independent str.count reference on fixture docs."""
    from poet_cloud_cost_etl_spark.operators.textstats import canary_scan
    from poet_cloud_cost_etl_spark.catalog import table

    d = table(spark, "/root/testdata/sf0.001", "documents")
    cans = ["table table", "zzz-canary"]
    got = {
        r["canary"]: (r["n_docs"], r["n_occurrences"])
        for r in canary_scan(d, "doc_id", "text", cans).collect()
    }
    rows = d.select("doc_id", "text").collect()
    for c in cans:
        nd = sum(1 for r in rows if c in r["text"])
        no = sum(r["text"].count(c) for r in rows)
        assert got[c] == (nd, no)


def test_priority_sample_hashlib_reference(spark):
    """X88 vs an independent hashlib/md5 Python reference: the full
    (sample, priority, threshold, estimate) output must be equal."""
    import hashlib

    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.sampling import priority_sample

    d = table(spark, "/root/testdata/sf0.001", "documents")
    k = 8
    got = sorted(
        (r["doc_id"], r["weight"], r["priority"], r["threshold"], r["est_weight"])
        for r in priority_sample(d, "doc_id", "n_chars", k).collect()
    )
    rows = d.select("doc_id", "n_chars").collect()
    ref = []
    for r in rows:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        q = (r["n_chars"] * 4294967296) // (h + 1)
        ref.append((q, r["doc_id"], r["n_chars"]))
    ref.sort(key=lambda t: (-t[0], t[1]))
    tau = ref[k][0] if len(ref) > k else 0
    expect = sorted(
        (doc, w, q, tau, max(w, tau)) for q, doc, w in ref[:k]
    )
    assert got == expect


def test_priority_sample_small_corpus_exact(spark):
    """X88: when |corpus| <= k the threshold is 0 and the HT
    estimates are the exact weights (the estimator degenerates to
    the identity — zero variance, as the paper requires)."""
    from poet_cloud_cost_etl_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], ["doc_id", "w"]
    )
    out = priority_sample(df, "doc_id", "w", 5).collect()
    assert len(out) == 3
    assert all(r["threshold"] == 0 for r in out)
    assert sorted((r["doc_id"], r["est_weight"]) for r in out) == [
        (1, 10), (2, 20), (3, 30)
    ]


def test_priority_sample_ht_sum_sane(spark):
    """X88: the HT subset-sum estimate of total chars lands within a
    loose factor of the exact total (single-draw smoke, not a
    distributional claim)."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.sampling import priority_sample
    import pyspark.sql.functions as F

    d = table(spark, "/root/testdata/sf0.01", "documents")
    est = (
        priority_sample(d, "doc_id", "n_chars", 64)
        .agg(F.sum("est_weight")).collect()[0][0]
    )
    exact = d.agg(F.sum("n_chars")).collect()[0][0]
    assert 0.5 * exact <= est <= 2.0 * exact


def test_hyperedge_components_equals_clique_expansion(spark):
    """X89: star reduction of group hyperedges yields the SAME
    components as expanding each group into all in-group pairs."""
    from poet_cloud_cost_etl_spark.operators.graph import (
        connected_components,
        hyperedge_components,
    )
    import pyspark.sql.functions as F

    # groups: {1,2,3}, {3,4}, {5,6}, {7} — components {1,2,3,4},{5,6},{7},{8 isolated}
    members = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 3), ("g2", 3), ("g2", 4),
         ("g3", 5), ("g3", 6), ("g4", 7)],
        ["grp", "m"],
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], ["id"])
    star = {
        (r["id"], r["cluster_id"])
        for r in hyperedge_components(
            members, ["grp"], "m", nodes=nodes, id_col="id"
        ).collect()
    }
    # clique expansion of the same groups
    pairs = (
        members.alias("a")
        .join(members.alias("b"), "grp")
        .filter(F.col("a.m") < F.col("b.m"))
        .select(F.col("a.m").alias("src"), F.col("b.m").alias("dst"))
        .distinct()
    )
    clique = {
        (r["id"], r["cluster_id"])
        for r in connected_components(nodes, pairs, id_col="id").collect()
    }
    assert star == clique
    assert star == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5), (7, 7), (8, 8)}


def test_hyperedge_components_fixture_matches_pair_pipeline(spark):
    """X89 on fixture LSH buckets == CC over X2c candidate pairs."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.dedup import (
        doc_shingles,
        lsh_band_membership,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from poet_cloud_cost_etl_spark.operators.graph import (
        connected_components,
        hyperedge_components,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents")
    sig = minhash_signatures(doc_shingles(d, "doc_id", "text"), "doc_id", 8)
    star = hyperedge_components(
        lsh_band_membership(sig, "doc_id", 8, 4),
        ["band_idx", "band_val"],
        "doc_id",
        nodes=d.select("doc_id"),
        id_col="doc_id",
    )
    pairs = lsh_candidate_pairs(sig, "doc_id", 8, 4)
    via_pairs = connected_components(
        d.select("doc_id"),
        pairs.withColumnRenamed("doc_a", "src").withColumnRenamed("doc_b", "dst"),
        id_col="doc_id",
    )
    assert sorted(map(tuple, star.collect())) == sorted(
        map(tuple, via_pairs.collect())
    )


def test_k_anonymity_audit_threshold_law(spark):
    """X90: combos below k are flagged, at/above k are anonymous."""
    from poet_cloud_cost_etl_spark.operators.scrub import k_anonymity_audit

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 3,
        ["t", "z"],
    )
    out = {
        (r["t"], r["z"]): (r["n_rows"], r["anonymous"])
        for r in k_anonymity_audit(df, ["t", "z"], 3).collect()
    }
    assert out == {
        ("a", 1): (5, True),
        ("a", 2): (2, False),
        ("b", 1): (3, True),
    }


def test_agreement_kappa_hand_computed(spark):
    """X91 vs a hand-computed 2x2 kappa: cells a=20 (1,1), b=5 (1,0),
    c=10 (0,1), d=15 (0,0): po=0.5833..., pe=0.5, kappa=0.166667."""
    from poet_cloud_cost_etl_spark.operators.textstats import agreement_kappa

    rows = (
        [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
    )
    df = spark.createDataFrame(rows, ["pred", "label"])
    r = agreement_kappa(df, "pred", "label").collect()[0]
    # N=50, trace=35, pe_num = r1*c1 + r0*c0 = 25*30 + 25*20 = 1250
    # kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4
    assert r["n"] == 50
    assert r["n_classes"] == 2
    assert r["accuracy_ppm"] == 700000
    assert r["chance_ppm"] == 500000
    assert r["kappa"] == 0.4


def test_agreement_kappa_perfect_and_degenerate(spark):
    """X91: identical raters give kappa=1; both-constant raters give
    NULL (denominator 0), not a fabricated value."""
    from poet_cloud_cost_etl_spark.operators.textstats import agreement_kappa

    same = spark.createDataFrame(
        [(1, 1), (0, 0), (1, 1), (2, 2)], ["p", "l"]
    )
    assert agreement_kappa(same, "p", "l").collect()[0]["kappa"] == 1.0
    const = spark.createDataFrame([(1, 1), (1, 1)], ["p", "l"])
    assert agreement_kappa(const, "p", "l").collect()[0]["kappa"] is None


def test_agreement_kappa_sklearn_style_reference(spark):
    """X91 on fixture scores vs an independent Python reference."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.textstats import (
        agreement_kappa,
        hashed_logit_scores,
    )
    import pyspark.sql.functions as F

    d = table(spark, "/root/testdata/sf0.001", "documents")
    scored = hashed_logit_scores(d, "doc_id", "text").join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("label")),
        "doc_id",
    ).select(F.col("pred_keep").cast("int").alias("pred"), "label")
    got = agreement_kappa(scored, "pred", "label").collect()[0]
    pairs = [(r["pred"], r["label"]) for r in scored.collect()]
    n = len(pairs)
    trace = sum(1 for p, l in pairs if p == l)
    classes = {p for p, _ in pairs} | {l for _, l in pairs}
    pe_num = sum(
        sum(1 for p, _ in pairs if p == c) * sum(1 for _, l in pairs if l == c)
        for c in classes
    )
    assert got["n"] == n
    assert got["accuracy_ppm"] == 1_000_000 * trace // n
    expect_kappa = round((n * trace - pe_num) / (n * n - pe_num), 6)
    assert got["kappa"] == expect_kappa


def test_unimax_allocation_water_fill_laws(spark):
    """X92: hand-computed water-fill — saturation prefix, even split
    of the remainder, exact budget conservation."""
    from poet_cloud_cost_etl_spark.operators.sampling import unimax_allocation

    # tokens: a=10, b=100, c=100  (epoch_cap=2 -> caps 20, 200, 200)
    rows = (
        [("a", 10)] + [("b", 100)] + [("c", 100)]
    )
    df = spark.createDataFrame(rows, ["src", "n"])
    out = {
        r["src"]: r
        for r in unimax_allocation(df, "src", "n", budget=240, epoch_cap=2).collect()
    }
    # level: a saturates (20*3+0=60 <= 240); b,c split 220 -> 110 each
    assert out["a"]["allocation"] == 20 and out["a"]["saturated"]
    assert out["b"]["allocation"] == 110 and not out["b"]["saturated"]
    assert out["c"]["allocation"] == 110 and not out["c"]["saturated"]
    assert sum(r["allocation"] for r in out.values()) == 240
    # epochs_ppm: a ran 2.0 epochs (cap), b/c 1.1
    assert out["a"]["epochs_ppm"] == 2_000_000
    assert out["b"]["epochs_ppm"] == 1_100_000


def test_unimax_allocation_remainder_and_overbudget(spark):
    """X92: remainder goes +1 to the first sources in pinned order;
    an unmeetable budget saturates everyone at capacity."""
    from poet_cloud_cost_etl_spark.operators.sampling import unimax_allocation

    df = spark.createDataFrame(
        [("a", 50), ("b", 50), ("c", 50)], ["src", "n"]
    )
    # budget 100, caps 100 each: nobody saturates (100*3 > 100);
    # 100 // 3 = 33 rem 1 -> first source in (cap, name) order gets 34
    out = {
        r["src"]: r["allocation"]
        for r in unimax_allocation(df, "src", "n", budget=100, epoch_cap=2).collect()
    }
    assert out == {"a": 34, "b": 33, "c": 33}
    # unmeetable: budget 1000 > total capacity 300 -> all at cap
    out2 = unimax_allocation(df, "src", "n", budget=1000, epoch_cap=2).collect()
    assert all(r["saturated"] for r in out2)
    assert sum(r["allocation"] for r in out2) == 300


def test_cluster_label_purity_hand_computed(spark):
    """X93: majority tie broken toward the LOWEST label string; ppm
    floor division."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        cluster_label_purity,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "x"), (2, "y"), (3, "z")],
        ["cl", "lab"],
    )
    out = {r["cluster"]: r for r in cluster_label_purity(df, "cl", "lab").collect()}
    assert out[1]["majority_label"] == "a"
    assert out[1]["purity_ppm"] == 666666
    assert out[1]["n_labels"] == 2
    # tie 1-1 in cluster 2 -> lowest label string wins
    assert out[2]["majority_label"] == "x"
    assert out[2]["purity_ppm"] == 500000
    assert out[3]["purity_ppm"] == 1_000_000


def test_cluster_hops_chain_and_star(spark):
    """X94: a 4-chain rooted at its min has hops 0,1,2,3 (radius 3);
    a star rooted at its min has radius 1; singleton hops 0."""
    from poet_cloud_cost_etl_spark.operators.graph import cluster_hops

    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], ["id"])
    edges = spark.createDataFrame(
        # chain 1-2-3-4, star 5-{6,7}, singleton 8
        [(1, 2), (2, 3), (3, 4), (5, 6), (5, 7)], ["src", "dst"]
    )
    out = {r["id"]: (r["cluster_id"], r["hops"]) for r in
           cluster_hops(nodes, edges, id_col="id").collect()}
    assert out == {
        1: (1, 0), 2: (1, 1), 3: (1, 2), 4: (1, 3),
        5: (5, 0), 6: (5, 1), 7: (5, 1), 8: (8, 0),
    }


def test_robust_outlier_panel_hand_computed(spark):
    """X95: lower-median law, MAD law, the 3-robust-sigma cut, and
    the degenerate MAD=0 convention (any deviation flags)."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        robust_outlier_panel,
    )

    rows = (
        # group g: values 1..9 plus a 1000 spike -> median(10 vals,
        # lower)=5, deviations sorted: 0,1,1,2,2,3,3,4,4,995 ->
        # MAD=lower median=2; cut: 10000*ad > 44478*2=88956 -> ad>8.9
        [("g", v, i) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
        # group h: constant 7s plus one 8 -> median 7, MAD 0 ->
        # the 8 flags (any deviation beats 0)
        + [("h", 7, 100), ("h", 7, 101), ("h", 7, 102), ("h", 8, 103)]
    )
    df = spark.createDataFrame(rows, ["src", "val", "rid"])
    out = {r["src"]: r for r in
           robust_outlier_panel(df, "src", "val", "rid").collect()}
    assert out["g"]["median"] == 5 and out["g"]["mad"] == 2
    assert out["g"]["n_outliers"] == 1  # only the 1000 spike
    assert out["h"]["median"] == 7 and out["h"]["mad"] == 0
    assert out["h"]["n_outliers"] == 1 and out["h"]["n_rows"] == 4
