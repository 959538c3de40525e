"""Round-9 operator unit tests (X128/X134/X135/X136/X145 batch):
hand-computed fixtures pinning the exact-integer semantics each
operator promises, independent of the DuckDB parity sweep."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def test_term_burstiness_hand_computed(spark):
    """tf/df and top-doc concentration on a 3-doc corpus: 'the'
    appears in all docs (burstiness from repeats), 'x' is a one-doc
    burst."""
    from poet_cloud_cost_etl_spark.operators.textstats import term_burstiness

    docs = [
        (1, "the cat the dog"),
        (2, "the fish"),
        (3, "x x x x the"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r.term: r for r in term_burstiness(df, "doc_id", "text").collect()}
    t = out["the"]
    assert (t.df, t.tf, t.max_doc_tf) == (3, 4, 2)
    assert t.burstiness_e3 == (1000 * 4) // 3
    assert t.conc_ppm == (1_000_000 * 2) // 4
    x = out["x"]
    assert (x.df, x.tf, x.max_doc_tf) == (1, 4, 4)
    assert x.burstiness_e3 == 4000 and x.conc_ppm == 1_000_000
    # deterministic ordering: df desc then term asc
    rows = term_burstiness(df, "doc_id", "text").collect()
    assert rows[0].term == "the"


def test_winsorized_panel_exact_ranks(spark):
    """100 values 1..100 in one group: P1 = value at rank 1 = 1,
    P99 = value at rank 99 = 99, so only v=100 clips high; the
    winsorized mean is (sum(1..99) + 99) div 100."""
    from poet_cloud_cost_etl_spark.operators.textstats import winsorized_panel

    df = spark.createDataFrame(
        [("a", v, v) for v in range(1, 101)], ["grp", "v", "rid"]
    )
    row = winsorized_panel(df, "grp", "v", "rid").collect()[0]
    assert (row.p_lo, row.p_hi) == (1, 99)
    assert row.n_clipped_low == 0 and row.n_clipped_high == 1
    assert row.win_mean == (sum(range(1, 100)) + 99) // 100
    assert row.clipped_ppm == 1_000_000 * 1 // 100


def test_output_file_plan_ceil_divisions(spark):
    """3 rows of 40 KiB against a 64 KiB budget: 120 KiB -> 2 files,
    ceil(3/2)=2 rows per file; a single 100 KiB row is oversize."""
    from poet_cloud_cost_etl_spark.operators.aggregates import output_file_plan

    rows = [
        ("s1", "a" * 40_960),
        ("s1", "b" * 40_960),
        ("s1", "c" * 40_960),
        ("s2", "d" * 102_400),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {
        r.source: r
        for r in output_file_plan(
            df, "source", "text", target_file_bytes=65536
        ).collect()
    }
    s1 = out["s1"]
    assert s1.total_bytes == 3 * 40_960
    assert s1.n_files == (3 * 40_960 + 65535) // 65536 == 2
    assert s1.rows_per_file == 2
    s2 = out["s2"]
    assert s2.n_oversize_rows == 1 and s2.max_row_bytes == 102_400
    assert s2.n_files == 2  # ceil(102400/65536)


def test_zorder_locality_interleave_and_coverage(spark):
    """A 2x2 extreme grid (corners of the value space): each corner
    quantizes to cell 0 or 15 per dim, Morton keys land in distinct
    Z-ranges, and each range's envelope covers only its corner
    (coverage ppm well below 1e6)."""
    from poet_cloud_cost_etl_spark.operators.aggregates import zorder_locality

    rows = [(0, 0), (0, 150), (150, 0), (150, 150)]
    df = spark.createDataFrame(rows, ["d1", "d2"])
    out = zorder_locality(df, "d1", "d2", bits=4).collect()
    assert len(out) == 4  # four corners -> four distinct z-ranges
    assert {r.n_rows for r in out} == {1}
    for r in out:
        # single-point envelope: coverage = 1e6 * 1 / 151
        assert r.d1_coverage_ppm == 1_000_000 // 151
        assert r.d2_coverage_ppm == 1_000_000 // 151
    # Morton property: (0,0) is z-range 0; (150,150) -> cells (15,15)
    # -> zkey 255 -> range 15
    zr = sorted(r.zrange for r in out)
    assert zr[0] == 0 and zr[-1] == 15


def test_freshness_decay_staircase(spark):
    """Ages 0/30/60/630 days at half-life 30: weights 1e6, 5e5,
    25e4, 0 (>= 20 half-lives); weighted cents floor-divide
    per-row."""
    from poet_cloud_cost_etl_spark.operators.aggregates import (
        freshness_decay_weights,
    )

    base = datetime(2026, 1, 1)
    rows = [
        ("t", datetime(2026, 1, 1), 10.0),
        ("t", datetime(2025, 12, 2), 10.0),  # 30 days
        ("t", datetime(2025, 11, 2), 10.0),  # 60 days
        ("t", datetime(2024, 4, 11), 10.0),  # 630 days = 21 half-lives
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = freshness_decay_weights(
        df, "event_type", "ts", F.round(F.col("value") * 100, 0).cast("long")
    ).collect()[0]
    assert out.n_events == 4
    assert out.weight_sum_ppm == 1_000_000 + 500_000 + 250_000 + 0
    assert out.mean_weight_ppm == 1_750_000 // 4
    assert out.raw_cents == 4000
    assert out.weighted_cents == 1000 + 500 + 250 + 0


def test_centroid_silhouette_well_separated(spark):
    """Two tight orthogonal clusters: every vector's own-centroid
    distance is tiny vs the cross-centroid distance, so the
    silhouette is high and nothing is ambiguous."""
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        centroid_silhouette,
    )

    # centroid seeds are the two md5-smallest ids (the deterministic
    # X8 draw) — put them in DIFFERENT clusters by construction
    import hashlib

    ids = list(range(12))
    by_md5 = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    group_a = {by_md5[0]} | set(by_md5[2:7])
    rows = [
        (
            i,
            [1.0, 0.0, float(i) * 1e-4]
            if i in group_a
            else [0.0, 1.0, float(i) * 1e-4],
        )
        for i in ids
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = centroid_silhouette(df, "vec_id", "embedding", n_centroids=2)
    rows = out.collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_vectors == 6
        assert r.mean_sil_ppm > 900_000
        assert r.ambiguous_ppm == 0


def test_lloyd_step_improves_objective(spark):
    """On the fixture embeddings, one Lloyd round must not reduce
    the membership-weighted mean assignment similarity — checked as:
    overall weighted mean after >= before (k-means monotonicity,
    exact integers)."""
    from poet_cloud_cost_etl_spark.catalog import table as _t
    from poet_cloud_cost_etl_spark.operators.embeddings import (
        lloyd_step_diagnostics,
    )
    from tests.conftest import SF_SMALL

    emb = _t(spark, SF_SMALL, "embeddings")
    rows = lloyd_step_diagnostics(emb, "vec_id", "embedding").collect()
    assert len(rows) == 8
    before = sum(r.n_before * r.mean_sim_before_e6 for r in rows)
    n_b = sum(r.n_before for r in rows)
    after = sum(r.n_after * (r.mean_sim_after_e6 or 0) for r in rows)
    n_a = sum(r.n_after for r in rows)
    assert n_b == n_a  # every vector reassigned somewhere
    assert after / n_a >= before / n_b
    for r in rows:
        assert 0 <= r.cos_move_e6 <= 1_000_000


def test_threshold_calibration_monotone(spark):
    """Raising the threshold can only shrink predictions and true
    positives (monotone counts), and precision/recall stay in
    [0, 1e6] or NULL."""
    from poet_cloud_cost_etl_spark.catalog import table as _t
    from poet_cloud_cost_etl_spark.operators.similarity import (
        cosine_threshold_calibration,
    )
    from tests.conftest import SF_SMALL

    emb = _t(spark, SF_SMALL, "embeddings")
    rows = cosine_threshold_calibration(
        emb, "vec_id", "embedding", "label"
    ).collect()
    assert [r.thr_ppm for r in rows] == sorted(r.thr_ppm for r in rows)
    assert len({r.n_pairs for r in rows}) == 1  # same candidate set
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_pred <= lo.n_pred and hi.n_tp <= lo.n_tp
    for r in rows:
        for v in (r.precision_ppm, r.recall_ppm):
            assert v is None or 0 <= v <= 1_000_000


def test_perplexity_buckets_tercile_shape(spark):
    """Terciles partition each language's scoreable docs into three
    nearly-equal buckets with head >= middle >= tail mean scores."""
    from poet_cloud_cost_etl_spark.catalog import table as _t
    from poet_cloud_cost_etl_spark.operators.textstats import (
        perplexity_buckets,
    )
    from tests.conftest import SF_SMALL

    d = _t(spark, SF_SMALL, "documents")
    rows = perplexity_buckets(d, "doc_id", "text", "lang").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        assert (
            b["head"].mean_score_ppm
            >= b["middle"].mean_score_ppm
            >= b["tail"].mean_score_ppm
        )
        sizes = sorted(x.n_docs for x in b.values())
        assert sizes[-1] - sizes[0] <= 1  # near-equal terciles


def test_lang_mixture_flags_code_switch(spark):
    """A doc whose first 64-token chunk is English markers and second
    chunk is German markers must be flagged mixed; monolingual and
    marker-free docs must not."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        lang_mixture_panel,
    )

    en = ("the and of to is a " * 11).strip()  # 66 tokens -> 2 chunks
    de = "der die das und nicht " * 13
    mixed = en + " " + de
    mono = "the cat sat on the mat"
    nomark = "zzz qqq www"
    df = spark.createDataFrame(
        [(1, mixed, "s1"), (2, mono, "s1"), (3, nomark, "s2")],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r for r in lang_mixture_panel(df, "doc_id", "text", "source").collect()}
    assert out["s1"].n_mixed_docs == 1 and out["s1"].n_docs == 2
    assert out["s1"].mixed_ppm == 500_000
    assert out["s2"].n_mixed_docs == 0 and out["s2"].n_unknown_docs == 1
