"""Unit-level contracts for the round-7 extension operators (X21
chunking, X22 vocab coverage, X23 incremental dedup, X25 template
clusters), beyond the oracle parity sweep: algebraic invariants on
synthetic inputs where the expected value is known by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.operators.dedup import (
    incremental_dedup,
    template_prefix_clusters,
)
from poet_cloud_cost_etl_spark.operators.packing import chunk_documents
from poet_cloud_cost_etl_spark.operators.textstats import vocab_coverage


def _words(n, start=0):
    return " ".join(f"w{i}" for i in range(start, start + n))


def test_chunking_covers_every_token_with_exact_overlap(spark):
    """130 tokens, chunk 64 / overlap 16 (stride 48) → starts at 0,
    48, 96; sizes 64, 64, 34; consecutive chunks share exactly 16
    tokens; concatenating de-overlapped chunks rebuilds the doc."""
    df = spark.createDataFrame([(1, _words(130))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", 64, 16).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_start, r.n_tokens) for r in rows] == [
        (0, 64),
        (48, 64),
        (96, 34),
    ]
    toks = [r.chunk_text.split(" ") for r in rows]
    assert toks[0][48:] == toks[1][:16]  # exact 16-token overlap
    rebuilt = toks[0] + toks[1][16:] + toks[2][16:]
    assert rebuilt == _words(130).split(" ")


def test_chunking_short_doc_single_chunk_and_empty_dropped(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "!!! ...")], ["doc_id", "text"]
    )
    rows = chunk_documents(df, "doc_id", "text", 64, 16).collect()
    assert len(rows) == 1  # doc 2 canonicalizes to zero tokens
    assert rows[0].doc_id == 1 and rows[0].chunk_text == "alpha beta"
    assert rows[0].n_tokens == 2 and rows[0].chunk_start == 0


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", 64, 64)


def test_vocab_coverage_exact_on_known_distribution(spark):
    """Corpus = 60x'a' 30x'b' 10x'c': top-1 covers 60%, top-2 90%,
    top-3 100%; unk_ppm is the exact integer-division complement."""
    docs = [(1, " ".join(["a"] * 60 + ["b"] * 30 + ["c"] * 10))]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        r.top_k: r
        for r in vocab_coverage(df, "doc_id", "text", [1, 2, 3]).collect()
    }
    assert rows[1].vocab_size == 3 and rows[1].total_tokens == 100
    assert rows[1].covered_tokens == 60 and rows[1].unk_ppm == 0.4
    assert rows[2].covered_tokens == 90 and rows[2].unk_ppm == 0.1
    assert rows[3].covered_tokens == 100 and rows[3].unk_ppm == 0.0


def test_vocab_coverage_rank_ties_break_lexicographically(spark):
    """Equal-count tokens rank by token asc — 'a' beats 'b' at K=1
    regardless of partitioning."""
    df = spark.createDataFrame([(1, "b a"), (2, "a b")], ["doc_id", "text"])
    r = {x.top_k: x for x in vocab_coverage(df, "doc_id", "text", [1]).collect()}
    assert r[1].covered_tokens == 2  # the two 'a' occurrences


def test_incremental_dedup_classifies_all_three_ways(spark):
    """Batch doc matching corpus → dup_corpus; two new identical batch
    docs → first kept, second dup_batch; unique doc → kept.
    Fingerprint canonicalization (case/punct) must not split dups."""
    corpus = spark.createDataFrame(
        [(1, "Existing Doc!"), (2, "other corpus text")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, "existing doc"),  # canonical dup of corpus 1
            (11, "brand new text"),
            (12, "Brand NEW text..."),  # canonical dup of 11 (larger id)
            (13, "unique snowflake"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.status
        for r in incremental_dedup(batch, corpus, "doc_id", "text").collect()
    }
    assert got == {
        10: "dup_corpus",
        11: "kept",
        12: "dup_batch",
        13: "kept",
    }


def test_template_clusters_finds_shared_prefixes_only(spark):
    """Three docs share the first-3-token prefix, two share another,
    one is unique → exactly two clusters, largest first, exemplar =
    min doc_id."""
    df = spark.createDataFrame(
        [
            (5, "dear valued customer please read"),
            (3, "dear valued customer your account"),
            (9, "dear valued customer final notice"),
            (7, "terms of service apply here"),
            (8, "terms of service were updated"),
            (1, "completely unique document text"),
        ],
        ["doc_id", "text"],
    )
    rows = template_prefix_clusters(df, "doc_id", "text", 3).collect()
    assert [(r.n_docs, r.exemplar_id) for r in rows] == [(3, 3), (2, 7)]


def test_chunking_plan_is_narrow(spark):
    """X21 scale contract: chunking must be a zero-shuffle narrow map
    (tokenize → sequence → explode → slice in the scan stage)."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.plans import explain as X
    from tests.conftest import SF_SMALL

    d = table(spark, SF_SMALL, "documents")
    q = chunk_documents(d, "doc_id", "text", 64, 16)
    assert X.count_exchanges(q) == 0, X.physical_plan(q)


def test_shingle_novelty_attribution_by_min_id(spark):
    """X24: the doc introducing a shingle (min id) gets the credit;
    an exact restatement under a larger id scores 0; a fresh doc
    scores 1. ppm derives from integer division."""
    from poet_cloud_cost_etl_spark.operators.dedup import shingle_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # introduces everything
            (2, "alpha beta gamma delta"),       # restates doc 1 -> 0
            (3, "epsilon zeta eta theta iota"),  # all fresh -> 1
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in shingle_novelty(df, "doc_id", "text").collect()}
    assert got[1].novelty_ppm == 1.0 and got[1].n_shingles == 2
    assert got[2].novelty_ppm == 0.0 and got[2].n_novel == 0
    assert got[3].novelty_ppm == 1.0 and got[3].n_shingles == 3


def test_label_separation_identity_and_orthogonality(spark):
    """X27: labels whose centroids point the same way → cos 1;
    orthogonal centroids → cos 0. Exact scaled-integer arithmetic
    makes both values exact, not approximate."""
    from poet_cloud_cost_etl_spark.operators.embeddings import label_separation

    rows = [
        (0, [1.0, 0.0]), (0, [1.0, 0.0]),
        (1, [0.5, 0.0]),                    # same direction as 0
        (2, [0.0, 2.0]),                    # orthogonal to both
    ]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    got = {
        (r.label_a, r.label_b): r.cos_sim
        for r in label_separation(df, "label", "embedding").collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == 0.0 and got[(1, 2)] == 0.0


def test_chunk_fingerprints_detect_shared_sections(spark):
    """X26 mechanism: two docs sharing an identical 64-token section
    chunk to identical fingerprints (the repetition chunk-level dedup
    counts), while document-level fingerprints differ."""
    from poet_cloud_cost_etl_spark.operators.dedup import fingerprint
    from poet_cloud_cost_etl_spark.operators.packing import chunk_documents

    shared = _words(64)
    df = spark.createDataFrame(
        [(1, shared + " " + _words(48, start=100)),
         (2, shared + " " + _words(48, start=200))],
        ["doc_id", "text"],
    )
    chunks = chunk_documents(df, "doc_id", "text", 64, 0)
    fps = (
        chunks.groupBy(F.md5("chunk_text").alias("fp"))
        .count()
        .collect()
    )
    assert any(r["count"] == 2 for r in fps)  # the shared section
    doc_fps = df.select(fingerprint(F.col("text")).alias("f")).distinct().count()
    assert doc_fps == 2
