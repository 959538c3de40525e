"""X2d scale knobs: min_df must be result-identical (unique shingles
cannot co-occur), max_df is the documented recall-trading stop-shingle
cap (changes results, so it stays off in the oracle-checked query)."""

from __future__ import annotations

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.operators.dedup import doc_shingles, ngram_jaccard_pairs

from tests.conftest import SF_MEDIUM, SF_SMALL


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_min_df_is_result_identical(spark):
    d = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(d, "doc_id", "text")
    base = _pairs(ngram_jaccard_pairs(sh, "doc_id", threshold=0.5))
    pruned = _pairs(ngram_jaccard_pairs(sh, "doc_id", threshold=0.5, min_df=2))
    assert base, "fixture should contain near-dup pairs"
    assert pruned == base


def test_max_df_only_removes_pairs(spark):
    d = table(spark, SF_MEDIUM, "documents")
    sh = doc_shingles(d, "doc_id", "text")
    base = _pairs(ngram_jaccard_pairs(sh, "doc_id", threshold=0.5))
    capped = ngram_jaccard_pairs(sh, "doc_id", threshold=0.5, max_df=50)
    capped_keys = {(a, b) for a, b, _ in _pairs(capped)}
    base_keys = {(a, b) for a, b, _ in base}
    assert capped_keys <= base_keys


def test_jaccard_hot_bucket_branch_is_result_identical(spark):
    """Forcing every bucket through the skew-escape self-join branch
    (split_threshold=1) must produce exactly the grouped-path pairs."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.dedup import (
        _jaccard_core,
        ngram_jaccard_from_docs,
        shingles,
        tokens,
    )

    d = table(spark, SF_SMALL, "documents")
    grouped = sorted(
        map(tuple, ngram_jaccard_from_docs(d, "doc_id", "text", 0.5, min_df=2).collect())
    )
    arrs = (
        d.select(F.col("doc_id"), tokens("text").alias("__t"))
        .select("doc_id", F.array_distinct(shingles("__t")).alias("__sh"))
        .filter(F.size("__sh") > 0)
    )
    sh_n = arrs.select(
        "doc_id", F.size("__sh").cast("long").alias("n_sh"), F.explode("__sh").alias("shingle")
    )
    joined = sorted(
        map(tuple, _jaccard_core(sh_n, "doc_id", 0.5, 2, None, split_threshold=1).collect())
    )
    assert grouped == joined and grouped
