"""X2d scale knobs: min_df must be result-identical (unique shingles
cannot co-occur), max_df is the documented recall-trading stop-shingle
cap (changes results, so it stays off in the oracle-checked query)."""

from __future__ import annotations

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.operators.dedup import doc_shingles, ngram_jaccard_pairs

from tests.conftest import SF_MEDIUM


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
