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
