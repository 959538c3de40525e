"""Round-8h operator tests: X115+ (constraint suite, Poisson
bootstrap CI, Heaps-law fit)."""

from __future__ import annotations


def test_constraint_suite_semantics(spark):
    """X115: pass/fail verdicts, NULL bounds unbounded, ppm metrics
    exact, deliberate failures detected."""
    from poet_cloud_cost_etl_spark.operators.aggregates import constraint_suite

    df = spark.createDataFrame(
        [
            (1, "en", "hello", 5),
            (2, "de", None, 0),
            (3, "xx!", "welt", 4),
            (3, "en", "dup id", 6),
        ],
        ["id", "lang", "text", "n"],
    )
    out = {
        r["check"]: r
        for r in constraint_suite(
            df,
            [
                {"name": "rows", "kind": "row_count", "lo": 1, "hi": 10},
                {"name": "text_comp", "kind": "completeness", "col": "text",
                 "lo": 1000000},
                {"name": "id_uniq", "kind": "distinctness", "col": "id",
                 "lo": 1000000},
                {"name": "lang_iso", "kind": "match", "col": "lang",
                 "pattern": "^[a-z][a-z]$", "lo": 1000000},
                {"name": "lang_set", "kind": "in_set", "col": "lang",
                 "allowed": ["en", "de"], "lo": 750000},
                {"name": "n_min", "kind": "min", "col": "n", "lo": 0},
                {"name": "n_max", "kind": "max", "col": "n", "hi": 5},
            ],
        ).collect()
    }
    assert out["rows"]["metric"] == 4 and out["rows"]["status"] == "pass"
    # 3 of 4 texts non-null -> 750000 ppm, fails the 1e6 floor
    assert out["text_comp"]["metric"] == 750000
    assert out["text_comp"]["status"] == "fail"
    # 3 distinct of 4 rows
    assert out["id_uniq"]["metric"] == 750000
    assert out["id_uniq"]["status"] == "fail"
    # 'xx!' fails the anchored iso-2 pattern: 3/4 match
    assert out["lang_iso"]["metric"] == 750000
    assert out["lang_iso"]["status"] == "fail"
    # exactly 3/4 in {en, de} meets the 750000 floor
    assert out["lang_set"]["metric"] == 750000
    assert out["lang_set"]["status"] == "pass"
    assert out["n_min"]["metric"] == 0 and out["n_min"]["status"] == "pass"
    assert out["n_max"]["metric"] == 6 and out["n_max"]["status"] == "fail"


def test_constraint_suite_empty_input(spark):
    """X115: empty input -> ppm metrics 0 (clamped division), NULL
    extrema pass vacuous bound checks, row_count-with-lo fails."""
    from poet_cloud_cost_etl_spark.operators.aggregates import constraint_suite

    df = spark.createDataFrame([], "id INT, lang STRING")
    out = {
        r["check"]: r
        for r in constraint_suite(
            df,
            [
                {"name": "rows", "kind": "row_count", "lo": 1},
                {"name": "comp", "kind": "completeness", "col": "lang",
                 "lo": 1000000},
                {"name": "mn", "kind": "min", "col": "id", "lo": 0},
            ],
        ).collect()
    }
    assert out["rows"]["metric"] == 0 and out["rows"]["status"] == "fail"
    assert out["comp"]["metric"] == 0 and out["comp"]["status"] == "fail"
    assert out["mn"]["metric"] is None and out["mn"]["status"] == "pass"


def test_constraint_suite_single_scan(spark):
    """X115 is ONE corpus scan: exactly one parquet scan node in the
    executed plan even with 7 checks incl. an exact distinct."""
    from poet_cloud_cost_etl_spark.queries import QUERIES

    plan = (
        QUERIES["documents_constraint_suite"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
