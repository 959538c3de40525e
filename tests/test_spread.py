"""r14: scale-adaptive compute spreading (catalog.spread_small_scan).

The optimization parallelizes heavy scan-stage per-row compute when
the input is a small single-split scan, and MUST be a no-op both at
scale (estimated splits ≥ parallelism) and on frames the estimate
cannot vouch for (derived frames lose the table() stamp).  These
tests pin the decision logic and the determinism claim the operators
rely on (round-robin repartition + partition-invariant consumers).
"""

from __future__ import annotations

from conftest import SF_SMALL

from poet_cloud_cost_etl_spark.catalog import spread_small_scan, table


def test_table_stamps_split_estimate(spark):
    d = table(spark, SF_SMALL, "documents")
    est = getattr(d, "_sg_scan_est_splits", None)
    assert est == 1  # sub-128MB single file -> one estimated split


def test_spread_repartitions_small_stamped_scan(spark):
    d = table(spark, SF_SMALL, "documents")
    out = spread_small_scan(d)
    assert out is not d
    p = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == p
    # row set unchanged
    assert out.count() == d.count()


def test_spread_noop_without_stamp(spark):
    d = table(spark, SF_SMALL, "documents").select("doc_id")
    # derived frame: the stamp does not propagate -> conservative no-op
    assert spread_small_scan(d) is d


def test_spread_noop_at_scale_estimate(spark):
    d = table(spark, SF_SMALL, "documents")
    p = spark.sparkContext.defaultParallelism
    assert spread_small_scan(d, current_partitions=p) is d
    assert spread_small_scan(d, current_partitions=p + 7) is d


def test_spread_preserves_results_through_heavy_chain(spark):
    """The dedup pair core must produce the identical pair set with
    and without the spread (partition invariance of the operators)."""
    from pyspark.sql import functions as F

    from poet_cloud_cost_etl_spark.operators.dedup import (
        _jaccard_core,
        shingles,
        tokens,
    )

    d = table(spark, SF_SMALL, "documents")

    def pairs(frame):
        arrs = (
            frame.select(F.col("doc_id"), tokens("text").alias("__t"))
            .select(
                F.col("doc_id"),
                F.array_distinct(shingles("__t")).alias("__sh"),
            )
            .filter(F.size("__sh") > 0)
        )
        sh_n = arrs.select(
            F.col("doc_id"),
            F.size("__sh").cast("long").alias("n_sh"),
            F.explode("__sh").alias("shingle"),
        )
        return sorted(
            tuple(r) for r in _jaccard_core(
                sh_n, "doc_id", 0.5, 2, None
            ).collect()
        )

    assert pairs(d) == pairs(spread_small_scan(d))
