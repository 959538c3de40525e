"""Document chunking for training-data preparation: fixed-size
character windows with overlap — the step that turns variable-length
documents into model-context-sized pieces. (Token-exact chunking needs
a real tokenizer; the fixture conventions use character windows, whose
Spark-side mechanics — explode of a generated start sequence, no
shuffle, no UDF — are identical.)

Scale notes (100 TB): the operator is a pure narrow map+explode on the
scan — no shuffle, no state. Output size is input size × (1 +
overlap/stride); partition count follows the scan, so oversized output
partitions are an AQE/`maxPartitionBytes` concern, not an operator
concern. The chunk text itself stays in the row only as long as the
consumer needs it; downstream usually hashes or embeds immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 80,
    stride: int = 60,
) -> DataFrame:
    """Explode each document into overlapping character windows:
    start positions 1, 1+stride, ... (1-based, SQL substring
    convention), window length ``chunk_size`` (the final windows are
    shorter). Empty documents yield one empty chunk, so every doc_id
    survives. Returns (id, chunk_idx, start, chunk_text)."""
    if stride <= 0 or chunk_size < stride:
        raise ValueError("need stride > 0 and chunk_size >= stride (overlap)")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), F.col(text_col), F.explode(starts).alias("start"))
        .select(
            F.col(id_col),
            ((F.col("start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start"),
            F.substring(F.col(text_col), F.col("start"), F.lit(chunk_size)).alias(
                "chunk_text"
            ),
        )
    )
