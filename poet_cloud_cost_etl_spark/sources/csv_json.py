"""CSV / JSON-lines sources — format breadth beyond the reference's
parquet-only scan (SURVEY §2.1). Cost exports commonly arrive as
gzipped CSV (legacy CUR) or JSON lines; both read into the same
normalize pipeline.

Schema policy at scale: always pass an explicit schema. Inference
reads the data twice and, for JSON, samples — neither acceptable at
100 TB. ``PERMISSIVE`` mode + ``columnNameOfCorruptRecord`` mirrors
the engine's null-on-error posture (bad rows quarantine, never abort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json_lines(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (both
    columnar with min/max stats); schema optional because ORC embeds
    one, but pass it when the directory may be empty."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
