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
