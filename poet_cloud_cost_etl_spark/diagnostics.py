"""Diagnostic commands (SURVEY §3.3): the Spark twins of the
reference's ``list-accounts`` / ``test-connection`` / ``test-s3``
(``/root/reference/src/main.py:148-210``).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from .accounts import AccountRegistry


def list_accounts(spark: SparkSession, registry: AccountRegistry) -> DataFrame:
    """Registry as a queryable dim table (main.py:148-157)."""
    return registry.to_df(spark)


def test_connection(spark: SparkSession) -> dict[str, str]:
    """Round-trip probe + engine version (main.py:160-182's
    ``SELECT version()``)."""
    row = spark.sql("SELECT 1 AS ok").collect()[0]
    return {"ok": str(row.ok), "version": spark.version}


def test_storage(spark: SparkSession, paths: list[str]) -> dict[str, int]:
    """Per-path parquet file counts (main.py:185-210's glob probe)."""
    out: dict[str, int] = {}
    for p in paths:
        try:
            out[p] = len(spark.read.parquet(p).inputFiles())
        except Exception:
            out[p] = -1
    return out


def path_to_table_name(path: str) -> str:
    """N6 (main.py:213-227): S3 report path → table identifier.
    First path segment, lowercased, dashes→underscores; an all-digit
    segment (a bare account id) gets an ``account_`` prefix."""
    first = path.strip("/").split("/")[0].lower().replace("-", "_")
    first = re.sub(r"[^0-9a-z_]", "_", first)
    if first.isdigit():
        first = f"account_{first}"
    return first or "unnamed"
