"""S6-S11: sinks + catalog DDL (SURVEY §2.1).

The reference's sink is psycopg2 ``execute_values`` into PostgreSQL
with drop/create DDL derived from pandas dtypes
(``/root/reference/src/loaders/postgresql.py:46-160``). Spark
equivalents:

- S6/S7 JDBC writes with replace/append/fail modes → ``df.write.jdbc``
  (executors write partitions in parallel; ``batchsize`` replaces
  execute_values paging)
- S8 DDL type projection → the JDBC writer derives DDL from the
  DataFrame schema natively; ``createTableColumnTypes`` overrides
- S9 schema ensure → catalog namespace DDL
- S10 SQL script execution → statement-split ``spark.sql`` loop
- S11 view creation → ``CREATE OR REPLACE [TEMP] VIEW``

Locally there is no PostgreSQL, so the default sink is partitioned
parquet — which is also the correct 100 TB answer: analytics outputs
land in object storage laid out ``cloud_provider=/year=/month=`` so
downstream scans partition-prune (SURVEY §7 design note).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MODE_MAP = {"replace": "overwrite", "append": "append", "fail": "errorifexists"}


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    if_exists: str = "replace",
    partition_cols: list[str] | None = None,
) -> None:
    """Default sink: partitioned parquet. For the costs table the
    canonical layout is cloud_provider/year/month."""
    writer = df.write.mode(_MODE_MAP[if_exists])
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_costs_partitioned(costs: DataFrame, path: str, if_exists: str = "replace") -> None:
    """The 100 TB layout: provider/year/month directories so date- and
    provider-scoped queries prune partitions at the listing step."""
    out = costs.withColumn("year", F.year("date")).withColumn("month", F.month("date"))
    write_parquet_partitioned(
        out, path, if_exists, partition_cols=["cloud_provider", "year", "month"]
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    if_exists: str = "replace",
    properties: dict[str, str] | None = None,
    batchsize: int = 10000,
    create_table_column_types: str | None = None,
    num_partitions: int | None = None,
) -> None:
    """S6-S8: JDBC sink. ``batchsize`` mirrors the reference's 10k
    execute_values pages (postgresql.py:51,96); ``numPartitions``
    bounds concurrent connections; ``createTableColumnTypes`` is the
    S8 DDL override (e.g. 'cost DECIMAL(10,2)')."""
    writer = df.write.mode(_MODE_MAP[if_exists]).format("jdbc")
    writer = writer.option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def quote_ident(name: str) -> str:
    """Backtick-quote a (possibly dotted) identifier so callers cannot
    inject SQL through table/schema/view name arguments. Plain
    identifiers pass through unquoted; anything else is backticked
    with embedded backticks doubled (Spark SQL escaping)."""
    parts = name.split(".")
    return ".".join(
        p if _IDENT_RE.match(p) else "`" + p.replace("`", "``") + "`" for p in parts
    )


def split_sql_statements(script: str) -> list[str]:
    """Split a SQL script on statement-terminating semicolons only —
    semicolons inside '...' strings, "..."/`...` quoted identifiers,
    -- line comments, and /* */ block comments do not split
    (comments are dropped). The reference splits naively on every ';'
    (postgresql.py:151-160); this closes that corruption hazard."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if ch in ("'", '"', "`"):
            # ' and " are string literals with backslash escapes (Spark
            # default escapedStringLiterals=false) and doubled-quote
            # escapes; ` identifiers escape only by doubling
            j = i + 1
            while j < n:
                if ch != "`" and script[j] == "\\":
                    j += 2
                    continue
                if script[j] == ch:
                    if j + 1 < n and script[j + 1] == ch:  # doubled escape
                        j += 2
                        continue
                    break
                j += 1
            buf.append(script[i : min(j + 1, n)])
            i = j + 1
        elif script.startswith("--", i):
            j = script.find("\n", i)
            i = n if j == -1 else j
        elif script.startswith("/*", i):
            j = script.find("*/", i + 2)
            i = n if j == -1 else j + 2
        elif ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


def ensure_namespace(spark: SparkSession, name: str) -> None:
    """S9: CREATE SCHEMA IF NOT EXISTS (postgresql.py:38-44)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {quote_ident(name)}")


def run_sql_script(spark: SparkSession, script: str) -> None:
    """S10: execute a multi-statement SQL script (postgresql.py:151-160)."""
    for stmt in split_sql_statements(script):
        spark.sql(stmt)


def create_view(spark: SparkSession, name: str, select_sql: str, temp: bool = True) -> None:
    """S11: CREATE OR REPLACE VIEW (normalize.py:112-143)."""
    kind = "TEMPORARY VIEW" if temp else "VIEW"
    spark.sql(f"CREATE OR REPLACE {kind} {quote_ident(name)} AS {select_sql}")


def write_training_shards(
    ordered: DataFrame,
    path: str,
    shard_col: str = "shard",
    pos_col: str = "pos",
    max_records_per_file: int | None = None,
) -> None:
    """X71: deterministic training-shard export — materialize the
    X44 ``training_order_shuffle`` assignment as one parquet file
    per shard whose ROW ORDER IS the training order.  Data loaders
    stream shard files sequentially; if the on-disk order differs
    from the computed (shard, pos) order, the X44 epoch-shuffle
    guarantees silently vanish at the loader boundary — so the sink,
    not the reader, owns ordering.

    Layout contract: ``path/<shard_col>=<k>/part-*.parquet``; each
    shard maps to exactly ONE file (hash-repartition on the shard
    key puts a shard in exactly one task; the partitionBy writer
    then splits that task's output per shard value), rows ascending
    by ``pos_col``.  ``max_records_per_file`` caps file size for
    loaders that need bounded memory — NOTE it splits a shard into
    several files whose lexicographic part-name order preserves pos
    order (Spark numbers split files monotonically within a task).

    Scale: one hash shuffle on the shard key + an in-task sort —
    the minimum any order-owning export pays. Shard count should be
    >= a few × executor count so the final stage parallelizes."""
    w = (
        ordered.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
    )
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
