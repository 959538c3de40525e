"""S6-S8: exercise the JDBC sink against embedded Derby (ships in
Spark's jars/). Reference parity: psycopg2 execute_values loader with
drop/create DDL (postgresql.py:46-107) — here df.write.jdbc with
replace/append/fail modes and the createTableColumnTypes DDL override.

Also covers the S10 quote-aware script splitter and S9/S11 identifier
quoting (ADVICE round 1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poet_cloud_cost_etl_spark.catalog import table
from poet_cloud_cost_etl_spark.sources.sinks import (
    quote_ident,
    split_sql_statements,
    write_jdbc,
)

from tests.conftest import SF_SMALL

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "sinkdb"
    return f"jdbc:derby:{db};create=true"


def _read_back(spark, url, tbl):
    return spark.read.format("jdbc").options(url=url, dbtable=tbl, **DERBY_PROPS).load()


def test_jdbc_replace_roundtrip(spark, derby_url):
    r = table(spark, SF_SMALL, "region")
    write_jdbc(r, derby_url, "region_sink", if_exists="replace", properties=DERBY_PROPS)
    got = _read_back(spark, derby_url, "region_sink")
    assert sorted(got.columns) == sorted(r.columns)
    assert got.count() == r.count()
    # replace again: still exactly one copy
    write_jdbc(r, derby_url, "region_sink", if_exists="replace", properties=DERBY_PROPS)
    assert _read_back(spark, derby_url, "region_sink").count() == r.count()


def test_jdbc_append_accumulates(spark, derby_url):
    n = table(spark, SF_SMALL, "nation")
    write_jdbc(n, derby_url, "nation_sink", if_exists="replace", properties=DERBY_PROPS)
    write_jdbc(n, derby_url, "nation_sink", if_exists="append", properties=DERBY_PROPS)
    assert _read_back(spark, derby_url, "nation_sink").count() == 2 * n.count()


def test_jdbc_fail_mode_raises_on_existing(spark, derby_url):
    r = table(spark, SF_SMALL, "region")
    write_jdbc(r, derby_url, "fail_sink", if_exists="replace", properties=DERBY_PROPS)
    with pytest.raises(Exception):
        write_jdbc(r, derby_url, "fail_sink", if_exists="fail", properties=DERBY_PROPS)


def test_jdbc_create_table_column_types(spark, derby_url):
    """S8: createTableColumnTypes projects DECIMAL DDL like the
    reference's init.sql:19 DECIMAL(10,2) cost column."""
    df = (
        table(spark, SF_SMALL, "region")
        .select("r_regionkey")
        .withColumn("cost", F.lit(12.34))
    )
    write_jdbc(
        df,
        derby_url,
        "ddl_sink",
        if_exists="replace",
        properties=DERBY_PROPS,
        create_table_column_types="cost DECIMAL(10,2)",
    )
    got = _read_back(spark, derby_url, "ddl_sink")
    assert dict(got.dtypes)["cost"] == "decimal(10,2)"


def test_split_sql_statements_quote_aware():
    script = """
        -- leading comment with ; semicolon
        CREATE TABLE t (s STRING);
        INSERT INTO t VALUES ('a;b', 'it''s;fine');
        /* block ; comment */
        SELECT `weird;col` FROM t
    """
    stmts = split_sql_statements(script)
    assert len(stmts) == 3
    assert stmts[1] == "INSERT INTO t VALUES ('a;b', 'it''s;fine')"
    assert "`weird;col`" in stmts[2]


def test_quote_ident():
    assert quote_ident("analytics.costs") == "analytics.costs"
    assert quote_ident("bad name") == "`bad name`"
    assert quote_ident("a.b`c") == "a.`b``c`"


def test_run_sql_script_executes_semicolon_literals(spark):
    from poet_cloud_cost_etl_spark.sources.sinks import run_sql_script

    run_sql_script(
        spark,
        "CREATE OR REPLACE TEMPORARY VIEW _script_v AS SELECT 'x;y' AS s; "
        "CREATE OR REPLACE TEMPORARY VIEW _script_v2 AS SELECT s FROM _script_v",
    )
    assert spark.sql("SELECT s FROM _script_v2").collect()[0].s == "x;y"


def test_jdbc_decimal_roundtrip(spark, derby_url):
    """DECIMAL(10,2) semantics survive the JDBC sink (reference
    sql/init.sql:19's column type): type and exact values round-trip."""
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, "12.34"), (2, "0.01")], ["id", "c"]).select(
        "id", F.col("c").cast(T.DecimalType(10, 2)).alias("cost")
    )
    write_jdbc(df, derby_url, "dec_sink", if_exists="replace", properties=DERBY_PROPS)
    back = _read_back(spark, derby_url, "dec_sink")
    assert dict(back.dtypes)["cost"] == "decimal(10,2)"
    assert {str(r.cost) for r in back.collect()} == {"12.34", "0.01"}


def test_jdbc_parallel_partition_writes(spark, derby_url):
    """S6 at executor parallelism: 4 concurrent JDBC writers (one per
    partition, each batching like the reference's 10k execute_values
    pages, postgresql.py:88-98) must land exactly one consistent copy
    of every row — no loss, no duplication, no deadlock."""
    o = table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    expect_n = o.count()
    parts = o.repartition(4)
    assert parts.rdd.getNumPartitions() == 4
    write_jdbc(
        parts,
        derby_url,
        "par_sink",
        if_exists="replace",
        properties=DERBY_PROPS,
        batchsize=100,
        num_partitions=4,
    )
    back = _read_back(spark, derby_url, "par_sink")
    assert back.count() == expect_n
    # value-level consistency, not just row count
    assert (
        back.select(F.sum("o_orderkey").alias("s")).collect()[0].s
        == o.select(F.sum("o_orderkey").alias("s")).collect()[0].s
    )
    assert back.select("o_orderkey").distinct().count() == expect_n


def test_split_sql_statements_backslash_escape():
    """Spark's default string literals use backslash escapes; a
    semicolon after an escaped quote must not split the statement."""
    stmts = split_sql_statements(r"SELECT 'it\'s; fine' AS s; SELECT 2")
    assert stmts == [r"SELECT 'it\'s; fine' AS s", "SELECT 2"]


def test_split_sql_statements_double_quote_escape():
    """Double-quoted literals get the same backslash handling as
    single-quoted ones; backtick identifiers escape only by doubling."""
    stmts = split_sql_statements('SELECT "a\\";b" AS s; SELECT `we``ird;` FROM t')
    assert stmts == ['SELECT "a\\";b" AS s', "SELECT `we``ird;` FROM t"]
