"""The local twin of the driver's t2 gate: every queries() entry with
an oracle must match DuckDB exactly at sf0.01."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_conn
from tests.conftest import SF_MEDIUM

import __spark_entry__ as entrymod


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_MEDIUM)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(name, spark, oracle_con):
    df = QUERIES[name](spark, SF_MEDIUM)
    if name not in ORACLES:
        # rows-only check (driver's weaker path for non-SQL ops)
        assert df.count() >= 0
        return
    cmp = compare(name, df, oracle_con, ORACLES[name])
    assert cmp.match, f"{name}:\n" + "\n".join(cmp.mismatches)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["service", "total"]
