"""Local replica of the driver's t2 correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, then compare (row count, column names/types,
order-insensitive values).

Values are canonicalized to strings (floats via ``repr`` so any ulp
divergence is caught — the engine's determinism conventions are
supposed to make results bit-identical, not merely close).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name (as the driver does), canonicalize cells,
    sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class Comparison:
    name: str
    spark_rows: int
    oracle_rows: int
    match: bool
    mismatches: list[str] = field(default_factory=list)


def compare(name: str, spark_df, oracle_con, oracle_query: str) -> Comparison:
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    o_res = oracle_con.execute(oracle_query)
    o_cols = [d[0] for d in o_res.description]
    o_rows = o_res.fetchall()

    issues: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        issues.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        issues.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    if not issues:
        cs = canon_rows(s_cols, [tuple(r) for r in s_rows])
        co = canon_rows(o_cols, o_rows)
        if cs != co:
            diffs = [
                f"  row {i}: spark={a} oracle={b}"
                for i, (a, b) in enumerate(zip(cs, co))
                if a != b
            ][:5]
            only_s = [r for r in cs if r not in set(co)][:3]
            only_o = [r for r in co if r not in set(cs)][:3]
            issues.append(
                "values differ:\n"
                + "\n".join(diffs)
                + f"\n  only-spark={only_s}\n  only-oracle={only_o}"
            )
    return Comparison(name, len(s_rows), len(o_rows), not issues, issues)
