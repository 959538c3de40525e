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


def _canon_pandas_cell(v) -> str:
    """Canonicalize a cell AFTER pandas materialization — the leg
    that replicates the driver's degradation path (r8 post-mortem:
    DuckDB ``fetchdf()`` degrades DECIMAL(10,2)→float64 with
    trailing-zero loss and HUGEINT→float64, while Spark's
    ``toPandas()`` keeps Decimal objects and int64 — an asymmetry
    the exact ``fetchall()`` leg can never see).  NaN and None are
    both NULL markers here (pandas erases the distinction), and a
    midnight Timestamp equals a date (DuckDB widens DATE to
    datetime64, Spark keeps datetime.date objects — symmetric under
    this canon)."""
    import datetime as _dt

    import numpy as _np
    import pandas as _pd

    if v is None or v is _pd.NaT:
        return "<N>"
    if isinstance(v, (float, _np.floating)):
        f = float(v)
        return "<N>" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, _np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, _np.integer)):
        return str(int(v))
    if isinstance(v, _pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple, _np.ndarray)):
        return "[" + ",".join(_canon_pandas_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    try:
        if _pd.isna(v):
            return "<N>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_pandas_rows(df) -> list[tuple[str, ...]]:
    """Driver-leg canonicalization of a pandas DataFrame: sort
    columns by name, canonicalize cells, sort rows."""
    cols = sorted(df.columns)
    out = [
        tuple(_canon_pandas_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
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
    # persist/unpersist in try/finally: driver_check keeps sweeping
    # after a per-query ERROR, so a raise between persist and
    # unpersist would pin cached blocks for the rest of the sweep —
    # the cross-query bleed bench.py's _release_persisted() exists
    # to prevent.
    spark_df = spark_df.persist()
    try:
        return _compare_impl(name, spark_df, oracle_con, oracle_query)
    finally:
        spark_df.unpersist()


def _compare_impl(
    name: str, spark_df, oracle_con, oracle_query: str
) -> Comparison:
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
    if not issues:
        # Driver-fidelity leg (r8 post-mortem): re-materialize BOTH
        # sides through pandas — Spark via toPandas(), DuckDB via
        # fetchdf() — and compare under the pandas canon.  The exact
        # leg above proves the engines agree; this leg proves the
        # agreement SURVIVES the driver's materialization (it is the
        # leg that catches DECIMAL / HUGEINT result columns, which
        # pandas degrades asymmetrically).
        ps = canon_pandas_rows(spark_df.toPandas())
        po = canon_pandas_rows(oracle_con.execute(oracle_query).fetchdf())
        if ps != po:
            diffs = [
                f"  row {i}: spark={a} oracle={b}"
                for i, (a, b) in enumerate(zip(ps, po))
                if a != b
            ][:5]
            issues.append(
                "pandas-leg divergence (driver-fragile result type — "
                "exact values match but the driver's materialization "
                "degrades them differently):\n" + "\n".join(diffs)
            )
    return Comparison(name, len(s_rows), len(o_rows), not issues, issues)
