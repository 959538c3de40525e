#!/usr/bin/env python3
"""Drive the product surface exactly as the round driver does:
import __spark_entry__, smoke entry(), run every queries() entry at
sf0.01 and compare with its oracle_sql() twin on DuckDB.

Usage: python scripts/driver_check.py [sf_dir]
Exit code 0 iff entry smokes and every oracle-checked query matches.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from poet_cloud_cost_etl_spark.session import build_session  # noqa: E402

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


def canon(v) -> str:
    if v is None:
        return "<N>"
    if isinstance(v, float):
        return "<NaN>" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="driver-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = E.entry(spark).collect()
    print(f"entry: {len(rows)} rows {'OK' if rows else 'FAIL'}")
    bad = 0 if rows else 1

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, sf)
            scols, srows = sdf.columns, sdf.collect()
            if name not in osql:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            r = con.execute(osql[name])
            ocols = [d[0] for d in r.description]
            orows = r.fetchall()
            si = sorted(range(len(scols)), key=lambda i: scols[i])
            oi = sorted(range(len(ocols)), key=lambda i: ocols[i])
            cs = sorted(tuple(canon(row[i]) for i in si) for row in srows)
            co = sorted(tuple(canon(row[i]) for i in oi) for row in orows)
            ok = sorted(scols) == sorted(ocols) and cs == co
            bad += 0 if ok else 1
            print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
            if not ok:
                if sorted(scols) != sorted(ocols):
                    print(f"  cols: spark={sorted(scols)} oracle={sorted(ocols)}")
                for a, b in list(zip(cs, co))[:3]:
                    if a != b:
                        print(f"  spark={a}\n  oracle={b}")
        except Exception as exc:  # surface per-query errors, keep going
            bad += 1
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:200]}")
    print(f"RESULT: {'PASS' if bad == 0 else f'FAIL ({bad} bad)'}")
    spark.stop()
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
