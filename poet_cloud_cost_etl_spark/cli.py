"""Command-line surface — the Spark twin of the reference's typer app
(``/root/reference/src/main.py:37-210``): ``sync``, ``list-accounts``,
``test-connection``, ``test-storage``, plus engine extras
(``list-queries``, ``run-query``). argparse (stdlib) instead of typer
so the CLI has zero extra dependencies.

Usage::

    python -m poet_cloud_cost_etl_spark sync --output-root /tmp/out
    python -m poet_cloud_cost_etl_spark run-query q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import sys
from collections.abc import Sequence

from pyspark.sql import SparkSession


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="poet_cloud_cost_etl_spark",
        description="PySpark cloud-cost analytics engine",
    )
    sub = p.add_subparsers(dest="command", required=True)

    sync_p = sub.add_parser("sync", help="extract → normalize → land → view")
    sync_p.add_argument("--output-root", default=None)
    sync_p.add_argument("--sf-dir", default=None, help="fixture dir to sync from")
    sync_p.add_argument("--dry-run", action="store_true")
    sync_p.add_argument("--no-raw", action="store_true", help="skip raw landing")
    sync_p.add_argument(
        "--months",
        "-m",
        type=int,
        default=None,
        help="temporal scope: only records from the last N calendar "
        "months (reference main.py --months); default = full history",
    )

    sub.add_parser("list-accounts", help="configured account registry")
    sub.add_parser("test-connection", help="engine round-trip probe")

    st = sub.add_parser("test-storage", help="parquet file counts per path")
    st.add_argument("paths", nargs="+")

    sub.add_parser("list-queries", help="registered analytics queries")

    rq = sub.add_parser("run-query", help="run a registered query")
    rq.add_argument("name")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)
    return p


def main(argv: Sequence[str] | None = None, spark: SparkSession | None = None) -> int:
    """Entry point. ``spark`` is injectable for tests; otherwise a
    session is built from env (config.EngineConfig)."""
    args = _build_parser().parse_args(argv)

    from .config import EngineConfig

    cfg = EngineConfig.from_env()

    if args.command == "list-queries":  # needs no Spark — stay JVM-free
        from .queries import QUERIES

        for name in sorted(QUERIES):
            print(name)
        return 0

    own_session = spark is None
    if spark is None:
        from .session import build_session

        spark = build_session(app_name=f"cli-{args.command}", **cfg.session_kwargs())
    try:
        return _dispatch(args, spark, cfg)
    finally:
        if own_session:
            spark.stop()


def _dispatch(args: argparse.Namespace, spark: SparkSession, cfg) -> int:
    from .queries import REGISTRY

    if args.command == "sync":
        from .pipeline import sync
        from .sources.base import fixture_sources

        sf_dir = args.sf_dir or cfg.sf_dir
        report = sync(
            spark,
            fixture_sources(sf_dir),
            output_root=args.output_root,
            dry_run=args.dry_run,
            write_raw=not args.no_raw,
            config=cfg,
            months=args.months,
        )
        print(json.dumps({"tables": report.tables, "failures": report.failures}))
        return 0 if not report.failures else 1

    if args.command == "list-accounts":
        from .accounts import AccountRegistry
        from .diagnostics import list_accounts

        # config-driven scope (reference accounts.py:54-64)
        registry = AccountRegistry.scoped(REGISTRY.accounts, cfg.test_accounts)
        for row in list_accounts(spark, registry).collect():
            print(json.dumps(row.asDict()))
        return 0

    if args.command == "test-connection":
        from .diagnostics import test_connection

        print(json.dumps(test_connection(spark)))
        return 0

    if args.command == "test-storage":
        from .diagnostics import test_storage

        counts = test_storage(spark, args.paths)
        print(json.dumps(counts))
        return 0 if all(v >= 0 for v in counts.values()) else 1

    if args.command == "run-query":
        from .queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        df = QUERIES[args.name](spark, args.sf_dir)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    raise AssertionError(f"unhandled command {args.command}")


if __name__ == "__main__":
    sys.exit(main())
