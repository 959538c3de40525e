"""CLI surface (reference main.py:37-210 typer-app parity): every
command runs against an injected session and prints machine-readable
output."""

from __future__ import annotations

import json

from poet_cloud_cost_etl_spark.cli import main

from conftest import SF_SMALL


def test_list_queries(spark, capsys):
    assert main(["list-queries"], spark=spark) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) >= 70


def test_test_connection(spark, capsys):
    assert main(["test-connection"], spark=spark) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"] == "1" and out["version"]


def test_list_accounts(spark, capsys):
    assert main(["list-accounts"], spark=spark) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert {r["account_id"] for r in lines} >= {"7", "23", "42"}


def test_storage_probe(spark, capsys):
    ok_path = f"{SF_SMALL}/events.parquet"
    assert main(["test-storage", ok_path], spark=spark) == 0
    assert json.loads(capsys.readouterr().out)[ok_path] >= 1
    assert main(["test-storage", "/nonexistent/x.parquet"], spark=spark) == 1


def test_run_query(spark, capsys):
    assert main(["run-query", "top_accounts", "--sf-dir", SF_SMALL], spark=spark) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert rows and "account_id" in rows[0]
    assert main(["run-query", "nope"], spark=spark) == 2


def test_sync_cli(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_OUTPUT", str(tmp_path / "out"))
    monkeypatch.delenv("SPARK_GRAFT_JDBC_URL", raising=False)
    rc = main(["sync", "--sf-dir", SF_SMALL, "--no-raw"], spark=spark)
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["tables"] == {"events": 1000, "orders": 1500}
    assert spark.sql("SELECT count(*) AS n FROM costs").collect()[0].n == 2500


def test_list_queries_needs_no_session():
    """list-queries must not pay JVM startup (and must not build a
    session at all when none is injected)."""
    assert main(["list-queries"]) == 0


def test_sync_jdbc_failure_does_not_leak_into_view(spark, tmp_path, monkeypatch):
    """A source whose JDBC landing fails is reported failed AND stays
    out of the unified costs view."""
    monkeypatch.setenv("SPARK_GRAFT_OUTPUT", str(tmp_path / "out"))
    monkeypatch.setenv("SPARK_GRAFT_JDBC_URL", "jdbc:nosuchdriver:nowhere")
    rc = main(["sync", "--sf-dir", SF_SMALL, "--no-raw"], spark=spark)
    assert rc == 1


def test_sync_cli_months_flag(spark, tmp_path, capsys, monkeypatch):
    """--months plumbs through to pipeline.sync (reference main.py
    --months). Anchored at the real current date, the 1995-2001
    orders and 2024 events fixtures both fall outside a 2-month
    window — every table syncs as 0 rows via the P9 guard."""
    monkeypatch.setenv("SPARK_GRAFT_OUTPUT", str(tmp_path / "out"))
    monkeypatch.delenv("SPARK_GRAFT_JDBC_URL", raising=False)
    rc = main(
        ["sync", "--sf-dir", SF_SMALL, "--no-raw", "--months", "2"], spark=spark
    )
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["tables"] == {"events": 0, "orders": 0}
