"""EngineConfig (reference src/config.py:32-61 parity): env-driven
deployment knobs, threaded through pipeline.sync including the JDBC
leg against embedded Derby."""

from __future__ import annotations

import os
from datetime import datetime

from poet_cloud_cost_etl_spark.config import EngineConfig
from poet_cloud_cost_etl_spark.pipeline import sync

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_from_env_defaults():
    cfg = EngineConfig.from_env(env={})
    assert cfg.sf_dir == "/root/testdata/sf0.1"
    assert cfg.jdbc_url is None
    assert cfg.jdbc_properties == {}
    assert cfg.test_accounts == ()
    assert cfg.cpus == 32


def test_from_env_full():
    cfg = EngineConfig.from_env(
        env={
            "SPARK_GRAFT_SF_DIR": "/data/in",
            "SPARK_GRAFT_OUTPUT": "/data/out",
            "SPARK_GRAFT_JDBC_URL": "jdbc:derby:/tmp/x;create=true",
            "SPARK_GRAFT_JDBC_DRIVER": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
            "SPARK_GRAFT_JDBC_USER": "u",
            "SPARK_GRAFT_TABLE_PREFIX": "analytics_",
            "TEST_ACCOUNTS": "111, 222",
            "SPARK_GRAFT_CPUS": "8",
            "SPARK_GRAFT_SHUFFLE_PARTITIONS": "16",
        }
    )
    assert cfg.output_root == "/data/out"
    assert cfg.jdbc_properties["driver"].endswith("AutoloadedDriver")
    assert cfg.jdbc_properties["user"] == "u"
    assert "password" not in cfg.jdbc_properties
    assert cfg.test_accounts == ("111", "222")
    assert cfg.jdbc_table("costs") == "analytics_costs"
    assert cfg.session_kwargs()["shuffle_partitions"] == 16


def test_sync_runs_from_config_with_jdbc(spark, tmp_path):
    """sync(config=...) with a JDBC URL lands normalized tables both
    as parquet and in the database."""
    from tests.test_pipeline import _sources

    cfg = EngineConfig(
        output_root=str(tmp_path / "out"),
        jdbc_url=f"jdbc:derby:{tmp_path}/db;create=true",
        jdbc_properties={"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
        table_prefix="t_",
    )
    report = sync(
        spark, _sources(spark), sync_timestamp=datetime(2026, 1, 1), config=cfg
    )
    assert report.ok, report.failures
    name = next(iter(report.tables))
    got = (
        spark.read.format("jdbc")
        .options(
            url=cfg.jdbc_url,
            dbtable=cfg.jdbc_table(f"{name}_normalized"),
            **cfg.jdbc_properties,
        )
        .load()
    )
    assert got.count() == report.tables[name]


def test_fs_conf_parsing_and_prefixing():
    """SPARK_GRAFT_FS_CONF (round-6 ask #4): object-store conf
    passthrough — the Spark twin of the reference's S3 credential
    wiring (reference src/sources/aws_cur.py:44-54). Hadoop FS keys
    gain the spark.hadoop. prefix; values keep embedded '='."""
    cfg = EngineConfig.from_env(
        env={
            "SPARK_GRAFT_FS_CONF": (
                "fs.s3a.endpoint=https://s3.us-east-1.amazonaws.com;"
                " fs.s3a.session.token=abc==;"
                "spark.hadoop.fs.s3a.path.style.access=true"
            )
        }
    )
    assert cfg.fs_conf["fs.s3a.endpoint"] == "https://s3.us-east-1.amazonaws.com"
    assert cfg.fs_conf["fs.s3a.session.token"] == "abc=="
    extra = cfg.session_kwargs()["extra_conf"]
    assert (
        extra["spark.hadoop.fs.s3a.endpoint"] == "https://s3.us-east-1.amazonaws.com"
    )
    # already spark.-prefixed keys pass through untouched
    assert extra["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert "spark.hadoop.spark.hadoop.fs.s3a.path.style.access" not in extra


def test_fs_conf_rejects_malformed_pair():
    import pytest

    with pytest.raises(ValueError, match="not key=value"):
        EngineConfig.from_env(env={"SPARK_GRAFT_FS_CONF": "fs.s3a.endpoint"})


def test_fs_conf_lands_in_hadoop_configuration():
    """End-to-end: a session built the CLI way (EngineConfig →
    build_session) must expose fs.* keys through the SparkContext's
    hadoopConfiguration — that is what the s3a connector reads.
    Fresh subprocess: hadoopConfiguration is fixed at JVM context
    creation, so the shared test session can't be used."""
    import subprocess
    import sys

    code = (
        "from poet_cloud_cost_etl_spark.config import EngineConfig\n"
        "from poet_cloud_cost_etl_spark.session import build_session\n"
        "cfg = EngineConfig.from_env(env={'SPARK_GRAFT_FS_CONF':"
        " 'fs.s3a.endpoint=https://example.test:9000'})\n"
        "s = build_session(app_name='fsconf', master='local[1]',"
        " **cfg.session_kwargs())\n"
        "h = s.sparkContext._jsc.hadoopConfiguration()\n"
        "print('GOT:', h.get('fs.s3a.endpoint'))\n"
        "s.stop()\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert "GOT: https://example.test:9000" in out.stdout, out.stderr[-2000:]
