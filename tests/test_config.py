"""EngineConfig (reference src/config.py:32-61 parity): env-driven
deployment knobs, threaded through pipeline.sync including the JDBC
leg against embedded Derby."""

from __future__ import annotations

from datetime import datetime

from poet_cloud_cost_etl_spark.config import EngineConfig
from poet_cloud_cost_etl_spark.pipeline import sync


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
