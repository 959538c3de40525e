"""Env-driven deployment configuration.

The reference centralizes deployment knobs in ``Config.from_env``
dataclasses (``/root/reference/src/config.py:32-61``: DB DSN, schema,
input root, account scope). This is the Spark twin: one frozen
dataclass a deployment constructs once (from the environment or
explicitly) and threads through ``pipeline.sync`` / ``build_session``
— instead of each module reading ``os.environ`` ad hoc.

Env surface (all optional, sane local defaults):

- ``SPARK_GRAFT_SF_DIR``     input parquet root (the table directory)
- ``SPARK_GRAFT_OUTPUT``     sink root for raw/normalized/sync_log
- ``SPARK_GRAFT_JDBC_URL``   when set, sync() also lands normalized
                             tables via JDBC (S6); otherwise parquet-only
- ``SPARK_GRAFT_JDBC_DRIVER``/``_USER``/``_PASSWORD`` JDBC properties
- ``SPARK_GRAFT_TABLE_PREFIX`` JDBC table-name prefix (reference
                             schema-qualification analog)
- ``TEST_ACCOUNTS``          comma-separated account scope (reference
                             accounts.py:54-64)
- ``SPARK_GRAFT_CPUS`` / ``SPARK_GRAFT_WAREHOUSE`` /
  ``SPARK_GRAFT_DRIVER_MEM`` session knobs (session.py)
- ``SPARK_GRAFT_FS_CONF``    object-store / filesystem conf
  passthrough: ``;``-separated ``key=value`` pairs applied to the
  session at build time. Hadoop filesystem keys (anything not
  already ``spark.``-prefixed) are prefixed ``spark.hadoop.`` so
  they land in the SparkContext's hadoopConfiguration — the Spark
  twin of the reference's S3 credential wiring
  (``/root/reference/src/sources/aws_cur.py:44-54``). Example::

      SPARK_GRAFT_FS_CONF='fs.s3a.endpoint=https://s3.us-east-1.amazonaws.com;fs.s3a.aws.credentials.provider=org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider'

  Values may contain ``=`` (only the first one splits). See the
  README "Reading from object storage" section for the full recipe.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    sf_dir: str = "/root/testdata/sf0.1"
    output_root: str = "/tmp/spark-graft-output"
    jdbc_url: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    table_prefix: str = ""
    test_accounts: tuple[str, ...] = ()
    cpus: int = 32
    shuffle_partitions: int | None = None
    warehouse_dir: str = "/tmp/spark-graft-warehouse"
    driver_memory: str = "8g"
    fs_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "EngineConfig":
        e = os.environ if env is None else env
        props = {}
        if e.get("SPARK_GRAFT_JDBC_DRIVER"):
            props["driver"] = e["SPARK_GRAFT_JDBC_DRIVER"]
        if e.get("SPARK_GRAFT_JDBC_USER"):
            props["user"] = e["SPARK_GRAFT_JDBC_USER"]
        if e.get("SPARK_GRAFT_JDBC_PASSWORD"):
            props["password"] = e["SPARK_GRAFT_JDBC_PASSWORD"]
        accounts = tuple(
            a.strip() for a in e.get("TEST_ACCOUNTS", "").split(",") if a.strip()
        )
        cpus = int(e.get("SPARK_GRAFT_CPUS", "32"))
        sp = e.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        fs_conf = {}
        for pair in e.get("SPARK_GRAFT_FS_CONF", "").split(";"):
            pair = pair.strip()
            if not pair:
                continue
            if "=" not in pair:
                raise ValueError(
                    f"SPARK_GRAFT_FS_CONF entry {pair!r} is not key=value"
                )
            k, v = pair.split("=", 1)
            fs_conf[k.strip()] = v.strip()
        return cls(
            sf_dir=e.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            output_root=e.get("SPARK_GRAFT_OUTPUT", "/tmp/spark-graft-output"),
            jdbc_url=e.get("SPARK_GRAFT_JDBC_URL") or None,
            jdbc_properties=props,
            table_prefix=e.get("SPARK_GRAFT_TABLE_PREFIX", ""),
            test_accounts=accounts,
            cpus=cpus,
            shuffle_partitions=int(sp) if sp else None,
            warehouse_dir=e.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
            driver_memory=e.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            fs_conf=fs_conf,
        )

    def session_kwargs(self) -> dict:
        """kwargs for session.build_session."""
        extra = {
            "spark.sql.warehouse.dir": self.warehouse_dir,
            "spark.driver.memory": self.driver_memory,
        }
        for k, v in self.fs_conf.items():
            # Hadoop FS keys must travel as spark.hadoop.* to reach the
            # SparkContext's hadoopConfiguration; spark.* keys (e.g.
            # spark.hadoop.* given explicitly) pass through untouched.
            extra[k if k.startswith("spark.") else f"spark.hadoop.{k}"] = v
        return {
            "shuffle_partitions": self.shuffle_partitions or self.cpus,
            "extra_conf": extra,
        }

    def jdbc_table(self, name: str) -> str:
        return f"{self.table_prefix}{name}" if self.table_prefix else name
