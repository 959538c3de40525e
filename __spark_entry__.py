"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``poet_cloud_cost_etl_spark/`` — queries.py
holds the Spark-side callables, oracles.py the DuckDB SQL twins.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from poet_cloud_cost_etl_spark import oracles as _oracles  # noqa: E402
from poet_cloud_cost_etl_spark import queries as _queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    headline "total cost by service over a date window"
    (/root/reference/README.md:125-130) run through the full
    scan→normalize→union-view→aggregate→sort pipeline."""
    return _queries.QUERIES["costs_by_service_30d"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys (non-SQL-expressible
    ops) get the driver's weaker rows-only check."""
    return dict(_oracles.ORACLES)
