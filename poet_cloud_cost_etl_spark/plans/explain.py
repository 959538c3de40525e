"""Plan-inspection helpers: programmatic access to what
``df.explain("formatted")`` shows, so tests can assert the physical
properties the 100 TB design depends on (SURVEY §4):

- filters reach the parquet scan (PushedFilters)
- projections prune the read schema (ReadSchema)
- dim joins broadcast (BroadcastHashJoin / BroadcastExchange)
- partition filters prune directories (PartitionFilters)
- expressions stay inside WholeStageCodegen
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols += re.findall(r"(\w+):", line.split("struct<", 1)[-1])
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_partition_filters(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PartitionFilters" in line and fragment in line:
            return True
    return False


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower is better)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


def final_physical_plan(df: DataFrame) -> str:
    """Execute the query, then read the *final* adaptive plan (AQE
    re-plans at runtime; codegen stages only appear post-execution)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_stage_count(df: DataFrame) -> int:
    """Codegen stages in the final plan — rendered either as
    'WholeStageCodegen (n)' or the compact '*(n)' operator prefix."""
    import re

    plan = final_physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return max(len(ids), plan.count("WholeStageCodegen"))
