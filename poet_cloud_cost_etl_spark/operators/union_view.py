"""U-family set operations: schema-drift-tolerant unions + costs view.

- U1 vertical concat across drifting physical schemas
  (reference ``pd.concat``, ``/root/reference/src/sources/aws_cur.py:131-172``)
  → ``unionByName(allowMissingColumns=True)``.
- U2 the unified ``costs`` UNION ALL view
  (``/root/reference/src/transforms/normalize.py:112-143``,
  ``/root/reference/sql/init.sql:31-56``) → a lazy union registered as
  a temp view; Catalyst folds filters/projections *through* the union
  into each branch's scan, so querying the view is as cheap as
  querying the branches.
- U3 intersect/except complete the set-op family (SURVEY §2.4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from .normalize import NORMALIZED_COLUMNS


def union_by_name(dfs: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """U1: n-way union reconciling columns by name (missing → NULL)."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs)


def create_costs_view(
    spark: SparkSession, normalized: dict[str, DataFrame], view_name: str = "costs"
) -> DataFrame:
    """U2: UNION ALL of every ``*_normalized`` frame, registered as the
    single query interface — the Spark twin of
    ``create_normalized_view_sql`` (normalize.py:112-143)."""
    branches = [df.select(*NORMALIZED_COLUMNS) for df in normalized.values()]
    costs = union_by_name(branches, allow_missing=False)
    costs.createOrReplaceTempView(view_name)
    return costs
