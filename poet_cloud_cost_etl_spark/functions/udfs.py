"""UDF / UDAF / UDTF surface (SURVEY §2.12).

Engine policy: every hot-path operator compiles to native Column
expressions (tests/test_plans.py enforces no BatchEvalPython in any
registered query). This module *provides the surface anyway* — the
reference's extension points are plain Python functions
(``normalize_aws_cur``, ``_clean_column_name``), and users porting
from it need the equivalent hooks:

- vectorized scalar: ``@pandas_udf`` (Arrow-batched, ~10-100× faster
  than row-at-a-time ``F.udf``)
- grouped aggregate (UDAF): ``@pandas_udf`` over a grouped agg
- grouped map (UDTF-like): ``applyInPandas``
- row-at-a-time ``F.udf``: exists, documented as the slow path

Each example has a native-expression twin; tests verify equivalence so
the examples double as correctness fixtures.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.StringType())
def canon_name_vec(names: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: the N1 column-name
    canonicalization as a data-level function (the reference applies
    it to values too when building table names, main.py:213-227)."""
    return (
        names.str.lower()
        .str.replace(r"[/:\-\s.]", "_", regex=True)
        .str.replace(r"[^0-9a-z_]", "_", regex=True)
        .str.replace(r"^(\d)", r"_\1", regex=True)
    )


@pandas_udf(T.DoubleType())
def weighted_avg_udaf(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): weighted average."""
    w = weights.sum()
    return float((values * weights).sum() / w) if w else float("nan")


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map applyInPandas (UDTF-like): per-group z-score.
    (Expressible natively with window functions — used here as the
    canonical applyInPandas shape.)"""
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("zscore", T.DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=1)
        pdf = pdf.copy()
        pdf["zscore"] = (pdf[value_col] - mu) / sd if sd and sd == sd else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema)


def slow_path_udf_example():
    """Row-at-a-time UDF — provided for completeness; never use in a
    hot path (no codegen, per-row Python round-trip)."""
    return F.udf(lambda s: re.sub(r"[/:\-\s.]", "_", s.lower()) if s else None, T.StringType())


def register_sql_functions(spark) -> None:
    """Expose the engine's Python functions to the SQL surface
    (``spark.udf.register``), so ``spark.sql`` users get the same
    extension points as DataFrame users."""
    spark.udf.register("canon_name", canon_name_vec)
    spark.udf.register("weighted_avg", weighted_avg_udaf)
