"""Normalize drifting-schema cost data to the fixed 9-column schema.

Re-expresses the reference's normalize operator family (SURVEY §2.3):

- N1 column-name canonicalization
  (``/root/reference/src/transforms/normalize.py:66``,
  ``/root/reference/src/loaders/postgresql.py:109-123``)
- N2 rename-with-fallback: per target column an ordered candidate
  list; first *present* source column wins, else a typed NULL literal
  (``/root/reference/src/transforms/normalize.py:24-41,71-90``)
- N3 literal metadata columns (``normalize.py:92-95``)
- N4 timestamp→date cast, tolerant (``normalize.py:97-102``)
- N5 string→numeric cast with null-on-error semantics
  (``normalize.py:106`` — ``pd.to_numeric(errors="coerce")``)

Crucially N2 is *driver-side schema resolution*, not a row-wise
coalesce: it inspects ``df.columns`` in Python and emits a plain
``select`` of column references — so Catalyst sees a static 9-column
projection and prunes the parquet scan down to exactly the columns
used (the reference reads all ~100 CUR columns and drops them after
materialization; we never read them).

At 100 TB this operator is a zero-shuffle narrow map over the scan.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The fixed normalized schema (reference normalize.py:11-21).
NORMALIZED_COLUMNS = [
    "date",
    "account_id",
    "service",
    "region",
    "cost",
    "currency",
    "cloud_provider",
    "source_table",
    "sync_timestamp",
]

NORMALIZED_TYPES: dict[str, T.DataType] = {
    "date": T.DateType(),
    "account_id": T.StringType(),
    "service": T.StringType(),
    "region": T.StringType(),
    "cost": T.DoubleType(),
    "currency": T.StringType(),
    "cloud_provider": T.StringType(),
    "source_table": T.StringType(),
    "sync_timestamp": T.TimestampType(),
}

# Primary source-column names per target (reference normalize.py:24-31,
# inverted to target→source because resolution is per target column).
AWS_CUR_PRIMARY = {
    "date": "line_item_usage_start_date",
    "account_id": "line_item_usage_account_id",
    "service": "product_servicename",
    "region": "product_region",
    "cost": "line_item_unblended_cost",
    "currency": "line_item_currency_code",
}

# Ordered alternatives (reference normalize.py:34-41). Order is
# load-bearing: e.g. unblended cost is preferred over blended.
AWS_CUR_ALTERNATIVES = {
    "date": ["lineitem_usagestartdate", "usage_start_date"],
    "account_id": ["lineitem_usageaccountid", "usage_account_id", "bill_payeraccountid"],
    "service": ["product_productname", "lineitem_productcode", "product_name"],
    "region": ["product_location", "lineitem_availabilityzone"],
    "cost": ["lineitem_unblendedcost", "unblended_cost", "lineitem_blendedcost"],
    "currency": ["lineitem_currencycode", "currency_code"],
}

_CANON_RE = re.compile(r"[/:\-\s.]")


def canonical_name(name: str) -> str:
    """N1: lowercase; ``/ : - space .`` → ``_``; leading digit guarded.

    Mirrors reference normalize.py:66 + postgresql.py:109-123.
    """
    cleaned = _CANON_RE.sub("_", name.lower())
    cleaned = re.sub(r"[^0-9a-z_]", "_", cleaned)
    if cleaned and cleaned[0].isdigit():
        cleaned = "_" + cleaned
    return cleaned


def canonicalize_columns(df: DataFrame) -> DataFrame:
    """Apply N1 to every column of ``df`` (pure rename, no shuffle)."""
    return df.toDF(*[canonical_name(c) for c in df.columns])


def resolve_column(
    columns: list[str], target: str, primary: dict[str, str], alternatives: dict[str, list[str]]
) -> Optional[str]:
    """N2 resolution: first present candidate (primary, then ordered
    alternatives) among ``columns``; None if absent."""
    candidates = [primary.get(target, target)] + list(alternatives.get(target, []))
    colset = set(columns)
    for cand in candidates:
        if canonical_name(cand) in colset:
            return canonical_name(cand)
    return None


def normalize(
    df: DataFrame,
    source_table: str,
    sync_timestamp: Optional[datetime] = None,
    primary: dict[str, str] = AWS_CUR_PRIMARY,
    alternatives: dict[str, list[str]] = AWS_CUR_ALTERNATIVES,
    cost_type: Optional[T.DataType] = None,
) -> DataFrame:
    """Normalize a raw (drifting-schema) frame to the 9-column schema.

    Equivalent of reference ``normalize_aws_cur``
    (normalize.py:44-109), expressed as a single narrow ``select``:

    - each mapped target = resolved source column (N2) with the
      target-appropriate cast (N4 date, N5 null-on-error numeric);
    - unresolved targets = typed NULL literal;
    - metadata targets = literals (N3).

    ``cost_type`` overrides the money column type — default double
    (with exact math routed through integer cents downstream), but
    DECIMAL-semantics deployments (reference sql/init.sql:19
    DECIMAL(10,2)) can pass ``T.DecimalType(10, 2)`` and the cast
    stays null-on-error under the pinned non-ANSI session."""
    if sync_timestamp is None:
        sync_timestamp = datetime.utcnow()

    df = canonicalize_columns(df)
    cols = list(df.columns)
    cost_t = cost_type or NORMALIZED_TYPES["cost"]
    projection = []
    for target in ("date", "account_id", "service", "region", "cost", "currency"):
        src = resolve_column(cols, target, primary, alternatives)
        if src is None:
            expr = F.lit(None).cast(cost_t if target == "cost" else NORMALIZED_TYPES[target])
        elif target == "date":
            # N4: tolerant timestamp/string → date (invalid → NULL).
            expr = F.try_to_timestamp(F.col(src).cast("string")).cast("date")
        elif target == "cost":
            # N5: numeric coercion, null-on-error.
            expr = F.col(src).cast(cost_t)
        else:
            expr = F.col(src).cast(NORMALIZED_TYPES[target])
        projection.append(expr.alias(target))

    projection += [
        F.lit("aws").alias("cloud_provider"),
        F.lit(source_table).alias("source_table"),
        F.lit(sync_timestamp).cast("timestamp").alias("sync_timestamp"),
    ]
    return df.select(*projection)


def normalize_mapped(
    df: DataFrame,
    source_table: str,
    mapping: dict[str, "F.Column"],
    cloud_provider: str,
    sync_timestamp: datetime,
    cost_type: Optional[T.DataType] = None,
) -> DataFrame:
    """Generalized normalize for non-CUR sources (the ``BaseSource``
    plugin recipe, reference ``src/sources/base.py:8-22`` +
    CLAUDE.md:101-105): caller supplies Column expressions for the six
    data columns; metadata columns are stamped here.

    ``cost_type`` mirrors ``normalize``'s money override: pass e.g.
    ``T.DecimalType(38, 10)`` for DDL parity with the reference's
    DECIMAL cost column (sql/init.sql:19) — decimal sums are then
    exact at any scale, with no integer-cents detour needed."""
    proj = []
    for target in ("date", "account_id", "service", "region", "cost", "currency"):
        expr = mapping.get(target, F.lit(None))
        t = cost_type if (target == "cost" and cost_type is not None) \
            else NORMALIZED_TYPES[target]
        proj.append(expr.cast(t).alias(target))
    proj += [
        F.lit(cloud_provider).alias("cloud_provider"),
        F.lit(source_table).alias("source_table"),
        F.lit(sync_timestamp).cast("timestamp").alias("sync_timestamp"),
    ]
    return df.select(*proj)
