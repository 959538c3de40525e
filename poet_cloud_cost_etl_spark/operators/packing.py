"""Token-budget packing: chunk a document stream into ~budget-token
packs (context windows) for LLM training (SURVEY §2.11 extension
family).

Semantics: within each shard, documents are laid end-to-end in key
order and cut into packs of ``budget`` tokens — pack id = exclusive
prefix token sum ÷ budget (the "streaming chunker"; a document whose
tokens straddle a boundary belongs to the pack where it starts).

Scale: packing is inherently sequential, so a single global order
would funnel the corpus through one task. Production pipelines shard
first (one writer per shard) and pack within shards — here the shard
is a hash of the document key, so the layout is deterministic and the
per-shard window is an ordinary hash-partitioned window, no global
sort. Pack identity is the (shard, pack_id) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import unit_hash


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Assign ``(shard, pack_id)`` to each row. ``token_col`` is the
    per-document token count (see ``textstats.token_counts``)."""
    shard = F.pmod(unit_hash(id_col), F.lit(n_shards)).cast("int")
    with_shard = df.select(
        F.col(id_col), F.col(token_col), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return with_shard.select(
        F.col(id_col),
        F.col("shard"),
        F.col(token_col),
        F.floor(prefix / F.lit(budget)).cast("long").alias("pack_id"),
    )
