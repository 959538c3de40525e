"""Connected components over a near-duplicate pair graph — the step
that turns pairwise dedup hits (X2/X3 operators) into CLUSTERS, so a
pipeline can keep one canonical document per cluster. The reference
stops at pairwise loading (it has no graph stage); this is part of the
LLM-training-data extension family (SURVEY §2.11).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round, a node adopts the minimum label among
itself and its neighbors; at fixpoint every node carries the minimum
node id of its component (which doubles as a canonical, deterministic
cluster id — no engine-specific numbering).

Scale notes (100 TB):

- One round = one shuffle of the (symmetrized) edge list joined to the
  current labels + a min-aggregate — all hash-partitioned on node id,
  broadcast-free, skew handled by AQE.
- Rounds needed = graph diameter. Near-dup graphs are dense clumps of
  duplicates with tiny diameters (pairs produced by threshold filters
  are near-cliques), so convergence in 2-4 rounds is typical;
  ``max_iter`` caps adversarial chains. (For worst-case chain graphs
  the O(log n)-round large-star/small-star variant [Kiveris et al.,
  "Connected Components in MapReduce and Beyond"] is the upgrade path;
  min-propagation is chosen here because its per-round cost is lower
  and dedup graphs are shallow.)
- ``localCheckpoint`` after every round cuts the lineage chain —
  without it the plan doubles per iteration and the driver re-optimizes
  an exponentially growing tree.
- The convergence probe is a ``count`` of changed labels per round —
  one cheap action over the (already materialized) label table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return ``(id_col, cluster_id)`` where ``cluster_id`` is the
    minimum node id reachable from each node (singletons cluster with
    themselves). ``nodes`` must contain every id that may appear in
    ``edges``; ``edges`` may be directed — it is symmetrized here.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("lab")
    ).localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    converged = False
    for it in range(max_iter):
        neighbor_labs = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("lab"))
        )
        new_labels = (
            labels.union(neighbor_labs)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        # The first round always changes something when any edge
        # exists, so the convergence probe (an extra job) starts at
        # round 2.
        if it > 0:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.lab") != F.col("o.lab"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new_labels
                converged = True
                break
        labels = new_labels
    if not converged:
        # unconverged labels are WRONG (a component would be reported
        # as several clusters) — never return them silently
        raise RuntimeError(
            f"connected_components did not confirm convergence in {max_iter} "
            "rounds — set max_iter > graph diameter (diameter rounds reach "
            "the fixpoint; one more confirms it)"
        )
    return labels.select(F.col("node").alias(id_col), F.col("lab").alias("cluster_id"))
