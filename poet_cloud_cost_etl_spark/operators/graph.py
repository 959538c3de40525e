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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    algo: str = "minlabel",
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Return ``(id_col, cluster_id)`` where ``cluster_id`` is the
    minimum node id reachable from each node (singletons cluster with
    themselves). ``nodes`` must contain every id that may appear in
    ``edges``; ``edges`` may be directed — it is symmetrized here.

    ``algo="minlabel"`` (default): diameter-round min propagation —
    lowest per-round cost, right for the shallow near-clique graphs
    dedup thresholds produce. ``algo="star"``: the O(log n)-round
    large-star/small-star alternation — right for graphs that may
    contain long chains (e.g. transitive similarity at low
    thresholds).  Both return identical labels (pinned by
    tests/test_graph.py).

    ``fixed_rounds`` (minlabel only): when the diameter bound is known
    a priori (threshold near-dup graphs are near-cliques, diameter
    ≤ ~4), run exactly that many propagation rounds with LAZY
    checkpoints — one Spark job materializes the whole chain instead
    of a driver-synced job + probe per round — then ONE confirming
    round verifies the fixpoint. Too small a bound still NEVER
    returns wrong labels: the confirmation raises instead."""
    if algo == "star":
        if fixed_rounds is not None:
            raise ValueError(
                "fixed_rounds is a minlabel-only optimization; "
                "algo='star' schedules its own rounds"
            )
        return _connected_components_star(
            nodes, edges, id_col, src_col, dst_col, max_iter
        )
    if algo != "minlabel":
        raise ValueError(f"unknown algo {algo!r} (want 'minlabel' or 'star')")
    # r14 job-count surgery (guide §2.4/§5). Three structural moves,
    # all label-identical:
    #
    # 1. SELF-LOOP propagation: the adjacency carries one (v, v,
    #    is_self=true) row per node, so a round is join → aggregate
    #    with the label table referenced EXACTLY ONCE (the former
    #    labs.union(neighbor_labs) referenced it twice — one more
    #    exchange per round, and any un-materialized labs fed two
    #    concurrent map stages that each recomputed its whole chain).
    #    min over {lab(v)} ∪ {lab(u): u~v} is unchanged; shuffle
    #    volume per round (|V| + 2|E| rows into the aggregate) is
    #    unchanged.
    # 2. The PREVIOUS label rides the same aggregate (min of the
    #    self-row's lab — exactly one self row per node), so the
    #    fixpoint probe is a scan-filter over the round's own
    #    materialized output: the former separate confirm-join job is
    #    gone.
    # 3. Rounds chain through LAZY checkpoints (lineage cut, RDD
    #    persisted, each round referenced once by the next) and only
    #    the probe round is EAGER — fixed_rounds runs as ONE
    #    driver-synced job + one scan-count, instead of five jobs.
    #    The adjacency stays EAGER: its map stages are independent of
    #    the round chain, so a lazy adjacency would be recomputed by
    #    every round's concurrently-submitted join stage — measured
    #    2× slower on the CC-heavy bench subset, not a win.
    # Single-reference symmetrization (r14): both orientations explode
    # out of ONE pass over the edge list — the former union of two
    # selects referenced the (typically expensive) upstream pair chain
    # twice, and two union branches are two concurrently-submitted map
    # stages that each re-execute everything after the pair core's
    # internal checkpoint.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .select("a", "b", F.lit(False).alias("is_self"))
        .unionByName(
            nodes.select(
                F.col(id_col).alias("a"),
                F.col(id_col).alias("b"),
                F.lit(True).alias("is_self"),
            )
        )
        .localCheckpoint(eager=True)
    )
    # Initial labels come from the MATERIALIZED self rows, not from
    # ``nodes`` directly — the node frame may itself be an expensive
    # pipeline (e.g. a kNN-derived vertex set), and referencing it here
    # would execute it a second time (r14: measured 1.6× on
    # mutual_knn_clusters, whose nodes are the gemm top-k vertex set).
    labels = sym.filter(F.col("is_self")).select(
        F.col("a").alias("node"), F.col("a").alias("lab")
    )

    def _propagate(labs: DataFrame, with_prev: bool = False) -> DataFrame:
        joined = sym.join(labs, sym["b"] == labs["node"])
        aggs = [F.min("lab").alias("lab")]
        if with_prev:
            aggs.append(
                F.min(F.when(F.col("is_self"), F.col("lab"))).alias("__prev")
            )
        return (
            joined.select(F.col("a").alias("__n"), "lab", "is_self")
            .groupBy("__n")
            .agg(*aggs)
            .withColumnRenamed("__n", "node")
        )

    def _probe_round(labs: DataFrame) -> DataFrame:
        """One propagation with the previous label folded into the
        same aggregate.  LAZY checkpoint (r15): the `_changed` count
        that immediately follows is the materializing action — the
        lazy-checkpointed RDD persists during that count and Spark's
        doCheckpoint backfills any partitions the limit(1) short-
        circuit skipped, so the former separate eager-checkpoint job
        is folded into the probe count: ONE driver sync per probe
        instead of two.  (Unlike the adjacency, `both` has no
        concurrent consumers — the count runs strictly before the
        next reference — so the r14 lazy-recompute race cannot
        occur.)"""
        return _propagate(labs, with_prev=True).localCheckpoint(eager=False)

    def _changed(both: DataFrame) -> int:
        # NULL-safe (r15, ADVICE r14): an edge endpoint missing from
        # ``nodes`` has no self row, so its __prev is NULL — under the
        # old `lab != __prev` the row silently dropped out and a round
        # where only such nodes changed read as converged (wrong split
        # components returned instead of a loud error).  The docstring
        # contract (nodes ⊇ edge endpoints) makes __prev non-NULL for
        # every compliant caller; a violation now keeps probing (and
        # fails the fixed_rounds confirm) instead of lying.
        # Full-scan count, NOT limit(1): the probe frame is a LAZY
        # checkpoint and this count is its materializing action — a
        # limit runs CollectLimit's incremental partition rounds (1,
        # then 4×, ...), each a separate driver-synced job, and then
        # doCheckpoint backfills whatever the early-out skipped
        # (measured r15: the limit form was ~0.5-1 s SLOWER per CC
        # query than this single-pass count).
        return both.filter(
            (F.col("lab") != F.col("__prev")) | F.col("__prev").isNull()
        ).count()

    if fixed_rounds is not None:
        # fixed_rounds lazy rounds + the eager probe round = one
        # materializing job; the confirm is the probe round itself.
        for _ in range(fixed_rounds):
            labels = _propagate(labels).localCheckpoint(eager=False)
        both = _probe_round(labels)
        if _changed(both) != 0:
            raise RuntimeError(
                f"connected_components(fixed_rounds={fixed_rounds}) had not "
                "reached the fixpoint — the graph's diameter exceeds the "
                "assumed bound; raise fixed_rounds or use the probe path"
            )
        return both.select(
            F.col("node").alias(id_col), F.col("lab").alias("cluster_id")
        )

    converged = False
    it = 0
    while it < max_iter:
        # Two propagation rounds per materialization+probe: labels are
        # MONOTONE non-increasing under propagation, so the chunk
        # probe (round 2k vs 2k−1) detects exactly the fixpoint the
        # per-round probe found, at half the driver-job count.
        step = min(2, max_iter - it)
        for _ in range(step - 1):
            labels = _propagate(labels).localCheckpoint(eager=False)
        both = _probe_round(labels)
        it += step
        if _changed(both) == 0:
            converged = True
            labels = both
            break
        labels = both.select("node", "lab")
    if not converged:
        # unconverged labels are WRONG (a component would be reported
        # as several clusters) — never return them silently
        raise RuntimeError(
            f"connected_components did not confirm convergence in {max_iter} "
            "rounds — set max_iter > graph diameter (diameter rounds reach "
            "the fixpoint; one more confirms it)"
        )
    return labels.select(F.col("node").alias(id_col), F.col("lab").alias("cluster_id"))


def _connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int,
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", public paper). Converges in
    O(log n) rounds even on chain graphs, vs diameter rounds for min
    propagation.

    Each half-round is a single hash shuffle: the neighborhood minimum
    is a window ``min`` partitioned by the star center (no join), and
    the emitted edges stay oriented big→small so small-star can group
    without re-symmetrizing.

    - large-star(u): m = min(N(u) ∪ {u}); for each neighbor v > u emit
      (v, m) — hooks big neighbors onto u's best-known root.
    - small-star(u) over big→small edges: m = min(N⁻(u)); emit (u, m)
      and (v, m) for the other small neighbors — flattens partial
      paths into stars.

    Fixpoint = edge set unchanged after a full round (checked with an
    ``exceptAll ... limit 1`` probe, cheap on the already-checkpointed
    sets); at fixpoint the edges form stars rooted at component minima.
    """
    # canonical undirected pair set, oriented big→small
    pairs = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    converged = pairs.limit(1).count() == 0  # no edges: all singletons
    for _ in range(max_iter):
        if converged:
            break
        # -- large-star: group the symmetrized adjacency by u --------
        adj = pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        w = Window.partitionBy("u")
        with_min = adj.select(
            "u", "v", F.least(F.col("u"), F.min("v").over(w)).alias("m")
        )
        large = (
            with_min.filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: edges already oriented u > v ----------------
        w2 = Window.partitionBy("u")
        with_min2 = large.select("u", "v", F.min("v").over(w2).alias("m"))
        small = (
            with_min2.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(with_min2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Convergence probe: edge-set fixpoint of the COMPOSED round
        # (large-star then small-star), not a per-half-step check as in
        # the Kiveris et al. formulation. Sufficiency rests on the
        # paper's potential-function argument (each composed round is
        # monotone non-increasing in the potential, and a composed
        # fixpoint is star-shaped); equivalence to minlabel is pinned
        # by tests/test_graph.py on fixtures, chains, and the real
        # near-dup pair graph.
        changed = (
            small.exceptAll(pairs).limit(1).count()
            + pairs.exceptAll(small).limit(1).count()
        )
        pairs = small
        converged = changed == 0
    if not converged:
        raise RuntimeError(
            f"connected_components(algo='star') did not converge in {max_iter} "
            "rounds — raise max_iter (O(log n) rounds suffice)"
        )
    # stars: u → root v. Root of a center is itself; singletons absent.
    labels = pairs.select(F.col("u").alias("node"), F.col("v").alias("lab"))
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("lab", "node").alias("cluster_id"),
        )
    )


def pagerank_ppm(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    iters: int = 8,
    damping_pct: int = 85,
) -> DataFrame:
    """X78: PageRank over an undirected pair graph in EXACT ppm
    integer arithmetic — the template/hub detector for the near-dup
    graph: a boilerplate page that half the crawl partially copies
    accumulates rank from every neighbor, while members of a closed
    duplicate cluster stay near uniform.  Curation reviews the top
    of this ranking the way search reviewed link hubs.

    Semantics: edges are symmetrized (a→b and b→a); scores start at
    1e6 ppm-of-uniform per node and update
    p' = (100 − d)·1e4 + (d · Σ_j p_j div deg_j) div 100
    for exactly ``iters`` rounds with damping d = ``damping_pct``.
    ALL integer arithmetic: per-neighbor contributions are integer
    divisions and the neighbor sum is an order-free integer SUM — no
    float summation-order hazard in either engine (the repo's ppm
    convention; the div-truncation mass loss is part of the pinned
    definition, bounded by deg per node per round).  Isolated nodes
    never enter (no edges — rank is about the graph).

    Scale: per iteration one (dst-keyed) aggregate over the edge
    list joined to the current score table — the textbook
    edge-partitioned PageRank; scores/degrees are node-sized.
    The symmetrized (src, dst, deg) edge frame is materialized ONCE
    (localCheckpoint) before the loop: the upstream edge list is
    typically an expensive LSH/similarity-join chain, and without
    the pin every iteration would replay it from the parquet scan —
    8 iterations cost 8 pair-generations instead of 1.
    localCheckpoint per round caps the score lineage exactly like
    CC."""
    # Single-reference symmetrization (r14; see connected_components).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("src"),
                        F.col(dst_col).alias("dst"),
                    ),
                    F.struct(
                        F.col(dst_col).alias("src"),
                        F.col(src_col).alias("dst"),
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # r14: the 8 per-iteration checkpoints are LAZY (lineage cut, RDD
    # persisted, each iteration referenced once by the next) so the
    # whole chain materializes inside the caller's single job — the
    # former eager form was 8 driver-synced jobs.  sym_deg stays EAGER:
    # its join stage is independent of the score chain, so every
    # iteration's concurrently-submitted map stage would recompute a
    # lazy sym_deg (and its upstream pair generation) from scratch.
    sym_deg = sym.join(deg, "src").localCheckpoint(eager=True)
    deg = sym_deg.select("src", "deg").distinct()
    p = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("p")
    )
    base = (100 - damping_pct) * 10_000
    for _ in range(int(iters)):
        contrib = (
            sym_deg.join(p, sym_deg.src == p.node)
            .select(F.col("dst"), F.expr("p div deg").alias("c"))
        )
        p = (
            contrib.groupBy("dst")
            .agg(F.sum("c").cast("long").alias("__s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"{base} + ({damping_pct} * __s) div 100"
                ).cast("long").alias("p"),
            )
            .localCheckpoint(eager=False)
        )
    return p.select(
        F.col("node"),
        (F.col("p").cast("double") / 1_000_000.0).alias("pagerank"),
    )


def hyperedge_components(
    members: DataFrame,
    group_cols: list[str],
    member_col: str,
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 20,
) -> DataFrame:
    """X89: connected components over HYPEREDGES (group-membership
    tables) without ever materializing in-group pairs — the scale
    path for LSH-bucket clustering: X7 expands each bucket of m docs
    into m·(m−1)/2 candidate pairs before clustering, which is
    exactly the quadratic blow-up the skew split exists to contain;
    but when the goal is the CLUSTERS (not scored pairs), the
    expansion is pure waste.  A bucket is a hyperedge — replace its
    clique with the m−1 STAR edges (member → bucket-min) and the
    connected components are IDENTICAL (each bucket stays internally
    connected through its min; unions of buckets compose unchanged —
    asserted against the clique expansion by test).  Pair count
    drops from Σ m²/2 to Σ m, and a degenerate 10⁶-member bucket
    (the hot-bucket hazard) costs 10⁶ edges, not 5·10¹¹.

    This is the standard single-linkage trick in minhash dedup at
    corpus scale (the "bucket → union-find" formulation of
    Lee et al. 2022 Deduplicating Training Data Makes LMs Better —
    pair scoring is skipped entirely when banding alone decides).

    ``members``: one row per (group, member); ``nodes`` defaults to
    the distinct members (pass the full corpus to cluster singletons
    with themselves).

    Scale: one group-keyed min-window (map-side combinable via the
    groupBy/join form below — no collect_list), then the shared
    minlabel/checkpoint CC machinery over a member-count-sized edge
    list."""
    g = [F.col(c) for c in group_cols]
    # The membership table feeds BOTH the bucket-min aggregate and the
    # star join (and the default nodes) — materialize it once (r14):
    # un-pinned, each reference re-executed the whole upstream banded-
    # signature chain (the expensive md5 pipeline) in its own stage.
    members = members.localCheckpoint(eager=True)
    mins = members.groupBy(*g).agg(F.min(member_col).alias("__gmin"))
    star = (
        members.join(mins, group_cols)
        .filter(F.col(member_col) != F.col("__gmin"))
        .select(
            F.col(member_col).alias("src"), F.col("__gmin").alias("dst")
        )
        .distinct()
    )
    if nodes is None:
        nodes = members.select(F.col(member_col).alias(id_col)).distinct()
    return connected_components(
        nodes, star, id_col=id_col, max_iter=max_iter
    )


def cluster_hops(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """X94: hop distance from every node to its cluster canonical
    (the min-id root) — the DEPTH companion to X82's edge-density
    audit: a near-dup cluster whose members sit many hops from the
    survivor was built by TRANSITIVE chaining (A≈B≈C≈D with A≉D),
    exactly the over-merge mode a pairwise threshold can't see.
    radius (max hops) per cluster is the review dial: radius ≤ 1 is
    a star of true dups; radius ≥ 3 at a 0.5 threshold deserves a
    human look before the cluster collapses to one survivor.

    Semantics: BFS level over the symmetrized graph from each
    component's min-id node (components computed here via the shared
    CC machinery, so labels and roots agree with X7 by
    construction).  Exact integers; singletons have hops 0.

    Scale: CC (shared machinery) + diameter-many min-plus rounds,
    each one edge-keyed join + node-keyed min aggregate with
    localCheckpoint lineage cuts — same per-round shape and cost as
    one CC round.  Convergence is confirmed (a round that changes
    nothing), never assumed."""
    labels = connected_components(
        nodes, edges, id_col=id_col, src_col=src_col, dst_col=dst_col,
        max_iter=max_iter,
    )
    # r14: the same self-loop/lazy-round/folded-probe surgery as the
    # minlabel CC (see connected_components) — a relax round is join →
    # aggregate with the distance table referenced ONCE (the self row
    # contributes d + 0, a neighbor d + 1), the previous distance
    # rides the same aggregate, rounds chain lazily in chunks of 2
    # with one eager probe round each.  Exact by monotonicity:
    # min-plus relaxation never increases a distance, so the chunk
    # probe detects exactly the fixpoint the per-round probe found.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .select("a", "b", F.lit(False).alias("is_self"))
        .unionByName(
            nodes.select(
                F.col(id_col).alias("a"),
                F.col(id_col).alias("b"),
                F.lit(True).alias("is_self"),
            )
        )
        .localCheckpoint(eager=True)
    )
    INF = 1_000_000_000
    dist = labels.select(
        F.col(id_col).alias("node"),
        F.when(F.col(id_col) == F.col("cluster_id"), F.lit(0))
        .otherwise(F.lit(INF))
        .cast("long")
        .alias("d"),
    )

    def _relax(dd: DataFrame, with_prev: bool = False) -> DataFrame:
        joined = sym.join(dd, sym["b"] == dd["node"]).select(
            F.col("a").alias("__n"),
            (
                F.col("d")
                + F.when(F.col("is_self"), F.lit(0)).otherwise(F.lit(1))
            ).alias("d"),
            "is_self",
        )
        aggs = [F.min("d").alias("d")]
        if with_prev:
            aggs.append(
                F.min(
                    F.when(F.col("is_self"), F.col("d"))
                ).alias("__prev")
            )
        return joined.groupBy("__n").agg(*aggs).withColumnRenamed("__n", "node")

    converged = False
    it = 0
    while it < max_iter:
        step = min(2, max_iter - it)
        for _ in range(step - 1):
            dist = _relax(dist).localCheckpoint(eager=False)
        # LAZY probe checkpoint (r15) — materialized by the change
        # count below; same fold as connected_components._probe_round.
        both = _relax(dist, with_prev=True).localCheckpoint(eager=False)
        it += step
        # NULL-safe change probe (r15, ADVICE r14 — same contract
        # guard as connected_components._changed): a node without a
        # self row has NULL __prev and would otherwise hide its change
        # from the probe while ALSO losing its d+0 relax term.
        # Full-scan count (see connected_components._changed): one
        # materializing job for the lazy probe, no incremental-limit
        # job rounds.
        if (
            both.filter(
                (F.col("d") != F.col("__prev")) | F.col("__prev").isNull()
            ).count()
            == 0
        ):
            dist = both.select("node", "d")
            converged = True
            break
        dist = both.select("node", "d")
    if not converged:
        raise RuntimeError(
            f"cluster_hops did not stabilize in {max_iter} rounds — "
            "raise max_iter above the graph diameter"
        )
    return (
        labels.join(dist, labels[id_col] == dist["node"])
        .select(F.col(id_col), F.col("cluster_id"), F.col("d").alias("hops"))
    )


def modularity(
    clusters: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """X124: Newman-Girvan modularity of a clustering over an
    evidence graph (Newman & Girvan 2004) — the one-number answer
    to "is this dedup partition real structure or an artifact of
    the threshold?": Q = Σ_c [e_c/m − (d_c/2m)²] compares each
    cluster's internal edge fraction against the degree-preserving
    null model.  Q near 0 means the clustering explains nothing
    beyond degrees (threshold too low — one giant hairball); the
    complement to X82's per-cluster density: X82 flags WHICH
    clusters are chain-merges, Q scores the partition as a whole,
    tracked across threshold dials.

    Exactness: all counts (m, per-cluster within-edges e_c, degree
    sums d_c) are exact integers in DECIMAL(38,0) (Σd_c² reaches
    4m², the X111 overflow argument); obs_ppm = (10⁶·Σe_c) div m
    and exp_ppm = (10⁶·Σd_c²) div (4m²) are exact NON-NEGATIVE
    integer divisions, and modularity_ppm := obs_ppm − exp_ppm — a
    difference of two floored ppms, deterministic and
    engine-identical, never a negative-numerator division (Spark
    div truncates, DuckDB // floors; the X120 trap).  m = 0 →
    NULLs (X91).

    Scale: two id-keyed label joins (the volumes CC already
    processed), one degree aggregate, two cluster-keyed aggregates,
    and a 1-row panel.  Nothing touches more than the edge list."""
    lab = clusters.select(F.col(id_col).alias("__id"), "cluster_id")
    e2 = (
        edges.select(F.col(src_col).alias("__a"), F.col(dst_col).alias("__b"))
        .join(lab.withColumnRenamed("__id", "__a").withColumnRenamed(
            "cluster_id", "__ca"), "__a")
        .join(lab.withColumnRenamed("__id", "__b").withColumnRenamed(
            "cluster_id", "__cb"), "__b")
    )
    within = e2.filter("__ca = __cb").groupBy("__ca").agg(
        F.count(F.lit(1)).alias("ec")
    )
    deg = (
        edges.select(
            F.explode(F.array(F.col(src_col), F.col(dst_col))).alias("__id")
        )
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dc = deg.join(lab, "__id").groupBy("cluster_id").agg(
        F.sum("d").alias("dcs")
    )
    m = edges.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m"))
    s = (
        dc.join(within, dc.cluster_id == within["__ca"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum(F.coalesce("ec", F.lit(0))).cast("decimal(38,0)").alias(
                "sum_ec"
            ),
            F.sum(F.expr("CAST(dcs AS DECIMAL(38,0)) * dcs")).alias(
                "sum_dc2"
            ),
        )
        .crossJoin(F.broadcast(m))
    )
    return s.select(
        F.expr("CAST(m AS BIGINT)").alias("n_edges"),
        "n_clusters",
        F.expr(
            "CASE WHEN m > 0 THEN CAST((1000000 * sum_ec) div m AS BIGINT) "
            "END"
        ).alias("obs_within_ppm"),
        F.expr(
            "CASE WHEN m > 0 THEN "
            "CAST((1000000 * sum_dc2) div (4 * m * m) AS BIGINT) END"
        ).alias("exp_within_ppm"),
        F.expr(
            "CASE WHEN m > 0 THEN "
            "CAST((1000000 * sum_ec) div m - "
            "(1000000 * sum_dc2) div (4 * m * m) AS BIGINT) END"
        ).alias("modularity_ppm"),
    )
