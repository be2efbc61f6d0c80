"""Integer-exact PageRank over an edge list.

Iterative link analysis as a Spark DataFrame loop — the engine-side
pattern for fixed-point graph algorithms (the same family as
operators/clustering's hash-min connected components, but with a fixed
iteration count instead of a convergence probe).

Determinism discipline: classic double-precision PageRank accumulates
contributions in partition order, so low bits (and any rounded hash)
drift between runs and engines. Here ALL rank mass is integer:

- ranks are scaled to ``SCALE`` (1e12) and stored as BIGINT;
- each node's contribution is ``rank DIV out_degree`` — exact integer
  division (Spark ``DIV`` ⇄ DuckDB ``//``), truncating the remainder
  (a deterministic, engine-portable leak of < out_degree units per
  node per round — negligible at SCALE and identical on both sides);
- the damping step is ``base + floor(0.85d * sum)`` where the sum is an
  exact integer (associative — partition-order-free) and the single
  double multiply is deterministic IEEE (the oracle casts to DOUBLE
  explicitly: DuckDB's bare ``0.85 * HUGEINT`` would be exact decimal
  arithmetic and disagree with Spark's double).

Scale notes (billions of edges):
- per iteration: one equi-join of ranks to edges on the source key and
  one partial-agg shuffle on the destination key — both hash-partitioned
  on node id; no broadcast of anything data-sized; degree rides with a
  second small join that shares the source-key partitioning;
- the driver only coordinates the loop (``iters`` plans); node count is
  the single collected scalar. For large ``iters`` pass
  ``checkpoint_every`` to truncate lineage with localCheckpoint, exactly
  as operators/clustering does;
- isolated nodes (no edges) are out of scope by construction — callers
  union them back with the base rank if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import graph_prepartition

#: Rank mass is SCALE split across nodes; BIGINT throughout.
SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 0,
    broadcast_ranks: bool = False,
    assume_symmetric_distinct: bool = False,
) -> DataFrame:
    """Ranks after ``iters`` synchronous iterations: (v, rank_scaled).

    ``edges`` is a directed edge list (symmetrize first for undirected
    graphs); parallel edges are deduplicated. Every node must appear as
    a source (true for symmetrized graphs) — dangling mass is therefore
    zero and needs no redistribution term.
    """
    # Materialize the (possibly expensive) edge derivation ONCE — every
    # iteration's plan re-reads it, and without the persist Spark would
    # recompute the upstream joins/distincts per round. On a cluster with
    # billions of edges this is the step to replace with a checkpoint to
    # durable storage.
    # ... and partition it by the join key: the per-iteration join
    # requires hash(src), but distinct() leaves hash(src, dst) — without
    # the explicit repartition every round re-shuffles the EDGE list
    # (the largest table in the job, iters× over). With it, the cached
    # layout satisfies the join's distribution and only the node-sized
    # rank table moves per round.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_symmetric_distinct:
        # the caller's edge list may carry parallel edges — dedup here;
        # producers that already emit the distinct symmetric set (e.g.
        # copurchase_edges) skip this exchange (guide §2.4)
        e = e.distinct()
    if not broadcast_ranks:
        # pre-partition for the per-iteration sort-merge join; under
        # broadcast_ranks the edge join is a broadcast hash join with no
        # distribution requirement, so this shuffle would be pure waste
        e = e.repartition(F.col("src"))
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    nodes = e.select(F.col("src").alias("v")).distinct().persist()
    n = nodes.count()
    if n == 0:
        return nodes.select("v", F.lit(0).cast("bigint").alias("rank_scaled"))
    base = int((1.0 - damping) * float(SCALE) / n)  # floor of a double — IEEE
    ranks = nodes.select("v", F.lit(SCALE // n).cast("bigint").alias("r"))
    for i in range(iters):
        # broadcast_ranks: the node-sized (rank ⋈ degree) table ships to
        # every executor and the edge list is NEVER sorted or shuffled —
        # the right plan whenever nodes ≪ edges and the node table fits
        # the broadcast budget (here: the bounded part dimension). The
        # default shuffle form is the billion-node-safe path.
        rd = ranks.join(deg, ranks.v == deg.src).select(
            "src", F.expr("r DIV deg").alias("_share")
        )
        if broadcast_ranks:
            rd = F.broadcast(rd)
        contrib = e.join(rd, "src").select(
            F.col("dst").alias("v"), F.col("_share").alias("c")
        )
        summed = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        ranks = nodes.join(summed, "v", "left").select(
            "v",
            (
                F.lit(base)
                + F.floor(
                    F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                )
            ).cast("bigint").alias("r"),
        )
        if broadcast_ranks:
            # each broadcast COLLECTS ranks — without truncating lineage
            # the collect at iteration i re-executes every earlier
            # iteration's edge join (O(iters²) total). The table is
            # node-sized, so an eager checkpoint per round is cheap and
            # keeps the broadcast path O(iters).
            ranks = ranks.localCheckpoint(eager=True)
        elif checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    # Materialize the result, then release the loop-scoped caches — a
    # library operator must not leak executor storage to its caller
    # (verify-style harnesses run the whole registry in one session).
    out = ranks.select("v", F.col("r").alias("rank_scaled")).localCheckpoint(
        eager=True
    )
    for cached in (e, deg, nodes):
        cached.unpersist()
    return out


def pagerank_converged(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    tol_denom: int = 1000,
    max_iters: int = 10,
    damping: float = 0.85,
    broadcast_ranks: bool = False,
    assume_symmetric_distinct: bool = False,
) -> tuple[DataFrame, int]:
    """PageRank with CONVERGENCE termination instead of a fixed count:
    iterate until ``max_v |r_k(v) − r_{k−1}(v)| ≤ tol`` or ``max_iters``.
    Returns ``(ranks, n_iters)`` where ranks is (v, rank_scaled) and
    n_iters is the number of iterations actually executed.

    ``tol = SCALE DIV n DIV tol_denom`` — a fixed fraction (1/tol_denom)
    of the uniform initial rank, so the stopping rule is scale-free and,
    being integer arithmetic end to end, DETERMINISTIC across engines:
    an unrolled SQL replay picks the identical iteration count (the
    `pagerank_converged_topk` oracle does exactly that). Same probe
    pattern as operators/clustering's ``_changed`` loop: each round
    materializes the node-sized rank table (eager localCheckpoint — also
    truncates lineage, so the loop is O(iters) not O(iters²)) and
    collects ONE scalar (the max delta) — rank mass itself never touches
    the driver. Per-round cost is identical to :func:`pagerank`; the
    probe adds one node-sized join-aggregate.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_symmetric_distinct:
        # the caller's edge list may carry parallel edges — dedup here;
        # producers that already emit the distinct symmetric set (e.g.
        # copurchase_edges) skip this exchange (guide §2.4)
        e = e.distinct()
    if not broadcast_ranks:
        e = e.repartition(F.col("src"))
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    nodes = e.select(F.col("src").alias("v")).distinct().persist()
    n = nodes.count()
    if n == 0:
        out = nodes.select("v", F.lit(0).cast("bigint").alias("rank_scaled"))
        for cached in (e, deg, nodes):
            cached.unpersist()
        return out, 0
    base = int((1.0 - damping) * float(SCALE) / n)
    tol = SCALE // n // tol_denom
    ranks = nodes.select("v", F.lit(SCALE // n).cast("bigint").alias("r"))
    ranks = ranks.localCheckpoint(eager=True)
    iters_run = 0
    for _ in range(max_iters):
        rd = ranks.join(deg, ranks.v == deg.src).select(
            "src", F.expr("r DIV deg").alias("_share")
        )
        if broadcast_ranks:
            rd = F.broadcast(rd)
        contrib = e.join(rd, "src").select(
            F.col("dst").alias("v"), F.col("_share").alias("c")
        )
        summed = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        new_ranks = nodes.join(summed, "v", "left").select(
            "v",
            (
                F.lit(base)
                + F.floor(
                    F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                )
            ).cast("bigint").alias("r"),
        ).localCheckpoint(eager=True)
        iters_run += 1
        delta = (
            new_ranks.alias("new")
            .join(ranks.alias("old"), "v")
            .agg(F.max(F.abs(F.col("new.r") - F.col("old.r"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks = new_ranks
        if delta is not None and delta <= tol:
            break
    out = ranks.select("v", F.col("r").alias("rank_scaled"))
    for cached in (e, deg, nodes):
        cached.unpersist()
    return out, iters_run


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Symmetric DISTINCT co-purchase edge list: two parts are linked
    when they appear in the same order. The self-join keys on the order
    id (one hash shuffle, per-order quadratic bounded by basket size).

    r16 shape (guide §2.3 — shuffle fewer bytes): the join emits each
    undirected pair ONCE via the ``<`` predicate (half the rows of the
    old ``<>`` form), the distinct runs at that canonical half grain,
    and the reverse direction is a narrow post-distinct union — the
    dedup exchange carries HALF the bytes it used to, and consumers
    that need the distinct symmetric set (pagerank / LPA) can skip
    their own re-distinct via ``assume_symmetric_distinct=True``
    instead of re-shuffling the largest table in the job (§2.4:
    a distinct on data that is already unique is an accidental
    exchange)."""
    li = lineitem.select(order_col, item_col).distinct()
    a = li.alias("a")
    b = li.alias("b")
    half = (
        a.join(
            b,
            (F.col(f"a.{order_col}") == F.col(f"b.{order_col}"))
            & (F.col(f"a.{item_col}") < F.col(f"b.{item_col}")),
        )
        .select(
            F.col(f"a.{item_col}").alias("src"),
            F.col(f"b.{item_col}").alias("dst"),
        )
        .distinct()
    )
    # disjoint halves (src < dst vs src > dst): the union IS distinct
    return half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    broadcast_ranks: bool = False,
    assume_symmetric_distinct: bool = False,
) -> DataFrame:
    """Personalized PageRank (random walk with restart): identical to
    :func:`pagerank` except ALL teleport mass restarts to the
    ``sources`` node set (one column, any name) — the
    related-items/recommendation form of link analysis (Haveliwala
    2002). Same integer-exact discipline: sources seed SCALE // |S|
    each, non-sources 0; per round each source adds
    floor((1-d)·SCALE/|S|) base mass, everyone else only receives
    damped contributions.

    Node-set convention: the node table is built from edge SOURCES
    only, so "appears in the graph" means HAS OUT-DEGREE. A restart
    node that occurs solely as a destination (a dangling node) is
    dropped from the restart set — its teleport mass would have
    nowhere to flow on the very first step — and if every requested
    source is dst-only this raises, even though those ids do occur as
    graph destinations. Callers who want dangling sources retained
    must add self-loops (or any out-edge) before calling.

    Scale notes: the source flag is a broadcast of the (small) restart
    set against the node table; everything else is the pagerank()
    topology — one edge⋈rank join and one partial-agg shuffle per
    round, edge list pre-partitioned once."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_symmetric_distinct:
        # the caller's edge list may carry parallel edges — dedup here;
        # producers that already emit the distinct symmetric set (e.g.
        # copurchase_edges) skip this exchange (guide §2.4)
        e = e.distinct()
    if not broadcast_ranks:
        e = e.repartition(F.col("src"))
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    nodes = e.select(F.col("src").alias("v")).distinct().persist()
    srcs = (
        sources.select(F.col(sources.columns[0]).alias("v"))
        .distinct()
        .join(nodes, "v")
        .persist()
    )
    flag = None
    try:
        ns = srcs.count()
        if ns == 0:
            raise ValueError(
                "personalized_pagerank: no source node has out-degree in "
                "the graph (dst-only sources are dangling — see docstring)"
            )
        base = int((1.0 - damping) * float(SCALE) / ns)
        flag = nodes.join(
            F.broadcast(srcs.withColumn("_is_src", F.lit(True))), "v", "left"
        ).persist()
        ranks = flag.select(
            "v",
            F.when(F.col("_is_src"), F.lit(SCALE // ns))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("r"),
        )
        for _ in range(iters):
            rd = ranks.join(deg, ranks.v == deg.src).select(
                "src", F.expr("r DIV deg").alias("_share")
            )
            if broadcast_ranks:
                rd = F.broadcast(rd)
            contrib = e.join(rd, "src").select(
                F.col("dst").alias("v"), F.col("_share").alias("c")
            )
            summed = contrib.groupBy("v").agg(F.sum("c").alias("s"))
            ranks = flag.join(summed, "v", "left").select(
                "v",
                (
                    F.when(F.col("_is_src"), F.lit(base)).otherwise(F.lit(0))
                    + F.floor(
                        F.lit(damping)
                        * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                    )
                ).cast("bigint").alias("r"),
            )
            if broadcast_ranks:
                ranks = ranks.localCheckpoint(eager=True)
        out = ranks.select(
            "v", F.col("r").alias("rank_scaled")
        ).localCheckpoint(eager=True)
        return out
    finally:
        # unpersist on every exit path — a raised iteration must not
        # leak executor storage to the caller
        for cached in (e, deg, nodes, srcs, flag):
            if cached is not None:
                cached.unpersist()


HITS_SCALE = 1_000_000


def hits_bipartite(
    edges: DataFrame,
    hub_col: str = "hub",
    auth_col: str = "auth",
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Integer-exact HITS (Kleinberg 1999) on a BIPARTITE hub→authority
    edge list — mutual reinforcement without the degeneracy HITS has on
    undirected graphs (where hubs ≡ authorities).

    Per half-step: a_raw(p) = Σ h(c) over in-edges, then L1-normalize
    to HITS_SCALE via ``a_raw · SCALE DIV total`` — floor of an exact
    rational, identical on both engines (never decimal division, whose
    Spark result ROUNDS at the result scale while DuckDB floors). The
    init is h₀ = 1 per hub: floor((x·k)/(y·k)) = floor(x/y), so the
    first normalize lands exactly where a pre-normalized init would,
    and every later score is ≤ SCALE — all products stay ≤ SCALE² =
    1e12, orders of magnitude inside BIGINT at ANY corpus size (no
    decimal widening needed, unlike the OLS second moments).

    Scale shape: each half-step is one equi-join of the (node-sized)
    score table to edges plus one partial-agg shuffle on the other
    side's key; the L1 total is a 1-row broadcast. Each half-step is
    materialized (eager localCheckpoint, the pagerank loop discipline)
    — _norm references its input twice (the total and the select), so
    a lazy chain would re-evaluate the edge joins ~2^(2·iters) times
    per action, and the edge cache would be unpersisted in ``finally``
    before any returned DataFrame ever evaluated it.

    Returns (hubs, auths): (hub_col, h) and (auth_col, a), BIGINT
    scores summing to ≈ HITS_SCALE (truncation leaks < 1 unit/node).
    """
    # TWO cached copies of the edge list, one per join key: each
    # half-step joins on a different side (c for the authority step, p
    # for the hub step) and distinct()'s hash(c, p) layout satisfies
    # neither, so a single cache would re-shuffle the edge list twice
    # per iteration. One extra setup exchange (e_p is built FROM the
    # e_c cache, so the upstream join/distinct still runs once) buys
    # zero edge-list exchanges in every iteration — the pagerank()
    # edge-cache discipline, doubled for the bipartite ping-pong.
    e_c = (
        edges.select(F.col(hub_col).alias("c"), F.col(auth_col).alias("p"))
        .distinct()
        .transform(lambda d: graph_prepartition(d, "c"))
        .persist()
    )
    e_p = graph_prepartition(e_c, "p").persist()

    def _norm(raw: DataFrame, key: str, out: str) -> DataFrame:
        tot = raw.agg(F.sum("raw").cast("bigint").alias("t"))
        return raw.crossJoin(F.broadcast(tot)).select(
            key,
            F.expr(f"raw * {HITS_SCALE} DIV t").cast("bigint").alias(out),
        )

    try:
        h = e_c.select("c").distinct().withColumn(
            "h", F.lit(1).cast("bigint")
        )
        a = None
        for _ in range(iters):
            a_raw = e_c.join(h, "c").groupBy("p").agg(
                F.sum("h").alias("raw")
            )
            a = _norm(a_raw, "p", "a").localCheckpoint(eager=True)
            h_raw = e_p.join(a, "p").groupBy("c").agg(
                F.sum("a").alias("raw")
            )
            h = _norm(h_raw, "c", "h").localCheckpoint(eager=True)
        return (
            h.select(F.col("c").alias(hub_col), "h"),
            a.select(F.col("p").alias(auth_col), "a"),
        )
    finally:
        e_c.unpersist()
        e_p.unpersist()
