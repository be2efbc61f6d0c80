"""Distributed triangle enumeration/counting (degree-ordered
adjacency intersection — Schank & Wagner'05; the MapReduce analysis is
Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the
Last Reducer").

Triangles are the unit of clustering-coefficient analytics and a
useful dup-graph diagnostic (near-clique duplicate clusters are
triangle-dense, operators/clustering.py). Two classic scale traps, and
how this module dodges both:

1. **Hub skew.** A degree-d node owns d² wedges; one celebrity node
   serializes the job (the "last reducer"). Fix: orient every
   undirected edge from its (degree, id)-SMALLER endpoint to the
   larger. The orientation is acyclic and its max OUT-degree is
   O(√m) regardless of in-degree skew — per-node work is bounded by
   construction (measured on the co-purchase graph: max out-degree 97
   at 1.2M edges).
2. **Wedge materialization.** The textbook wedge-join (generate all
   open two-paths, then semi-join the closing edge) shuffles Σ d_out²
   rows — 41M wedges for 1.9M triangles on the benchmark graph, a
   ~20× write amplification. This module instead materializes the
   oriented adjacency LIST once (arrays bounded by the O(√m) cap) and
   intersects the two endpoints' sorted lists per edge:
   ``array_intersect(N⁺(x), N⁺(y))`` — triangles fall out in-row, and
   the only shuffled rows are edges (with bounded arrays) and the
   triangles themselves.

Each triangle {a,b,c} appears EXACTLY once: its orientation DAG has one
source (two out-edges) and one sink, so it is found only from its
unique source-edge (x→y, the source's edge to the middle vertex). No
post-hoc dedup, no division by 6.

Plan shape: degree = one partial-agg shuffle over endpoints (broadcast
back when nodes ≪ edges); adjacency = one groupBy-collect shuffle of
the oriented edges; the per-edge intersection = two equi-joins of the
edge list against the adjacency table. Nothing data-sized reaches the
driver; no wedge table exists anywhere.

The oracle (registry) uses the orientation-free a<b<c triple join —
triangle sets are orientation-invariant, which makes the cross-engine
check meaningful rather than circular.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["undirected_unique", "triangles", "triangle_counts"]


def undirected_unique(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Canonical undirected edge set (u < v, self-loops dropped,
    parallel edges collapsed)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )


def triangles(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
    broadcast_degrees: bool = False,
    broadcast_adjacency: bool = False,
) -> DataFrame:
    """All triangles of the undirected graph as (a, b, c) rows, each
    triangle exactly once (a→b, a→c, b→c in the degree orientation).

    ``assume_canonical``: the input is already (u < v, distinct) — skips
    a full re-canonicalization shuffle when the producer (e.g. a basket
    self-join with a ``<`` predicate) emits that form directly.
    ``broadcast_degrees``: the degree table is node-sized; when nodes ≪
    edges (any dense graph — parts, users, domains) broadcasting it
    replaces two edge-sized orientation shuffles. Leave False when the
    node set itself is broadcast-hostile (billions of nodes).
    ``broadcast_adjacency``: the scale lever the r5 sf5 sweep exposed.
    The shuffle variant's SMJ serializes every edge row WITH both
    endpoints' adjacency arrays — Θ(m · avg-degree) shuffle bytes
    (~avg-degree × the edge list itself; measured 65 GB at sf5,
    disk-spill-bound at 9× the per-edge payload). Broadcasting the
    adjacency table instead makes both joins map-side BroadcastHashJoins:
    the array-widened rows live only INSIDE one whole-stage-codegen
    stage and never serialize — total shuffle is the skinny oriented
    edge list (the adjacency groupBy), full stop. The broadcast payload
    is Θ(m) int64s (one entry per oriented edge, NOT n × max-degree):
    ~8 bytes/edge, so any graph up to ~10⁸ edges fits a 1 GiB
    broadcast — right for every dimension-bounded graph (parts, users,
    domains). Leave False for open-world graphs whose edge count
    outgrows executor memory; the shuffle variant spills but never dies.
    """
    if assume_canonical:
        und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    else:
        und = undirected_unique(edges, src, dst)
    # eager localCheckpoint, not persist: the edge set feeds two
    # branches (degree + orientation) and the adjacency/edge branches
    # below, so it must materialize exactly once — and a persist would
    # either leak executor storage past return (the returned plan is
    # lazy; there is no post-action hook to unpersist from) or, if
    # unpersisted before return, never be cached at all. Checkpoint
    # blocks are released by the ContextCleaner when the returned
    # DataFrame is garbage-collected.
    und = und.localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    if broadcast_degrees:
        deg = F.broadcast(deg)
    with_deg = (
        und.join(deg.withColumnRenamed("node", "u")
                    .withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v")
                 .withColumnRenamed("deg", "dv"), "v")
    )
    # orient from the (deg, id)-smaller endpoint (struct comparison is
    # the lexicographic tuple order)
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oriented = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
    ).localCheckpoint(eager=True)
    # bounded adjacency arrays: |N⁺| ≤ O(√m) by the orientation
    adj = oriented.groupBy("x").agg(
        F.sort_array(F.collect_list("y")).alias("nb")
    )
    if broadcast_adjacency:
        # materialize once THEN broadcast: the two joins below each
        # plan their own BroadcastExchange, and without the checkpoint
        # each would re-run the groupBy/collect subplan from scratch
        adj = F.broadcast(adj.localCheckpoint(eager=True))
    e = oriented.select(F.col("x").alias("a"), F.col("y").alias("b"))
    out = (
        e.join(adj.select(F.col("x").alias("a"), F.col("nb").alias("_na")),
               "a")
        .join(adj.select(F.col("x").alias("b"), F.col("nb").alias("_nb")),
              "b", "left")
        .select(
            "a",
            "b",
            F.explode(
                F.array_intersect(
                    F.col("_na"), F.coalesce("_nb", F.array())
                )
            ).alias("c"),
        )
    )
    return out


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
    broadcast_degrees: bool = False,
    broadcast_adjacency: bool = False,
) -> DataFrame:
    """(node, n_triangles): per-node triangle participation (each
    triangle credits all three corners)."""
    tri = triangles(edges, src, dst, assume_canonical, broadcast_degrees,
                    broadcast_adjacency)
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
