"""Distributed triangle enumeration/counting (degree-ordered
node-iterator — Schank & Wagner'05; the MapReduce formulation is
Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the
Last Reducer").

Triangles are the unit of clustering-coefficient analytics and a
useful dup-graph diagnostic (near-clique duplicate clusters are
triangle-dense, operators/clustering.py). The naive wedge join
explodes on hubs: a degree-d node contributes d² wedges, and one
celebrity node serializes the job — the "last reducer" curse. The fix
is the standard orientation trick:

  orient every undirected edge from its (degree, id)-SMALLER endpoint
  to the larger one. The result is an acyclic orientation whose
  max out-degree is O(√m) regardless of in-degree skew — so the wedge
  self-join fan-out is bounded per node, by construction.

Each triangle {a,b,c} then appears EXACTLY once: as the wedge
(a→b, a→c) with (deg,id)(b) < (deg,id)(c), closed by the oriented
edge b→c. No post-hoc dedup, no division by 6.

Plan shape: degree = one partial-agg shuffle over edge endpoints;
orientation = two node-sized joins; wedge generation = one self
equi-join of the oriented edge list on the apex; closure = one
left-semi equi-join on the (b, c) pair. Everything hash-partitioned on
node/pair keys; nothing data-sized reaches the driver.

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
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """All triangles of the undirected graph as (a, b, c) rows, each
    triangle exactly once, ordered by the (degree, id) orientation."""
    und = undirected_unique(edges, src, dst).persist()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        und.join(deg.withColumnRenamed("node", "u")
                    .withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v")
                 .withColumnRenamed("deg", "dv"), "v")
    )
    # orient from the (deg, id)-smaller endpoint; carry the head's rank
    # key so wedge ordering below needs no extra join
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oriented = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    )
    e1 = oriented.select(
        F.col("x").alias("a"), F.col("y").alias("b"),
        F.col("dy").alias("db"),
    )
    e2 = oriented.select(
        F.col("x").alias("a2"), F.col("y").alias("c"),
        F.col("dy").alias("dc"),
    )
    wedges = e1.join(e2, F.col("a") == F.col("a2")).filter(
        F.struct(F.col("db"), F.col("b")) < F.struct(F.col("dc"), F.col("c"))
    )
    closing = oriented.select(
        F.col("x").alias("b"), F.col("y").alias("c")
    )
    out = wedges.join(closing, ["b", "c"], "left_semi").select("a", "b", "c")
    und.unpersist()
    return out


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_triangles): per-node triangle participation (each
    triangle credits all three corners)."""
    tri = triangles(edges, src, dst)
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
