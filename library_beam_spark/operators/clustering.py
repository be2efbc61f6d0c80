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

Algorithm: **hash-min label propagation**. Every node starts labelled
with its own id; each round, every node takes the min label across its
neighborhood; stop when no label changes. Each round is one equi-join
(edges ⋈ labels, shuffled on node id) plus one aggregation — no
driver-side graph, no per-node state outside the DataFrames.

Scale notes (100 TB):
- Rounds needed = graph diameter. Near-dup clusters are near-cliques
  (every member shares most shingles with every other), so diameter is
  1-3 and the loop exits after ~3 rounds with the convergence check.
  For adversarial long-path graphs the alternating large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) converges in O(log² n) rounds; hash-min is chosen
  because dup graphs are shallow and each round is a single cheap
  shuffle on a bigint key.
- Iterative plans grow lineage exponentially; each round ends in
  ``localCheckpoint`` to truncate it. On a real cluster prefer
  ``spark.sparkContext.setCheckpointDir`` + ``checkpoint`` so a lost
  executor doesn't force recomputation from round 0.
- The convergence probe is ``isEmpty()`` on the changed-label set — an
  O(first-match) action, not a count of the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id in its connected component.

    Returns (node, component). Nodes appearing only as isolated endpoints
    of self-loops still get a row; nodes absent from ``edges`` entirely do
    not (callers union singletons back if they need total coverage).

    Raises ``RuntimeError`` if labels have not stabilised after
    ``max_rounds`` rounds (diameter > max_rounds — not a dup graph).
    """
    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # symmetrize; distinct collapses parallel edges so each round's join
    # fan-out is bounded by the true neighborhood size
    e = half.union(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().persist()

    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_rounds):
        nbr_min = (
            e.join(labels.select(F.col("node").alias("v"), "component"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("_nbr"))
            .select(F.col("u").alias("node"), "_nbr")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least("component", F.coalesce("_nbr", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        stable = changed.isEmpty()
        labels = new_labels
        if stable:
            e.unpersist()
            return labels
    e.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "graph diameter exceeds the dup-cluster assumption — use a "
        "large-star/small-star pass for deep graphs"
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
