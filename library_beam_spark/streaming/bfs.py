"""Streaming incremental multi-source BFS — landmark hop distances
maintained as edges ARRIVE, the distance twin of streaming/cc.py.

Unlike connectivity, a distance metric does NOT compress into
node-sized state: a new edge can shorten paths THROUGH old edges, so
the fold must retain the edge set (state is GRAPH-sized — one row per
distinct edge ever seen, exactly what any incremental-SSSP structure
keeps; stated plainly, not hidden). What the fold saves is both
ROUNDS and WORK: committed distances are a fixpoint of the previous
edge set, so relaxation restarts from only the improvement candidates
the new edges induce (frontier-restricted — operators/clustering.
bfs_delta_fixpoint), converging in rounds AND per-round rows
proportional to the new edges' impact radius; a no-impact batch does
zero relaxation rounds. The fixpoint of min relaxation is
schedule-independent, making the fold order-free and
redelivery-idempotent with NO arrival contract. Deletions are out of
scope by construction (decremental distances are a different
algorithm).

Seeds are DERIVED from the graph (a predicate on node ids), so a
landmark arriving late simply enters the next relaxation at dist 0 and
monotonicity still holds: every committed distance remains a valid
upper bound of the full-graph distance.

State layout per commit: batch=N/edges (cumulative distinct edge
list) and batch=N/dist (current fixpoint distances). Crash/replay
contract: shared atomic CURRENT-pointer commit (streaming/dedup
helpers); each state partition supersedes all earlier ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.clustering import bfs_delta_fixpoint, bfs_fixpoint
from .dedup import _check_config, _commit, _read_meta


def bfs_stream_batches(
    index_dir: str,
    seed_mod: int = 100,
    src: str = "u",
    dst: str = "v",
    round_counts: list | None = None,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: the two edge-endpoint columns. Seeds are the nodes
    with ``node % seed_mod == 0`` present in the graph so far.

    Incremental batches are FRONTIER-RESTRICTED (operators/clustering.
    bfs_delta_fixpoint): relaxation starts from only the improvement
    candidates the new edges induce — new seed endpoints at 0 and
    new-edge endpoint relaxations through committed distances — so a
    batch's relaxation input is proportional to its impact radius in
    rows, not a re-scan of every node against the cumulative edge set
    (warm distances already bounded the ROUNDS; this bounds the WORK).
    A no-impact batch performs zero relaxation rounds. ``round_counts``
    (test hook) collects per-batch lists of improved-frontier sizes.
    """
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"src": src, "dst": dst, "seed_mod": seed_mod}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "bfs_stream_batches",
            "edge columns / seed rule would silently change mid-stream; "
            "restart with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = batch.sparkSession
        new_edges = batch.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).distinct()
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and not os.path.isdir(prev_dir):
            # fail-loud discipline: a committed pointer whose state
            # partition vanished is external corruption — silently
            # rebuilding from only the new batch would commit wrong
            # cumulative distances under the same pointer protocol
            raise RuntimeError(
                f"committed pointer batch={committed} has no state "
                f"directory under {index_dir} — state store corrupted; "
                "refusing to fold from a partial prefix"
            )
        if committed >= 0:
            warm = spark.read.parquet(os.path.join(prev_dir, "dist"))
            edges = new_edges.unionByName(
                spark.read.parquet(os.path.join(prev_dir, "edges"))
            ).distinct()
            # improvement candidates from the delta only: new-batch
            # endpoints matching the seed rule (old seeds are already
            # at 0 in the committed fixpoint), plus both-direction
            # relaxations of the new edges through committed distances
            delta_adj = new_edges.unionAll(
                new_edges.select(
                    F.col("v").alias("u"), F.col("u").alias("v")
                )
            )
            new_seeds = (
                delta_adj.select(F.col("u").alias("node"))
                .distinct()
                .filter(F.col("node") % seed_mod == 0)
                .withColumn("dist", F.lit(0).cast("bigint"))
            )
            endpoint_relax = delta_adj.join(
                warm.select(F.col("node").alias("u"), "dist"), "u"
            ).select(
                F.col("v").alias("node"),
                (F.col("dist") + 1).cast("bigint").alias("dist"),
            )
            rc: list | None = [] if round_counts is not None else None
            dist = bfs_delta_fixpoint(
                edges,
                warm,
                new_seeds.unionByName(endpoint_relax),
                "u",
                "v",
                round_counts=rc,
            )
            if round_counts is not None:
                round_counts.append(rc)
        else:
            edges = new_edges
            nodes = (
                edges.select(F.col("u").alias("node"))
                .unionAll(edges.select(F.col("v").alias("node")))
                .distinct()
            )
            seeds = nodes.filter(F.col("node") % seed_mod == 0)
            dist = bfs_fixpoint(edges, seeds, "u", "v")
            if round_counts is not None:
                round_counts.append(None)
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            edges.write.mode("overwrite").parquet(
                os.path.join(out, "edges")
            )
            dist.write.mode("overwrite").parquet(os.path.join(out, "dist"))
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def bfs_result(spark, index_dir: str) -> DataFrame:
    """Current committed (node, dist) table."""
    committed, _ = _read_meta(index_dir)
    if committed < 0:
        raise ValueError(f"no committed state in {index_dir}")
    return spark.read.parquet(
        os.path.join(index_dir, f"batch={committed}", "dist")
    )
