"""Streaming incremental multi-source BFS — landmark hop distances
maintained as edges ARRIVE, the distance twin of streaming/cc.py.

Unlike connectivity, a distance metric does NOT compress into
node-sized state: a new edge can shorten paths THROUGH old edges, so
the fold must retain the edge set (state is GRAPH-sized — one row per
distinct edge ever seen, exactly what any incremental-SSSP structure
keeps; stated plainly, not hidden). What the fold saves is ROUNDS:
committed distances re-enter as warm-start upper bounds (edge
insertion only shortens paths), so each batch's re-relaxation over
the full edge set converges in rounds proportional to the new edges'
impact radius — the fixpoint of min relaxation is schedule-independent
(operators/clustering.bfs_fixpoint), making the fold order-free and
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

from ..operators.clustering import bfs_fixpoint
from .dedup import _check_config, _commit, _read_meta


def bfs_stream_batches(
    index_dir: str,
    seed_mod: int = 100,
    src: str = "u",
    dst: str = "v",
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: the two edge-endpoint columns. Seeds are the nodes
    with ``node % seed_mod == 0`` present in the graph so far."""
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
        edges = batch.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        warm = None
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            edges = edges.unionByName(
                spark.read.parquet(os.path.join(prev_dir, "edges"))
            )
            warm = spark.read.parquet(os.path.join(prev_dir, "dist"))
        edges = edges.distinct()
        nodes = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .distinct()
        )
        seeds = nodes.filter(F.col("node") % seed_mod == 0)
        dist = bfs_fixpoint(edges, seeds, "u", "v", warm_start=warm)
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
