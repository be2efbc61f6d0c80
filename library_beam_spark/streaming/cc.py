"""Streaming incremental connected components — duplicate clusters
(or any equivalence closure) maintained as edges ARRIVE, the streaming
twin of operators/clustering.connected_components.

State is the per-node component label (node, component). The fold is
STAR CONTRACTION: the committed labels, read back as edges
node → component, preserve the prefix graph's connectivity exactly
(each old component collapses to a star), so

    CC(star(state) ∪ Δedges) = CC(all edges seen)

and each batch runs the batch fixpoint operator over state-stars ∪
new edges — the stars keep old components at diameter ≤ 2, so the
O(log d) hash-min/pointer-jump rounds effectively pay only the NEW
edges' diameter. Connectivity is MONOTONE under edge insertion and
the min-id label is split-independent, so the fold is order-free,
redelivery-idempotent, and needs NO arrival contract (the
q:stream_kmv_distinct discipline); labels only ever decrease.
(Deletions are out of scope by construction — decremental
connectivity is a different algorithm, stated in the registry
docstring, not hidden.)

State size: one row per node ever seen — the same bound any
union-find keeps. Crash/replay contract: shared atomic
CURRENT-pointer commit (streaming/dedup helpers); each state
partition supersedes all earlier ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.clustering import connected_components
from .dedup import _batch_session, _check_config, _commit, _read_meta


def cc_stream_batches(index_dir: str, src: str = "u", dst: str = "v"):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: the two edge-endpoint columns. The committed state
    at ``index_dir/batch=N`` holds (node, component)."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"src": src, "dst": dst}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "cc_stream_batches",
            "edge columns would silently change mid-stream; restart "
            "with the same columns or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        edges = batch.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            stars = spark.read.parquet(prev_dir).select(
                F.col("node").alias("u"), F.col("component").alias("v")
            )
            edges = edges.unionByName(stars)
        labels = connected_components(edges, "u", "v")
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            labels.write.mode("overwrite").parquet(out)
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step
