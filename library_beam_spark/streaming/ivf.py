"""Streaming IVF ingest: append arriving embedding batches to a
partitioned posting store under a PRE-TRAINED coarse quantizer, and
maintain a bounded per-cell statistics table — the streaming twin of
the batch IVF family (operators/ivf.py; q:ivf_ann_topk).

Production ANN services ingest this way: the coarse centroids are
trained offline (re-training them per batch would re-assign history —
the one thing an append-only index must never do), every arriving
vector is assigned map-side to its nearest cell, postings are APPENDED
(they are the index — growth is the point, and committed partitions
are never rewritten), and only the small per-cell stats (count,
aggregate similarity mass) fold batch over batch. The split mirrors
streaming/dsir.py's model-vs-state separation:

- **Quantizer**: pinned in the commit pointer as (m, dim, md5 of the
  centroid literal). A restart under different centroids would split
  the posting store across two incompatible geometries — step() fails
  loudly on mismatch (the index-config discipline of
  streaming/dedup.py).
- **Postings**: ``index_dir/postings/batch=N`` — one append per batch,
  written before the pointer commit, never read back by the ingest
  path (crash before commit orphans a partition that replay simply
  overwrites).
- **Stats**: ``index_dir/stats/batch=N`` — ≤ m rows (cell, n_vecs,
  sim_mass), the ONLY state a batch reads: previous stats ∪ this
  batch's per-cell aggregate → one ≤ 2m-row groupBy. Superseded stats
  partitions are GC'd; postings are not (they are data, not state).

Per-cell counts are the load-balance signal a 100 TB ANN ingest runs
on (cell skew → re-shard or re-train decisions); sim_mass (Σ of each
vector's similarity to its own centroid, portable-rounded) is the
quantization-quality proxy — both exactly replayable by a SQL oracle
against the same centroid literals (q:stream_ivf_ingest).

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup._commit); committed replays are no-ops, an
uncommitted replay rebuilds batch N's postings AND stats from the
still-committed batch N−1 state.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import dsum, pround
from ..operators.ivf import _sims, assign_cell
from .dedup import _batch_session, _check_config, _commit, _read_meta


def _centroids_md5(centroids: list[list[float]]) -> str:
    canon = ";".join(
        ",".join(repr(float(v)) for v in c) for c in centroids
    )
    return hashlib.md5(canon.encode()).hexdigest()


def ivf_ingest_batches(
    index_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    After batch N commits, ``index_dir/postings/batch=K`` for K ≤ N
    holds every ingested vector's (id, cell, sim, ingest_batch) row and
    ``index_dir/stats/batch=N`` the ≤ m-row per-cell rollup."""
    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "m": len(centroids),
        "dim": len(centroids[0]),
        "centroids_md5": _centroids_md5(centroids),
        "digits": int(digits),
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "ivf_ingest_batches",
            "cell assignment depends on the coarse centroids; resuming "
            "under a different quantizer would split the posting store "
            "across incompatible geometries; restart with the same "
            "centroids or a fresh index_dir",
        )
        if batch_id <= committed:
            return  # at-least-once replay of a committed batch: no-op
        spark = _batch_session(batch)
        vec = F.col(vec_col).cast("array<double>")
        # map-side argmax assignment — the batch is never shuffled; sim
        # to the OWN centroid is the quantization-quality term, rounded
        # portably so the stats fold is bit-exact cross-engine
        assigned = batch.select(
            F.col(id_col),
            assign_cell(vec, centroids).alias("cell"),
            pround(F.array_max(_sims(vec, centroids)), digits).alias("sim"),
            F.lit(batch_id).cast("int").alias("ingest_batch"),
        )
        assigned.write.mode("overwrite").parquet(
            os.path.join(index_dir, "postings", f"batch={batch_id}")
        )
        stats = (
            spark.read.parquet(
                os.path.join(index_dir, "postings", f"batch={batch_id}")
            )
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n_vecs"),
                dsum(F.col("sim"), digits).alias("sim_mass"),
            )
        )
        prev = os.path.join(index_dir, "stats", f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev):
            stats = (
                spark.read.parquet(prev)
                .unionByName(stats)
                .groupBy("cell")
                .agg(
                    F.sum("n_vecs").alias("n_vecs"),
                    dsum(F.col("sim_mass"), digits).alias("sim_mass"),
                )
            )
        stats.write.mode("overwrite").parquet(
            os.path.join(index_dir, "stats", f"batch={batch_id}")
        )
        # base tracks the oldest LIVE stats partition (postings live
        # forever — they are the index, not fold state)
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):  # best-effort GC of folded stats
            shutil.rmtree(
                os.path.join(index_dir, "stats", f"batch={j}"),
                ignore_errors=True,
            )

    return step
