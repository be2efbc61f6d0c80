"""Streaming KMV distinct-count maintenance: fold each micro-batch
into the per-key bottom-k distinct-hash state — the streaming twin of
q:distinct_kmv_counts (operators/kmv.py).

The KMV merge (union → distinct → keep the k smallest) is
associative, commutative, and IDEMPOTENT, so like the quantile
sketch's count addition it needs NO arrival contract — any batch
split, interleaving, or redelivery folds to the identical state the
one-shot build produces (the hypothesis property in
tests/test_kmv.py), which is exactly why the registry oracle can be
the same one-shot replay. State is bounded at k rows per key FOREVER
— the whole point of the sketch at stream scale.

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers) — committed replays are no-ops; k is pinned
in the pointer (a drifted k would silently change every h_(k)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.kmv import kmv_hash_col, merge_kmv_states
from .dedup import _batch_session, _check_config, _commit, _read_meta


def kmv_stream_batches(
    index_dir: str,
    key_cols: list,
    value_col: str,
    k: int = 256,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    The committed state at ``index_dir/batch=N`` holds (key…, kmv_h)
    bottom-k rows; extract estimates with operators/kmv.kmv_estimate."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"key_cols": list(key_cols), "value_col": value_col, "k": k}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "kmv_stream_batches",
            "k and the hashed column define the sketch; restart with "
            "the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        hashes = batch.select(
            *key_cols, kmv_hash_col(value_col).alias("kmv_h")
        ).distinct()
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        states = [hashes]
        if committed >= 0 and os.path.isdir(prev_dir):
            states.append(spark.read.parquet(prev_dir))
        state = merge_kmv_states(states, list(key_cols), k=k)
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            state.write.mode("overwrite").parquet(out)
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        # bottom-k state supersedes all earlier partitions
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step
