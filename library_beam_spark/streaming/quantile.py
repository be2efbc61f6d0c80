"""Streaming mergeable quantile sketch: fold each arriving micro-batch
into the DDSketch-family integer-bucket state of
operators/quantile_sketch.py — the streaming twin the batch operator
gets FOR FREE, because its merge is count addition: associative,
commutative, and ORDER-FREE, so unlike the EWMA/attribution folds
there is NO per-key arrival-order contract at all. Any interleaving,
any batch split, any redelivery-free replay of the same rows produces
the identical state.

State is the (key, bucket_lb, bucket_n) table — bounded by the VALUE
DOMAIN (≤ ~(64−b)·2^b buckets per key), never by stream length. Each
batch: bucket its rows, add counts into the committed state, commit
the merged state under the shared atomic-pointer discipline
(streaming/dedup helpers; committed replays are no-ops, config —
including the bucket precision b, which silently changes every
estimate if it drifts — pinned in the pointer). Quantile queries run
on the committed state with the batch extractor
(sketch_quantiles) at any time.

Scale shape: one (key, bucket) partial-agg shuffle per batch over
batch ∪ state — state rows are bounded, so per-batch cost is
O(batch) with a domain-bounded constant.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quantile_sketch import quantile_sketch_state
from .dedup import _batch_session, _check_config, _commit, _read_meta


def quantile_sketch_stream_batches(
    index_dir: str,
    key_cols: tuple = ("k",),
    value_col: str = "v",
    b: int = 6,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    The committed state lives at ``index_dir/batch=N``; read it with
    ``spark.read.parquet`` and pass it straight to
    operators/quantile_sketch.sketch_quantiles."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"key_cols": list(key_cols), "value_col": value_col, "b": b}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "quantile_sketch_stream_batches",
            "bucket precision/columns would silently change every "
            "estimate mid-stream; restart with the same config or a "
            "fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        state = quantile_sketch_state(
            batch.select(*key_cols, value_col), list(key_cols), value_col, b=b
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            state = (
                spark.read.parquet(prev_dir)
                .unionByName(state)
                .groupBy(*key_cols, "bucket_lb")
                .agg(F.sum("bucket_n").alias("bucket_n"))
            )
        state.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step
