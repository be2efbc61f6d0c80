"""Streaming EWMA: score each arriving micro-batch with the
exponentially-weighted moving average over each key's trailing
``window`` observations — the streaming twin of the batch
operators/timeseries.ewma (α = ½, power-of-two weights, identical
left-fold arithmetic).

State is the per-key TAIL: the last ``window − 1`` observations
(key, order cols, value) — bounded at window−1 rows per key no matter
how long the stream runs, because the truncated frame is precisely
what the batch operator computes. Each batch unions the tail with its
own rows, runs the SAME windowed fold, emits ONLY the batch's rows
(tagged by a transient marker), and keeps the new last-(window−1)
tail as the next state.

Ordering contract: arrival must be time-ordered PER KEY across
batches (each batch's earliest (order) per key ≥ the committed tail's
latest) — the standard source contract for event-time folds; under it
the emitted values are bit-identical to the one-shot batch EWMA,
which is exactly what the registry oracle hashes. Boundary EQUALITY
(a batch row carrying the same (key, order) tuple as a committed tail
row) is redelivery of an already-emitted observation: rows are
deduped on (key, *order_cols) BEFORE the fold, preferring the
committed tail copy, so the join-back stays 1:1 and the duplicate is
neither re-emitted nor double-counted in the fold frame. Genuinely
out-of-order arrival needs a watermark/reorder buffer upstream and is
NOT silently tolerated here: emitted history is append-only and never
revised.

Crash/replay contract: identical to streaming/dedup.py — shared
atomic CURRENT-pointer commit, committed replays are no-ops, an
uncommitted replay rebuilds batch=N from the committed batch=N−1
tail. Column names pinned in the commit pointer (a restart folding a
different value column would silently change every emission).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.timeseries import ewma
from .dedup import _batch_session, _check_config, _commit, _read_meta


def ewma_stream_batches(
    out_dir: str,
    index_dir: str,
    key_col: str = "user_id",
    order_cols: tuple = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 16,
):
    """``writeStream.foreachBatch`` body factory (module docstring)."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "key_col": key_col,
        "order_cols": list(order_cols),
        "value_col": value_col,
        "window": window,
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "ewma_stream_batches",
            "fold semantics would silently change mid-stream; restart "
            "with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        cols = [key_col, *order_cols, value_col]
        rows = batch.select(*cols).withColumn("_tail", F.lit(False))
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            rows = (
                spark.read.parquet(prev_dir)
                .withColumn("_tail", F.lit(True))
                .unionByName(rows)
            )
        # Boundary-equality redelivery guard (module docstring): a batch
        # row sharing (key, *order_cols) with a committed tail row is the
        # SAME observation re-delivered — keep one copy (tail preferred,
        # then max value for full determinism) so the 1:1 join-back below
        # cannot fan out and the fold frame sees each observation once.
        rows = (
            rows.groupBy(key_col, *order_cols)
            .agg(
                F.max_by(
                    value_col,
                    F.struct(F.col("_tail").cast("int"), F.col(value_col)),
                ).alias(value_col),
                F.max("_tail").alias("_tail"),
            )
            .select(*cols, "_tail")
        )
        scored = ewma(
            rows, key_col, order_cols, value_col, window=window,
            out_col="ewma",
        ).join(
            rows.select(key_col, *order_cols, "_tail"),
            [key_col, *order_cols],
        )
        emitted = scored.filter(~F.col("_tail")).drop("_tail")
        emitted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        w = Window.partitionBy(key_col).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        tail = (
            rows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= window - 1)
            .select(*cols)
        )
        tail.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step
