"""Streaming interval-coverage maintenance: fold each micro-batch's
spans into a per-key MERGED-ISLAND state — the streaming twin of the
batch q:interval_coverage_users composition.

Why the fold is lossless: interval union is ASSOCIATIVE and order-
insensitive — merge(islands(A) ∪ B) = islands(A ∪ B) — so the state
can hold the merged islands ONLY (key, start, end per island), never
the raw events. State size is bounded by the key set's true gap
structure (one row per surviving island), not by stream length:
overlapping traffic COLLAPSES state rather than growing it, the same
shape as the DSIR stream's top-k bound. A pathological all-disjoint
stream degrades to one row per span — documented, not hidden; a
watermark-retire policy (close islands older than the watermark) is
the production bound for that case and composes on top.

Crash/replay contract: identical to streaming/dedup.py — shared
atomic CURRENT-pointer commit, committed replays are no-ops, an
uncommitted replay rebuilds `batch=N` from the still-committed
`batch=N-1` state. Column names are pinned in the commit pointer: a
restart reading different span columns would silently fold a
different quantity, so step() fails loudly on mismatch.

At scale: per batch ONE hash-partitioned sort window over
(state islands ∪ batch spans) — both sides at the island/span grain —
then the island re-aggregation; each commit supersedes the previous
partition (base advances, superseded partitions GC'd best-effort), so
a batch reads exactly one state partition plus itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sessions import merge_intervals
from .dedup import _batch_session, _check_config, _commit, _read_meta


def interval_stream_batches(
    index_dir: str,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    tiebreak_col: str = "event_id",
    watermark_lag: int | None = None,
    closed_dir: str | None = None,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    State partitions hold (key, _s, _e) merged islands; the committed
    pointer's ``base`` advances with every commit since each state
    supersedes all earlier ones.

    ``watermark_lag`` (with ``closed_dir``) is the production bound
    for all-disjoint traffic: after each batch, islands whose end
    falls at or below ``max(batch end) − watermark_lag`` are RETIRED —
    appended to ``closed_dir/batch=N`` and dropped from state — under
    the event-time contract that no span older than the watermark
    arrives later (the standard late-data rule; a violator would
    wrongly split an already-retired island, the same failure
    watermarked engines accept by definition). State then holds only
    islands still inside the lag horizon."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    if (watermark_lag is None) != (closed_dir is None):
        raise ValueError(
            "watermark_lag and closed_dir must be passed together"
        )
    cfg = {
        "key_col": key_col,
        "start_col": start_col,
        "end_col": end_col,
        "watermark_lag": watermark_lag,
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "interval_stream_batches",
            "span columns would silently change mid-stream; restart "
            "with the same columns or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        spans = batch.select(
            F.col(key_col),
            F.col(start_col),
            F.col(end_col),
            F.col(tiebreak_col),
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            prev = spark.read.parquet(prev_dir).select(
                F.col(key_col),
                F.col("_s").alias(start_col),
                F.col("_e").alias(end_col),
                # the merged-island SET is tiebreak-independent
                # (operators/sessions.merge_intervals docstring), so
                # state rows carry a constant
                F.lit(-1).cast("long").alias(tiebreak_col),
            )
            spans = prev.unionByName(spans)
        state = merge_intervals(
            spans, key_col, start_col, end_col, tiebreak_col
        )
        if watermark_lag is not None:
            # event-time watermark from THIS batch's max end (the
            # committed state can only be older); retire islands
            # wholly at or below the horizon
            hi = batch.agg(F.max(F.col(end_col))).collect()[0][0]
            if hi is not None:
                horizon = int(hi) - int(watermark_lag)
                state = state.persist()
                try:
                    state.filter(F.col("_e") <= horizon).write.mode(
                        "overwrite"
                    ).parquet(os.path.join(closed_dir, f"batch={batch_id}"))
                    state.filter(F.col("_e") > horizon).write.mode(
                        "overwrite"
                    ).parquet(os.path.join(index_dir, f"batch={batch_id}"))
                finally:
                    state.unpersist()
            else:  # empty batch: carry state forward unchanged
                state.write.mode("overwrite").parquet(
                    os.path.join(index_dir, f"batch={batch_id}")
                )
        else:
            state.write.mode("overwrite").parquet(
                os.path.join(index_dir, f"batch={batch_id}")
            )
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):  # GC superseded state
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step
