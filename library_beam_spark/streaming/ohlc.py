"""Streaming OHLC bar maintenance — the streaming twin of
q:ohlc_hourly_bars: per (series, hour bucket), open/high/low/close,
count, and the exact-decimal volume, folded micro-batch by
micro-batch.

The whole bar is an ORDER-FREE mergeable aggregate once the open and
close carry their pick keys: state rows hold open/close as
(ts, event_id, value) STRUCTS, so the merge is

    open  = lexicographic MIN of the structs   (min_by re-stated)
    close = lexicographic MAX
    high/low = max/min, n = sum, volume = exact-decimal sum

— associative and commutative, so like the quantile and KMV folds the
stream needs NO arrival contract: a bucket's events may arrive in any
order, across any batch split, and late events for an old bucket fold
in correctly forever (state grain = the bucket grain, bounded by the
time domain × series set, never event volume). Exactly-once per batch
comes from the shared commit pointer (a replayed committed batch is a
no-op); cross-batch duplication of the same EVENT is out of scope
exactly as in the quantile-sketch stream — sums are not
set-idempotent, which is the documented contract, not a surprise.

Per-batch cost: ONE map-side-combined shuffle over the batch at the
bucket grain, then a bucket-grain merge with the committed state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import dsum
from .dedup import _batch_session, _check_config, _commit, _read_meta

_KEYS = ["event_type", "bucket_ts"]


def _batch_bars(df: DataFrame) -> DataFrame:
    """Bucket-grain bars WITH pick keys from raw events (module
    docstring) — the same one-shuffle shape as the batch query, the
    structs making the picks re-mergeable."""
    return (
        df.withColumn("bucket_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy(*_KEYS)
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("open_s"),
            F.max(F.struct("ts", "event_id", "value")).alias("close_s"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("volume"),
        )
    )


def _merge_bars(states: list) -> DataFrame:
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*_KEYS).agg(
        F.min("open_s").alias("open_s"),
        F.max("close_s").alias("close_s"),
        F.max("high_v").alias("high_v"),
        F.min("low_v").alias("low_v"),
        F.sum("n_events").alias("n_events"),
        F.sum("volume").alias("volume"),
    )


def ohlc_stream_batches(index_dir: str):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: event_type, ts, event_id, value."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"bucket": "hour"}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "ohlc_stream_batches",
            "the bucket grain defines every bar; restart with the "
            "same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        states = [_batch_bars(batch)]
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            states.append(spark.read.parquet(prev_dir))
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            _merge_bars(states).write.mode("overwrite").parquet(out)
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def ohlc_result(spark, index_dir: str) -> DataFrame:
    """Final bars from the committed state — the batch query's output
    columns, the picks unwrapped from their key structs."""
    committed, _ = _read_meta(index_dir)
    state = spark.read.parquet(
        os.path.join(index_dir, f"batch={committed}")
    )
    return state.select(
        "event_type",
        "bucket_ts",
        F.col("open_s.value").alias("open_v"),
        "high_v",
        "low_v",
        F.col("close_s.value").alias("close_v"),
        F.col("n_events").cast("bigint").alias("n_events"),
        "volume",
    )
