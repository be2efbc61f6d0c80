"""Streaming last-touch attribution: credit each arriving purchase to
the user's latest qualifying click/view — the streaming twin of
q:attribution_last_touch, completing the r9 analytics families'
batch/stream pairing (the SCD2/EWMA pointer discipline).

State is ONE row per user: the latest touch (ts, event_id,
event_type) seen so far — bounded forever, because last-touch
attribution by definition never needs an older touch. Each batch
unions the committed touch state with its own rows, runs the SAME
union-tag as-of window as the batch operator (touches and purchases
interleave in one per-user sort; the running last-touch carries
forward), emits ONLY the batch's purchases with their credited
channel ('organic' when no touch within the lookback window), and
commits the new per-user latest touch as the next state.

Ordering contract: arrival time-ordered PER USER across batches (each
batch's earliest ts per user ≥ the committed state's) — under it the
emitted attribution is bit-identical to the one-shot batch operator,
which is what the registry oracle (a correlated subquery stating the
semantics directly) hashes. Boundary-equality redelivery is deduped on
(user, ts, event_id) before the window, tail copy preferred, so a
redelivered row is neither re-credited nor re-emitted (the
streaming/ewma.py discipline).

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers) — committed replays are no-ops, an
uncommitted replay rebuilds batch=N from the committed batch=N−1
state. Config (lookback window, column names) pinned in the pointer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _batch_session, _check_config, _commit, _read_meta

_TOUCH_TYPES = ("click", "view")


def attribution_stream_batches(
    out_dir: str,
    index_dir: str,
    lookback_hours: int = 1,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: user_id, ts, event_id, event_type, value."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"lookback_hours": lookback_hours}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "attribution_stream_batches",
            "attribution semantics would silently change mid-stream; "
            "restart with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        rows = (
            batch.select("user_id", "ts", "event_id", "event_type", "value")
            .filter(F.col("event_type").isin(*_TOUCH_TYPES, "purchase"))
            .withColumn("_tail", F.lit(False))
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            # null literal cast to the BATCH's value dtype (not a
            # hard-coded double) so unionByName holds for any numeric
            # source column type, e.g. decimal
            value_dt = batch.schema["value"].dataType
            rows = (
                spark.read.parquet(prev_dir)
                .withColumn("value", F.lit(None).cast(value_dt))
                .withColumn("_tail", F.lit(True))
                .unionByName(rows)
            )
        # boundary-equality redelivery guard (module docstring)
        rows = (
            rows.groupBy("user_id", "ts", "event_id")
            .agg(
                F.max_by(
                    F.struct("event_type", "value", "_tail"),
                    F.col("_tail").cast("int"),
                ).alias("_r")
            )
            .select("user_id", "ts", "event_id", "_r.*")
        )
        is_touch = F.col("event_type").isin(*_TOUCH_TYPES)
        tagged = rows.withColumn(
            "_is_touch", F.when(is_touch, 1).otherwise(0)
        )
        w = Window.partitionBy("user_id").orderBy(
            "ts", F.desc("_is_touch"), "event_id"
        ).rowsBetween(Window.unboundedPreceding, 0)
        last_touch = F.last(
            F.when(
                F.col("_is_touch") == 1,
                F.struct("ts", "event_id", "event_type"),
            ),
            ignorenulls=True,
        ).over(w)
        emitted = (
            tagged.withColumn("_lt", last_touch)
            .filter((F.col("event_type") == "purchase") & ~F.col("_tail"))
            .select(
                "user_id", "event_id", "value",
                F.when(
                    F.col("_lt").isNotNull()
                    & (
                        F.col("_lt.ts")
                        >= F.col("ts")
                        - F.expr(f"INTERVAL {lookback_hours} HOUR")
                    ),
                    F.col("_lt.event_type"),
                )
                .otherwise(F.lit("organic"))
                .alias("channel"),
            )
        )
        emitted.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )
        state = (
            tagged.filter(F.col("_is_touch") == 1)
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct("ts", "event_id", "event_type"),
                    F.struct("ts", "event_id"),
                ).alias("_t")
            )
            .select("user_id", "_t.*")
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
