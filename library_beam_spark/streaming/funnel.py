"""Streaming ordered-funnel fold: maintain each user's
view → click → purchase cascade incrementally — the streaming twin of
q:funnel_conversion.

State is ONE row per user: (ts1, ts2, ts3) — the first view, the
first click within the step window after it, the first purchase
within the step window after that; unreached stages are NULL. The
triple is a SUFFICIENT STATISTIC for the cascade under the standard
per-user time-ordering contract (each batch's earliest event per user
≥ the committed state's latest — so a later batch can never carry an
EARLIER view/click than one already folded): each stage's timestamp,
once set, is final (it is a min over a prefix the stream has fully
seen), and an unset stage can only be satisfied by future events,
which the stage's window predicate filters exactly as the one-shot
batch cascade would.

Each batch runs the same three cascaded min-aggregations as the batch
query over state ∪ batch rows — stage k's window anchored on stage
k−1's JUST-UPDATED timestamp, so a view and its qualifying click
arriving in the same batch resolve correctly. Per-batch cost: three
user-grain partial-agg shuffles over batch + state.

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers) — committed replays are no-ops; the step
window hours are pinned in the pointer (drift would silently change
every stage assignment).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _batch_session, _check_config, _commit, _read_meta


def funnel_stream_batches(
    index_dir: str,
    step_hours: int = 24,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: user_id, ts, event_type. The committed state at
    ``index_dir/batch=N`` holds (user_id, ts1, ts2, ts3); the stage
    histogram is a 3-row aggregate over it."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"step_hours": step_hours}
    win = F.expr(f"INTERVAL {step_hours} HOUR")

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "funnel_stream_batches",
            "the step window defines every stage; restart with the "
            "same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        rows = batch.select("user_id", "ts", "event_type").filter(
            F.col("event_type").isin("view", "click", "purchase")
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            state = spark.read.parquet(prev_dir)
        else:
            # JVM-only empty relation (guide §4): a python-list
            # createDataFrame spawns the cloned session's Python worker
            # pool for zero Python work; range(0)+casts folds to an
            # empty relation with the exact state schema
            state = spark.range(0).select(
                F.col("id").alias("user_id"),
                F.lit(None).cast("timestamp_ntz").alias("ts1"),
                F.lit(None).cast("timestamp_ntz").alias("ts2"),
                F.lit(None).cast("timestamp_ntz").alias("ts3"),
            )
        # stage 1: first view ever (min over state anchor + batch views)
        t1 = (
            rows.filter(F.col("event_type") == "view")
            .groupBy("user_id")
            .agg(F.min("ts").alias("_bt1"))
            .join(state, "user_id", "full")
            .select(
                "user_id",
                F.least("ts1", F.col("_bt1")).alias("ts1"),
                "ts2", "ts3",
            )
        )
        # stage 2: first qualifying click (only while unset)
        t2 = (
            rows.filter(F.col("event_type") == "click")
            .join(t1.select("user_id", "ts1"), "user_id")
            .filter(
                (F.col("ts") > F.col("ts1"))
                & (F.col("ts") <= F.col("ts1") + win)
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("_bt2"))
        )
        t2s = t1.join(t2, "user_id", "left").select(
            "user_id", "ts1",
            F.coalesce("ts2", F.col("_bt2")).alias("ts2"),
            "ts3",
        )
        # stage 3: first qualifying purchase (only while unset)
        t3 = (
            rows.filter(F.col("event_type") == "purchase")
            .join(t2s.select("user_id", "ts2"), "user_id")
            .filter(
                (F.col("ts") > F.col("ts2"))
                & (F.col("ts") <= F.col("ts2") + win)
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("_bt3"))
        )
        new_state = t2s.join(t3, "user_id", "left").select(
            "user_id", "ts1", "ts2",
            F.coalesce("ts3", F.col("_bt3")).alias("ts3"),
        )
        new_state.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def funnel_stages(state: DataFrame) -> DataFrame:
    """Stage histogram over a committed funnel state: users with a
    first view, split by the deepest stage reached."""
    return (
        state.filter(F.col("ts1").isNotNull())
        .select(
            F.when(F.col("ts3").isNotNull(), 3)
            .when(F.col("ts2").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("stage")
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
