"""Streaming rolling-active-users maintenance: fold each micro-batch
into the (user, day) DISTINCT-grain state — the streaming twin of
q:rolling_active_users.

The batch query's first move (collapse events to the (user, day)
DISTINCT grain BEFORE the 7-day coverage explode) is exactly what
makes it incremental: the distinct set is a UNION fold — associative,
commutative, idempotent — so the stream needs NO arrival contract
(the q:stream_quantile_sketch order-freedom property) and redelivered
events are absorbed by set semantics. State is APPEND-ONLY: each
batch anti-joins its day pairs against the committed state and writes
only the NEW pairs as ``batch=N`` (the streaming/ivf.py postings
discipline — never rewrite history), so per-batch write cost is
proportional to novelty, and total state is bounded by the TRUE
(user, active-day) grain, never event volume.

The rolling answer (trailing-7-day distinct actives per day) is a
read-time view over the committed state: the same 7-element coverage
explode + per-day distinct count as the batch query, at the bounded
day grain.

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers) — a replayed committed batch is a no-op; an
uncommitted orphan partition is overwritten by the replay and ignored
by readers (only partitions ≤ committed count). The day anchor is
pinned in the pointer (a drifted anchor would silently shift every
day bucket).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _batch_session, _check_config, _commit, _read_meta


def _day_pairs(df: DataFrame, anchor: str) -> DataFrame:
    return df.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(anchor).cast("date"))
        .cast("bigint")
        .alias("d"),
    ).distinct()


def _committed_state(spark, index_dir: str):
    """Union of the committed append-only partitions (base..committed);
    None when the index is empty."""
    committed, base = _read_meta(index_dir)
    parts = [
        os.path.join(index_dir, f"batch={j}")
        for j in range(base, committed + 1)
        if os.path.isdir(os.path.join(index_dir, f"batch={j}"))
    ]
    if not parts:
        return None
    return spark.read.parquet(*parts)


def rolling_active_stream_batches(index_dir: str, anchor: str = "2024-01-01"):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: user_id, ts. ``index_dir/batch=N`` holds the batch's
    NOVEL (user_id, d) pairs only."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"anchor": anchor}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "rolling_active_stream_batches",
            "the day anchor defines every bucket; restart with the "
            "same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        pairs = _day_pairs(batch, anchor)
        state = _committed_state(spark, index_dir)
        if state is not None:
            pairs = pairs.join(state, ["user_id", "d"], "left_anti")
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            pairs.write.mode("overwrite").parquet(out)
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, base, cfg)

    return step


def rolling_active_result(spark, index_dir: str) -> DataFrame:
    """(day, n_users_7d) over the committed state — the batch query's
    coverage-explode tail at the bounded (user, day) grain."""
    ud = _committed_state(spark, index_dir)
    if ud is None:
        raise ValueError("rolling_active: empty index")
    mx = ud.agg(F.max("d").alias("md"))
    cov = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6))).alias(
            "day"
        ),
    )
    return (
        cov.join(F.broadcast(mx))
        .filter(F.col("day") <= F.col("md"))
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users_7d")
        )
        .select(F.col("day").cast("int").alias("day"), "n_users_7d")
    )


def cohort_retention_result(spark, index_dir: str) -> DataFrame:
    """(cohort, offset_d, n_users) over the SAME committed (user, day)
    state rolling_active_stream_batches maintains — the distinct day
    grain is a sufficient statistic for the whole retention matrix
    too (cohort = min day per user, offsets = day − cohort), so one
    state serves multiple read-time analytics views; at 100 TB you
    maintain the collapse once, never per-dashboard."""
    ud = _committed_state(spark, index_dir)
    if ud is None:
        raise ValueError("rolling_active: empty index")
    firsts = ud.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    act = (
        ud.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_d",
            (F.col("d") - F.col("cohort_d")).alias("offset_d"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_d", "offset_d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.col("cohort_d").cast("int").alias("cohort"),
            F.col("offset_d").cast("int").alias("offset_d"),
            "n_users",
        )
    )
