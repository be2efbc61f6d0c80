"""Streaming session-path maintenance: fold each micro-batch into
per-user OPEN-session state, retire sessions the event-time watermark
has definitively closed, and emit their path trigrams — the streaming
twin of q:session_path_trigrams, completing the r10 analytics
families' batch/stream pairing (the intervals.py retirement
discipline applied to gap sessions).

State is the OPEN sessions' raw events only (user, ts, event_id,
event_type): a session is open exactly while a future event could
still extend it, so under the event-time watermark contract — every
future event's ts exceeds watermark = max(batch ts) − lag — a session
whose last event satisfies last_ts + gap < watermark is CLOSED
forever (any future event lands > gap after it and starts a new
session, and no event can retro-fill the gap). Closed sessions leave
state in the same batch that closes them: their trigram counts are
appended to ``closed_dir/batch=N`` and their events dropped, so state
is bounded by traffic inside the (gap + lag) horizon, never by stream
length. Trigrams need the full ordered event-type sequence, which is
why the state grain is events-of-open-sessions rather than a scalar
per session — the minimal sufficient statistic for path analysis.

Each batch: boundary-equality redelivery dedup on (user, ts,
event_id), then ONE user-key shuffle sessionizes state ∪ batch (the
same operators/sessions.sessionize the batch query uses) and serves
the trigram lead window — the batch query's one-shuffle shape,
incrementally. A session straddling the batch boundary is re-stitched
exactly because its open prefix rides state into the union (the
boundary case tests/test_streaming_paths.py pins against the one-shot
run).

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers) — committed replays are no-ops; gap and lag
are pinned in the pointer (drift would silently re-segment every
session).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sessions import sessionize
from .dedup import _batch_session, _check_config, _commit, _read_meta

_EVENT_COLS = ("user_id", "ts", "event_id", "event_type")


def _trigram_counts(sessions: DataFrame) -> DataFrame:
    """(step1, step2, step3, n) over sessionized rows — the batch
    query's lead window, partitioned by (user, session_no) so a path
    can never straddle a session boundary."""
    w = Window.partitionBy("user_id", "session_no").orderBy(
        "ts", "event_id"
    )
    tri = sessions.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
    return tri.groupBy("step1", "step2", "step3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def session_paths_stream_batches(
    index_dir: str,
    closed_dir: str,
    gap_seconds: int = 1800,
    watermark_lag_seconds: int = 0,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: user_id, ts, event_id, event_type. State partitions
    hold the open sessions' events; ``closed_dir/batch=N`` accumulates
    retired sessions' trigram counts."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    os.makedirs(closed_dir, exist_ok=True)
    cfg = {
        "gap_seconds": gap_seconds,
        "watermark_lag_seconds": watermark_lag_seconds,
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "session_paths_stream_batches",
            "gap/lag define every session boundary; restart with the "
            "same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        rows = batch.select(*_EVENT_COLS)
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            rows = spark.read.parquet(prev_dir).unionByName(rows)
        # boundary-equality redelivery guard (streaming/ewma.py rule)
        rows = rows.groupBy("user_id", "ts", "event_id").agg(
            F.max("event_type").alias("event_type")
        )
        # the per-session last-ts rides a window over the partitioning
        # sessionize already established (user-key clustering satisfies
        # the (user, session_no) window's distribution — zero new
        # exchanges), replacing the r15 shape's self-join against a
        # groupBy aggregate that BOTH state writes re-evaluated per
        # batch (guide §2.4: two operations keyed the same way share
        # one exchange; §2.4 again: don't recompute what one pass can
        # produce — the tagged table is what gets persisted now)
        s = sessionize(rows, gap_seconds=gap_seconds).withColumn(
            "_last_ts",
            F.max("ts").over(
                Window.partitionBy("user_id", "session_no")
            ),
        ).persist()
        try:
            hi = batch.agg(F.max("ts")).collect()[0][0]
            closed_counts = None
            open_events = s
            if hi is not None:
                # close sessions no future event (ts > watermark) can
                # extend: last_ts + gap < watermark
                horizon = F.lit(hi).cast("timestamp_ntz") - F.expr(
                    f"INTERVAL {gap_seconds + watermark_lag_seconds} SECOND"
                )
                closed = s.filter(F.col("_last_ts") < horizon)
                open_events = s.filter(~(F.col("_last_ts") < horizon))
                closed_counts = _trigram_counts(closed)
            out_state = os.path.join(index_dir, f"batch={batch_id}")
            out_closed = os.path.join(closed_dir, f"batch={batch_id}")
            if closed_counts is not None:
                closed_counts.write.mode("overwrite").parquet(out_closed)
            open_events.select(*_EVENT_COLS).write.mode(
                "overwrite"
            ).parquet(out_state)
        except Exception:
            shutil.rmtree(
                os.path.join(index_dir, f"batch={batch_id}"),
                ignore_errors=True,
            )
            shutil.rmtree(
                os.path.join(closed_dir, f"batch={batch_id}"),
                ignore_errors=True,
            )
            raise
        finally:
            s.unpersist()
        # each state partition supersedes all earlier ones -> base
        # advances; superseded state partitions GC'd best-effort
        # (closed_dir partitions are APPEND-only history, never GC'd)
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def session_paths_result(
    spark, index_dir: str, closed_dir: str, gap_seconds: int | None = None
) -> DataFrame:
    """Final (step1, step2, step3, n): the retired sessions' appended
    counts plus a FLUSH of the sessions still open in the committed
    state (end-of-stream is itself a close event — the one-shot batch
    answer covers every session).

    ``gap_seconds`` is read from the config pinned in the index's
    commit pointer — the SAME gap the stream segmented with; flushing
    with a different gap would silently re-segment the still-open
    sessions, defeating the pinning discipline. Passing an explicit
    value is allowed only as an assertion: it must match the pinned
    config (or be supplied for a legacy pre-config index, which has
    no recorded truth)."""
    import glob as _glob

    from .dedup import _PRE_CONFIG, _read_config

    committed, _ = _read_meta(index_dir)
    pinned = _read_config(index_dir)
    if pinned is None or pinned is _PRE_CONFIG:
        if gap_seconds is None:
            raise ValueError(
                f"session_paths_result: index at {index_dir!r} has no "
                "pinned config — pass gap_seconds explicitly for a "
                "legacy index"
            )
    else:
        pinned_gap = int(pinned["gap_seconds"])
        if gap_seconds is not None and gap_seconds != pinned_gap:
            raise ValueError(
                f"session_paths_result: gap_seconds={gap_seconds} does "
                f"not match the gap pinned in {index_dir!r}'s commit "
                f"pointer ({pinned_gap}) — the flush must use the gap "
                "the stream segmented with"
            )
        gap_seconds = pinned_gap
    state = spark.read.parquet(
        os.path.join(index_dir, f"batch={committed}")
    )
    parts = [
        _trigram_counts(sessionize(state, gap_seconds=gap_seconds))
    ]
    for p in sorted(_glob.glob(os.path.join(closed_dir, "batch=*"))):
        # ignore orphans from an uncommitted crashed attempt — the
        # replay overwrites them, but a reader must not count them
        if int(p.rsplit("=", 1)[1]) <= committed:
            parts.append(spark.read.parquet(p))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("step1", "step2", "step3").agg(
        F.sum("n").cast("bigint").alias("n")
    )
