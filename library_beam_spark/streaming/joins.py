"""Stream-stream interval join: the event-enrichment join
(impression ⋈ click / order ⋈ payment) as unbounded streams.

Semantics: left event at time ``t`` matches right events with the same
key whose event time lies in ``[t - lookback, t + lookahead]``. Both
sides carry watermarks, so Spark bounds the join state: a buffered row
is dropped once the other side's watermark passes its interval — without
the time-range condition a stream-stream join must keep EVERY row
forever (Spark rejects inner joins with unbounded state when watermarks
are missing).

Scale: state is hash-partitioned by key; per-key buffered rows =
events-per-lookback-window, the same bound a batch range join would
shuffle. This is the streaming twin of the batch ``range_join_events``
registry query — the availableNow test pins streaming == batch on a
bounded replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "10 minutes",
    lookahead: str = "0 seconds",
    watermark: str = "20 minutes",
    prefix: str = "r_",
) -> DataFrame:
    """Inner stream-stream join of ``left`` and ``right`` on ``on`` with
    ``right_ts ∈ [left_ts - lookback, left_ts + lookahead]``. Right
    columns (except the key) appear with ``prefix``. Works identically
    on static DataFrames (the batch-parity oracle path)."""
    r = right.select(
        F.col(on),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in right.columns
            if c != on
        ],
    )
    l2, r2 = left, r
    if left.isStreaming or right.isStreaming:
        l2 = left.withWatermark(left_ts, watermark)
        r2 = r.withWatermark(f"{prefix}{right_ts}", watermark)
    cond = (
        (l2[on] == r2[on])
        & (
            F.col(f"{prefix}{right_ts}")
            >= F.col(left_ts) - F.expr(f"interval {lookback}")
        )
        & (
            F.col(f"{prefix}{right_ts}")
            <= F.col(left_ts) + F.expr(f"interval {lookahead}")
        )
    )
    return l2.join(r2, cond).drop(r2[on])
