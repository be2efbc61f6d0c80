"""Gap-based sessionization (batch form).

``F.session_window`` (streaming/windows.py) answers *windowed
aggregate* questions; this operator answers the *assignment* question —
give every event a stable (user, session_no) identity so downstream
joins, funnels and retention can key on the session itself. The
reference engine has no session surface (its only event grouping is the
version-window dedup, SURVEY §2.4 A1); this is part of the
analytics/training-pipeline surface.

Semantics: events of one user, ordered by (ts, tie-break cols); a new
session starts when the gap to the previous event exceeds
``gap_seconds`` (strictly greater — an exactly-gap-long silence still
continues the session, matching ``session_window``'s closed-open
interval convention). ``session_no`` is 1-based per user.

Scale shape: ONE shuffle on the user key. Both window passes (lag,
running sum) and the session-stats aggregation share the same
partitioning — lag and sum run under one Exchange, and the final
``groupBy(user, session_no)`` arrives pre-partitioned by the window's
hash partitioning on user, so AQE keeps it local (the group key is a
superset of the partition key). Skewed users (bots with millions of
events) are real at 100 TB: the per-user window is a sequential scan
per user, so a single hot user serializes — cap with an upstream
per-user sample/filter when that matters (operators/sampling.
per_group_cap).

Gap arithmetic is whole seconds via ``timestampdiff(SECOND, …)``,
mirrored in oracles as ``(epoch_us(b) - epoch_us(a)) // 1000000`` (the
proven cross-engine mapping from the lag_gaps query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Input columns + ``session_no`` (1-based per user).

    ``order_cols`` break timestamp ties so the assignment is
    deterministic under any partition layout (the events table has
    same-second bursts).
    """
    for col in ("_prev_ts", "_new_session", "session_no"):
        if col in events.columns:
            raise ValueError(
                f"input already has reserved/output column {col!r}"
            )
    order = [F.col(ts_col), *(F.col(c) for c in order_cols)]
    w = Window.partitionBy(user_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts_col).over(w)
    # backtick-quote the caller's column for the SQL fragment (dots,
    # spaces); _prev_ts is ours
    ts_ref = "`" + ts_col.replace("`", "``") + "`"
    return (
        events.withColumn("_prev_ts", prev)
        .withColumn(
            "_new_session",
            (
                F.col("_prev_ts").isNull()
                | (
                    F.expr(f"timestampdiff(SECOND, _prev_ts, {ts_ref})")
                    > F.lit(gap_seconds)
                )
            ).cast("int"),
        )
        .withColumn("session_no", F.sum("_new_session").over(run))
        .drop("_prev_ts", "_new_session")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: (user, session_no, session_start, session_end,
    n_events, duration_s)."""
    s = sessionize(events, user_col, ts_col, order_cols, gap_seconds)
    return (
        s.groupBy(user_col, "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_s",
            F.expr("timestampdiff(SECOND, session_start, session_end)"),
        )
    )


def interval_coverage(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands interval MERGE — the classic "total covered
    time" problem (union of possibly-overlapping [start, end)
    intervals per key, merged; distinct from :func:`sessionize`, which
    groups POINT events by inactivity gaps — here every row carries
    its own extent and overlap is resolved by sweep). Adjacent
    intervals (start == previous max end) merge, the half-open
    convention.

    Returns (key, n_islands, covered, longest): island count, total
    covered extent, and the longest merged island, all in the input's
    integer units.

    Algorithm: per key, order by (start, end, tiebreak); an interval
    opens a NEW island iff its start exceeds the running max of all
    previous ends (the prefix-max sweep — overlap against the FURTHEST
    reach so far, not just the previous row, which nested intervals
    break); island ids are the running sum of those flags. Scale
    shape: ONE hash-partitioned sort window per key (no global sort),
    then count-grain aggregations at the island grain — the
    wide-record payload never moves twice."""
    islands = merge_intervals(df, key_col, start_col, end_col, tiebreak_col)
    return islands.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum(F.col("_e") - F.col("_s")).cast("bigint").alias("covered"),
        F.max(F.col("_e") - F.col("_s")).cast("bigint").alias("longest"),
    )


def merge_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """The island grain of :func:`interval_coverage`: one row per
    MERGED interval (key, _s, _e). Interval union is ASSOCIATIVE and
    idempotent — merge_intervals(islands ∪ more intervals) equals
    merging everything at once — which is what lets a streaming fold
    carry the islands as state (streaming/intervals.py) and what the
    hypothesis differential in tests/test_sessions.py pins. The merged
    island SET is independent of the tiebreak (it only disambiguates
    transient island ids), so state rows may pass a constant."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(start_col), F.col(end_col), F.col(tiebreak_col)
    )
    prev_reach = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_reach.isNull() | (F.col(start_col) > prev_reach), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = (
        df.select(
            F.col(key_col),
            F.col(start_col),
            F.col(end_col),
            F.col(tiebreak_col),
            opens.alias("_new"),
        )
        .withColumn("_island", F.sum("_new").over(run))
        .drop(tiebreak_col)
    )
    return marked.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("_s"), F.max(end_col).alias("_e")
    )
