"""Streaming sessionization — the stateful twin of
``operators/sessions.sessionize`` (custom stateful operator surface,
SURVEY §2.9/§2.10; same API family as updates.latest_version_upsert).

``applyInPandasWithState`` keyed by user. State is four scalars
(session_no, start_us, last_us, n_events) — O(1) per user, NOT the
event buffer: sessionization only ever needs the last event time, so
state stays bounded no matter how long a session runs.

Emission contract (update mode): one row per session TOUCHED in each
micro-batch, carrying current (start, end, n_events) and ``closed`` —
true the moment a later event proves the session over (gap exceeded).
Consumers treat (user_id, session_no) rows as upserts: the last update
per session equals the batch rollup exactly (pinned by the parity
test); a closed=true row is final and safe to act on. Sessions idle at
stream end stay open by design — closing them needs an event-time
watermark timeout, which is a policy choice (how long to wait for
stragglers) layered on the same state with
``GroupStateTimeout.EventTimeTimeout``.

State sizing (measured by the 10⁵-user RocksDB soak in
tests/test_sessions.py): 4 longs per user ≈ 140 B/user including
store overhead, hash-partitioned across
``spark.sql.shuffle.partitions`` state stores — 10⁸ users ≈ 14 GB
total, ~70 MB per executor on a 200-executor cluster. Run production
streams on the RocksDB provider
(``spark.sql.streaming.stateStore.providerClass =
…state.RocksDBStateStoreProvider``) so state lives off-heap/on-disk
with incremental checkpoints; the watermark delay bounds how long a
finished session's full state (vs its session_no stub) survives.

Ordering: within a batch, rows are sorted by (ts, event_id) before the
state walk — rerun-deterministic like the upsert operator. ACROSS
micro-batches the operator assumes in-order arrival per user (an event
older than the state's last_us cannot reopen a closed session; it is
folded into the current one). The batch operator is the ground truth
for out-of-order replays.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_STATE = StructType(
    [
        StructField("session_no", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

def session_update_schema(key_field: StructField) -> StructType:
    """Output schema with the key column named/typed after the actual
    stream key (derived from ``stream.schema[user_col]`` — a string or
    UUID user key must flow through, not be mislabeled as LongType)."""
    return StructType(
        [
            StructField(key_field.name, key_field.dataType),
            StructField("session_no", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("closed", BooleanType()),
        ]
    )


# default shape for the common (user_id: long) event stream
SESSION_UPDATE = session_update_schema(StructField("user_id", LongType()))


def sessionize_stream(
    stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    close_on_watermark: bool = False,
) -> DataFrame:
    """Session updates for a (user_id, event_id, ts) event stream.

    ``close_on_watermark=True`` adds the policy the plain form leaves
    open (see module docstring): when the event-time watermark passes
    ``last_event + gap``, the session provably cannot continue — no
    on-time event can extend it — so its state times out, a final
    closed row is emitted, and the state shrinks to a numbering stub
    (session_no only; removing it entirely would restart a returning
    user at session 1 and re-emit a finalized key). Requires
    ``withWatermark(ts_col, …)`` on the input; the watermark delay then
    also bounds how late a straggler may arrive and still extend its
    session.
    """
    gap_seconds = int(gap_seconds)
    key_field = stream.schema[user_col]
    key_name = key_field.name
    out_schema = session_update_schema(key_field)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            session_no, start_us, last_us, n_events = state.get
        else:
            session_no, start_us, last_us, n_events = 0, None, None, 0

        if close_on_watermark and state.hasTimedOut:
            # watermark passed last_event + gap: finalize. State shrinks
            # to a numbering stub (session_no only, no timeout) rather
            # than being removed — state.remove() would restart a
            # returning user at session_no 1 and re-emit the key of an
            # already-final closed session. O(1) per user either way.
            if start_us is not None:
                yield pd.DataFrame(
                    {
                        key_name: [user],
                        "session_no": [session_no],
                        "session_start": pd.to_datetime(
                            [start_us], unit="us"
                        ),
                        "session_end": pd.to_datetime([last_us], unit="us"),
                        "n_events": [n_events],
                        "closed": [True],
                    }
                )
            state.update((session_no, None, None, 0))
            return

        rows = []
        for pdf in pdfs:
            ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
            rows.extend(zip(ts_us.tolist(), pdf[order_col].tolist()))
        rows.sort()
        if not rows:
            return

        out = []
        for ts_us, _eid in rows:
            if start_us is None:
                # session_no is 0 for a brand-new user and the last
                # finalized number after a timeout close — either way
                # the next session continues the numbering
                session_no += 1
                start_us, last_us, n_events = ts_us, ts_us, 1
            elif (ts_us - last_us) // 1_000_000 > gap_seconds:
                # whole-second gap arithmetic, matching the batch
                # operator's timestampdiff(SECOND, …) truncation — a
                # 1800.5 s silence must CONTINUE a 1800 s-gap session
                # on both paths (parity-tested with sub-second ts)
                # the previous session is now provably over: emit its
                # final form before opening the next
                out.append(
                    (user, session_no, start_us, last_us, n_events, True)
                )
                session_no += 1
                start_us, last_us, n_events = ts_us, ts_us, 1
            else:
                last_us = max(last_us, ts_us)
                n_events += 1
        out.append((user, session_no, start_us, last_us, n_events, False))

        state.update((session_no, start_us, last_us, n_events))
        if close_on_watermark:
            # fire once no on-time event can extend the session (+1 s:
            # the gap comparison is whole-second truncated, so an event
            # inside the same truncated second still continues it).
            # CEILING to ms — flooring could fire up to 1 ms before the
            # session is provably unextendable.
            state.setTimeoutTimestamp(
                -(-last_us // 1000) + (gap_seconds + 1) * 1000
            )
        yield pd.DataFrame(
            {
                key_name: [o[0] for o in out],
                "session_no": [o[1] for o in out],
                "session_start": pd.to_datetime(
                    [o[2] for o in out], unit="us"
                ),
                "session_end": pd.to_datetime([o[3] for o in out], unit="us"),
                "n_events": [o[4] for o in out],
                "closed": [o[5] for o in out],
            }
        )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if close_on_watermark
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )
