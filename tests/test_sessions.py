"""Sessionization: batch semantics + streaming/batch parity
(availableNow on an in-order bounded replay ⇒ last update per session
== batch rollup)."""

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    ).withColumn("ts", F.col("ts"))


ROWS = [
    # user 1: two sessions (gap 40 min between event 3 and 4)
    (1, 1, "2024-01-01 10:00:00"),
    (1, 2, "2024-01-01 10:10:00"),
    (1, 3, "2024-01-01 10:29:00"),
    (1, 4, "2024-01-01 11:09:30"),
    (1, 5, "2024-01-01 11:15:00"),
    # user 2: exactly-gap silence (1800 s) continues the session
    (2, 6, "2024-01-01 09:00:00"),
    (2, 7, "2024-01-01 09:30:00"),
    # user 3: single event
    (3, 8, "2024-01-01 00:00:00"),
]


def _typed(spark):
    return spark.createDataFrame(
        [(u, e, t) for u, e, t in ROWS],
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_sessionize_assignment(spark):
    from library_beam_spark.operators.sessions import sessionize

    out = sessionize(_typed(spark), gap_seconds=1800)
    got = {r["event_id"]: r["session_no"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1, 7: 1, 8: 1}


def test_session_stats_rollup(spark):
    from library_beam_spark.operators.sessions import session_stats

    out = session_stats(_typed(spark), gap_seconds=1800)
    got = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["duration_s"])
        for r in out.collect()
    }
    assert got == {
        (1, 1): (3, 29 * 60),
        (1, 2): (2, 330),
        (2, 1): (2, 1800),
        (3, 1): (1, 0),
    }


def test_sessionize_tie_break_deterministic(spark):
    """Same-timestamp burst: event_id ties the order, assignment stable."""
    from library_beam_spark.operators.sessions import sessionize

    rows = [
        (9, i, "2024-02-01 12:00:00") for i in range(20)
    ] + [(9, 100, "2024-02-01 14:00:00")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sessionize(df, gap_seconds=1800)
    got = {r["event_id"]: r["session_no"] for r in out.collect()}
    assert all(got[i] == 1 for i in range(20))
    assert got[100] == 2


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Two micro-batches split MID-SESSION: the stateful operator must
    carry the open session across the batch boundary and its last
    update per session must equal the batch rollup."""
    from library_beam_spark.operators.sessions import session_stats
    from library_beam_spark.streaming.sessions import sessionize_stream

    d = tmp_path / "ev"
    d.mkdir()
    # batch 1: first half (user 1's session 1 still open at the cut)
    b1 = [r for r in ROWS if r[1] in (1, 2, 6, 8)]
    b2 = [r for r in ROWS if r[1] in (3, 4, 5, 7)]
    for i, (name, rows) in enumerate((("b1.json", b1), ("b2.json", b2))):
        p = os.path.join(d, name)
        with open(p, "w") as fh:
            for u, e, t in rows:
                fh.write(json.dumps({"user_id": u, "event_id": e, "ts": t}) + "\n")
        # oldest-mtime-first batching: same-second mtimes can reorder
        # the replay and break the in-order arrival the operator assumes
        os.utime(p, (1700000000 + i * 10, 1700000000 + i * 10))

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("update")
        .trigger(availableNow=True)
        .format("memory")
        .queryName("sessions_stream")
        .start()
    )
    q.awaitTermination(120)

    updates = spark.table("sessions_stream").collect()
    # last update per (user, session_no): max n_events wins (monotone)
    last = {}
    for r in updates:
        k = (r["user_id"], r["session_no"])
        if k not in last or r["n_events"] > last[k]["n_events"]:
            last[k] = r
    want = {
        (r["user_id"], r["session_no"]): r
        for r in session_stats(_typed(spark), gap_seconds=1800).collect()
    }
    assert set(last) == set(want)
    for k, r in last.items():
        assert r["n_events"] == want[k]["n_events"], k
        assert r["session_start"] == want[k]["session_start"], k
        assert r["session_end"] == want[k]["session_end"], k

    # closure proof: user 1 session 1 was closed by the gap in batch 2
    closed = {
        (r["user_id"], r["session_no"]) for r in updates if r["closed"]
    }
    assert (1, 1) in closed
    # open sessions at stream end remain open
    assert (1, 2) not in closed


def test_streaming_gap_truncation_matches_batch(spark, tmp_path):
    """Sub-second timestamps: a 1800.5 s silence must CONTINUE a
    1800 s-gap session on BOTH paths (whole-second truncation), and a
    1801.2 s silence must split on both."""
    import json
    import os

    from library_beam_spark.operators.sessions import session_stats
    from library_beam_spark.streaming.sessions import sessionize_stream

    rows = [
        (7, 1, "2024-03-01 08:00:00.400"),
        (7, 2, "2024-03-01 08:30:00.900"),  # +1800.5s → same session
        (7, 3, "2024-03-01 09:00:02.100"),  # +1801.2s → new session
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in session_stats(batch, gap_seconds=1800).collect()
    }
    assert want == {(7, 1): 2, (7, 2): 1}

    d = tmp_path / "subsec"
    d.mkdir()
    with open(os.path.join(d, "b1.json"), "w") as fh:
        for u, e, t in rows:
            fh.write(json.dumps({"user_id": u, "event_id": e, "ts": t}) + "\n")
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts string")
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("update")
        .trigger(availableNow=True)
        .format("memory")
        .queryName("subsec_sessions")
        .start()
    )
    q.awaitTermination(120)
    got = {}
    for r in spark.table("subsec_sessions").collect():
        k = (r["user_id"], r["session_no"])
        got[k] = max(got.get(k, 0), r["n_events"])
    assert got == want


def test_watermark_timeout_closes_idle_sessions(spark, tmp_path):
    """EventTimeTimeout: once the watermark passes last_event + gap, an
    idle session emits its final closed row and its state is dropped."""
    import json
    import os

    from library_beam_spark.streaming.sessions import sessionize_stream

    files = [
        # batch 1: user 1 has a short burst; user 2 appears
        [(1, 1, "2024-05-01 10:00:00"), (1, 2, "2024-05-01 10:05:00"),
         (2, 3, "2024-05-01 10:01:00")],
        # batch 2: only user 2 — advances the watermark to 13:00
        [(2, 4, "2024-05-01 13:00:00")],
        # batch 3: a third user at 13:30 — processed with the 13:00
        # watermark, which is past user 1's 10:05 + 30 min → timeout
        [(3, 5, "2024-05-01 13:30:00")],
    ]
    d = tmp_path / "wm"
    d.mkdir()
    for i, rows in enumerate(files):
        p = os.path.join(d, f"b{i}.json")
        with open(p, "w") as fh:
            for u, e, t in rows:
                fh.write(json.dumps({"user_id": u, "event_id": e, "ts": t}) + "\n")
        # the file source micro-batches oldest-mtime first: pin strictly
        # increasing mtimes or all three files may land in one batch /
        # out of order (observed: same-second mtimes replayed newest
        # first, watermark jumped to 13:30, everything else dropped late)
        os.utime(p, (1700000000 + i * 10, 1700000000 + i * 10))

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "0 seconds")
    )
    out = sessionize_stream(stream, gap_seconds=1800, close_on_watermark=True)
    q = (
        out.writeStream.outputMode("update")
        .trigger(availableNow=True)
        .format("memory")
        .queryName("wm_sessions")
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("wm_sessions").collect()
    closed = {
        (r["user_id"], r["session_no"]): r
        for r in rows
        if r["closed"]
    }
    # user 1's only session was closed BY TIMEOUT with its true extent
    assert (1, 1) in closed
    assert closed[(1, 1)]["n_events"] == 2
    assert str(closed[(1, 1)]["session_end"]).startswith("2024-05-01 10:05:00")
    # user 2's 13:00 event opened session 2 (gap from 10:01 > 30 min):
    # the in-stream gap close emitted session 1 closed
    assert (2, 1) in closed
    # sessions still extendable at stream end stay open
    assert (3, 1) not in closed


def test_timeout_preserves_session_numbering(spark, tmp_path):
    """A user returning AFTER a watermark-timeout close must open
    session_no+1, never re-emit the finalized key as session 1."""
    import json
    import os

    from library_beam_spark.streaming.sessions import sessionize_stream

    files = [
        [(1, 1, "2024-06-01 08:00:00")],
        # advances watermark far past 08:00 + gap → user 1 times out
        [(9, 2, "2024-06-01 12:00:00")],
        # user 1 returns: must be session 2
        [(1, 3, "2024-06-01 12:30:00")],
        # push the watermark so batch 3's row is on time
        [(9, 4, "2024-06-01 12:40:00")],
    ]
    d = tmp_path / "renum"
    d.mkdir()
    for i, rows in enumerate(files):
        p = os.path.join(d, f"b{i}.json")
        with open(p, "w") as fh:
            for u, e, t in rows:
                fh.write(json.dumps({"user_id": u, "event_id": e, "ts": t}) + "\n")
        os.utime(p, (1700000000 + i * 10, 1700000000 + i * 10))

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800, close_on_watermark=True)
        .writeStream.outputMode("update")
        .trigger(availableNow=True)
        .format("memory")
        .queryName("renum_sessions")
        .start()
    )
    q.awaitTermination(120)
    u1 = [r for r in spark.table("renum_sessions").collect()
          if r["user_id"] == 1]
    by_session = {}
    for r in u1:
        by_session.setdefault(r["session_no"], []).append(r)
    # session 1 closed exactly once by timeout; the return is session 2
    assert sorted(by_session) == [1, 2]
    assert [r["closed"] for r in by_session[1]].count(True) == 1
    assert all(not r["closed"] for r in by_session[2])


def test_streaming_sessionize_string_key(spark, tmp_path):
    """The output/state key column is derived from the actual stream
    schema: a STRING key named something other than user_id must flow
    through under its own name and type (r4 advice: the schemas were
    hard-coded to a LongType 'user_id')."""
    from library_beam_spark.streaming.sessions import sessionize_stream

    d = tmp_path / "strkey"
    d.mkdir()
    rows = [
        ("alice", 1, "2024-03-01 08:00:00"),
        ("alice", 2, "2024-03-01 08:10:00"),
        ("alice", 3, "2024-03-01 10:00:00"),  # gap → session 2
        ("bob", 4, "2024-03-01 08:05:00"),
    ]
    with open(os.path.join(d, "b1.json"), "w") as fh:
        for c, e, t in rows:
            fh.write(json.dumps({"client": c, "event_id": e, "ts": t}) + "\n")
    stream = (
        spark.readStream.schema("client string, event_id long, ts string")
        .json(str(d))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = sessionize_stream(stream, gap_seconds=1800, user_col="client")
    assert out.schema["client"].dataType.simpleString() == "string"
    q = (
        out.writeStream.outputMode("update")
        .trigger(availableNow=True)
        .format("memory")
        .queryName("sessions_strkey")
        .start()
    )
    q.awaitTermination(120)
    updates = spark.table("sessions_strkey").collect()
    last = {}
    for r in updates:
        k = (r["client"], r["session_no"])
        if k not in last or r["n_events"] > last[k]["n_events"]:
            last[k] = r["n_events"]
    assert last == {("alice", 1): 2, ("alice", 2): 1, ("bob", 1): 1}


def test_streaming_sessionize_soak_bounded_state(spark, tmp_path):
    """State-store soak (r4 directive): 10⁵ users across three
    micro-batches with timeout churn, on the RocksDB state store
    provider. Proves the O(1)-per-user state bound holds under churn:
    numRowsTotal never exceeds n_users (closed sessions shrink to
    numbering stubs, they don't accumulate), and every session the
    event stream proves over is emitted closed exactly once.

    Sizing doc (measured here, asserted loosely): state is 4 longs per
    user ≈ 140 B/user in RocksDB including column-family overhead —
    10⁸ users ≈ 14 GB spread over numShufflePartitions state stores,
    i.e. a 200-executor cluster holds ~70 MB each. The watermark delay
    is the knob that bounds how long a dead session's full state (vs
    stub) survives."""
    import collections

    from library_beam_spark.streaming.sessions import sessionize_stream

    n_users = 100_000
    d = tmp_path / "soak"
    d.mkdir()

    def write(name, mtime, users, ts):
        p = os.path.join(d, name)
        with open(p, "w") as fh:
            for u in users:
                fh.write(
                    json.dumps({"user_id": u, "event_id": u, "ts": ts}) + "\n"
                )
        os.utime(p, (mtime, mtime))

    # b1: every user opens a session. b2: half return 2h later (gap →
    # their session 1 closes, session 2 opens); the idle half's sessions
    # are closed by the event-time timeout as the watermark advances.
    write("b1.json", 1700000000, range(n_users), "2024-03-01 08:00:00")
    write("b2.json", 1700000010, range(0, n_users, 2), "2024-03-01 10:00:00")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("user_id long, event_id long, ts string")
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
            .withColumn("ts", F.to_timestamp("ts"))
            .withWatermark("ts", "10 minutes")
        )
        q = (
            sessionize_stream(stream, gap_seconds=1800, close_on_watermark=True)
            .writeStream.outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .format("memory")
            .queryName("sessions_soak")
            .start()
        )
        q.awaitTermination(500)
        progress = q.recentProgress
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)

    # state NEVER exceeds one row per user, in any batch
    for p in progress:
        for so in p["stateOperators"]:
            assert so["numRowsTotal"] <= n_users, p["batchId"]
    last = [p for p in progress if p["stateOperators"]][-1]["stateOperators"][0]
    assert last["numRowsTotal"] == n_users          # stubs retained
    assert last["memoryUsedBytes"] < 100 * 1024 * 1024  # ~140 B/user

    rows = spark.table("sessions_soak").collect()
    by_closed = collections.Counter(r["closed"] for r in rows)
    # every session 1 closes exactly once: returning half by the gap,
    # idle half by the watermark timeout; session 2s stay open
    assert by_closed[True] == n_users
    assert by_closed[False] == n_users + n_users // 2
    closed_once = collections.Counter(
        (r["user_id"], r["session_no"]) for r in rows if r["closed"]
    )
    assert all(c == 1 for c in closed_once.values())


def test_interval_coverage_nested_and_adjacent(spark):
    """The prefix-max sweep must merge NESTED intervals (a long span
    containing later short ones — a lag-against-previous-row
    implementation splits these) and adjacent half-open intervals
    (start == previous reach), while a genuine gap opens a new
    island."""
    from library_beam_spark.operators.sessions import interval_coverage

    rows = [
        # user 1: [0,100) contains [10,20) and [30,40); [100,150)
        # adjacent; [200,250) after a gap → 2 islands, covered 200
        (1, 1, 0, 100), (1, 2, 10, 20), (1, 3, 30, 40),
        (1, 4, 100, 150), (1, 5, 200, 250),
        # user 2: chain of overlaps → 1 island [0,30)
        (2, 6, 0, 10), (2, 7, 5, 20), (2, 8, 15, 30),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start_us long, end_us long"
    )
    got = {
        r.user_id: (r.n_islands, r.covered, r.longest)
        for r in interval_coverage(df).collect()
    }
    assert got == {1: (2, 200, 150), 2: (1, 30, 30)}


def test_interval_stream_fold_matches_batch(spark, tmp_path):
    """Associativity of interval union, end to end: three batches
    folded through interval_stream_batches must leave EXACTLY the
    islands a one-shot merge over all spans produces — including a
    span that BRIDGES two islands created by earlier batches
    (state must collapse, not append)."""
    from library_beam_spark.operators.sessions import merge_intervals
    from library_beam_spark.streaming.intervals import (
        interval_stream_batches,
    )

    batches = [
        [(1, 1, 0, 10), (1, 2, 40, 50), (2, 3, 0, 5)],
        [(1, 4, 100, 110)],
        [(1, 5, 8, 45), (2, 6, 5, 9)],   # bridges islands 1+2 of user 1
    ]
    idx = str(tmp_path / "index")
    step = interval_stream_batches(idx)
    allrows = []
    for i, rows in enumerate(batches):
        allrows += rows
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, start_us long, end_us long"
        )
        step(df, i)
    got = {
        (r.user_id, r._s, r._e)
        for r in spark.read.parquet(f"{idx}/batch=2").collect()
    }
    want_df = spark.createDataFrame(
        allrows, "user_id long, event_id long, start_us long, end_us long"
    )
    want = {
        (r.user_id, r._s, r._e)
        for r in merge_intervals(want_df).collect()
    }
    assert got == want
    assert (1, 0, 50) in got        # bridged island collapsed
    import os
    assert not os.path.isdir(f"{idx}/batch=0")  # superseded state GC'd


def test_interval_stream_replay_and_config_pin(spark, tmp_path):
    """Committed replays are no-ops; a restart with different span
    columns fails loudly."""
    import pytest

    from library_beam_spark.streaming.intervals import (
        interval_stream_batches,
    )

    idx = str(tmp_path / "index")
    step = interval_stream_batches(idx)
    df = spark.createDataFrame(
        [(1, 1, 0, 10)], "user_id long, event_id long, start_us long, end_us long"
    )
    step(df, 0)
    before = {
        tuple(r) for r in spark.read.parquet(f"{idx}/batch=0").collect()
    }
    step(df, 0)  # replay: no-op
    after = {
        tuple(r) for r in spark.read.parquet(f"{idx}/batch=0").collect()
    }
    assert before == after
    other = interval_stream_batches(idx, start_col="other_start")
    with pytest.raises(Exception, match="interval_stream_batches"):
        other(df.withColumnRenamed("start_us", "other_start"), 1)


def test_interval_stream_watermark_retires_closed_islands(spark, tmp_path):
    """Watermark retirement: islands wholly below max(batch end) −
    lag leave state into closed_dir; live islands stay; the union of
    retired + final state equals the unbounded fold."""
    from library_beam_spark.operators.sessions import merge_intervals
    from library_beam_spark.streaming.intervals import (
        interval_stream_batches,
    )

    idx = str(tmp_path / "index")
    closed = str(tmp_path / "closed")
    step = interval_stream_batches(
        idx, watermark_lag=50, closed_dir=closed
    )
    b0 = [(1, 1, 0, 10), (1, 2, 100, 120), (2, 3, 5, 15)]
    b1 = [(1, 4, 200, 210)]  # horizon = 210-50 = 160: retires <=160
    allrows = b0 + b1
    for i, rows in enumerate((b0, b1)):
        step(
            spark.createDataFrame(
                rows,
                "user_id long, event_id long, start_us long, end_us long",
            ),
            i,
        )
    live = {
        (r.user_id, r._s, r._e)
        for r in spark.read.parquet(f"{idx}/batch=1").collect()
    }
    retired = set()
    for i in range(2):
        retired |= {
            (r.user_id, r._s, r._e)
            for r in spark.read.parquet(f"{closed}/batch={i}").collect()
        }
    assert live == {(1, 200, 210)}
    want_df = spark.createDataFrame(
        allrows, "user_id long, event_id long, start_us long, end_us long"
    )
    want = {
        (r.user_id, r._s, r._e) for r in merge_intervals(want_df).collect()
    }
    assert live | retired == want
    # nothing retired twice
    assert not (live & retired)


def test_interval_stream_watermark_requires_both_params(spark, tmp_path):
    import pytest

    from library_beam_spark.streaming.intervals import (
        interval_stream_batches,
    )

    with pytest.raises(ValueError, match="together"):
        interval_stream_batches(str(tmp_path / "i"), watermark_lag=10)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),       # key
            st.integers(0, 40),      # start
            st.integers(1, 12),      # length
        ),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=12, deadline=None)
def test_merge_intervals_matches_reference(spark, spans):
    """Hypothesis differential: arbitrary per-key interval sets merge
    to exactly the reference sweep's island set (half-open adjacency
    merges, nested intervals collapse)."""
    from library_beam_spark.operators.sessions import merge_intervals

    rows = [
        (k, i, s, s + ln) for i, (k, s, ln) in enumerate(spans)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, start_us long, end_us long"
    )
    got = {
        (r.user_id, r._s, r._e) for r in merge_intervals(df).collect()
    }
    ref = set()
    bykey = {}
    for k, _i, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                ref.add((k, cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        ref.add((k, cur_s, cur_e))
    assert got == ref
