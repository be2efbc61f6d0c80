"""Streaming last-touch attribution: one-row-per-user state,
cross-boundary credit, lookback expiry, organic fallback, replay
idempotence + config pin, boundary redelivery."""

import datetime

import pytest
from pyspark.sql import functions as F


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(
        minutes=minute
    )


def _batch(spark, rows):
    """rows: (user_id, minute, event_id, event_type, value)"""
    return spark.createDataFrame(
        [(u, _ts(m), e, t, v) for u, m, e, t, v in rows],
        "user_id long, ts timestamp_ntz, event_id long, "
        "event_type string, value double",
    )


def _emitted(spark, out, batches=2):
    got = {}
    for i in range(batches):
        for r in spark.read.parquet(f"{out}/batch={i}").collect():
            assert r.event_id not in got, "purchase emitted twice"
            got[r.event_id] = (r.channel, r.value, i)
    return got


def test_cross_boundary_credit_and_lookback(spark, tmp_path):
    """A batch-1 purchase credits the batch-0 touch carried in state;
    a purchase past the lookback window falls to organic; within a
    batch the latest touch wins with (ts, event_id) ties."""
    from library_beam_spark.streaming.attribution import (
        attribution_stream_batches,
    )

    out, idx = str(tmp_path / "out"), str(tmp_path / "index")
    step = attribution_stream_batches(out, idx, lookback_hours=1)
    step(
        _batch(spark, [
            (1, 0, 10, "click", 0.0),
            (1, 5, 11, "view", 0.0),      # latest touch for user 1
            (2, 3, 12, "click", 0.0),
            (3, 4, 13, "purchase", 9.0),  # no touch ever -> organic
        ]),
        0,
    )
    step(
        _batch(spark, [
            (1, 20, 20, "purchase", 5.0),   # credits view@5 from state
            (2, 200, 21, "purchase", 7.0),  # click@3 > 1h old -> organic
            (2, 210, 22, "click", 0.0),
            (2, 215, 23, "purchase", 3.0),  # credits click@210
        ]),
        1,
    )
    got = _emitted(spark, out)
    assert got == {
        13: ("organic", 9.0, 0),
        20: ("view", 5.0, 1),
        21: ("organic", 7.0, 1),
        23: ("click", 3.0, 1),
    }
    # state bound: ONE row per user, the latest touch
    state = {
        r.user_id: (r.event_id, r.event_type)
        for r in spark.read.parquet(f"{idx}/batch=1").collect()
    }
    assert state == {1: (11, "view"), 2: (22, "click")}


def test_matches_batch_operator_on_time_split(spark, tmp_path):
    """Two-batch fold == one-shot batch attribution on a random-ish
    interleaving (the registry oracle's property, pinned locally)."""
    from library_beam_spark import registry
    from library_beam_spark.streaming.attribution import (
        attribution_stream_batches,
    )

    rows = []
    eid = 0
    for u in range(4):
        for m in range(0, 120, 7 + u):
            eid += 1
            kind = ["click", "view", "purchase"][(u + m) % 3]
            rows.append((u, m, eid, kind, float(m % 13)))
    out, idx = str(tmp_path / "out"), str(tmp_path / "index")
    step = attribution_stream_batches(out, idx, lookback_hours=1)
    step(_batch(spark, [r for r in rows if r[1] < 60]), 0)
    step(_batch(spark, [r for r in rows if r[1] >= 60]), 1)
    got = {k: v[0] for k, v in _emitted(spark, out).items()}

    # one-shot reference via the same union-tag window the batch
    # registry query uses, inlined on the local frame
    ev = _batch(spark, rows)
    from pyspark.sql import Window

    tagged = ev.withColumn(
        "_is_touch",
        F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0),
    )
    w = Window.partitionBy("user_id").orderBy(
        "ts", F.desc("_is_touch"), "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    lt = F.last(
        F.when(F.col("_is_touch") == 1,
               F.struct("ts", "event_id", "event_type")),
        ignorenulls=True,
    ).over(w)
    want = {
        r.event_id: r.channel
        for r in tagged.withColumn("_lt", lt)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.when(
                F.col("_lt").isNotNull()
                & (F.col("_lt.ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")),
                F.col("_lt.event_type"),
            ).otherwise("organic").alias("channel"),
        )
        .collect()
    }
    assert got == want


def test_replay_and_config_pin(spark, tmp_path):
    from library_beam_spark.streaming.attribution import (
        attribution_stream_batches,
    )

    out, idx = str(tmp_path / "out"), str(tmp_path / "index")
    step = attribution_stream_batches(out, idx, lookback_hours=1)
    df = _batch(spark, [(1, 0, 1, "click", 0.0), (1, 2, 2, "purchase", 4.0)])
    step(df, 0)
    before = {tuple(r) for r in spark.read.parquet(f"{out}/batch=0").collect()}
    step(df, 0)  # committed replay: no-op
    after = {tuple(r) for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert before == after
    other = attribution_stream_batches(out, idx, lookback_hours=2)
    with pytest.raises(Exception, match="attribution_stream_batches"):
        other(df, 1)


def test_boundary_redelivery_not_recredited(spark, tmp_path):
    """A batch-1 row equal to the committed state touch is redelivery:
    deduped before the window, so attribution and state stay exact."""
    from library_beam_spark.streaming.attribution import (
        attribution_stream_batches,
    )

    out, idx = str(tmp_path / "out"), str(tmp_path / "index")
    step = attribution_stream_batches(out, idx, lookback_hours=1)
    step(_batch(spark, [(1, 10, 5, "click", 0.0)]), 0)
    step(
        _batch(spark, [
            (1, 10, 5, "click", 0.0),        # redelivered state row
            (1, 30, 6, "purchase", 2.0),
        ]),
        1,
    )
    got = _emitted(spark, out)
    assert got == {6: ("click", 2.0, 1)}
    state = spark.read.parquet(f"{idx}/batch=1").collect()
    assert [(r.user_id, r.event_id) for r in state] == [(1, 5)]
