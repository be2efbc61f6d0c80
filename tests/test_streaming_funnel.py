"""Streaming funnel fold: cross-boundary stage chains, same-batch
view→click resolution, window expiry, min-idempotent redelivery,
replay no-op, config pin."""

import datetime

import pytest
from pyspark.sql import functions as F  # noqa: F401

from library_beam_spark.streaming.funnel import (
    funnel_stages,
    funnel_stream_batches,
)


def _ts(hour):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=hour)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(hr), t) for u, hr, t in rows],
        "user_id long, ts timestamp_ntz, event_type string",
    )


def _state(spark, idx, batch_id):
    return {
        r.user_id: (r.ts1, r.ts2, r.ts3)
        for r in spark.read.parquet(f"{idx}/batch={batch_id}").collect()
    }


def test_cross_boundary_chain_and_window_expiry(spark, tmp_path):
    idx = str(tmp_path / "index")
    step = funnel_stream_batches(idx, step_hours=24)
    step(
        _batch(spark, [
            (1, 0, "view"),
            (2, 0, "view"),
            (3, 5, "view"),
            (3, 6, "click"),       # same-batch qualifying click
            (4, 1, "click"),       # click with NO view: stays stage-0
        ]),
        0,
    )
    step(
        _batch(spark, [
            (1, 10, "click"),      # within 24h of view@0 -> stage 2
            (1, 20, "purchase"),   # within 24h of click@10 -> stage 3
            (2, 30, "click"),      # view@0 + 30h: window EXPIRED
            (3, 40, "purchase"),   # click@6 + 34h: expired -> stage 2
        ]),
        1,
    )
    got = {
        r.stage: r.n_users
        for r in funnel_stages(
            spark.read.parquet(f"{idx}/batch=1")
        ).collect()
    }
    # user 1 -> 3, user 2 -> 1 (expired), user 3 -> 2, user 4 -> no view
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_batch_cascade_on_time_split(spark, tmp_path):
    """Fold over a time split == the one-shot cascade, on a dense
    interleaving with every boundary shape present."""
    rows = []
    for u in range(6):
        for hr in range(0, 200, 5 + u):
            kind = ["view", "click", "purchase"][(u + hr) % 3]
            rows.append((u, hr, kind))
    idx = str(tmp_path / "index")
    step = funnel_stream_batches(idx, step_hours=24)
    step(_batch(spark, [r for r in rows if r[1] < 100]), 0)
    step(_batch(spark, [r for r in rows if r[1] >= 100]), 1)
    got = _state(spark, idx, 1)

    ev = _batch(spark, rows)
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter((F.col("ts") > F.col("ts1"))
                & (F.col("ts") <= F.col("ts1") + F.expr("INTERVAL 24 HOUR")))
        .groupBy("user_id").agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter((F.col("ts") > F.col("ts2"))
                & (F.col("ts") <= F.col("ts2") + F.expr("INTERVAL 24 HOUR")))
        .groupBy("user_id").agg(F.min("ts").alias("ts3"))
    )
    want = {
        r.user_id: (r.ts1, r.ts2, r.ts3)
        for r in t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left").collect()
    }
    assert got == want


def test_redelivery_is_idempotent_and_replay_noop(spark, tmp_path):
    idx = str(tmp_path / "index")
    step = funnel_stream_batches(idx, step_hours=24)
    b0 = _batch(spark, [(1, 0, "view"), (1, 2, "click")])
    step(b0, 0)
    s0 = _state(spark, idx, 0)
    step(b0, 0)  # committed replay: no-op
    assert _state(spark, idx, 0) == s0
    # boundary redelivery: the same click re-arrives — min is idempotent
    step(_batch(spark, [(1, 2, "click"), (1, 5, "purchase")]), 1)
    s1 = _state(spark, idx, 1)
    assert s1[1] == (_ts(0), _ts(2), _ts(5))
    other = funnel_stream_batches(idx, step_hours=48)
    with pytest.raises(Exception, match="funnel_stream_batches"):
        other(b0, 2)
