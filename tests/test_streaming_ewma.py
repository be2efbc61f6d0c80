"""Streaming EWMA: bounded per-key tail state, boundary-spanning
frames, replay idempotence, config pin."""

import pytest
from pyspark.sql import functions as F


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double"
    )


def test_boundary_spanning_frames_match_batch(spark, tmp_path):
    """Frames that mix tail rows with the new batch's rows must fold
    identically to a one-shot batch EWMA — three batches, window 4,
    so every batch-2 frame spans a boundary; the tail never exceeds
    window-1 rows per key."""
    from library_beam_spark.operators.timeseries import ewma
    from library_beam_spark.streaming.ewma import ewma_stream_batches

    allrows = [(1, t, t, float((3 * t) % 7) + 0.5) for t in range(10)]
    allrows += [(2, t, 100 + t, float(t)) for t in range(5)]
    batches = [
        [r for r in allrows if r[1] < 4],
        [r for r in allrows if 4 <= r[1] < 7],
        [r for r in allrows if r[1] >= 7],
    ]
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    step = ewma_stream_batches(out, idx, window=4)
    for i, rows in enumerate(batches):
        step(_batch(spark, rows), i)
    got = {}
    for i in range(3):
        for r in spark.read.parquet(f"{out}/batch={i}").collect():
            got[(r.user_id, r.event_id)] = (r.ewma, i)
    want_df = ewma(_batch(spark, allrows), window=4)
    want = {
        (r.user_id, r.event_id): r.ewma for r in want_df.collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    # emitted rows tagged to the batch that carried them
    assert got[(1, 0)][1] == 0 and got[(1, 5)][1] == 1 and got[(1, 9)][1] == 2
    # tail state bound: <= window-1 rows per key
    tail = spark.read.parquet(f"{idx}/batch=2")
    per_key = {
        r.user_id: r.c
        for r in tail.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    }
    assert all(c <= 3 for c in per_key.values()), per_key


def test_replay_and_config_pin(spark, tmp_path):
    from library_beam_spark.streaming.ewma import ewma_stream_batches

    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    step = ewma_stream_batches(out, idx, window=4)
    df = _batch(spark, [(1, 0, 0, 2.0), (1, 1, 1, 4.0)])
    step(df, 0)
    before = {
        tuple(r) for r in spark.read.parquet(f"{out}/batch=0").collect()
    }
    step(df, 0)  # committed replay: no-op
    after = {
        tuple(r) for r in spark.read.parquet(f"{out}/batch=0").collect()
    }
    assert before == after
    other = ewma_stream_batches(out, idx, window=8)
    with pytest.raises(Exception, match="ewma_stream_batches"):
        other(df, 1)


def test_boundary_equality_redelivery_not_duplicated(spark, tmp_path):
    """A batch row carrying the SAME (key, order) tuple as a committed
    tail row is redelivery of an already-emitted observation: it must
    not fan out the join-back, pollute the fold frame, or be emitted
    twice (ADVICE r9 — the '>=' ordering contract admits boundary
    equality)."""
    from library_beam_spark.operators.timeseries import ewma
    from library_beam_spark.streaming.ewma import ewma_stream_batches

    allrows = [(1, t, t, float((3 * t) % 7) + 0.5) for t in range(8)]
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    step = ewma_stream_batches(out, idx, window=4)
    step(_batch(spark, [r for r in allrows if r[1] < 4]), 0)
    # batch 1 redelivers t=3 (the committed tail's latest) + new rows
    step(_batch(spark, [r for r in allrows if r[1] >= 3]), 1)
    want = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(_batch(spark, allrows), window=4).collect()
    }
    got = []
    for i in range(2):
        for r in spark.read.parquet(f"{out}/batch={i}").collect():
            got.append(((r.user_id, r.event_id), r.ewma))
    # t=3 emitted exactly once (in batch 0), every value batch-exact
    assert len(got) == len(allrows)
    assert dict(got) == want
