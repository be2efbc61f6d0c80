"""Streaming skyline fold (streaming/skyline.py): fold ≡ one-shot on
any batch split (the closure law), eviction by late dominators,
permanent exclusion of late dominated points, redelivery idempotence,
and the fail-loud corrupted-state guard."""

import os
import random
import shutil

import pytest

from library_beam_spark.operators.skyline import skyline_2d
from library_beam_spark.streaming.skyline import (
    skyline_result,
    skyline_stream_batches,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)],
        "id long, x long, y long",
    )


def _front(spark, idx):
    return sorted(
        (r.x, r.y) for r in skyline_result(spark, idx).collect()
    )


def test_fold_equals_oneshot_any_split(spark, tmp_path):
    rng = random.Random(23)
    rows = [(rng.randrange(60), rng.randrange(60)) for _ in range(300)]
    idx = str(tmp_path / "i")
    step = skyline_stream_batches(idx, "x", "y")
    step(_df(spark, rows[:100]), 0)
    step(_df(spark, rows[100:150]), 1)
    step(_df(spark, rows[150:]), 2)
    expect = sorted(
        (r.x, r.y)
        for r in skyline_2d(_df(spark, rows), "x", "y").collect()
    )
    assert _front(spark, idx) == expect


def test_late_dominator_evicts(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = skyline_stream_batches(idx, "x", "y")
    step(_df(spark, [(5, 50), (10, 80)]), 0)
    assert _front(spark, idx) == [(5, 50), (10, 80)]
    step(_df(spark, [(4, 90)]), 1)  # dominates both
    assert _front(spark, idx) == [(4, 90)]


def test_late_dominated_never_enters(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = skyline_stream_batches(idx, "x", "y")
    step(_df(spark, [(3, 70)]), 0)
    step(_df(spark, [(6, 60), (3, 70)]), 1)  # dominated + duplicate
    # duplicate of a front vector survives (no strict objective)
    assert _front(spark, idx) == [(3, 70), (3, 70)]


def test_redelivery_is_noop(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = skyline_stream_batches(idx, "x", "y")
    step(_df(spark, [(1, 10), (2, 20)]), 0)
    f0 = _front(spark, idx)
    step(_df(spark, [(1, 10), (2, 20)]), 0)
    assert _front(spark, idx) == f0


def test_missing_committed_state_fails_loud(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = skyline_stream_batches(idx, "x", "y")
    step(_df(spark, [(1, 10)]), 0)
    shutil.rmtree(os.path.join(idx, "batch=0"))
    with pytest.raises(RuntimeError, match="corrupt"):
        step(_df(spark, [(2, 20)]), 1)


def test_config_pin_rejects_changed_objectives(spark, tmp_path):
    idx = str(tmp_path / "i")
    skyline_stream_batches(idx, "x", "y")(_df(spark, [(1, 1)]), 0)
    with pytest.raises(ValueError, match="config|objective"):
        skyline_stream_batches(idx, "y", "x")(_df(spark, [(2, 2)]), 1)
