"""Lossy-counting heavy-hitter stream fold (streaming/lossy.py).

Pins (1) the fold against a pure-Python batch-bucket lossy-counting
simulation; (2) the Manku–Motwani invariants — f ≤ true ≤ f + delta
for survivors, true ≤ b for pruned items, no false negatives at
result time; (3) the open-vocabulary state bound on a planted-drift
stream the exact fold would retain ~10× more state for; (4)
redelivery idempotence and the fail-loud corrupted-state guard."""

import os
import random
import shutil
from collections import Counter

import pytest

from library_beam_spark.streaming.lossy import (
    lossy_result,
    lossy_stream_batches,
)
from library_beam_spark.streaming.dedup import _read_meta


def _df(spark, items):
    return spark.createDataFrame([(i,) for i in items], "item string")


def _py_lossy(batches):
    """Reference batch-bucket lossy counting: state item → (f, delta)."""
    state: dict = {}
    for b, batch in enumerate(batches, start=1):
        for it, c in Counter(batch).items():
            if it in state:
                f, d = state[it]
                state[it] = (f + c, d)
            else:
                state[it] = (c, b - 1)
        state = {
            it: (f, d) for it, (f, d) in state.items() if f + d > b
        }
    return state


def _state(spark, idx):
    committed, _ = _read_meta(idx)
    d = os.path.join(idx, f"batch={committed}", "state")
    return {
        r.item: (r.f, r.delta)
        for r in spark.read.parquet(d).collect()
    }


class TestFoldMatchesReference:
    def test_three_batches(self, spark, tmp_path):
        batches = [
            ["a"] * 5 + ["b"] * 2 + ["x"],
            ["a"] * 4 + ["c"] * 3 + ["y"],
            ["a"] * 3 + ["b"] * 4 + ["z"],
        ]
        idx = str(tmp_path / "i")
        step = lossy_stream_batches(idx)
        for i, b in enumerate(batches):
            step(_df(spark, b), i)
        assert _state(spark, idx) == _py_lossy(batches)

    def test_invariants_random_stream(self, spark, tmp_path):
        rng = random.Random(1341)
        vocab = [f"t{i}" for i in range(40)]
        batches = [
            rng.choices(vocab, weights=range(1, 41), k=300)
            for _ in range(4)
        ]
        idx = str(tmp_path / "i")
        step = lossy_stream_batches(idx)
        for i, b in enumerate(batches):
            step(_df(spark, b), i)
        true = Counter(x for b in batches for x in b)
        n, nb = sum(true.values()), len(batches)
        got = _state(spark, idx)
        for it, (f, d) in got.items():
            assert f <= true[it] <= f + d, it
        for it, t in true.items():
            if it not in got:
                assert t <= nb, it
        # no false negatives: every item with true >= s*N (> b) reported
        s_ppm = 50_000  # 5%
        heavy = {it for it, t in true.items() if t * 1_000_000 >= s_ppm * n}
        reported = {
            r.item
            for r in lossy_result(spark, idx, threshold_ppm=s_ppm).collect()
        }
        assert heavy <= reported


def test_planted_drift_state_stays_bounded(spark, tmp_path):
    """Each batch mints 300 fresh singleton terms (open-vocabulary
    drift) plus 3 persistent heavies. The exact fold retains every term
    ever seen (~10× this state); the lossy fold prunes each batch's
    singletons at its own boundary, keeping state ~ per-batch vocab."""
    idx = str(tmp_path / "i")
    step = lossy_stream_batches(idx)
    n_batches, fresh_per_batch = 5, 300
    for b in range(n_batches):
        items = [f"fresh_{b}_{j}" for j in range(fresh_per_batch)]
        items += ["hot1"] * 50 + ["hot2"] * 30 + ["hot3"] * 20
        step(_df(spark, items), b)
    got = _state(spark, idx)
    total_vocab = n_batches * fresh_per_batch + 3
    assert len(got) <= fresh_per_batch + 3  # ≤ one batch's vocab
    assert len(got) * 4 < total_vocab  # vs what the exact fold keeps
    for h in ("hot1", "hot2", "hot3"):
        assert h in got
        assert got[h][0] == {"hot1": 250, "hot2": 150, "hot3": 100}[h]


def test_redelivery_is_noop(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = lossy_stream_batches(idx)
    step(_df(spark, ["a", "a", "b"]), 0)
    s0 = _state(spark, idx)
    step(_df(spark, ["a", "a", "b"]), 0)  # redelivered
    assert _state(spark, idx) == s0


def test_missing_committed_state_fails_loud(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = lossy_stream_batches(idx)
    step(_df(spark, ["a", "a"]), 0)
    shutil.rmtree(os.path.join(idx, "batch=0"))
    with pytest.raises(RuntimeError, match="corrupt"):
        step(_df(spark, ["b"]), 1)


def test_config_pin_rejects_changed_item_col(spark, tmp_path):
    idx = str(tmp_path / "i")
    lossy_stream_batches(idx, item_col="item")(_df(spark, ["a"]), 0)
    with pytest.raises(ValueError, match="config|item"):
        lossy_stream_batches(idx, item_col="other")(
            spark.createDataFrame([("a",)], "other string"), 1
        )


def test_empty_batch_skipped_entirely(spark, tmp_path):
    # An idle trigger's zero-row batch must not raise the prune
    # threshold (f + delta <= b) without data support: "b" survives
    # batch 0 with f + delta = 2 > 1; an empty batch that still counted
    # as a bucket would prune it (2 <= 2) for free.
    idx = str(tmp_path / "i")
    step = lossy_stream_batches(idx)
    step(_df(spark, ["a", "a", "b", "b", "b"]), 0)
    s0 = _state(spark, idx)
    assert s0["b"] == (3, 0)
    committed0, _ = _read_meta(idx)
    step(_df(spark, []), 1)  # idle trigger: no bucket, no commit
    assert _read_meta(idx)[0] == committed0
    assert _state(spark, idx) == s0
    # the next real batch folds with bucket count 2, not 3: "b" with
    # f + delta = 3 survives 3 > 2 but would be pruned at 3 <= 3 had
    # the empty batch counted as a bucket
    step(_df(spark, ["a", "c"]), 2)
    final = _state(spark, idx)
    assert final == _py_lossy([["a", "a", "b", "b", "b"], ["a", "c"]])
    assert final["b"] == (3, 0)
