"""Streaming SCD2 (streaming/scd.py): open-interval carry across
batches, replay idempotence, config pin, state bound + GC, and the
incremental-vs-batch differential. Cross-engine value correctness is
the registry oracle (q:stream_scd2_history)."""

import os

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.scd import scd2_history
from library_beam_spark.streaming.scd import (
    scd2_stream_batches,
    scd2_stream_result,
)

KOA = (["k"], ["ts", "eid"], ["attr"])


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, eid long, attr string")


def _run(spark, idx, batches):
    step = scd2_stream_batches(idx, *KOA)
    for i, rows in enumerate(batches):
        step(_df(spark, rows), i)
    return step


def test_boundary_spanning_interval_stays_open(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _run(
        spark,
        idx,
        [
            [(1, 10, 1, "a"), (1, 20, 2, "a")],
            [(1, 30, 3, "a"), (1, 40, 4, "b")],
        ],
    )
    out = scd2_stream_result(spark, idx, ["k"], ["attr"], ["eid"]).collect()
    by_attr = {r.attr: r for r in out}
    assert len(out) == 2
    # the 'a' interval opened at ts=10 in batch 0 and must close at the
    # batch-1 'b' event WITHOUT losing its original valid_from
    assert by_attr["a"].valid_from == 10
    assert by_attr["a"].valid_to == 40
    assert by_attr["a"].closed_in_batch == 1
    assert by_attr["b"].is_current and by_attr["b"].valid_to is None


def test_incremental_equals_batch(spark, tmp_path):
    rows = [
        (k, t, k * 100 + t, ["x", "y", "x"][(k + t) % 3])
        for k in range(4)
        for t in range(8)
    ]
    idx = str(tmp_path / "idx")
    _run(spark, idx, [rows[:12], rows[12:20], rows[20:]])
    inc = {
        (r.k, r.valid_from, r.attr, r.valid_to, r.is_current)
        for r in scd2_stream_result(
            spark, idx, ["k"], ["attr"], ["eid"]
        ).collect()
    }
    ref = {
        (r.k, r.valid_from, r.attr, r.valid_to, r.valid_to is None)
        for r in scd2_history(_df(spark, rows), *KOA).collect()
    }
    assert inc == ref


def test_replay_committed_batch_is_noop(spark, tmp_path):
    idx = str(tmp_path / "idx")
    step = _run(spark, idx, [[(1, 10, 1, "a")], [(1, 20, 2, "b")]])
    before = sorted(
        map(tuple, scd2_stream_result(spark, idx, ["k"], ["attr"], ["eid"]).collect())
    )
    step(_df(spark, [(1, 20, 2, "b")]), 1)  # at-least-once redelivery
    after = sorted(
        map(tuple, scd2_stream_result(spark, idx, ["k"], ["attr"], ["eid"]).collect())
    )
    assert before == after


def test_config_mismatch_fails_loudly(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _run(spark, idx, [[(1, 10, 1, "a")]])
    other = scd2_stream_batches(idx, ["k"], ["ts", "eid"], ["ts"])
    with pytest.raises(ValueError, match="config"):
        other(_df(spark, [(1, 20, 2, "b")]), 1)


def test_state_one_row_per_key_and_gc(spark, tmp_path):
    idx = str(tmp_path / "idx")
    _run(
        spark,
        idx,
        [
            [(1, 10, 1, "a"), (2, 10, 2, "a"), (1, 20, 3, "b")],
            [(1, 30, 4, "b"), (3, 10, 5, "a")],
        ],
    )
    state = spark.read.parquet(os.path.join(idx, "state=1"))
    assert state.count() == 3  # exactly one open interval per key
    assert not os.path.isdir(os.path.join(idx, "state=0"))  # superseded GC'd
    assert os.path.isdir(os.path.join(idx, "hist=0"))  # history append-only
    assert os.path.isdir(os.path.join(idx, "hist=1"))


def test_scd2_intervals_tile_timeline_hypothesis(spark):
    """Property (hypothesis): for ANY event stream, the batch SCD2
    intervals per key tile the key's timeline exactly — sorted by
    valid_from: first interval opens at the key's first event, each
    valid_to equals the next valid_from, exactly one open interval,
    and consecutive intervals always change attribute."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 50),  # ts
            st.sampled_from(["a", "b", "c"]),  # attr
        ),
        min_size=1,
        max_size=40,
    )

    @given(events)
    @settings(max_examples=15, deadline=None)
    def run(rows):
        data = [
            (k, t, i, a) for i, (k, t, a) in enumerate(rows)
        ]  # eid = unique arrival index
        df = spark.createDataFrame(
            data, "k long, ts long, eid long, attr string"
        )
        out = scd2_history(df, ["k"], ["ts", "eid"], ["attr"]).collect()
        by_key: dict = {}
        for r in out:
            by_key.setdefault(r.k, []).append(r)
        first_event = {}
        for k, t, i, a in data:
            cur = first_event.get(k)
            if cur is None or (t, i) < cur:
                first_event[k] = (t, i)
        assert set(by_key) == set(first_event)
        for k, ivs in by_key.items():
            # two change rows can share a ts (distinct eid), giving two
            # intervals with equal valid_from — disambiguate with
            # valid_to (open interval last) so the tiling check does
            # not depend on Spark's collect order
            ivs.sort(
                key=lambda r: (
                    r.valid_from,
                    r.valid_to is None,
                    r.valid_to if r.valid_to is not None else 0,
                )
            )
            assert ivs[0].valid_from == first_event[k][0]
            opens = [r for r in ivs if r.is_current]
            assert len(opens) == 1 and ivs[-1].is_current
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to == b.valid_from
                assert a.attr != b.attr

    run()
