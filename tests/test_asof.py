"""As-of join semantics (operators/asof.py)."""

import datetime as dt

import pytest

from library_beam_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "a", _ts(20)), (3, "b", _ts(5)), (4, "c", _ts(9))],
        "lid INT, k STRING, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(8), 100, 1.0),
            ("a", _ts(10), 101, 2.0),   # equal-ts with lid=1
            ("a", _ts(15), 102, 3.0),
            ("b", _ts(7), 103, 4.0),    # after b's only left row
        ],
        "k STRING, ts TIMESTAMP, rid INT, v DOUBLE",
    )
    return left, right


def _rows(df):
    return {r.lid: (r.asof_rid, r.asof_v) for r in df.collect()}


def test_backward_inclusive(spark, frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="k", right_order="rid"))
    assert got == {
        1: (101, 2.0),   # equal ts matches (inclusive)
        2: (102, 3.0),
        3: (None, None),  # no right row at-or-before → NULLs kept
        4: (None, None),  # key with no right rows at all
    }


def test_backward_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="k", right_order="rid", strict=True))
    assert got[1] == (100, 1.0)
    assert got[2] == (102, 3.0)


def test_forward(spark, frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="k", right_order="rid",
                          direction="forward"))
    assert got == {
        1: (101, 2.0),   # inclusive: equal ts still matches
        2: (None, None),  # nothing at-or-after ts=20 for key a
        3: (103, 4.0),
        4: (None, None),
    }


def test_equal_ts_right_dups_pick_max_order(spark):
    left = spark.createDataFrame([(1, "a", _ts(10))], "lid INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [("a", _ts(5), 7, 1.0), ("a", _ts(5), 9, 2.0), ("a", _ts(5), 8, 3.0)],
        "k STRING, ts TIMESTAMP, rid INT, v DOUBLE",
    )
    got = _rows(asof_join(left, right, on="k", right_order="rid"))
    assert got == {1: (9, 2.0)}


def test_left_columns_preserved_and_invalid_direction(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_order="rid")
    assert set(out.columns) == {"lid", "k", "ts", "asof_ts", "asof_rid", "asof_v"}
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", direction="sideways")


def test_single_shuffle_plan(spark, frames):
    """The plan must contain exactly one Exchange (the key shuffle) —
    no range-join cartesian, no second shuffle."""
    left, right = frames
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_reserved_column_names_rejected(spark, frames):
    left, right = frames
    bad = left.withColumn("_ts", left["ts"])
    with pytest.raises(ValueError, match="_ts"):
        asof_join(bad, right, on="k")
    bad_r = right.withColumn("_p", right["rid"])
    with pytest.raises(ValueError, match="_p"):
        asof_join(left, bad_r, on="k")


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _asof_case(draw):
    keys = ["a", "b"]
    n_l = draw(st.integers(1, 8))
    n_r = draw(st.integers(0, 8))
    left = [
        (i, draw(st.sampled_from(keys)), draw(st.integers(0, 30)))
        for i in range(n_l)
    ]
    right = [
        (100 + j, draw(st.sampled_from(keys)), draw(st.integers(0, 30)))
        for j in range(n_r)
    ]
    return left, right


@given(_asof_case(), st.sampled_from(["backward", "forward"]),
       st.booleans())
@settings(max_examples=25, deadline=None)
def test_asof_matches_bruteforce(spark, case, direction, strict):
    """Random instances vs a brute-force python reference: for each left
    row the matched right row is the max-ts (backward) / min-ts
    (forward) candidate on the correct side of left.ts, ties broken by
    the largest right id."""
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, _ts(t)) for i, k, t in left_rows], "lid INT, k STRING, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(j, k, _ts(t)) for j, k, t in right_rows],
        "rid INT, k STRING, ts TIMESTAMP",
    ) if right_rows else spark.createDataFrame(
        [], "rid INT, k STRING, ts TIMESTAMP"
    )
    got = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", right_order="rid",
            direction=direction, strict=strict,
        ).collect()
    }

    def brute(i, k, t):
        if direction == "backward":
            cand = [(rt, j) for j, rk, rt in right_rows
                    if rk == k and (rt < t if strict else rt <= t)]
            return max(cand)[1] if cand else None
        cand = [(-rt, j) for j, rk, rt in right_rows
                if rk == k and (rt > t if strict else rt >= t)]
        return max(cand)[1] if cand else None

    want = {i: brute(i, k, t) for i, k, t in left_rows}
    assert got == want
