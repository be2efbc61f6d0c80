"""Mergeable quantile sketch (operators/quantile_sketch.py): the
DDSketch-style integer-bucket state. Pins (1) the 2^-b relative-error
bound against exact percentiles, (2) exactness below 2^b, (3) merge =
one-shot equality on ARBITRARY splits and merge trees (the property
that makes the sketch partition-free at 100 TB), (4) the map-side
partial-agg plan shape."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from library_beam_spark.operators.quantile_sketch import (
    hdr_bucket_lb,
    merge_sketch_states,
    quantile_sketch_state,
    sketch_quantiles,
)

QS = [(1, 2, 0.5), (9, 10, 0.9), (99, 100, 0.99)]


def _df(spark, values, key="k"):
    return spark.createDataFrame([(key, int(v)) for v in values], "k string, v long")


def _sketch(spark, values, b=6):
    return quantile_sketch_state(_df(spark, values), ["k"], "v", b=b)


def _py_bucket_lb(c, b):
    if c < (1 << b):
        return c
    sh = c.bit_length() - 1 - b
    return (c >> sh) << sh


def test_bucket_lb_matches_python_reference(spark):
    vals = [0, 1, 63, 64, 65, 127, 128, 999, 2**20 + 12345, 2**40 + 7]
    got = {
        r.v: r.lb
        for r in _df(spark, vals)
        .select("v", hdr_bucket_lb("v", 6).alias("lb"))
        .collect()
    }
    assert got == {v: _py_bucket_lb(v, 6) for v in vals}


def test_small_values_are_exact(spark):
    """Below 2^b every bucket has width 1 — the estimates ARE the
    type-1 quantiles."""
    values = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    out = {
        r.q: (r.est, r.n_rows)
        for r in sketch_quantiles(
            _sketch(spark, values), ["k"], QS
        ).collect()
    }
    sv = sorted(values)
    for num, den, q in QS:
        rank = -(-num * len(values) // den)
        assert out[q] == (sv[rank - 1], len(values))


@given(
    st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=60)
)
@settings(max_examples=12, deadline=None)
def test_relative_error_bound(spark, values):
    """est <= v and est > v / (1 + 2^-b): the DDSketch guarantee,
    against the exact rank-th smallest."""
    b = 6
    out = {
        r.q: r.est
        for r in sketch_quantiles(_sketch(spark, values, b=b), ["k"], QS).collect()
    }
    sv = sorted(values)
    for num, den, q in QS:
        rank = -(-num * len(values) // den)
        v = sv[rank - 1]
        assert out[q] <= v, (q, out[q], v)
        assert out[q] * (1 + 2.0 ** -b) > v, (q, out[q], v)


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=10, deadline=None)
def test_merge_equals_one_shot_any_split(spark, values, nparts):
    """Split the rows arbitrarily, sketch each part, merge in a skewed
    tree — the state (and therefore every quantile) must equal the
    one-shot sketch bit for bit. This IS the 100 TB property: no
    partitioning or merge order can change the answer."""
    parts = [values[i::nparts] for i in range(nparts)]
    states = [_sketch(spark, p) for p in parts if p]
    merged = states[0]
    for s in states[1:]:
        merged = merge_sketch_states([merged, s], ["k"])
    one = _sketch(spark, values)
    key = lambda r: (r.k, r.bucket_lb)  # noqa: E731
    assert sorted(map(lambda r: (r.k, r.bucket_lb, r.bucket_n), merged.collect())) \
        == sorted(map(lambda r: (r.k, r.bucket_lb, r.bucket_n), one.collect()))


def test_state_build_is_partial_agg_jvm_side(spark):
    """The state build must plan map-side combine (partial + final
    HashAggregate around ONE exchange) with zero Python evaluation —
    the merge runs inside Spark's aggregation, not in a UDF."""
    from library_beam_spark.plans import (
        assert_no_python_eval,
        assert_partial_aggregation,
        formatted_plan,
    )

    df = _sketch(spark, [1, 2, 3, 700, 700, 12345])
    assert_partial_aggregation(df)
    assert_no_python_eval(df)
    import re

    assert len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df))) == 1


def test_registry_query_bounded_windows(spark):
    """The extraction's windows run on the bucket grain; the probe join
    is a broadcast of the 3-row quantile table."""
    from library_beam_spark import registry
    from library_beam_spark.plans import assert_no_python_eval, formatted_plan

    df = registry.queries()["price_quantile_sketch"](
        spark, "/root/testdata/sf0.001"
    )
    plan = formatted_plan(df)
    assert_no_python_eval(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_grouping_sets_rollup_equals_per_grain_builds(spark):
    """q:quantile_sketch_rollup's property: a GROUPING SETS
    re-aggregation of ONE state equals building the sketch per grain
    from scratch — the mergeability the rollup exploits."""
    import random

    from library_beam_spark import registry  # noqa: F401
    from pyspark.sql import functions as F

    rng = random.Random(5)
    rows = [
        (f"f{v % 2}", 2020 + v % 3, rng.randint(1, 10**6))
        for v in range(500)
    ]
    df = spark.createDataFrame(rows, "flag string, yr int, v long")
    state = quantile_sketch_state(df, ["flag", "yr"], "v")
    rolled = state.groupingSets(
        [["flag", "yr", "bucket_lb"], ["flag", "bucket_lb"], ["bucket_lb"]],
        "flag", "yr", "bucket_lb",
    ).agg(
        F.sum("bucket_n").alias("bucket_n"),
        F.grouping_id().cast("int").alias("lvl"),
    )
    got = {
        (r.lvl, r.flag, r.yr, r.q): r.est
        for r in sketch_quantiles(
            rolled, ["lvl", "flag", "yr"], QS
        ).collect()
    }
    # per-grain rebuilds
    flag_grain = sketch_quantiles(
        quantile_sketch_state(df, ["flag"], "v"), ["flag"], QS
    )
    for r in flag_grain.collect():
        assert got[(2, r.flag, None, r.q)] == r.est
    global_grain = sketch_quantiles(
        quantile_sketch_state(df.withColumn("g", F.lit(1)), ["g"], "v"),
        ["g"], QS,
    )
    for r in global_grain.collect():
        assert got[(6, None, None, r.q)] == r.est
