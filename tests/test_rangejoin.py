"""Bucketized range join vs brute-force; bucket-boundary edges."""

import random

import pytest


def _brute(probes, intervals):
    return {
        (p_id, i_id)
        for p_id, v in probes
        for i_id, lo, hi in intervals
        if lo <= v < hi
    }


def test_bucketized_range_join_matches_bruteforce(spark):
    from library_beam_spark.operators.rangejoin import bucketized_range_join

    rng = random.Random(3)
    probes = [(i, round(rng.uniform(-50, 50), 2)) for i in range(300)]
    intervals = [
        (j, lo := round(rng.uniform(-55, 50), 2), round(lo + rng.uniform(0, 8), 2))
        for j in range(60)
    ]
    p = spark.createDataFrame(probes, "p_id long, v double")
    iv = spark.createDataFrame(intervals, "i_id long, lo double, hi double")
    for width in (0.5, 3.0, 20.0):
        got = {
            (r["p_id"], r["i_id"])
            for r in bucketized_range_join(
                p, iv, "v", "lo", "hi", bucket_width=width
            ).collect()
        }
        assert got == _brute(probes, intervals), width


def test_bucketized_range_join_boundaries_half_open(spark):
    """v == lo matches, v == hi does not; exact bucket-boundary values
    (v a multiple of the width) land correctly."""
    from library_beam_spark.operators.rangejoin import bucketized_range_join

    p = spark.createDataFrame(
        [(1, 4.0), (2, 8.0), (3, 7.999)], "p_id long, v double"
    )
    iv = spark.createDataFrame([(9, 4.0, 8.0)], "i_id long, lo double, hi double")
    got = {
        r["p_id"]
        for r in bucketized_range_join(
            p, iv, "v", "lo", "hi", bucket_width=4.0
        ).collect()
    }
    assert got == {1, 3}


def test_bucketized_range_join_no_dedup_exactly_once(spark):
    """A pair spanning several covered buckets still appears once (the
    probe owns one bucket), and negative values bucket correctly."""
    from library_beam_spark.operators.rangejoin import bucketized_range_join

    p = spark.createDataFrame([(1, -3.5)], "p_id long, v double")
    iv = spark.createDataFrame(
        [(7, -10.0, 10.0)], "i_id long, lo double, hi double"
    )
    rows = bucketized_range_join(
        p, iv, "v", "lo", "hi", bucket_width=2.0
    ).collect()
    assert len(rows) == 1


def test_balance_band_join_plan_no_nested_loop(spark):
    from library_beam_spark.registry import queries

    df = queries()["balance_band_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketized_range_join_rejects_column_overlap(spark):
    from library_beam_spark.operators.rangejoin import bucketized_range_join

    p = spark.createDataFrame([(1, 1.0)], "x long, v double")
    iv = spark.createDataFrame([(2, 0.0, 5.0, 1)], "i long, lo double, hi double, x long")
    with pytest.raises(ValueError):
        bucketized_range_join(p, iv, "v", "lo", "hi", 1.0)


def test_bucketized_range_join_inverted_interval_zero_fanout(spark):
    """An interval with lo > hi matches nothing AND must generate zero
    bucket rows — F.sequence would otherwise step -1 and fan the
    malformed row out across every descending bucket (shuffle volume),
    even though the exact re-check keeps the output correct."""
    from pyspark.sql import functions as F

    from library_beam_spark.operators.rangejoin import bucketized_range_join

    p = spark.createDataFrame([(1, 5.0)], "p_id long, v double")
    iv = spark.createDataFrame(
        [(1, 100.0, -100.0), (2, 0.0, 10.0)],
        "i_id long, lo double, hi double",
    )
    out = bucketized_range_join(p, iv, "v", "lo", "hi", 1.0)
    assert [(r["p_id"], r["i_id"]) for r in out.collect()] == [(1, 2)]
    # fan-out check on the interval side: the inverted row contributes
    # zero buckets (the valid 0..10 interval at width 1.0 yields 11)
    buckets = iv.select(
        "i_id",
        F.explode(
            F.when(
                F.col("lo") <= F.col("hi"),
                F.sequence(
                    F.floor(F.col("lo") / 1.0).cast("bigint"),
                    F.floor(F.col("hi") / 1.0).cast("bigint"),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("b"),
    )
    per = {r["i_id"]: r["n"] for r in buckets.groupBy("i_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {2: 11}
