"""Exact two-pass heavy hitters (operators/freq.py)."""

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.freq import frequent_items_exact


def _exact_truth(rows, denom):
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return {k: v for k, v in c.items() if v * denom > n}


def test_matches_bruteforce(spark):
    # skewed: item 0 is ~30%, 1 is ~12%, long tail unique
    rows = (
        ["hot"] * 300 + ["warm"] * 120 + [f"t{i}" for i in range(580)]
    )
    df = spark.createDataFrame([(r,) for r in rows], "item string")
    out = {
        r["item"]: r["cnt"]
        for r in frequent_items_exact(df, "item", denom=10).collect()
    }
    assert out == _exact_truth(rows, 10)


def test_spread_across_partitions(spark):
    # a heavy item diluted evenly across many partitions must still be
    # found (the pigeonhole argument is per-batch, not per-partition-
    # uniform): 8 partitions, each 12% 'hot' locally -> 12% globally
    rows = (["hot"] * 12 + [f"u{i}" for i in range(88)]) * 8
    df = spark.createDataFrame(
        [(r,) for r in rows], "item string"
    ).repartition(8)
    out = {
        r["item"]: r["cnt"]
        for r in frequent_items_exact(df, "item", denom=10).collect()
    }
    assert out == {"hot": 96}
    total = frequent_items_exact(df, "item", denom=10).collect()[0]["total"]
    assert total == len(rows)


def test_no_heavy_items(spark):
    df = spark.createDataFrame(
        [(f"t{i}",) for i in range(500)], "item string"
    )
    assert frequent_items_exact(df, "item", denom=100).count() == 0


def test_denom_contract(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        frequent_items_exact(df, "item", denom=1)


def test_integer_items(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("item")
    )  # uniform: each of 100 values is exactly 1%
    # threshold 1/200: every value qualifies (10 * 200 > 1000)
    out = frequent_items_exact(df, "item", denom=200).collect()
    assert len(out) == 100 and all(r["cnt"] == 10 for r in out)
    # threshold 1/50: 10 * 50 = 500 < 1000 -> none qualify (strict >)
    assert frequent_items_exact(df, "item", denom=50).count() == 0
