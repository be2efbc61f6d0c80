"""groupwise_pearson (operators/regression.py) — hand-worked goldens."""

import math

from library_beam_spark.operators.regression import groupwise_pearson


def test_perfect_and_inverse(spark):
    rows = [("up", float(x), float(2 * x + 1)) for x in range(5)] + [
        ("down", float(x), float(10 - 3 * x)) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in groupwise_pearson(df, ["g"], "x", "y").collect()}
    assert out["up"]["r"] == 1.0
    assert out["down"]["r"] == -1.0
    assert out["up"]["n"] == 5


def test_hand_worked_value(spark):
    # x = [1,2,3,4], y = [2,1,4,3]: n=4 sx=10 sy=10 sxy=28 sxx=30 syy=30
    # cov_n = 112-100 = 12, var = 120-100 = 20 -> r = 12/20 = 0.6
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, 1.0), ("a", 3.0, 4.0), ("a", 4.0, 3.0)],
        "g string, x double, y double",
    )
    r = groupwise_pearson(df, ["g"], "x", "y").collect()[0]["r"]
    assert math.isclose(r, 0.6, abs_tol=1e-9)


def test_degenerate_variance_null(spark):
    df = spark.createDataFrame(
        [("c", 1.0, 5.0), ("c", 2.0, 5.0), ("s", 3.0, 1.0)],
        "g string, x double, y double",
    )
    out = {r["g"]: r for r in groupwise_pearson(df, ["g"], "x", "y").collect()}
    assert out["c"]["r"] is None  # zero y-variance
    assert out["s"]["r"] is None  # single point
