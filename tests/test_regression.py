"""Group-wise OLS vs closed-form reference; degenerate-group guards."""

import pytest


def _ref_ols(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    if var_x <= 0:
        return None, None, None
    slope = (n * sxy - sx * sy) / var_x
    intercept = (sy - slope * sx) / n
    r2 = slope * ((n * sxy - sx * sy) / var_y) if var_y > 0 else None
    return slope, intercept, r2


def test_groupwise_ols_matches_reference(spark):
    from library_beam_spark.operators.regression import groupwise_ols

    groups = {
        "exact": [(1, 2.0), (2, 4.0), (3, 6.0)],            # y = 2x, r2 = 1
        "noisy": [(1, 1.5), (2, 3.9), (3, 5.5), (4, 8.2)],
        "flat": [(1, 5.0), (2, 5.0), (3, 5.0)],             # slope 0, var_y 0
    }
    rows = [(g, x, y) for g, pts in groups.items() for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in groupwise_ols(
            df, ["g"], "x", "y", x_scale=0, y_scale=2
        ).collect()
    }
    for g, pts in groups.items():
        scaled = [(x, round(y * 100)) for x, y in pts]
        slope, intercept, r2 = _ref_ols(scaled)
        n, got_s, got_i, got_r2 = out[g]
        assert n == len(pts)
        if slope is None:
            assert got_s is None
        else:
            assert got_s == pytest.approx(slope, abs=1e-6)
            assert got_i == pytest.approx(intercept, abs=1e-6)
        if r2 is None:
            assert out[g][3] is None
        else:
            assert got_r2 == pytest.approx(r2, abs=1e-6)
    # exact line: r2 is exactly 1 after portable rounding
    assert out["exact"][3] == 1.0
    # zero x-variance → NULL fit, not a crash
    one = spark.createDataFrame(
        [("z", 5, 1.0), ("z", 5, 2.0)], "g string, x int, y double"
    )
    z = groupwise_ols(one, ["g"], "x", "y").collect()[0]
    assert z["slope"] is None and z["intercept"] is None and z["r2"] is None


def test_groupwise_ols_no_bigint_wrap(spark):
    """Second moments accumulate as DECIMAL(38,0): magnitudes whose
    per-row square already exceeds 2^63 (y ≈ 4e9 in the scaled unit —
    y² ≈ 1.6e19) must fit exactly instead of wrapping the way a BIGINT
    accumulator silently would in non-ANSI Spark. Reference arithmetic
    is Python ints (arbitrary precision)."""
    from library_beam_spark.operators.regression import groupwise_ols

    pts = [(i, 4.0e9 * i + 7.0e8) for i in range(1, 8)]
    df = spark.createDataFrame(
        [("big", x, y) for x, y in pts], "g string, x int, y double"
    )
    got = groupwise_ols(df, ["g"], "x", "y", x_scale=0, y_scale=0).collect()[0]
    scaled = [(x, round(y)) for x, y in pts]
    slope, intercept, r2 = _ref_ols(scaled)
    assert got["slope"] == pytest.approx(slope, rel=1e-9)
    assert got["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert got["r2"] == pytest.approx(r2, rel=1e-9)


def test_groupwise_ols_single_shuffle(spark):
    """Any number of groups, one partial-agg Exchange (plus the
    broadcast dim join)."""
    from library_beam_spark.registry import queries

    df = queries()["brand_price_regression"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


def test_zipf_slope_shape_and_plan(spark):
    """Natural-ish corpus: negative slope, strong fit; the vocabulary
    must reach the rank window only through a TakeOrderedAndProject
    (bounded 1000 rows), never a global window over all tokens."""
    from library_beam_spark.registry import queries

    df = queries()["zipf_slope"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    row = df.collect()[0]
    # the synthetic corpus has ~31 near-uniform tokens — no Zipf tail,
    # so only the sign and well-formedness are assertable here (the
    # exact values are pinned cross-engine by the oracle)
    assert row["slope"] is not None and row["slope"] < 0
    assert row["r2"] is not None and 0.0 <= row["r2"] <= 1.0
