"""Linear interpolation gap-fill vs hand-computed series."""

import pytest


def test_interpolate_gaps_exact_series(spark):
    from library_beam_spark.operators.timeseries import interpolate_gaps

    rows = [
        # entity a: observed at t=0 (10), t=4 (30) → slope 5/step
        ("a", 0, 10), ("a", 4, 30),
        # and t=6 (20) → slope -5 between 4 and 6
        ("a", 6, 20),
        # entity b: single observation → span of one
        ("b", 3, 7),
    ]
    df = spark.createDataFrame(rows, "e string, t long, v long")
    out = {(r["e"], r["t"]): (r["v"], r["observed"])
           for r in interpolate_gaps(df, "e", "t", "v").collect()}
    assert out == {
        ("a", 0): (10.0, True),
        ("a", 1): (15.0, False),
        ("a", 2): (20.0, False),
        ("a", 3): (25.0, False),
        ("a", 4): (30.0, True),
        ("a", 5): (25.0, False),
        ("a", 6): (20.0, True),
        ("b", 3): (7.0, True),
    }


def test_interpolate_gaps_rounding_and_span(spark):
    """Non-integer interpolants round portably; spans never extend past
    an entity's own observations (no global spine)."""
    from library_beam_spark.operators.timeseries import interpolate_gaps

    df = spark.createDataFrame(
        [("x", 0, 0), ("x", 3, 1), ("far", 100, 5)],
        "e string, t long, v long",
    )
    got = {(r["e"], r["t"]): r["v"]
           for r in interpolate_gaps(df, "e", "t", "v", digits=4).collect()}
    assert got[("x", 1)] == pytest.approx(0.3333, abs=1e-9)
    assert got[("x", 2)] == pytest.approx(0.6667, abs=1e-9)
    # entity 'far' contributes exactly one row — x's span is untouched
    assert ("far", 100) in got and len(got) == 5


def test_interpolate_single_user_partitioned_window(spark):
    """The neighbor windows must partition by the entity (no global
    single-task window over the dense spine)."""
    from library_beam_spark.registry import queries

    df = queries()["interpolated_user_values"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(user_id" in plan
    rows = df.collect()
    assert rows and all(r["cents"] is not None for r in rows)
