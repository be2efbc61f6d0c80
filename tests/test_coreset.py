"""Farthest-first k-center selection: known geometry + the 2-approx
radius invariant."""

from pyspark.sql import functions as F

from library_beam_spark.operators.coreset import kcenter_select


def test_known_geometry(spark):
    # Seed at origin; farthest point is (10,0); then (0,6) is farther
    # from {origin,(10,0)} than (5,0)/(1,1) are from either.
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 0.0]),
        (2, [0.0, 6.0]),
        (3, [5.0, 0.0]),
        (4, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = kcenter_select(df, k=3, seed_id=0).orderBy("center_rank").collect()
    assert [r.vec_id for r in out] == [1, 2, 3]
    assert [r.radius2 for r in out] == [100.0, 36.0, 25.0]


def test_radius_sequence_non_increasing(spark):
    # Deterministic pseudo-random cloud: the greedy coverage radius
    # can never increase (each pick only shrinks min-distances).
    rows = [
        (i, [float((i * 37 + d * 11) % 101) / 10.0 for d in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = kcenter_select(df, k=6, seed_id=0).orderBy("center_rank").collect()
    radii = [r.radius2 for r in out]
    assert len(out) == 6
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert len({r.vec_id for r in out}) == 6 and 0 not in {
        r.vec_id for r in out
    }
