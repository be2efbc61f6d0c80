"""Skyline operators (operators/skyline.py) vs a brute-force
dominance reference: random data with x-ties and duplicate vectors,
the duplicate-survival convention, the bounded-grain guard, and the
plan shape (no global window, one range exchange)."""

import random

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.skyline import (
    skyline_2d,
    skyline_dominance,
    skyline_grid,
)


def _brute_2d(rows):
    """Reference: minimize x, maximize y; duplicates both survive."""
    out = []
    for i, (x, y) in enumerate(rows):
        dominated = any(
            (xe <= x and ye >= y and (xe < x or ye > y))
            for j, (xe, ye) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


class TestSkyline2D:
    def _check(self, spark, rows):
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)],
            "id long, x long, y long",
        )
        got = sorted(
            (r.x, r.y) for r in skyline_2d(df, "x", "y").collect()
        )
        assert got == _brute_2d(rows)

    def test_random_with_ties(self, spark):
        rng = random.Random(7)
        rows = [
            (rng.randrange(50), rng.randrange(50)) for _ in range(400)
        ]
        self._check(spark, rows)

    def test_duplicate_vectors_both_survive(self, spark):
        rows = [(1, 10), (1, 10), (2, 20), (5, 5)]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)],
            "id long, x long, y long",
        )
        got = sorted(
            (r.x, r.y) for r in skyline_2d(df, "x", "y").collect()
        )
        # (5,5) dominated by (2,20)? 2<=5 and 20>=5 strict → yes
        assert got == [(1, 10), (1, 10), (2, 20)]

    def test_monotone_chain_keeps_all(self, spark):
        rows = [(i, 100 - i) for i in range(20)]  # pareto-optimal chain
        self._check(spark, rows)

    def test_single_winner(self, spark):
        rows = [(5, 5), (1, 100), (3, 50)]
        self._check(spark, rows)


def _brute_nd(rows, n_min, n_max):
    out = []
    for i, r in enumerate(rows):
        dominated = False
        for j, e in enumerate(rows):
            if i == j:
                continue
            at_least = all(e[k] <= r[k] for k in range(n_min)) and all(
                e[k] >= r[k] for k in range(n_min, n_min + n_max)
            )
            strict = any(e[k] < r[k] for k in range(n_min)) or any(
                e[k] > r[k] for k in range(n_min, n_min + n_max)
            )
            if at_least and strict:
                dominated = True
                break
        if not dominated:
            out.append(r)
    return sorted(out)


class TestSkylineDominance:
    def test_3d_random(self, spark):
        rng = random.Random(11)
        rows = [
            (rng.randrange(10), rng.randrange(10), rng.randrange(10))
            for _ in range(200)
        ]
        df = spark.createDataFrame(
            [(i,) + r for i, r in enumerate(rows)],
            "id long, a long, b long, c long",
        )
        got = sorted(
            (r.a, r.b, r.c)
            for r in skyline_dominance(
                df, minimize=["a"], maximize=["b", "c"]
            ).collect()
        )
        assert got == _brute_nd(rows, 1, 2)

    def test_grain_guard_fails_loud(self, spark):
        df = spark.range(50).select(
            F.col("id").alias("a"), F.col("id").alias("b")
        )
        with pytest.raises(ValueError, match="bounded grain"):
            skyline_dominance(
                df, minimize=["a"], maximize=["b"], max_rows=10
            )


def test_2d_plan_no_global_window(spark):
    from library_beam_spark.plans import formatted_plan

    df = spark.range(100).select(
        F.col("id").alias("x"), (100 - F.col("id")).alias("y")
    )
    out = skyline_2d(df, "x", "y")
    full = formatted_plan(out)
    import re

    for b in re.split(r"\n\n", full):
        if not re.match(r"\(\d+\) Window\b", b):
            continue
        spec = re.search(r"windowspecdefinition\(([^)]*)", b)
        first = spec.group(1).split(",")[0].strip()
        partitioned = not re.search(r"(ASC|DESC) NULLS", first)
        if not partitioned:
            inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", b)
            cols = {
                c.strip().split("#")[0] for c in inp.group(1).split(",")
            }
            assert cols <= {"_pid", "_pmax"}, cols


class TestSkylineGrid:
    def test_matches_brute_force_random(self, spark):
        rng = random.Random(77)
        for trial in range(5):
            rows = [
                (
                    rng.randrange(100),
                    rng.randrange(100),
                    rng.randrange(100),
                )
                for _ in range(300)
            ]
            df = spark.createDataFrame(
                [(i,) + r for i, r in enumerate(rows)],
                "id long, a long, b long, c long",
            )
            from library_beam_spark.operators.skyline import skyline_grid

            got = sorted(
                (r.a, r.b, r.c)
                for r in skyline_grid(
                    df, minimize=["a"], maximize=["b", "c"]
                ).collect()
            )
            assert got == _brute_nd(rows, 1, 2), trial

    def test_constant_objective_and_negatives(self, spark):
        from library_beam_spark.operators.skyline import skyline_grid

        rows = [(-5, 7, 3), (-9, 7, 1), (0, 7, 9), (-9, 7, 9)]
        df = spark.createDataFrame(
            [(i,) + r for i, r in enumerate(rows)],
            "id long, a long, b long, c long",
        )
        got = sorted(
            (r.a, r.b, r.c)
            for r in skyline_grid(
                df, minimize=["a"], maximize=["b", "c"]
            ).collect()
        )
        assert got == _brute_nd(rows, 1, 2)

    def test_empty_input(self, spark):
        from library_beam_spark.operators.skyline import skyline_grid

        df = spark.createDataFrame([], "id long, a long, b long")
        assert (
            skyline_grid(df, minimize=["a"], maximize=["b"]).count() == 0
        )

    def test_survivor_guard_fails_loud(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from library_beam_spark.operators.skyline import skyline_grid

        # the all-optimal diagonal for (min a, max b) is b = a: every
        # point trades a against b, nothing dominates, nothing prunes
        df = spark.range(200).select(
            F.col("id").alias("a"), F.col("id").alias("b")
        )
        with pytest.raises(ValueError, match="survivors"):
            skyline_grid(
                df, minimize=["a"], maximize=["b"], max_survivors=50
            )

    def test_prune_is_lossless_and_effective(self, spark):
        """Correlated data: the cell prune must drop most rows before
        the confirm (the point of the grid), and the result equals
        the bounded-grain operator on the same input."""
        from pyspark.sql import functions as F

        from library_beam_spark.operators.skyline import (
            skyline_dominance,
            skyline_grid,
        )

        rng = random.Random(5)
        rows = [
            (v + rng.randrange(10), v + rng.randrange(10),
             100 - v + rng.randrange(10))
            for v in [rng.randrange(90) for _ in range(500)]
        ]
        df = spark.createDataFrame(
            [(i,) + r for i, r in enumerate(rows)],
            "id long, a long, b long, c long",
        )
        a = sorted(
            (r.a, r.b, r.c)
            for r in skyline_grid(
                df, minimize=["a"], maximize=["b", "c"]
            ).collect()
        )
        b = sorted(
            (r.a, r.b, r.c)
            for r in skyline_dominance(
                df, minimize=["a"], maximize=["b", "c"]
            ).collect()
        )
        assert a == b


def test_integral_type_contract_fails_loud(spark):
    # ADVICE r13: float objectives must be rejected up front — the 2-D
    # RANGE −1 frame and the grid DIV quantization are only exact on
    # integers (int() truncation of a negative fractional lo would
    # silently misbucket).
    f = spark.createDataFrame(
        [(1.5, 2), (2.5, 1)], "x double, y int"
    )
    with pytest.raises(TypeError, match="integral"):
        skyline_2d(f, "x", "y")
    with pytest.raises(TypeError, match="integral"):
        skyline_grid(f, minimize=["x"], maximize=["y"])


def test_dominance_null_objectives_fail_loud(spark):
    # A NULL objective makes the dominance predicate NULL both ways, so
    # the row would silently always survive — reject instead.
    d = spark.createDataFrame(
        [(1, 2), (None, 1), (3, 4)], "x int, y int"
    )
    with pytest.raises(ValueError, match="NULL"):
        skyline_dominance(d, minimize=["x"], maximize=["y"])
