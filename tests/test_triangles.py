"""Triangle enumeration vs brute force; orientation invariants."""

import itertools
import random


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    tris = set()
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in und and (b, c) in und and (a, c) in und):
            tris.add((a, b, c))
    return tris


def test_triangles_known_graphs(spark):
    from library_beam_spark.operators.triangles import triangles

    # K4: 4 triangles; plus a disjoint 5-cycle: none
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    c5 = [(10 + i, 10 + (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(k4 + c5, ["src", "dst"])
    got = {tuple(sorted((r["a"], r["b"], r["c"])))
           for r in triangles(df).collect()}
    assert got == _brute_triangles(k4 + c5)
    assert len(got) == 4


def test_triangles_random_graph_matches_bruteforce(spark):
    from library_beam_spark.operators.triangles import triangles

    rng = random.Random(11)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
    # duplicates/self-loops/reversed duplicates exercised on purpose
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = [tuple(sorted((r["a"], r["b"], r["c"])))
            for r in triangles(df).collect()]
    # exactly-once enumeration: no triangle appears twice
    assert len(rows) == len(set(rows))
    assert set(rows) == _brute_triangles(edges)


def test_triangle_counts_credit_all_corners(spark):
    from library_beam_spark.operators.triangles import triangle_counts

    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(spark.createDataFrame(k4, ["src", "dst"])).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_no_cartesian(spark):
    from library_beam_spark.registry import queries

    df = queries()["copurchase_triangle_nodes"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
