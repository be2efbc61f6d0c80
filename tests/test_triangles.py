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


def _brute_support(edges):
    """Per-canonical-edge triangle support, brute force."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return {(u, v): len(adj[u] & adj[v]) for u, v in und}


def _brute_truss(edges, k, rounds):
    live = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(rounds):
        sup = _brute_support(live)
        live = {e for e in live if sup[e] >= k - 2}
    return {e: s for e, s in _brute_support(live).items()}


def test_ktruss_known_cascade(spark):
    """K5 + a pendant triangle chained through a path: the 4-truss
    keeps exactly the K5 (support 3 everywhere inside), the triangle
    (support 1) and path edges cascade off over two rounds — and the
    survivors' reported support is computed on the SURVIVING graph."""
    from library_beam_spark.operators.clustering import ktruss_peel

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    fringe = [(4, 10), (10, 11), (11, 12), (10, 12), (12, 13)]
    df = spark.createDataFrame(k5 + fringe, "src long, dst long")
    got = {
        (r.u, r.v): r.support
        for r in ktruss_peel(df, k=4, rounds=3).collect()
    }
    assert got == {e: 3 for e in k5}
    # k=3 (support >= 1) keeps the pendant triangle too
    got3 = {
        (r.u, r.v): r.support
        for r in ktruss_peel(df, k=3, rounds=3).collect()
    }
    assert got3 == _brute_truss(k5 + fringe, 3, 3)
    assert (10, 11) in got3 and got3[(10, 11)] == 1


def test_ktruss_matches_bruteforce_random(spark):
    from library_beam_spark.operators.clustering import ktruss_peel

    rng = random.Random(5)
    edges = list(
        {
            tuple(sorted((rng.randrange(12), rng.randrange(12))))
            for _ in range(40)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    for k, rounds in ((3, 2), (4, 3), (5, 1)):
        got = {
            (r.u, r.v): r.support
            for r in ktruss_peel(df, k=k, rounds=rounds).collect()
        }
        assert got == _brute_truss(edges, k, rounds), (k, rounds)


def test_bfs_hops_known_graph(spark):
    """Path 0-1-2-3-4-5 plus a disjoint pair (8,9): sources {0, 8};
    4 relaxation rounds reach exactly dist <= 4, the disjoint island
    gets its own source distance, node 5 (dist 5) is absent, and a
    shortcut edge (0,3) wins the min."""
    from library_beam_spark.operators.clustering import bfs_hops

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (8, 9), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    src = spark.createDataFrame([(0,), (8,)], "node long")
    got = {r.node: r.dist for r in bfs_hops(df, src, rounds=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3, 8: 0, 9: 1}
    # bounded schedule: with 1 round only the 1-hop neighborhood exists
    got1 = {r.node: r.dist for r in bfs_hops(df, src, rounds=1).collect()}
    assert got1 == {0: 0, 1: 1, 3: 1, 8: 0, 9: 1}
