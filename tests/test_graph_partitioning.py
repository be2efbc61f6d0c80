"""Focused plan pins for the r15 graph-family edge-cache partitioning
(guide §2.4/§3): the symmetrized/adjacency edge cache of every iterative
graph operator is persisted pre-partitioned on its per-round join key,
so the cached layout satisfies the join's required distribution and the
edge list — the largest table in every loop — is shuffled ONCE at build
instead of once per round. These tests execute the exact round-join
shape each operator builds and count Exchange nodes in the EXECUTED
plan: with the cache pre-partitioned, only the node-sized side moves.
"""

import re

import pytest
from pyspark.sql import functions as F

from library_beam_spark.plans import executed_plan


def _n_ensure_exchanges(df) -> int:
    """ENSURE_REQUIREMENTS hash exchanges in the top-level FINAL plan
    (the slice before the top-level '== Initial Plan ==' marker, which
    is the only one at column 0 — nested cached-plan markers are
    indented). REPARTITION_BY_COL (the deliberate one-time cache build
    exchange) is excluded: the claim under test is about the exchanges
    the JOIN's distribution requirement inserts per round."""
    df.write.format("noop").mode("overwrite").save()
    plan = executed_plan(df).split("\n+- == Initial Plan ==")[0]
    return len(
        re.findall(r"Exchange hashpartitioning\([^)]*\), ENSURE_REQUIREMENTS", plan)
    )


def _edges(spark):
    return spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(300) if i != (i * 7) % 50],
        "src long, dst long",
    )


def _symmetrized(half, prepartition: bool):
    e = (
        half.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
    )
    if prepartition:
        e = e.repartition(F.col("v"))
    return e.persist()


@pytest.fixture
def _no_broadcast(spark):
    """Force the at-scale SMJ shape: at sf-test sizes the labels side
    broadcasts and the join has no distribution requirement at all, so
    the edge-cache layout only matters when the node table outgrows the
    broadcast budget — which is exactly the 100 TB case the
    prepartition exists for."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cc_round_join_reuses_edge_cache_partitioning(spark, _no_broadcast):
    """Under sort-merge (the at-scale strategy), the round join's edge
    side must reuse the cache's hash(v) layout: the round plan carries
    exactly ONE FEWER ensure-requirements exchange than the same plan
    over an un-prepartitioned cache (whose hash(u, v) distinct layout
    satisfies nothing)."""
    half = _edges(spark).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    counts = {}
    for prepart in (True, False):
        e = _symmetrized(half, prepart)
        try:
            labels = (
                e.select(F.col("u").alias("node"))
                .distinct()
                .withColumn("component", F.col("node"))
                .localCheckpoint(eager=True)
            )
            nbr_min = (
                e.join(
                    labels.select(F.col("node").alias("v"), "component"), "v"
                )
                .groupBy("u")
                .agg(F.min("component").alias("_nbr"))
            )
            counts[prepart] = _n_ensure_exchanges(nbr_min)
        finally:
            e.unpersist()
    assert counts[True] == counts[False] - 1, counts


def test_connected_components_values_unchanged(spark):
    """Value pin across the partitioning change: CC on a graph with a
    long path, a cycle, and islands still equals union-find."""
    from library_beam_spark.operators.clustering import connected_components

    edges = (
        [(i, i + 1) for i in range(40)]
        + [(100 + i, 100 + (i + 1) % 9) for i in range(9)]
        + [(500, 500)]
    )
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expect = {n: find(n) for n in parent}

    got = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == expect


def test_bfs_adjacency_cache_partitioning_value_pin(spark):
    """bfs_hops / weighted_sssp / bfs_fixpoint share the repartitioned
    adjacency cache; pin the values on a weighted diamond graph."""
    from library_beam_spark.operators.clustering import (
        bfs_fixpoint,
        bfs_hops,
        weighted_sssp,
    )

    edges = spark.createDataFrame(
        [(0, 1, 4), (0, 2, 1), (2, 1, 1), (1, 3, 1), (3, 4, 2)],
        "src long, dst long, w long",
    )
    srcs = spark.createDataFrame([(0,)], "node long")

    hops = {r.node: r.dist for r in bfs_hops(edges, srcs, rounds=4).collect()}
    assert hops == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}

    sssp = {
        r.node: r.dist
        for r in weighted_sssp(edges, srcs, rounds=4).collect()
    }
    assert sssp == {0: 0, 1: 2, 2: 1, 3: 3, 4: 5}

    fix = {r.node: r.dist for r in bfs_fixpoint(edges, srcs).collect()}
    assert fix == hops


def test_hits_dual_cache_value_pin(spark):
    """hits_bipartite now keeps TWO cached copies of the edge list (one
    per half-step join key); scores must be identical to the published
    two-iteration hand computation on a small bipartite graph."""
    from library_beam_spark.operators.pagerank import hits_bipartite

    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12)],
        "hub long, auth long",
    )
    hubs, auths = hits_bipartite(e, iters=2)
    a = {r.auth: r.a for r in auths.collect()}
    h = {r.hub: r.h for r in hubs.collect()}
    # exact integer algebra replay (HITS_SCALE = 1e6):
    # h0 = 1 each; a_raw = in-degree: {10:2, 11:2, 12:1}, total 5
    # a1 = raw*S DIV 5 -> {10:400000, 11:400000, 12:200000}
    # h_raw = {1:800000, 2:400000, 3:600000}, total 1800000
    # h1 = {1:444444, 2:222222, 3:333333}
    # a_raw2 = {10:666666, 11:777777, 12:333333}, total 1777776
    # a2 = raw*S DIV 1777776 -> {10:375000, 11:437500, 12:187500}
    # (666666e6 / 1777776 = exactly 375000: the divisor is 8/3 of the
    # numerator's raw count scale)
    # h_raw2 = {1:812500, 2:375000, 3:625000}, total 1812500
    # h2 = {1:448275, 2:206896, 3:344827}
    assert a == {10: 375000, 11: 437500, 12: 187500}
    assert h == {1: 448275, 2: 206896, 3: 344827}
