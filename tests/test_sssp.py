"""weighted_sssp (operators/clustering.py) — hand-worked goldens."""

import pytest

from library_beam_spark.operators.clustering import bfs_hops, weighted_sssp


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_cheaper_detour_beats_direct(spark):
    # 0-3 direct costs 10; 0-1-2-3 costs 3. Bellman-Ford with 4 rounds
    # must prefer the 3-hop detour.
    e = _edges(spark, [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)])
    src = spark.createDataFrame([(0,)], "node long")
    d = {r["node"]: r["dist"] for r in weighted_sssp(e, src).collect()}
    assert d == {0: 0, 1: 1, 2: 2, 3: 3}


def test_round_bound_limits_reach(spark):
    # chain 0-1-2-3-4-5, 2 rounds -> nodes past hop 2 unseen
    e = _edges(spark, [(i, i + 1, 1) for i in range(5)])
    src = spark.createDataFrame([(0,)], "node long")
    d = {r["node"]: r["dist"] for r in weighted_sssp(e, src, rounds=2).collect()}
    assert d == {0: 0, 1: 1, 2: 2}


def test_multi_source_and_parallel_edges(spark):
    # symmetrized duplicate edges keep the MIN weight
    e = _edges(spark, [(0, 1, 5), (1, 0, 2), (1, 2, 1)])
    src = spark.createDataFrame([(0,), (2,)], "node long")
    d = {r["node"]: r["dist"] for r in weighted_sssp(e, src).collect()}
    assert d == {0: 0, 2: 0, 1: 1}  # 1 is reached from 2 at cost 1


def test_unit_weights_match_bfs(spark):
    e = _edges(
        spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 4, 1), (4, 3, 1)]
    )
    src = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in weighted_sssp(e, src, rounds=3).collect()}
    ref = {
        r["node"]: r["dist"]
        for r in bfs_hops(e.drop("w"), src, rounds=3).collect()
    }
    assert got == ref


def test_negative_weight_rejected(spark):
    e = _edges(spark, [(0, 1, -1)])
    src = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError):
        weighted_sssp(e, src)
