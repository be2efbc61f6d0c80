"""Integer-exact PageRank (operators/pagerank.py)."""

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.pagerank import (
    SCALE,
    copurchase_edges,
    pagerank,
)


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_star_center_dominates(spark):
    # Star: center 0 linked to 1..5. Center must out-rank every leaf,
    # and all leaves must tie exactly (integer determinism).
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    r = {row.v: row.rank_scaled for row in pagerank(e, iters=4).collect()}
    leaves = {r[i] for i in range(1, 6)}
    assert len(leaves) == 1
    assert r[0] > leaves.pop()


def test_symmetric_cycle_is_uniform(spark):
    # 4-cycle: perfect symmetry — every node keeps exactly SCALE // 4
    # up to the integer-division leak (identical per node).
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ranks = {row.rank_scaled for row in pagerank(e, iters=3).collect()}
    assert len(ranks) == 1
    assert abs(ranks.pop() - SCALE // 4) < SCALE // 1000


def test_mass_is_conserved_approximately(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (3, 4)])
    total = (
        pagerank(e, iters=5)
        .agg(F.sum("rank_scaled").alias("s"))
        .collect()[0]
        .s
    )
    # floor damping + DIV leak lose < 1 unit per node per round
    assert 0.98 * SCALE < total <= SCALE


def test_deterministic_across_partitionings(spark):
    e = _edges(spark, [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23])
    a = sorted(map(tuple, pagerank(e, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13), iters=3).collect()))
    assert a == b


def test_checkpoint_path_matches(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    a = sorted(map(tuple, pagerank(e, iters=4).collect()))
    b = sorted(map(tuple, pagerank(e, iters=4, checkpoint_every=2).collect()))
    assert a == b


def test_copurchase_edges_symmetric_no_self_loops(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 10), (2, 12), (3, 13)],
        "l_orderkey long, l_partkey long",
    )
    e = copurchase_edges(li)
    rows = {(r.src, r.dst) for r in e.collect()}
    assert rows == {(10, 11), (11, 10), (10, 12), (12, 10)}
    assert all(s != d for s, d in rows)


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e, iters=2).count() == 0


def test_duplicate_edges_do_not_change_ranks(spark):
    # copurchase_edges emits one edge per co-purchase order; pagerank's
    # own dedup pass must make multiplicities irrelevant.
    base = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e1 = _edges(spark, base)
    e2 = _edges(spark, base + base + [(0, 1), (2, 3)])
    a = sorted(map(tuple, pagerank(e1, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e2, iters=3).collect()))
    assert a == b


def test_converged_matches_fixed_iters_at_same_count(spark):
    """pagerank_converged with an unreachable tolerance runs exactly
    max_iters rounds and reproduces the fixed-iteration ranks bit for
    bit (same integer arithmetic, different stopping rule)."""
    from library_beam_spark.operators.pagerank import pagerank_converged

    # IRREGULAR degrees (0:3, 1:2, 2:2, 3:1) — a regular graph starts at
    # its stationary distribution and would stop after one probe
    base = [(0, 1), (1, 0), (0, 2), (2, 0), (0, 3), (3, 0), (1, 2), (2, 1)]
    e = _edges(spark, base)
    got, n_iters = pagerank_converged(e, tol_denom=10**12, max_iters=4)
    assert n_iters == 4
    want = pagerank(e, iters=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_converged_stops_early_on_symmetric_graph(spark):
    """A regular graph is ALREADY at its stationary distribution (every
    node keeps the uniform rank), so the first probe sees delta ~ 0 and
    the loop stops after one iteration."""
    from library_beam_spark.operators.pagerank import pagerank_converged

    # 4-cycle, symmetrized: every node has in-degree = out-degree = 2
    base = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 0), (2, 1), (3, 2), (0, 3)]
    got, n_iters = pagerank_converged(_edges(spark, base), max_iters=8)
    assert n_iters == 1
    ranks = {r.rank_scaled for r in got.collect()}
    assert len(ranks) == 1  # still uniform


def test_converged_releases_caches(spark):
    from library_beam_spark.operators.pagerank import pagerank_converged

    spark.catalog.clearCache()
    e = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 1)])
    out, _ = pagerank_converged(e, max_iters=3)
    out.count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


class TestPersonalizedPagerank:
    def test_restart_confines_mass(self, spark):
        """Two disconnected 2-cycles; sources only in the first: the
        second component must end with rank 0 everywhere, and the
        first's total stays near SCALE (integer truncation leaks
        only)."""
        from library_beam_spark.operators.pagerank import (
            SCALE,
            personalized_pagerank,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (10, 11), (11, 10)], "src long, dst long"
        )
        srcs = spark.createDataFrame([(1,)], "v long")
        out = {
            r.v: r.rank_scaled
            for r in personalized_pagerank(edges, srcs, iters=4).collect()
        }
        assert out[10] == 0 and out[11] == 0
        assert out[1] > out[2] > 0  # source holds the restart mass
        assert abs(sum(out.values()) - SCALE) < 10

    def test_absent_sources_raise(self, spark):
        from library_beam_spark.operators.pagerank import (
            personalized_pagerank,
        )

        edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        srcs = spark.createDataFrame([(99,)], "v long")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no source node"):
            personalized_pagerank(edges, srcs, iters=1)
