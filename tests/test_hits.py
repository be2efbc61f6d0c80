"""Integer-exact bipartite HITS (operators/pagerank.hits_bipartite)."""

from library_beam_spark.operators.pagerank import HITS_SCALE, hits_bipartite


def _e(spark, pairs):
    return spark.createDataFrame(pairs, "hub string, auth string")


def _run(spark, pairs, iters=2):
    h, a = hits_bipartite(_e(spark, pairs), iters=iters)
    return (
        {r["hub"]: r["h"] for r in h.collect()},
        {r["auth"]: r["a"] for r in a.collect()},
    )


def test_consensus_item_wins(spark):
    # x is bought by every customer; y/z by one each -> x dominates
    pairs = [("c1", "x"), ("c2", "x"), ("c3", "x"), ("c1", "y"), ("c3", "z")]
    hubs, auths = _run(spark, pairs)
    assert auths["x"] > auths["y"] and auths["x"] > auths["z"]
    # c1 and c3 (buy 2 items incl. x) out-hub c2 (buys only x)
    assert hubs["c1"] > hubs["c2"] and hubs["c3"] > hubs["c2"]


def test_mass_conservation(spark):
    pairs = [(f"c{i}", f"p{j}") for i in range(5) for j in range(3) if (i + j) % 2]
    hubs, auths = _run(spark, pairs)
    # L1 totals: SCALE minus < 1 unit truncation per node
    assert HITS_SCALE - len(auths) <= sum(auths.values()) <= HITS_SCALE
    assert HITS_SCALE - len(hubs) <= sum(hubs.values()) <= HITS_SCALE


def test_hand_worked_first_step(spark):
    # 2 customers, 2 parts; c1->x, c2->x, c2->y.
    # a1_raw: x=2, y=1, total 3 -> a(x)=666666, a(y)=333333
    pairs = [("c1", "x"), ("c2", "x"), ("c2", "y")]
    _, auths = _run(spark, pairs, iters=1)
    assert auths == {"x": 2 * HITS_SCALE // 3, "y": HITS_SCALE // 3}


def test_disconnected_components_share_mass(spark):
    pairs = [("c1", "x"), ("c2", "y")]
    _, auths = _run(spark, pairs)
    assert auths["x"] == auths["y"] == HITS_SCALE // 2
