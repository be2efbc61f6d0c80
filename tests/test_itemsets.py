"""Apriori frequent itemsets (operators/itemsets.py)."""

from itertools import combinations

import pytest

from library_beam_spark.operators.itemsets import apriori_frequent_itemsets


def _df(spark, baskets):
    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    return spark.createDataFrame(rows, "basket_id long, item string")


def _brute(baskets, s, max_k=3):
    out = {}
    for k in range(1, max_k + 1):
        counts = {}
        for b in baskets:
            for c in combinations(sorted(set(b)), k):
                counts[c] = counts.get(c, 0) + 1
        for c, n in counts.items():
            if n >= s:
                out["|".join(c)] = (k, n)
    return out


def test_hand_worked_lattice(spark):
    baskets = [
        ["a", "b", "c"],
        ["a", "b", "c"],
        ["a", "b"],
        ["a", "c"],
        ["b", "d"],
        ["d"],
    ]
    got = {
        r["itemset"]: (r["k"], r["support"])
        for r in apriori_frequent_itemsets(
            _df(spark, baskets), min_support=2
        ).collect()
    }
    assert got == _brute(baskets, 2)
    # spot values: abc appears twice, d twice but pair b|d only once
    assert got["a|b|c"] == (3, 2)
    assert got["d"] == (1, 2)
    assert "b|d" not in got


def test_downward_closure_prunes_triple(spark):
    # each pair of {x,y,z} co-occurs twice but never all three together:
    # no triple can be frequent, and brute force agrees
    baskets = [["x", "y"], ["x", "y"], ["y", "z"], ["y", "z"],
               ["x", "z"], ["x", "z"]]
    got = {
        r["itemset"]: (r["k"], r["support"])
        for r in apriori_frequent_itemsets(
            _df(spark, baskets), min_support=2
        ).collect()
    }
    assert got == _brute(baskets, 2)
    assert all(k <= 2 for k, _ in got.values())


def test_duplicate_items_in_basket_count_once(spark):
    rows = [(1, "a"), (1, "a"), (2, "a")]
    df = spark.createDataFrame(rows, "basket_id long, item string")
    got = apriori_frequent_itemsets(df, min_support=2).collect()
    assert [(r["itemset"], r["support"]) for r in got] == [("a", 2)]


def test_param_contracts(spark):
    df = _df(spark, [["a"]])
    with pytest.raises(ValueError):
        apriori_frequent_itemsets(df, min_support=0)
    with pytest.raises(ValueError):
        apriori_frequent_itemsets(df, max_k=4)


def test_max_k_truncation(spark):
    baskets = [["a", "b", "c"]] * 3
    got = {
        r["itemset"]
        for r in apriori_frequent_itemsets(
            _df(spark, baskets), min_support=2, max_k=2
        ).collect()
    }
    assert got == {"a", "b", "c", "a|b", "a|c", "b|c"}
