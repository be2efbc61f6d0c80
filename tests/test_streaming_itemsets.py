"""Streaming itemset-count fold (streaming/itemsets.py)."""

from library_beam_spark.operators.itemsets import apriori_frequent_itemsets
from library_beam_spark.streaming.itemsets import (
    itemsets_result,
    itemsets_stream_batches,
)


def _b(spark, baskets, start_id=0):
    rows = [(start_id + i, it) for i, bsk in enumerate(baskets) for it in bsk]
    return spark.createDataFrame(rows, "basket_id long, item string")


def test_fold_equals_oneshot_with_redelivery(spark, tmp_path):
    b0 = [["a", "b", "c"], ["a", "b"], ["d"]]
    b1 = [["a", "b", "c"], ["a", "c"], ["b", "d"], ["d"]]
    idx = str(tmp_path / "i")
    step = itemsets_stream_batches(idx)
    step(_b(spark, b0), 0)
    step(_b(spark, b0), 0)  # redelivery: dropped by the commit check
    step(_b(spark, b1, start_id=10), 1)
    got = {
        r["itemset"]: (r["k"], r["support"])
        for r in itemsets_result(spark, idx, frac=2 / 7).collect()
    }
    expect = {
        r["itemset"]: (r["k"], r["support"])
        for r in apriori_frequent_itemsets(
            _b(spark, b0).union(_b(spark, b1, start_id=10)),
            min_support=2,
        ).collect()
    }
    assert got == expect
    assert got["a|b|c"] == (3, 2)  # one occurrence per batch, merged


def test_threshold_binds_at_result_time(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = itemsets_stream_batches(idx)
    step(_b(spark, [["x", "y"], ["x"], ["x"], ["z"]]), 0)
    # same state, two thresholds
    loose = {r["itemset"] for r in itemsets_result(spark, idx, 0.25).collect()}
    tight = {r["itemset"] for r in itemsets_result(spark, idx, 0.75).collect()}
    assert "x|y" in loose and "z" in loose
    assert tight == {"x"}


def test_basket_tally_accumulates(spark, tmp_path):
    idx = str(tmp_path / "i")
    step = itemsets_stream_batches(idx)
    step(_b(spark, [["a"], ["a"]]), 0)
    step(_b(spark, [["a"], ["b"]], start_id=10), 1)
    # frac 0.6 of 4 baskets -> ceil = 3: only 'a' (support 3) survives
    got = {
        r["itemset"]: r["support"]
        for r in itemsets_result(spark, idx, 0.6).collect()
    }
    assert got == {"a": 3}


def test_config_pin_rejects_changed_max_k(spark, tmp_path):
    import pytest

    idx = str(tmp_path / "i")
    itemsets_stream_batches(idx, max_k=3)(_b(spark, [["a", "b"]]), 0)
    with pytest.raises(ValueError, match="max_k|config"):
        itemsets_stream_batches(idx, max_k=2)(_b(spark, [["c"]]), 1)
