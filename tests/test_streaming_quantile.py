"""Streaming quantile sketch: order-free fold == one-shot state on
arbitrary splits AND arbitrary batch ORDER (the property that
distinguishes it from the ordering-contract folds), replay
idempotence, config pin (bucket precision drift refused)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from library_beam_spark.operators.quantile_sketch import (
    quantile_sketch_state,
    sketch_quantiles,
)
from library_beam_spark.streaming.quantile import (
    quantile_sketch_stream_batches,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _state_rows(spark, idx, batch_id):
    return sorted(
        (r.k, r.bucket_lb, r.bucket_n)
        for r in spark.read.parquet(f"{idx}/batch={batch_id}").collect()
    )


def test_fold_equals_one_shot_any_batch_order(spark, tmp_path):
    rows = [("a", (7 * t) % 1000 + 1) for t in range(40)]
    rows += [("b", (13 * t) % 70000 + 5) for t in range(30)]
    splits = [rows[0:25], rows[25:40], rows[40:70]]
    for perm, tag in [((0, 1, 2), "fwd"), ((2, 0, 1), "rot")]:
        idx = str(tmp_path / f"index_{tag}")
        step = quantile_sketch_stream_batches(idx, key_cols=("k",))
        for i, p in enumerate(perm):
            step(_batch(spark, splits[p]), i)
        got = _state_rows(spark, idx, 2)
        want = sorted(
            (r.k, r.bucket_lb, r.bucket_n)
            for r in quantile_sketch_state(
                _batch(spark, rows), ["k"], "v"
            ).collect()
        )
        assert got == want, tag
    # and the extractor sees identical quantiles from the folded state
    st = spark.read.parquet(f"{tmp_path}/index_fwd/batch=2")
    q_stream = {
        (r.k, r.q): r.est
        for r in sketch_quantiles(st, ["k"], [(1, 2, 0.5)]).collect()
    }
    q_batch = {
        (r.k, r.q): r.est
        for r in sketch_quantiles(
            quantile_sketch_state(_batch(spark, rows), ["k"], "v"),
            ["k"],
            [(1, 2, 0.5)],
        ).collect()
    }
    assert q_stream == q_batch


def test_replay_and_config_pin(spark, tmp_path):
    idx = str(tmp_path / "index")
    step = quantile_sketch_stream_batches(idx, key_cols=("k",))
    df = _batch(spark, [("a", 5), ("a", 900)])
    step(df, 0)
    before = _state_rows(spark, idx, 0)
    step(df, 0)  # committed replay: no-op, counts must not double
    assert _state_rows(spark, idx, 0) == before
    other = quantile_sketch_stream_batches(idx, key_cols=("k",), b=7)
    with pytest.raises(Exception, match="quantile_sketch_stream_batches"):
        other(df, 1)
