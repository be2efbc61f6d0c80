"""Streaming DSIR (streaming/dsir.py): bounded top-k state folding,
replay idempotence, and the ratio/config pin. Cross-engine value
correctness is the registry oracle (q:stream_dsir_selected)."""

import os

import pytest
from pyspark.sql import functions as F

# texts built from two disjoint vocabularies so hand-chosen ratios can
# push specific docs up or down deterministically
HI = "alpha beta gamma delta epsilon zeta eta theta"
LO = "omega psi chi phi upsilon tau sigma rho"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ratios(spark, buckets=16):
    """Hand-trained stand-in model: buckets hit by HI grams get +1,
    the rest −1 — computed with the engine's own feature hash so the
    stream scores exactly these."""
    from library_beam_spark.operators.sampling import hash_value

    hi = (
        spark.createDataFrame([(0, HI)], "doc_id long, text string")
        .select(F.explode(F.split("text", " ")).alias("gram"))
        .select(F.pmod(hash_value(F.col("gram"), "dsir"), F.lit(buckets)).alias("b"))
        .distinct()
        .collect()
    )
    hi_buckets = {r.b for r in hi}
    return {b: (1.0 if b in hi_buckets else -1.0) for b in range(buckets)}


def _step(spark, tmp_path, k=3, buckets=16, ratios=None):
    from library_beam_spark.streaming.dsir import dsir_stream_batches

    idx = str(tmp_path / "idx")
    return (
        dsir_stream_batches(
            idx, ratios or _ratios(spark, buckets), k=k, buckets=buckets
        ),
        idx,
    )


def _state(spark, idx):
    from library_beam_spark.streaming.dedup import _read_meta

    committed, base = _read_meta(idx)
    df = spark.read.parquet(os.path.join(idx, f"batch={committed}"))
    return committed, base, {
        r.doc_id: (r.sel_key, r.admitted_batch) for r in df.collect()
    }


def test_state_bounded_and_superseded_partitions_gcd(spark, tmp_path):
    """After every commit the index holds exactly ONE state partition of
    ≤ k rows — older partitions are folded away and removed; pointer
    base tracks the commit."""
    step, idx = _step(spark, tmp_path, k=3)
    for b in range(4):
        rows = [(b * 10 + j, HI if j % 2 else LO) for j in range(5)]
        step(_docs(spark, rows), b)
        committed, base, state = _state(spark, idx)
        assert committed == base == b
        assert len(state) <= 3
        parts = [p for p in os.listdir(idx) if p.startswith("batch=")]
        assert parts == [f"batch={b}"]


def test_fold_equals_global_topk_with_admission_tags(spark, tmp_path):
    """Gumbel top-k folding is lossless: the final two-batch state
    equals a single mega-batch run over the same docs (associativity —
    the property that lets the state stay ≤ k), and admitted_batch
    records when each survivor first entered (a batch-0 doc later
    evicted is gone)."""
    step, idx = _step(spark, tmp_path, k=2)
    b0 = [(1, HI), (2, LO), (3, HI + " " + HI)]
    b1 = [(4, HI + " alpha alpha"), (5, LO)]
    step(_docs(spark, b0), 0)
    _, _, s0 = _state(spark, idx)
    step(_docs(spark, b1), 1)
    _, _, final = _state(spark, idx)
    assert len(final) == 2

    all_docs = _docs(spark, b0 + b1)
    step2, idx2 = _step(spark, tmp_path / "replay", k=2)
    step2(all_docs, 0)
    _, _, global_topk = _state(spark, idx2)
    assert set(final) == set(global_topk)
    assert {d: v[0] for d, v in final.items()} == {
        d: v[0] for d, v in global_topk.items()
    }
    # admission tags: survivors present at batch 0 carry tag 0
    for d, (_, ab) in final.items():
        assert ab == (0 if d in s0 else 1)


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    step, idx = _step(spark, tmp_path, k=2)
    step(_docs(spark, [(1, HI), (2, LO)]), 0)
    _, _, before = _state(spark, idx)
    step(_docs(spark, [(999, HI * 3)]), 0)  # replay with DIFFERENT data
    _, _, after = _state(spark, idx)
    assert before == after


def test_ratio_config_pin_fails_loudly(spark, tmp_path):
    """Resuming with different ratios (or k/buckets) must raise — the
    trained-model-in-pointer discipline; identical config resumes."""
    ratios = _ratios(spark, 16)
    step, idx = _step(spark, tmp_path, k=2, ratios=ratios)
    step(_docs(spark, [(1, HI)]), 0)

    other = dict(ratios)
    other[0] = other[0] + 0.5
    bad, _ = _step(spark, tmp_path, k=2, ratios=other)
    with pytest.raises(ValueError, match="dsir_stream_batches"):
        bad(_docs(spark, [(2, LO)]), 1)
    bad_k, _ = _step(spark, tmp_path, k=3, ratios=ratios)
    with pytest.raises(ValueError, match="dsir_stream_batches"):
        bad_k(_docs(spark, [(2, LO)]), 1)

    same, _ = _step(spark, tmp_path, k=2, ratios=ratios)
    same(_docs(spark, [(2, LO)]), 1)  # resumes cleanly
