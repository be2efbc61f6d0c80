"""Streaming curation (streaming/curation.py): first-arrival-wins
fingerprint dedup across batches, threshold gating, replay idempotence,
and the model-config pin. Cross-engine value correctness is the
registry oracle (q:stream_curation_admitted)."""

import os

import pytest
from pyspark.sql import functions as F

GOOD = (
    "the committee is reviewing a detailed proposal for the renewable "
    "energy storage program that the council approved with substantial "
    "funding in the previous session of the regional assembly meeting"
)
W, B = [0.5, 0.5, 2.0], 0.0  # stopword-heavy text scores high


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _step(tmp_path, threshold=0.5, weights=W, bias=B):
    from library_beam_spark.streaming.curation import curation_batches

    return (
        curation_batches(
            str(tmp_path / "out"), str(tmp_path / "idx"), weights, bias,
            threshold=threshold,
        ),
        str(tmp_path / "out"),
    )


def test_first_arrival_wins_not_lowest_id(spark, tmp_path):
    """A duplicate whose LOWER id arrives in a LATER batch is dropped —
    the streaming-native policy, explicitly different from the batch
    exact_dedup lowest-id-overall canon (and exactly what the two-phase
    oracle of q:stream_curation_admitted replays)."""
    step, out = _step(tmp_path)
    step(_docs(spark, [(10, GOOD)]), 0)
    step(_docs(spark, [(3, GOOD), (11, GOOD + " extra tail words")]), 1)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [10, 11]  # 3 lost to the earlier-admitted 10


def test_threshold_gates_before_dedup(spark, tmp_path):
    """A low-quality doc neither lands in the output NOR claims its
    fingerprint — a later high-quality duplicate of it is admitted."""
    step, out = _step(tmp_path, weights=[0.0, 0.0, 4.0], bias=-1.2)
    low = "zxqj vwpk mlrt ngfd hbsc"  # no stopwords → quality < 0.5
    step(_docs(spark, [(1, low)]), 0)
    assert not os.path.isdir(os.path.join(out, "batch=0")) or (
        spark.read.parquet(os.path.join(out, "batch=0")).count() == 0
    )
    step(_docs(spark, [(2, GOOD)]), 1)
    got = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert got == [2]


def test_replay_and_config_pin(spark, tmp_path):
    step, out = _step(tmp_path)
    step(_docs(spark, [(1, GOOD)]), 0)
    step(_docs(spark, [(1, GOOD)]), 0)  # committed replay: no-op
    assert spark.read.parquet(out).count() == 1
    with pytest.raises(ValueError, match="admission semantics"):
        _step(tmp_path, threshold=0.7)[0](_docs(spark, [(2, GOOD)]), 1)
    with pytest.raises(ValueError, match="admission semantics"):
        _step(tmp_path, weights=[0.1, 0.5, 2.0])[0](_docs(spark, [(2, GOOD)]), 1)
    step(_docs(spark, [(9, GOOD + " more")]), 1)  # same config resumes
    assert spark.read.parquet(out).count() == 2


def test_compaction_bounds_window_and_preserves_dedup(spark, tmp_path):
    """compact_every=2: the pointer window stays <= 2 partitions, folded
    partitions are GC'd, and post-compaction arrivals still dedup
    against folded history."""
    import glob

    from library_beam_spark.streaming.curation import curation_batches
    from library_beam_spark.streaming.dedup import _read_meta

    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    step = curation_batches(out, idx, W, B, compact_every=2)
    texts = {}
    for b in range(6):
        t = GOOD + f" batch marker {b}"
        texts[b] = t
        rows = [(b * 10, t)]
        if b >= 2:
            rows.append((b * 10 + 1, texts[b - 2]))  # dup of older batch
        step(_docs(spark, rows), b)
        committed, base = _read_meta(idx)
        assert committed - base + 1 <= 2, (b, base, committed)
        on_disk = {
            int(p.rsplit("=", 1)[1])
            for p in glob.glob(os.path.join(idx, "batch=*"))
        }
        assert min(on_disk) == base
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [0, 10, 20, 30, 40, 50]  # every cross-batch dup dropped
