"""Streaming IVF ingest (streaming/ivf.py): append-only postings,
bounded per-cell stats folding, replay idempotence, and the quantizer
pin. Cross-engine value correctness is the registry oracle
(q:stream_ivf_ingest)."""

import os

import pytest

# 2-D quantizer with well-separated cells: vectors on the +x axis land
# in cell 0, +y in cell 1 — assignments are hand-checkable
CENTS = [[1.0, 0.0], [0.0, 1.0]]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _step(tmp_path, cents=None):
    from library_beam_spark.streaming.ivf import ivf_ingest_batches

    idx = str(tmp_path / "idx")
    return ivf_ingest_batches(idx, cents or CENTS), idx


def _meta(idx):
    from library_beam_spark.streaming.dedup import _read_meta

    return _read_meta(idx)


def test_postings_append_and_stats_fold(spark, tmp_path):
    """Two batches: postings partitions accumulate (both survive), the
    stats table folds to corpus-total counts/mass yet never exceeds one
    ≤ m-row partition; superseded stats partitions are GC'd."""
    step, idx = _step(tmp_path)
    step(_vecs(spark, [(0, [2.0, 0.0]), (2, [0.0, 3.0])]), 0)
    step(_vecs(spark, [(1, [5.0, 0.1]), (3, [4.0, 0.0])]), 1)

    committed, base = _meta(idx)
    assert (committed, base) == (1, 1)
    assert sorted(os.listdir(os.path.join(idx, "postings"))) == [
        "batch=0", "batch=1",
    ]
    assert os.listdir(os.path.join(idx, "stats")) == ["batch=1"]

    posts = spark.read.parquet(os.path.join(idx, "postings"))
    got = {r.vec_id: (r.cell, r.ingest_batch) for r in posts.collect()}
    assert got == {0: (0, 0), 2: (1, 0), 1: (0, 1), 3: (0, 1)}

    stats = {
        r.cell: (r.n_vecs, r.sim_mass)
        for r in spark.read.parquet(
            os.path.join(idx, "stats", "batch=1")
        ).collect()
    }
    # cell 0: sims 2.0 + 5.0 + 4.0; cell 1: 3.0
    assert stats[0] == (3, 11.0)
    assert stats[1] == (1, 3.0)


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    """An at-least-once redelivery of a committed batch must not append
    its postings twice."""
    step, idx = _step(tmp_path)
    b0 = _vecs(spark, [(0, [2.0, 0.0])])
    step(b0, 0)
    step(b0, 0)  # replay
    posts = spark.read.parquet(os.path.join(idx, "postings"))
    assert posts.count() == 1
    assert _meta(idx) == (0, 0)


def test_quantizer_config_pin_fails_loudly(spark, tmp_path):
    """Resuming the index under different centroids must raise, not
    silently split the posting store across two geometries."""
    step, idx = _step(tmp_path)
    step(_vecs(spark, [(0, [2.0, 0.0])]), 0)
    from library_beam_spark.streaming.ivf import ivf_ingest_batches

    other = ivf_ingest_batches(idx, [[0.5, 0.5], [1.0, 0.0]])
    with pytest.raises(ValueError, match="config"):
        other(_vecs(spark, [(1, [0.0, 1.0])]), 1)


def test_assignment_tie_takes_first_cell(spark, tmp_path):
    """A vector equidistant from both centroids lands in the FIRST
    best cell — the list_position rule the oracle shares."""
    step, idx = _step(tmp_path)
    step(_vecs(spark, [(0, [1.0, 1.0])]), 0)
    posts = spark.read.parquet(os.path.join(idx, "postings"))
    assert posts.collect()[0].cell == 0
