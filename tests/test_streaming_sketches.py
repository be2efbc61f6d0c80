"""Streaming sketches (streaming/sketches.py): the incremental CMS /
Bloom state equals the batch-built sketch, state is bounded by the
sketch configuration, and bloom_dedup_batches never emits a key twice —
including across at-least-once foreachBatch replays and crashes between
the output write and the filter commit."""

import os

from pyspark.sql import functions as F


def _run_available_now(writer, name):
    q = writer.format("memory").queryName(name).trigger(availableNow=True).start()
    q.awaitTermination(120)
    return q


def _token_frame(spark, n=4000):
    # item t<v> appears ~2v+1 times (planted skew)
    return spark.range(n).select(
        F.concat(F.lit("t"), F.floor(F.sqrt(F.col("id"))).cast("int")).alias("term")
    )


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    from library_beam_spark.operators.cms import cms_build, cms_collect
    from library_beam_spark.streaming.sketches import streaming_cms

    d, w = 3, 256
    occ = _token_frame(spark)
    echo = str(tmp_path / "occ")
    occ.write.mode("overwrite").parquet(echo)
    stream = spark.readStream.schema(occ.schema).parquet(echo)
    _run_available_now(
        streaming_cms(stream, "term", d, w).writeStream.outputMode("complete"),
        "cms_state",
    )
    got = cms_collect(spark.table("cms_state"), d, w)
    want = cms_collect(cms_build(occ, "term", d, w), d, w)
    assert got == want
    # state bound: the COMPLETE state is at most the d*w grid
    assert spark.table("cms_state").count() <= d * w


def test_streaming_bloom_equals_batch_filter(spark, tmp_path):
    from library_beam_spark.operators.bloom import bloom_build, bloom_collect
    from library_beam_spark.streaming.sketches import streaming_bloom

    m, k = 64 * 64, 4
    keys = spark.range(800).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    echo = str(tmp_path / "keys")
    keys.write.mode("overwrite").parquet(echo)
    stream = spark.readStream.schema(keys.schema).parquet(echo)
    _run_available_now(
        streaming_bloom(stream, "key", m, k).writeStream.outputMode("complete"),
        "bloom_state",
    )
    got = bloom_collect(spark.table("bloom_state"), m)
    want = bloom_collect(bloom_build(keys, "key", m, k), m)
    assert got == want
    assert spark.table("bloom_state").count() <= m // 64


def _dedup_setup(spark, tmp_path):
    from library_beam_spark.streaming.sketches import bloom_dedup_batches

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    fdir = str(tmp_path / "filter")
    os.makedirs(src)
    step = bloom_dedup_batches(
        spark.readStream.schema("key string").parquet(src),
        "key",
        out,
        fdir,
        m_bits=1 << 14,
        k=5,
    )
    return step, out, fdir


def test_bloom_dedup_never_emits_twice_across_batches(spark, tmp_path):
    step, out, _ = _dedup_setup(spark, tmp_path)
    b1 = spark.createDataFrame([(f"k{i}",) for i in range(100)], "key string")
    b2 = spark.createDataFrame(
        # 50 repeats from batch 1 + 50 fresh + an in-batch duplicate
        [(f"k{i}",) for i in range(50, 150)] + [("k60",)],
        "key string",
    )
    step(b1, 0)
    step(b2, 1)

    emitted = [r["key"] for r in spark.read.parquet(out).collect()]
    assert len(emitted) == len(set(emitted)), "a key was emitted twice"
    # batch-1 keys all emitted exactly once (the filter was empty)
    assert set(f"k{i}" for i in range(100)) <= set(emitted)
    # fresh batch-2 keys emitted except (rare) false positives
    fresh = set(f"k{i}" for i in range(100, 150))
    dropped = fresh - set(emitted)
    assert len(dropped) <= 2, f"too many false-positive drops: {sorted(dropped)}"


def test_bloom_dedup_filter_survives_restart(spark, tmp_path):
    from library_beam_spark.streaming.sketches import bloom_dedup_batches

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    fdir = str(tmp_path / "filter")
    os.makedirs(src)
    stream = spark.readStream.schema("key string").parquet(src)

    step = bloom_dedup_batches(stream, "key", out, fdir, m_bits=1 << 14, k=5)
    step(spark.createDataFrame([("a",), ("b",)], "key string"), 0)
    # "restart": a NEW step instance over the same persisted filter dir
    step2 = bloom_dedup_batches(stream, "key", out, fdir, m_bits=1 << 14, k=5)
    step2(spark.createDataFrame([("a",), ("c",)], "key string"), 1)
    emitted = sorted(r["key"] for r in spark.read.parquet(out).collect())
    assert emitted == ["a", "b", "c"]


def test_bloom_dedup_replay_of_committed_batch_is_noop(spark, tmp_path):
    step, out, _ = _dedup_setup(spark, tmp_path)
    b = spark.createDataFrame([("x",), ("y",)], "key string")
    step(b, 0)
    step(b, 0)  # at-least-once replay AFTER the commit: must not re-emit
    emitted = sorted(r["key"] for r in spark.read.parquet(out).collect())
    assert emitted == ["x", "y"]


def test_bloom_dedup_crash_between_write_and_commit_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """Crash AFTER the batch output write but BEFORE the pointer commit:
    the replay recomputes against the old filter and OVERWRITES the same
    batch partition — same survivors, no duplicates, filter intact."""
    import library_beam_spark.streaming.sketches as S

    step, out, fdir = _dedup_setup(spark, tmp_path)
    step(spark.createDataFrame([("a",), ("b",)], "key string"), 0)

    real_commit = S._commit_state
    boom = {"armed": True}

    def failing_commit(filter_dir, batch_id, words):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("injected crash before commit")
        real_commit(filter_dir, batch_id, words)

    monkeypatch.setattr(S, "_commit_state", failing_commit)
    b1 = spark.createDataFrame([("a",), ("c",), ("d",)], "key string")
    try:
        step(b1, 1)  # crashes: output written, pointer NOT moved
    except OSError:
        pass
    assert S._read_state(fdir, 1 << 14)[0] == 0  # still at batch 0
    step(b1, 1)  # replay: same batch id, same data, old filter
    emitted = sorted(r["key"] for r in spark.read.parquet(out).collect())
    assert emitted == ["a", "b", "c", "d"]  # 'a' deduped, nothing doubled
    assert S._read_state(fdir, 1 << 14)[0] == 1
