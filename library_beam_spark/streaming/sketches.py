"""Streaming sketch maintenance: count-min and Bloom state over an
unbounded stream, with state bounded by SKETCH CONFIGURATION instead of
data cardinality.

The point: a streaming ``groupBy(token).count()`` holds one state row
per distinct key — unbounded on an open vocabulary, and the reason
vanilla streaming heavy-hitters needs watermark-evicted approximations.
A mergeable sketch inverts that: because CMS counters and Bloom words
combine by plain SUM / BIT_OR (associative + commutative — the same
property operators/cms.py and operators/bloom.py prove for batch
merges), the sketch build IS a streaming aggregation Spark can run
incrementally, and the state store holds exactly the sketch:

- :func:`streaming_cms` — ≤ depth·width rows of (row, bucket, n),
- :func:`streaming_bloom` — ≤ m_bits/64 rows of (word_idx, word),

forever, no watermark, no eviction, no growth. Downstream each
micro-batch's updated cells flow to the sink; the full sketch can be
densified any time and probed with the batch-side cms_estimate /
might_contain.

:func:`bloom_dedup_batches` composes the Bloom sketch with
foreachBatch into bounded-state STREAM DEDUP: drop every row whose key
is probably-already-seen, append survivors, then OR the survivors' bits
into the persisted filter. One-sided error by construction — a true
duplicate is NEVER emitted twice (bits are set before the next batch
reads the filter), while a false positive silently drops a fresh row at
the configured FPR. That trade (bounded memory forever, ~1% loss) is
the standard firehose-dedup contract; when exactness is required,
follow with the batch exact dedup over the (much smaller) survivor set.
Filter persistence uses write-new + POSIX-rename like
updates.foreach_batch_merge; the manifest-table variant
(streaming/manifest.py) is the object-store-safe upgrade path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bit_positions, might_contain
from ..operators.cms import _bucket

__all__ = ["streaming_cms", "streaming_bloom", "bloom_dedup_batches"]


def streaming_cms(stream: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """Incremental count-min sketch of ``stream[col]`` occurrences:
    (row, bucket, n), state ≤ depth·width rows. Update-mode sink gets
    the touched cells per micro-batch."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    _bucket(F.col(col), j, width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
    ).alias("_p")
    return (
        stream.select(pairs)
        .groupBy(F.col("_p.row").alias("row"), F.col("_p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def streaming_bloom(stream: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """Incremental Bloom filter of the keys seen on the stream:
    (word_idx, word), state ≤ m_bits/64 rows."""
    pos = F.explode(F.array(*bit_positions(F.col(col), m_bits, k))).alias("_pos")
    word_idx = F.call_function("shiftright", F.col("_pos"), F.lit(6)).cast("int")
    mask = F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        F.pmod(F.col("_pos"), F.lit(64)).cast("int"),
    )
    return (
        stream.select(pos)
        .select(word_idx.alias("word_idx"), mask.alias("_mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def _read_filter(spark: SparkSession, filter_dir: str, m_bits: int) -> list[int]:
    words = [0] * (m_bits // 64)
    cur = os.path.join(filter_dir, "current")
    if os.path.exists(cur):
        for r in spark.read.parquet(cur).collect():
            words[r["word_idx"]] = r["word"]
    return words


def _write_filter(spark: SparkSession, filter_dir: str, words: list[int]) -> None:
    rows = [(i, w) for i, w in enumerate(words) if w]
    tmp = os.path.join(filter_dir, "_next")
    cur = os.path.join(filter_dir, "current")
    spark.createDataFrame(rows or [(0, 0)], "word_idx int, word bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    # POSIX swap: rename is atomic per directory entry; readers see the
    # old or the new filter, never a partial one (object stores: use the
    # manifest table instead — streaming/manifest.py).
    old = os.path.join(filter_dir, "_old")
    if os.path.exists(cur):
        os.rename(cur, old)
    os.rename(tmp, cur)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)


def bloom_dedup_batches(
    stream: DataFrame,
    key_col: str,
    out_dir: str,
    filter_dir: str,
    m_bits: int = 1 << 20,
    k: int = 5,
):
    """``writeStream.foreachBatch`` body factory: bounded-state stream
    dedup through a persisted Bloom filter (module docstring for the
    exact/approximate contract). Within a batch, exact dropDuplicates
    breaks ties; across batches the filter does. Returns the function to
    pass to ``foreachBatch``."""
    from ..operators.bloom import bloom_build, bloom_collect, bloom_merge

    os.makedirs(filter_dir, exist_ok=True)

    def step(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        words = _read_filter(spark, filter_dir, m_bits)
        from ..operators.bloom import bloom_attach

        fresh = (
            bloom_attach(batch.dropDuplicates([key_col]), words)
            .where(~might_contain(F.col(key_col), F.col("_bloom"), m_bits, k))
            .drop("_bloom")
        )
        fresh.persist()
        try:
            fresh.write.mode("append").parquet(out_dir)
            new_bits = bloom_build(fresh, key_col, m_bits, k)
            prev = spark.createDataFrame(
                [(i, w) for i, w in enumerate(words) if w] or [(0, 0)],
                "word_idx int, word bigint",
            )
            merged = bloom_collect(bloom_merge(prev, new_bits), m_bits)
            _write_filter(spark, filter_dir, merged)
        finally:
            fresh.unpersist()

    return step
