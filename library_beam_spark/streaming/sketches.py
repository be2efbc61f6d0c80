"""Streaming sketch maintenance: count-min and Bloom state over an
unbounded stream, with state bounded by SKETCH CONFIGURATION instead of
data cardinality.

The point: a streaming ``groupBy(token).count()`` holds one state row
per distinct key — unbounded on an open vocabulary, and the reason
vanilla streaming heavy-hitters needs watermark-evicted approximations.
A mergeable sketch inverts that: because CMS counters and Bloom words
combine by plain SUM / BIT_OR (associative + commutative), the batch
builders ARE valid incremental streaming aggregations — Spark keeps
exactly the sketch in the state store:

- :func:`streaming_cms` — ≤ depth·width rows of (row, bucket, n),
- :func:`streaming_bloom` — ≤ m_bits/64 rows of (word_idx, word),

forever: no watermark, no eviction, no growth. They are the batch
cms_build / bloom_build applied to a streaming DataFrame — one
implementation, two execution modes; that identity is the design
claim, and the parity tests pin it.

:func:`bloom_dedup_batches` composes the Bloom sketch with
foreachBatch into bounded-state STREAM DEDUP: drop every row whose key
is probably-already-seen, write survivors, then OR the survivors' bits
into the persisted filter. One-sided error by construction — a true
duplicate is NEVER emitted twice, while a false positive silently
drops a fresh row at the configured FPR. That trade (bounded memory
forever, ~1% loss) is the standard firehose-dedup contract; when
exactness is required, follow with the batch exact dedup over the
(much smaller) survivor set.

Crash/replay contract (foreachBatch is at-least-once, so this matters):

- the COMMIT POINT is an atomic ``os.replace`` of the one-line pointer
  file ``CURRENT`` recording the last committed batch id;
- a replay of an already-committed batch id is SKIPPED outright;
- a replay of an uncommitted batch recomputes against the same
  pre-batch filter (the pointer still names it) over the same source
  offsets (Structured Streaming's replayable-source guarantee), so it
  produces the identical survivor set and OVERWRITES the same
  ``batch=N`` output partition — idempotent, no duplicate emission;
- filter snapshots are immutable versioned files (``filter_v{N}``,
  written whole, fsync'd, then atomically renamed — with a directory
  fsync after, so the commit survives power loss, not just process
  crash); old versions are deleted only
  AFTER the pointer moves, so a crash anywhere leaves either the old
  or the new committed state, never a partial one. The filter is m/64
  longs — driver-file I/O, no Spark job on the hot path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.bloom import bloom_build, bloom_collect, might_contain
from ..operators.cms import cms_build

__all__ = ["streaming_cms", "streaming_bloom", "bloom_dedup_batches"]


def streaming_cms(stream: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """Incremental count-min sketch of ``stream[col]`` occurrences:
    (row, bucket, n), state ≤ depth·width rows. Update-mode sinks get
    the touched cells per micro-batch. Identical plan to the batch
    cms_build — mergeability is what makes it a legal streaming agg."""
    return cms_build(stream, col, depth, width)


def streaming_bloom(stream: DataFrame, col: str, m_bits: int, k: int) -> DataFrame:
    """Incremental Bloom filter of the keys seen on the stream:
    (word_idx, word), state ≤ m_bits/64 rows. Identical plan (and
    m_bits validation) to the batch bloom_build."""
    return bloom_build(stream, col, m_bits, k)


def _pointer_path(filter_dir: str) -> str:
    return os.path.join(filter_dir, "CURRENT")


def _read_state(filter_dir: str, m_bits: int) -> tuple[int, list[int]]:
    """(last committed batch id, dense filter words); (-1, zeros) when
    nothing has been committed yet."""
    ptr = _pointer_path(filter_dir)
    if not os.path.exists(ptr):
        return -1, [0] * (m_bits // 64)
    with open(ptr) as f:
        meta = json.load(f)
    with open(os.path.join(filter_dir, f"filter_v{meta['batch_id']}")) as f:
        words = json.load(f)
    return int(meta["batch_id"]), words


def _commit_state(filter_dir: str, batch_id: int, words: list[int]) -> None:
    from .dedup import _fsync_dir

    snap = os.path.join(filter_dir, f"filter_v{batch_id}")
    tmp = snap + ".tmp"
    with open(tmp, "w") as f:
        json.dump(words, f)
        f.flush()
        os.fsync(f.fileno())  # snapshot bytes durable before its rename
    os.replace(tmp, snap)  # snapshot complete before the pointer moves
    ptr_tmp = _pointer_path(filter_dir) + ".tmp"
    with open(ptr_tmp, "w") as f:
        json.dump({"batch_id": batch_id}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(ptr_tmp, _pointer_path(filter_dir))  # THE commit point
    _fsync_dir(filter_dir)  # both renames durable across power loss
    for name in os.listdir(filter_dir):  # best-effort GC of old snapshots
        if name.startswith("filter_v") and name != f"filter_v{batch_id}":
            try:
                os.remove(os.path.join(filter_dir, name))
            except OSError:
                pass


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
    exact/approximate and crash/replay contracts). Within a batch, the
    MINIMUM row under the total ordering of all columns wins per key —
    deterministic, so a replay of an uncommitted batch rewrites
    byte-identical survivor rows, not merely the same key set (a
    ``dropDuplicates`` would keep an arbitrary representative and
    weaken replay idempotence to the key set only). Across batches the
    filter breaks ties.
    Survivors land in ``out_dir/batch=N`` partitions (overwritten on
    replay — idempotent). Returns the function for ``foreachBatch``."""
    from ..operators.bloom import bloom_attach

    os.makedirs(filter_dir, exist_ok=True)

    def step(batch: DataFrame, batch_id: int) -> None:
        from .dedup import _batch_session

        _batch_session(batch)  # restore AQE for the fold's batch plans
        committed, words = _read_state(filter_dir, m_bits)
        if batch_id <= committed:
            return  # at-least-once replay of a committed batch: no-op
        # deterministic within-batch winner: min over the total ordering
        # of the full row (same pattern as operators/dedup.exact_dedup)
        one_per_key = (
            batch.groupBy(key_col)
            .agg(F.min_by(F.struct(*batch.columns), F.struct(*batch.columns)).alias("_w"))
            .select("_w.*")
        )
        fresh = (
            bloom_attach(one_per_key, words)
            .where(~might_contain(F.col(key_col), F.col("_bloom"), m_bits, k))
            .drop("_bloom")
        )
        fresh.persist()
        try:
            fresh.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
            fresh_words = bloom_collect(
                bloom_build(fresh, key_col, m_bits, k), m_bits
            )
            merged = [a | b for a, b in zip(words, fresh_words)]
            _commit_state(filter_dir, batch_id, merged)
        finally:
            fresh.unpersist()

    return step
