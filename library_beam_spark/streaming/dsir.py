"""Streaming DSIR: score each arriving micro-batch against
PRE-COMPUTED bucket log-ratios and fold it into a BOUNDED top-k
selection state via Gumbel keys — the streaming twin of the batch
`dsir_selected_docs` pipeline (operators/dsir.py; Xie et al.,
NeurIPS 2023).

Training stays offline, exactly like streaming/curation.py's
hard-sigmoid model: estimating p̂_target/p̂_raw needs the whole corpus,
so the stream consumes the finished (bucket → log-ratio) table — 64 to
10⁵ rows, broadcast to every batch — and never re-derives it. The
ratios are pinned in the commit pointer next to buckets/salt/k: a
restart with different ratios (or a different feature hash) would
silently re-weight half a stream, so step() fails loudly on mismatch
(the index-config discipline of streaming/dedup.py).

State is the CURRENT TOP-K ONLY — (doc_id, logw, sel_key,
admitted_batch), ≤ k rows in one partition `batch=N`. Gumbel top-k is
associative (top-k(state ∪ batch) = top-k of everything seen), so the
fold loses nothing, each commit supersedes the previous partition
(pointer ``base`` advances with every commit; superseded partitions
GC'd best-effort), and per batch the stream reads exactly ONE ≤ k-row
state partition plus the batch itself — state never grows with the
stream, the strongest bound any stateful query here carries.
``admitted_batch`` records when a survivor first entered the state,
making the incremental fold itself value-verifiable (a doc admitted at
batch 0 and evicted later is absent; a batch-1 entry is tagged 1).

Crash/replay contract: identical to streaming/dedup.py — shared atomic
CURRENT-pointer commit, committed replays are no-ops, an uncommitted
replay rebuilds `batch=N` from the still-committed `batch=N-1` state.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.portable import dsum, pround
from ..operators.dsir import doc_grams
from ..operators.sampling import HASH_SPACE, hash_value
from .dedup import _batch_session, _check_config, _commit, _read_meta


def _r6(x: float) -> float:
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def dsir_stream_batches(
    index_dir: str,
    ratios: dict[int, float],
    k: int = 100,
    buckets: int = 64,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 6,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    ``ratios`` is the offline-trained bucket → log-ratio table
    (operators/dsir.dsir_log_ratios, collected — bounded by
    ``buckets``). After batch N commits, ``index_dir/batch=N`` holds
    the ≤ k selected documents so far."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "k": int(k),
        "buckets": int(buckets),
        "salt": salt,
        "digits": int(digits),
        "ratios": [[int(b), _r6(float(r))] for b, r in sorted(ratios.items())],
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "dsir_stream_batches",
            "selection keys depend on buckets/salt/ratios/k; resuming "
            "with a different model would silently re-weight the "
            "stream; restart with the same ratios or a fresh index_dir",
        )
        if batch_id <= committed:
            return  # at-least-once replay of a committed batch: no-op
        spark = _batch_session(batch)
        # JVM-only VALUES relation (guide §4): a python-list
        # createDataFrame builds a default-parallelism-sliced pickled
        # RDD PER BATCH whose first use spawns the cloned session's
        # Python worker pool — for a bounded model table with zero
        # Python work. repr() round-trips doubles exactly, so the
        # parsed literal is bit-identical to the py4j-shipped value.
        vals = ", ".join(
            f"({int(b)}, CAST({float(r)!r} AS DOUBLE))"
            for b, r in sorted(ratios.items())
        )
        rdf = spark.sql(
            f"SELECT col1 AS bucket, col2 AS ratio FROM (VALUES {vals})"
        )
        # per-doc weights: one gram pass over the BATCH, count-grain
        # join against the broadcast ratio table, exact dsum — the
        # identical arithmetic of operators/dsir.dsir_weights, minus
        # the distribution estimation (pre-computed)
        counts = (
            doc_grams(batch, id_col, text_col)
            .select(
                id_col,
                F.pmod(
                    hash_value(F.col("gram"), salt), F.lit(buckets)
                ).alias("bucket"),
            )
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = (
            counts.join(F.broadcast(rdf), "bucket")
            .groupBy(id_col)
            .agg(dsum(F.col("c") * F.col("ratio"), digits).alias("logw"))
        )
        # Gumbel key from the open-interval hash uniform — the exact
        # expression of operators/dsir.dsir_select
        u = (
            hash_value(F.col(id_col), salt + ":gumbel") + F.lit(0.5)
        ) / F.lit(float(HASH_SPACE))
        g = pround(-F.log(-F.log(u)), digits)
        scored = w.select(
            id_col,
            "logw",
            pround(F.col("logw") + g, digits).alias("sel_key"),
            F.lit(batch_id).cast("int").alias("admitted_batch"),
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and os.path.isdir(prev_dir):
            scored = spark.read.parquet(prev_dir).unionByName(scored)
        # At-least-once sources may redeliver a document in a later
        # committed batch; without dedup the identical (doc_id, sel_key)
        # row would occupy two top-k slots and shrink the effective
        # selection. Collapse to one row per doc, keeping the EARLIEST
        # admission (min_by on admitted_batch — ≤ 2 rows per doc here:
        # prior state is already unique, so this is a cheap partial agg
        # over ≤ k + |batch| rows, not a widening shuffle).
        scored = scored.groupBy(id_col).agg(
            F.min_by("logw", "admitted_batch").alias("logw"),
            F.min_by("sel_key", "admitted_batch").alias("sel_key"),
            F.min("admitted_batch").alias("admitted_batch"),
        )
        # global top-k plans as TakeOrderedAndProject over ≤ k + |batch|
        # candidate rows; ties break on id, both engines' rule
        state = scored.orderBy(F.desc("sel_key"), F.asc(id_col)).limit(k)
        state.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )
        # every commit supersedes all earlier state: base == batch_id
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):  # best-effort GC of superseded state
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step
