"""Streaming curation: score each micro-batch with a PRE-TRAINED
hard-sigmoid quality model, threshold-filter, and exact-dedup against
everything admitted before — the streaming twin of the batch
`curation_pipeline_docs` composition (training itself stays offline:
full-batch gradient descent needs the whole corpus per iteration, so a
stream consumes the trained weights).

State is the FINGERPRINT INDEX of admitted documents — one
(fingerprint, doc_id) row per admitted doc (md5 of normalized text,
16 bytes + id), text never stored. Within a batch the winner per
fingerprint is the lowest id (operators/dedup.exact_dedup's rule);
across batches a fingerprint already admitted drops the newcomer —
first-arrival-wins, the streaming-native policy (a batch pass over the
final corpus can re-canonicalize globally if lowest-id-overall is
required).

Crash/replay contract: identical to streaming/dedup.py — shared
atomic CURRENT-pointer commit, committed replays are no-ops,
uncommitted replays rewrite the same partitions against the same
pre-batch state. The pointer records {threshold, weights, bias}: a
restart with a different model would silently change the admission
semantics of a half-written stream, so step() fails loudly on
mismatch (same discipline as the LSH index's mode pin).

At scale: per batch one fingerprint shuffle of the (small) batch side;
history is probed by an equi-join on the 16-byte fingerprint and never
re-scored or re-read as text.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classifier import hard_sigmoid_quality
from ..operators.dedup import normalized_text
from .dedup import _batch_session, _check_config, _commit, _read_meta


def _r6(x: float) -> float:
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def curation_batches(
    out_dir: str,
    index_dir: str,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Admitted documents land in ``out_dir/batch=N`` with their
    ``quality`` column; their fingerprints in ``index_dir/batch=N``.
    ``compact_every=k`` folds the committed fingerprint window into the
    new batch's partition every k batches (pointer ``base`` advances
    with the commit, folded partitions GC'd best-effort) — the same
    small-files bound the LSH stream carries, so a long-running
    curation stream reads O(k) partitions per batch."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "threshold": _r6(float(threshold)),
        "weights": [_r6(float(w)) for w in weights],
        "bias": _r6(float(bias)),
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "curation_batches",
            "admission semantics would silently change; restart with "
            "the same model or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        kept = hard_sigmoid_quality(
            batch, weights, bias, text_col
        ).where(F.col("quality") >= F.lit(threshold))
        fp = kept.withColumn(
            "fingerprint", F.md5(normalized_text(F.col(text_col)))
        )
        # within-batch winner per fingerprint: lowest id
        win = fp.groupBy("fingerprint").agg(
            F.min_by(F.struct(fp.columns), F.col(id_col)).alias("_w")
        ).select("_w.*")
        hist_dirs = [
            os.path.join(index_dir, f"batch={k}")
            for k in range(base, committed + 1)
            if os.path.isdir(os.path.join(index_dir, f"batch={k}"))
        ]
        hist = spark.read.parquet(*hist_dirs) if hist_dirs else None
        if hist is not None:
            win = win.join(hist.select("fingerprint"), "fingerprint", "anti")
        win = win.persist()
        try:
            win.drop("fingerprint").write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch={batch_id}")
            )
            fresh = win.select("fingerprint", F.col(id_col))
            compact = (
                compact_every is not None
                and batch_id > 0
                and batch_id % compact_every == 0
                and hist is not None
            )
            if compact:
                fresh = hist.select("fingerprint", F.col(id_col)).unionByName(
                    fresh
                )
            fresh.write.mode("overwrite").parquet(
                os.path.join(index_dir, f"batch={batch_id}")
            )
            _commit(index_dir, batch_id, batch_id if compact else base, cfg)
            if compact:  # best-effort GC of folded-away partitions
                for k in range(base, batch_id):
                    shutil.rmtree(
                        os.path.join(index_dir, f"batch={k}"),
                        ignore_errors=True,
                    )
        finally:
            win.unpersist()

    return step
