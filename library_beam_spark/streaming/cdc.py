"""Streaming CDC chunk-store admission — crawl-versioning dedup as a
fold: each arriving document is content-defined-chunked
(operators/cdc.py) and admitted only if the fraction of its tokens
covered by chunks ALREADY IN the committed chunk store stays at or
below a threshold; admitted documents' chunks then join the store.
This is the chunk-grain complement to the LSH admission fold
(streaming/dedup.py): LSH asks "have I seen a NEAR-DUPLICATE of this
whole document", CDC asks "how much of this document's CONTENT have I
already stored" — the question a crawl re-visiting evolving pages
needs (a 95 %-unchanged page re-crawl is rejected even though its
minhash may have drifted past the band threshold).

Arrival contract — stated plainly (the stream_near_dedup_admitted
discipline): admission depends on what was admitted BEFORE, so the
fold is batch-order-DEPENDENT by nature; the contract is the file
stream's deterministic batch order, and intra-batch documents are
judged against the committed store only (two same-batch near-copies
are both admitted — the batch is the atomicity grain). Redelivered
batches are dropped by the batch-id commit check.

State grain: the distinct chunk hashes of admitted documents — chunk-
store-sized, the same thing any CDC storage system keeps; tiny
slivers below ``min_tokens`` never enter the store (they are also
exempt from the coverage numerator, keeping numerator ⊆ denominator).

State layout per commit: batch=N/store (chunk_md5) and batch=N/admitted
(doc_id, batch, n_tokens, dup_tokens — cumulative). Crash/replay:
shared atomic CURRENT-pointer commit; fail-loud when the committed
state partition is missing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cdc import cdc_chunks
from .dedup import _check_config, _commit, _read_meta


def cdc_stream_batches(
    index_dir: str,
    max_dup_ppm: int = 500_000,
    k: int = 3,
    mask_bits: int = 5,
    min_tokens: int = 4,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: (doc_id, text). Documents with ZERO eligible chunks
    (token-less, or every chunk below ``min_tokens``) carry no
    dedupable content: they produce no accounting row and add nothing
    to the store — the admission decision is about content coverage,
    and they have none to judge."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "max_dup_ppm": max_dup_ppm,
        "k": k,
        "mask_bits": mask_bits,
        "min_tokens": min_tokens,
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "cdc_stream_batches",
            "chunking or admission parameters would silently change "
            "mid-stream; restart with the same config or a fresh "
            "index_dir",
        )
        if batch_id <= committed:
            return
        spark = batch.sparkSession
        from ..util import pin

        # the eligible-chunk table feeds three consumers (coverage
        # join, per-doc totals, store growth) — pin it so the chunker
        # runs once per batch
        ch = pin(
            cdc_chunks(batch, k=k, mask_bits=mask_bits).filter(
                F.col("n_tokens") >= min_tokens
            )
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and not os.path.isdir(prev_dir):
            raise RuntimeError(
                f"committed pointer batch={committed} has no state "
                f"directory under {index_dir} — state store corrupted; "
                "refusing to fold from a partial prefix"
            )
        if committed >= 0:
            store = spark.read.parquet(os.path.join(prev_dir, "store"))
            admitted_prev = spark.read.parquet(
                os.path.join(prev_dir, "admitted")
            )
        else:
            store = spark.createDataFrame([], "chunk_md5 string")
            admitted_prev = spark.createDataFrame(
                [], "doc_id bigint, batch bigint, n_tokens bigint, "
                    "dup_tokens bigint"
            )
        hit = ch.join(store, "chunk_md5", "semi").groupBy("doc_id").agg(
            F.sum("n_tokens").alias("dup_tokens")
        )
        per_doc = (
            ch.groupBy("doc_id")
            .agg(F.sum("n_tokens").alias("n_tokens"))
            .join(hit, "doc_id", "left")
            .fillna({"dup_tokens": 0})
        )
        admitted_now = per_doc.filter(
            F.col("dup_tokens") * F.lit(1_000_000)
            <= F.lit(int(max_dup_ppm)) * F.col("n_tokens")
        ).select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.lit(batch_id).cast("bigint").alias("batch"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("dup_tokens").cast("bigint").alias("dup_tokens"),
        )
        new_store = store.unionByName(
            ch.join(admitted_now.select("doc_id"), "doc_id", "semi")
            .select("chunk_md5")
        ).distinct()
        admitted_all = admitted_prev.unionByName(admitted_now)
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            new_store.write.mode("overwrite").parquet(
                os.path.join(out, "store")
            )
            admitted_all.write.mode("overwrite").parquet(
                os.path.join(out, "admitted")
            )
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def cdc_admitted(spark, index_dir: str) -> DataFrame:
    """Cumulative admitted documents with their coverage accounting."""
    committed, _ = _read_meta(index_dir)
    if committed < 0:
        raise ValueError(f"no committed state in {index_dir}")
    return spark.read.parquet(
        os.path.join(index_dir, f"batch={committed}", "admitted")
    )
