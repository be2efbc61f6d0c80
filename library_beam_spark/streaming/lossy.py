"""Streaming lossy-counting heavy hitters (Manku & Motwani, VLDB
2002) — the BOUNDED-STATE complement to streaming/itemsets.py's raw
counts for OPEN vocabularies.

Bucket grain — stated plainly: buckets are the NON-EMPTY micro-batches
(an idle trigger's zero-row batch is skipped outright — folding it
would raise the prune threshold without data support and evict state
for free; deterministic and order-free within a batch, which is what
keeps the fold redelivery-idempotent and exactly SQL-replayable; the
classic row-count buckets of width 1/ε would need a stable intra-batch
arrival order no stream contract provides). The guarantees then read
with ε_effective = b / N for b committed batches over N total rows:

- per surviving item: ``f ≤ true_count ≤ f + delta`` where ``delta``
  is the bucket count at insertion minus one (the classic invariant);
- an ABSENT item's true count is ≤ b (it was pruned while
  ``f + delta ≤ b``);
- result-time rule ``f + delta ≥ s·N`` therefore has NO false
  negatives for any support s with s·N > b, and every reported count
  undercounts by at most b.

State bound — the open-vocabulary point: at each commit the state
holds only items whose ``f + delta`` exceeds the bucket count, so a
term appearing ONCE in its batch is pruned at that batch's own
boundary (f = 1, delta = b−1 ⇒ f + delta = b, dropped). Heavy drift —
every batch minting a fresh long-tail vocabulary — leaves state
proportional to the per-batch vocabulary plus the persistent heavies,
NOT the cumulative vocabulary the exact fold (itemsets-style raw
counts) would retain forever; tests/test_streaming_lossy.py pins this
with a planted-drift stream whose cumulative vocabulary is ~10× the
committed state.

State layout per commit: batch=N/state (item, f, delta) and a 1-row
batch=N/tally (n_rows, n_batches). Crash/replay contract: shared
atomic CURRENT-pointer commit (streaming/dedup helpers); each state
partition supersedes all earlier ones; redelivered batches are dropped
by the batch-id commit check; a committed pointer whose state
partition is missing fails loudly (external corruption, never a
silent rebuild).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _batch_session, _check_config, _commit, _read_meta


def lossy_merge(
    state: DataFrame | None,
    counts: DataFrame,
    bucket: int,
) -> DataFrame:
    """One lossy-counting bucket fold: merge the bucket's (item, c)
    counts into (item, f, delta) state — existing items add to f, new
    items enter with delta = bucket − 1 — then prune every item with
    ``f + delta ≤ bucket``. Pure relational algebra (one full-outer
    join + one filter on vocabulary-grain rows), exactly replayable in
    SQL, which is how the registry oracle unrolls it."""
    fresh = counts.select(
        "item",
        F.col("c").cast("bigint").alias("_c"),
    )
    if state is None:
        merged = fresh.select(
            "item",
            F.col("_c").alias("f"),
            F.lit(bucket - 1).cast("bigint").alias("delta"),
        )
    else:
        merged = (
            state.join(fresh, "item", "full_outer")
            .select(
                "item",
                (
                    F.coalesce(F.col("f"), F.lit(0))
                    + F.coalesce(F.col("_c"), F.lit(0))
                ).cast("bigint").alias("f"),
                F.coalesce(
                    F.col("delta"), F.lit(bucket - 1).cast("bigint")
                ).alias("delta"),
            )
        )
    return merged.filter(F.col("f") + F.col("delta") > F.lit(bucket))


def lossy_stream_batches(index_dir: str, item_col: str = "item"):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: one row per item OCCURRENCE (the fold counts rows
    per item). Bucket id = committed batch count + 1."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"item_col": item_col}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "lossy_stream_batches",
            "item column would silently change mid-stream; restart "
            "with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = _batch_session(batch)
        counts = batch.groupBy(
            F.col(item_col).alias("item")
        ).agg(F.count(F.lit(1)).alias("c"))
        n_new = batch.count()
        if n_new == 0:
            # an empty micro-batch (idle trigger) carries no data
            # support: folding it would still increment the bucket
            # count, raising the prune threshold f + delta ≤ b and
            # evicting state for free — skip the fold entirely (no
            # bucket, no tally move, no commit; a redelivery of the
            # same empty batch is again a no-op)
            return
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and not os.path.isdir(prev_dir):
            raise RuntimeError(
                f"committed pointer batch={committed} has no state "
                f"directory under {index_dir} — state store corrupted; "
                "refusing to fold from a partial prefix"
            )
        if committed >= 0:
            state = spark.read.parquet(os.path.join(prev_dir, "state"))
            t = spark.read.parquet(
                os.path.join(prev_dir, "tally")
            ).collect()[0]
            n_rows, n_buckets = t["n_rows"] + n_new, t["n_batches"] + 1
        else:
            state, n_rows, n_buckets = None, n_new, 1
        new_state = lossy_merge(state, counts, n_buckets)
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            new_state.write.mode("overwrite").parquet(
                os.path.join(out, "state")
            )
            # JVM-only 1-row relation (guide §4): a python-list
            # createDataFrame spawns the cloned session's Python worker
            # pool for zero Python work
            spark.range(1).select(
                F.lit(int(n_rows)).cast("bigint").alias("n_rows"),
                F.lit(int(n_buckets)).cast("bigint").alias("n_batches"),
            ).write.mode("overwrite").parquet(os.path.join(out, "tally"))
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def lossy_result(
    spark, index_dir: str, threshold_ppm: int = 10_000
) -> DataFrame:
    """Result-time heavy-hitter view over the committed state:
    items whose guaranteed-count ceiling ``f + delta`` reaches
    threshold_ppm · n_rows / 10⁶ — no false negatives for supports
    above b/N (module docstring), every f an undercount by ≤ b.
    Integer-exact on both engines: the comparison is
    (f + delta)·10⁶ ≥ threshold_ppm·n_rows, never a float share."""
    committed, _ = _read_meta(index_dir)
    if committed < 0:
        raise ValueError(f"no committed state in {index_dir}")
    d = os.path.join(index_dir, f"batch={committed}")
    n = spark.read.parquet(os.path.join(d, "tally")).collect()[0]["n_rows"]
    return (
        spark.read.parquet(os.path.join(d, "state"))
        .filter(
            (F.col("f") + F.col("delta"))
            * F.lit(1_000_000).cast("bigint")
            >= F.lit(int(threshold_ppm)).cast("bigint")
            * F.lit(int(n)).cast("bigint")
        )
        .select(
            "item",
            F.col("f").cast("bigint").alias("f"),
            F.col("delta").cast("bigint").alias("delta"),
        )
    )
