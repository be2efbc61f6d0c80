"""Streaming type-2 SCD maintenance — the incremental twin of
``operators/scd.scd2_history`` (which generalizes the reference's
type-1 GetLatestVersion, main.py:576-587, to history-preserving
intervals).

Per micro-batch the fold is: re-enter each key's OPEN interval as a
pseudo-event at its ORIGINAL sort position (valid_from + the opening
event's order tail, carried in state exactly for this), union the
batch's rows, and run the batch SCD2 collapse over that per-key slice.
Intervals that gained a successor CLOSE (appended to the history
partition ``hist=N`` with a ``closed_in_batch`` tag — the
admitted_batch discipline of streaming/dsir.py: the incremental
behavior itself is value-verifiable, not just the final table);
each key's last interval becomes the new open state.

Ordering contract: the feed must be per-key ordered across batches
(CDC commit order — the contract every SCD2 consumer already assumes).
A row sorting BEFORE a key's open interval would belong to already-
emitted history; the fold cannot retract parquet partitions, so such
rows are folded at their sorted position within state∪batch only —
cross-batch retraction is explicitly out of contract and the staged
feeds in the registry query split by per-key rank prefix so it never
occurs.

State bound: one row per dimension key (open interval) — the
latest-version upsert profile, hash-partitioned; history partitions are
append-only and never re-read by the fold. Per batch the stream reads
ONE state partition plus the batch itself.

Crash/replay: the shared atomic CURRENT-pointer commit of
streaming/dedup.py — committed replays are no-ops, an uncommitted
replay rebuilds from the still-committed previous state; config
(key/order/attr columns) is pinned in the pointer and mismatches fail
loudly.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import scd2_history
from .dedup import _batch_session, _check_config, _commit, _read_meta


def scd2_stream_batches(
    index_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    After batch N commits, ``index_dir/state=N`` holds one open
    interval per key seen so far and ``hist=0..N`` the closed
    intervals."""
    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "key": list(key_cols),
        "order": list(order_cols),
        "attr": list(attr_cols),
    }
    tail = list(order_cols[1:])

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "scd2_stream_batches",
            "interval boundaries depend on the key/order/attr columns; "
            "resuming with different ones would corrupt open-interval "
            "state; restart with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return  # at-least-once replay of a committed batch: no-op
        spark = _batch_session(batch)
        rows = batch.select(*key_cols, *order_cols, *attr_cols)
        prev_state = os.path.join(index_dir, f"state={committed}")
        if committed >= 0 and os.path.isdir(prev_state):
            st = spark.read.parquet(prev_state)
            pseudo = st.select(
                *key_cols,
                F.col("valid_from").alias(order_cols[0]),
                *tail,
                *attr_cols,
            )
            rows = pseudo.unionByName(rows)
        hist = scd2_history(
            rows, key_cols, order_cols, attr_cols, keep_order_tail=True
        )
        closed = (
            hist.filter(~F.col("is_current"))
            .select(
                *key_cols,
                *attr_cols,
                "valid_from",
                "valid_to",
                F.lit(batch_id).cast("int").alias("closed_in_batch"),
            )
        )
        open_ = hist.filter(F.col("is_current")).select(
            *key_cols, *attr_cols, "valid_from", *tail
        )
        closed.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"hist={batch_id}")
        )
        open_.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"state={batch_id}")
        )
        # history partitions are append-only (base stays 0); only the
        # superseded open-state partitions GC
        _commit(index_dir, batch_id, 0, cfg)
        for j in range(base if committed >= 0 else 0, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"state={j}"), ignore_errors=True
            )

    return step


def scd2_stream_result(
    spark: SparkSession,
    index_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    order_tail: list[str],
) -> DataFrame:
    """The full type-2 table after the stream drains: every closed
    interval from the hist partitions plus the committed open state
    (null valid_to, is_current true)."""
    committed, _ = _read_meta(index_dir)
    hists = [
        os.path.join(index_dir, f"hist={j}") for j in range(committed + 1)
    ]
    hists = [p for p in hists if os.path.isdir(p)]
    closed = spark.read.parquet(*hists).withColumn(
        "is_current", F.lit(False)
    )
    open_ = (
        spark.read.parquet(os.path.join(index_dir, f"state={committed}"))
        .drop(*order_tail)
        .withColumn("valid_to", F.lit(None).cast(closed.schema["valid_to"].dataType))
        .withColumn("closed_in_batch", F.lit(None).cast("int"))
        .withColumn("is_current", F.lit(True))
    )
    return closed.unionByName(open_)
