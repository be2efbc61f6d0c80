"""Streaming bounded-state reservoir sample: per-stratum bottom-k
PRIORITY sampling over an unbounded stream, with the priority a fixed
integer hash so the whole fold is deterministic and oracle-replayable.

Why bottom-k-by-hash IS a reservoir sample: assigning every record a
uniform priority and keeping the k smallest yields a uniform random
k-subset of the distinct records seen so far (Vitter's reservoir
invariant, TOMS 1985; the priority formulation is the mergeable form —
Efraimidis & Spiliotopoulos, IPL 2006, with unit weights). Using the
repo's portable integer mixer (operators/kmv.kmv_hash_col) as the
priority makes the "random" order a pure function of the record id, so

  - the merge (union → dedup by id → keep the k smallest per stratum)
    is associative, commutative, AND idempotent: any batch split,
    interleaving, or redelivery folds to the state the one-shot build
    produces — no arrival contract, set semantics absorb replays
    (the streaming/kmv.py discipline, payload rows carried along);
  - a DuckDB oracle replays hash → per-stratum bottom-k verbatim, so
    the driver verifies the sample MEMBERSHIP at hash level, not a
    tolerance (ties inside the window are broken by the unique id).

State is bounded at k rows PER STRATUM forever — this is the bounded-
state family (lossy, kmv, quantile, skyline front): rewriting the
committed state each batch is O(k·strata), not O(stream), so the
append-only-delta discipline the cumulative folds need does not apply.

Scale shape: the per-batch fold is one local bottom-k per stratum
(Spark 4 pushes the row_number ≤ k filter into a partial
WindowGroupLimit, so each task keeps k rows before the exchange — the
operators/kmv.py plan shape) merged against ≤ k·strata committed rows.
At 100 TB the only shuffle is rank-k-bounded on the stratum key; a
hot stratum ships k rows per task, never its data.

Reference parity: the reference pipeline samples documents for QA
eyeballing via its debug sinks (main.py --sample flags); this is that
capability as a first-class bounded operator with an exact oracle.

Crash/replay contract: shared atomic CURRENT-pointer commit
(streaming/dedup helpers) — committed replays are no-ops; k, the
strata, the id, and the payload columns are pinned in the pointer (a
drifted k or id column would silently change every membership).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.kmv import kmv_hash_col
from .dedup import _batch_session, _check_config, _commit, _read_meta


def reservoir_merge(
    states: list[DataFrame],
    strata_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """union → dedup by (strata, id) → keep the k smallest priorities
    per stratum. Inputs carry ``res_h`` (the priority) and any payload
    columns; duplicates across states agree on every column because
    res_h and the payload are pure functions of the record.

    Contract: the id must DETERMINE the payload within a stratum (true
    for any primary-keyed source). Two arrivals sharing (strata, id)
    but disagreeing on payload would make the kept payload
    arrival-order-dependent — the same keys-verified-unique convention
    every oracle-checked dedup in the registry documents."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    merged = merged.dropDuplicates(list(strata_cols) + [id_col])
    w = Window.partitionBy(*strata_cols).orderBy("res_h", id_col)
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def reservoir_stream_batches(
    index_dir: str,
    strata_cols: list[str],
    id_col: str,
    payload_cols: list[str],
    k: int = 16,
):
    """``writeStream.foreachBatch`` body factory (module docstring).
    The committed state at ``index_dir/batch=N`` holds the per-stratum
    bottom-k (strata…, id, res_h, payload…) rows; extract the sample
    with :func:`reservoir_result`."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {
        "strata_cols": list(strata_cols),
        "id_col": id_col,
        "payload_cols": list(payload_cols),
        "k": k,
    }

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "reservoir_stream_batches",
            "k, strata, id and payload columns define the sample; "
            "restart with the same config or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        if batch.isEmpty():
            # idle trigger: nothing to fold, nothing to rewrite — the
            # streaming/lossy.py empty-batch discipline (a later
            # non-empty batch advances the pointer; replaying this one
            # re-skips identically)
            return
        spark = _batch_session(batch)
        cols = list(strata_cols) + [id_col] + list(payload_cols)
        rows = batch.select(
            *cols, kmv_hash_col(id_col).alias("res_h")
        )
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        states = [rows]
        if committed >= 0:
            # family discipline (cdc/bfs/itemsets/lossy/skyline): a
            # committed pointer whose state partition vanished is
            # external corruption — silently folding only the new batch
            # would RESET the accumulated sample under a valid pointer
            if not os.path.isdir(prev_dir):
                raise RuntimeError(
                    f"committed pointer batch={committed} has no state "
                    f"directory under {index_dir} — state store "
                    "corrupted; refusing to fold from a partial prefix"
                )
            states.append(spark.read.parquet(prev_dir))
        state = reservoir_merge(states, list(strata_cols), id_col, k)
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            state.write.mode("overwrite").parquet(out)
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        # bottom-k state supersedes all earlier partitions
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def reservoir_result(spark, index_dir: str) -> DataFrame:
    """The committed sample with its per-stratum rank (the order
    statistic of the priority — rank 1 is the stratum's first pick at
    every stream length, the property that makes bottom-k samples
    consistent across time). Fails loudly on an uncommitted index."""
    committed, _ = _read_meta(index_dir)
    if committed < 0:
        raise ValueError(
            f"reservoir_result: no committed state at {index_dir!r}"
        )
    return spark.read.parquet(
        os.path.join(index_dir, f"batch={committed}")
    )


def reservoir_result_ranked(
    spark,
    index_dir: str,
    strata_cols: list[str],
    id_col: str,
) -> DataFrame:
    """reservoir_result + the per-stratum sample_rank column (window
    over the ≤ k·strata committed rows — driver-scale input, bounded
    by construction)."""
    state = reservoir_result(spark, index_dir)
    w = Window.partitionBy(*strata_cols).orderBy("res_h", id_col)
    return state.withColumn(
        "sample_rank", F.row_number().over(w).cast("int")
    )
