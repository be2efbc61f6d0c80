"""Sequence packing for LLM pretraining batches.

Two semantics, both deterministic:

- :func:`chunk_pack` — GPT-style "concatenate everything, slice every
  ``budget`` tokens": documents are laid out in a fixed global order and
  each gets its absolute token offset, so a doc may straddle sequence
  boundaries. Pure arithmetic over a global running token sum.
- :func:`greedy_pack_bins` — whole-document bins: documents never split;
  a new bin opens when the current one would overflow. Sequential by
  nature, so it runs greedily *within* deterministic hash groups in
  parallel (`applyInPandas`), which is how production packers shard the
  problem — packing efficiency loss is O(1 doc) per group.

The global running sum does NOT use a global window — ``Window.orderBy``
without ``partitionBy`` funnels every row through one task, the classic
100 TB scale-killer. :func:`distributed_cumsum` is the textbook two-phase
prefix scan instead: range-partition by the order key (layout pinned by
a checkpoint — sampled boundaries are execution-specific, see in-code
note), local cumsum per partition (a window keyed on the partition id),
then add per-partition prefix offsets broadcast back — no second
shuffle of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order
    (``out_col`` = total of all *strictly earlier* rows).

    Both the local-cumsum branch and the per-partition totals branch
    read ONE pinned materialization of the range-partitioned table —
    ``repartitionByRange`` samples boundaries per execution, so any
    plan shape that lets the two branches execute the exchange
    independently (see the in-function comment on why ReuseExchange
    cannot be trusted for this) silently mis-aligns partition ids. The
    offsets table is ``num_partitions`` rows, so its global window and
    the broadcast join back are deliberately tiny.

    Cost note: ``repartitionByRange`` SAMPLES its input to choose
    boundaries — the upstream plan is evaluated once for sampling and
    once for the shuffle. If ``df`` carries an expensive projection
    (tokenization, feature extraction), materialize it first
    (``util.pin``): measured 2.6× end-to-end on the sequence-packing
    query at sf5.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # The partitioned table MUST be materialized once and read by both
    # branches. Leaving two textually-identical repartitionByRange
    # branches in one plan is NOT enough: range boundaries are sampled
    # per execution, and ReuseExchange only deduplicates the branches
    # while their pruned column sets coincide — the offsets branch needs
    # fewer columns, so any payload column kills the reuse and the two
    # exchanges sample DIFFERENT boundaries (observed: duplicated and
    # skipped prefix ids). localCheckpoint pins one layout; on a real
    # cluster prefer setCheckpointDir + checkpoint for lineage safety,
    # or compute boundaries once driver-side for numeric keys.
    with_pid = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = with_pid.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("bigint")
    )

    wp = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_pid.groupBy("_pid")
        .agg(F.sum(value_col).cast("bigint").alias("_t"))
        .withColumn("_off", F.coalesce(F.sum("_t").over(wp), F.lit(0)).cast("bigint"))
        .select("_pid", "_off")
    )

    return (
        local.join(F.broadcast(offsets), on="_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_t", "_off")
    )


def assign_row_ids(
    df: DataFrame,
    order_col: str,
    out_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 1-based row ids in ``order_col`` order — the shard/
    example-id assignment step of a training-data export, without the
    two classic traps: a global ``row_number`` window (single-task
    funnel) and ``monotonically_increasing_id`` (sparse, partition-
    dependent, not contiguous). Exactly :func:`distributed_cumsum` of
    the constant 1: range-partition, local rank, per-partition offsets
    broadcast back — one range exchange total.

    Ids are a permutation of 1..n in ALL cases, but which tied row gets
    which id is layout-dependent: stability across reruns requires
    ``order_col`` to be unique (build a struct of (key, tiebreak) when
    it is not — cf. the contiguous_doc_ids registry query)."""
    return distributed_cumsum(
        df.withColumn("_one", F.lit(1)),
        order_col,
        "_one",
        out_col="_rid0",
        num_partitions=num_partitions,
    ).withColumn(out_col, (F.col("_rid0") + 1).cast("bigint")).drop(
        "_one", "_rid0"
    )


def assign_ntile(
    df: DataFrame,
    order_col: str,
    buckets: int,
    total: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``ntile(buckets)`` recovered from the distributed
    range-partition rank — no global window, no single-task sort (the
    q:order_deciles_scalable pattern, factored here so every quantile-
    bucketing query shares one audited implementation). SQL ntile's
    size rule: with ``total = q·buckets + r``, the first ``r`` buckets
    take ``q + 1`` rows each, the rest ``q`` — so
    ``bucket = ceil(rank / (q+1))`` while ``rank ≤ r·(q+1)``, else
    ``r + ceil((rank − r·(q+1)) / q)``. Pure integer arithmetic over
    :func:`assign_row_ids`' output, engine-portable, degenerate
    ``total < buckets`` included (``q = 0`` ⇒ bucket = rank).

    ``total`` is the caller's exact row count: counting here would
    re-execute ``df``'s lineage, so callers pin expensive inputs and
    pass the count (cf. kn_perplexity_buckets). Determinism requires a
    unique ``order_col`` — struct in a tiebreaker when the sort key
    alone is not."""
    q, r = total // buckets, total % buckets
    ranked = assign_row_ids(
        df, order_col, out_col="_rn", num_partitions=num_partitions
    )
    rn = F.col("_rn")
    head = r * (q + 1)
    qq = max(q, 1)
    # ceil(n/d) for positive ints as (n + d - 1) DIV d — integer DIV, not
    # IEEE double division, so the bucket is exact at any cardinality
    # (double `/` then cast('int') can round up across a representable-
    # integer boundary once the rank exceeds ~2^53).
    bucket = (
        F.when(rn <= F.lit(head), F.expr(f"(_rn + {q}) DIV {q + 1}"))
        .otherwise(F.lit(r) + F.expr(f"(_rn - {head} + {qq - 1}) DIV {qq}"))
        .cast("int")
    )
    return ranked.withColumn(out_col, bucket).drop("_rn")


def chunk_pack(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-then-chunk layout: absolute ``start_offset``, the sequence
    ids the document starts/ends in, and its offset within the first
    sequence."""
    cum = distributed_cumsum(
        df, order_col, token_col, out_col="start_offset",
        num_partitions=num_partitions,
    )
    start = F.col("start_offset")
    end = start + F.col(token_col) - 1  # inclusive last token
    return (
        cum.withColumn("start_seq", (start / budget).cast("bigint"))
        .withColumn(
            "end_seq",
            F.when(F.col(token_col) > 0, (end / budget).cast("bigint"))
            .otherwise((start / budget).cast("bigint")),
        )
        .withColumn("offset_in_seq", (start % budget).cast("bigint"))
    )


def greedy_pack_bins(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    id_col: str = "doc_id",
    n_groups: int = 64,
) -> DataFrame:
    """Whole-document next-fit packing inside deterministic hash groups.

    Output adds ``pack_id`` (globally unique: ``group * 2^32 + bin``).
    A document alone larger than ``budget`` still gets its own bin.
    """
    from .sampling import hash_value

    schema = df.schema.add("pack_id", "long")
    grouped = df.withColumn(
        "_grp", hash_value(F.col(id_col), salt="pack") % n_groups
    )

    def pack(key, pdf):
        import pandas as pd

        grp = int(key[0])
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins, used, cur = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            bins.append(grp * (1 << 32) + cur)
            used += t
        out = pdf.drop(columns=["_grp"])
        out["pack_id"] = pd.Series(bins, dtype="int64")
        return out

    return grouped.groupBy("_grp").applyInPandas(pack, schema=schema)


def epoch_shuffle(
    df,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 8,
    total: int | None = None,
):
    """Deterministic training-epoch shuffle + balanced shard assignment
    — the export step between a curated corpus and a data loader. Every
    row gets a pseudorandom ``position`` (1..N permutation: rank in
    (hash(epoch|id), id) order — a new derangement per epoch, replayable
    from the epoch number alone, no stored permutation table) and a
    ``shard`` = (position−1)·n_shards DIV N, i.e. contiguous position
    ranges → shard sizes balanced to ±1 BY CONSTRUCTION, not just in
    hash expectation.

    Scale shape: the rank comes from :func:`assign_row_ids` (range
    exchange + local rank + broadcast offsets) — no global
    single-partition window; the only driver scalar is the total count
    (pass ``total`` to skip the count job when the caller already knows
    it). Integer shard arithmetic (DIV) is engine-portable."""
    from pyspark.sql import functions as F

    from .sampling import hash_value

    n = total if total is not None else df.count()
    keyed = df.withColumn(
        "_ord",
        F.struct(
            hash_value(F.col(id_col), f"epoch{epoch}").alias("h"),
            F.col(id_col).alias("i"),
        ),
    )
    out = assign_row_ids(keyed, "_ord", out_col="position")
    return out.withColumn(
        "shard",
        F.expr(f"CAST((position - 1) * {n_shards} DIV {n} AS INT)"),
    ).drop("_ord")
