"""Mergeable quantile sketch with a DETERMINISTIC, oracle-replayable
merge — the scale path for per-key percentiles that exact
``percentile`` (sort-in-buffer) cannot follow to 100 TB.

Design: a log-bucketed histogram in the DDSketch family (Masson,
Rim & Lee, "DDSketch: a fast and fully-mergeable quantile sketch with
relative-error guarantees", VLDB 2019) with the bucket function made
PURE INTEGER in the HdrHistogram style (Tene): a non-negative integer
value ``c`` keeps its top ``1 + b`` significant bits and zeroes the
rest —

    e  = bit_length(c) − 1            (position of the leading bit)
    sh = max(e − b, 0)                (bits zeroed)
    lb = (c >> sh) << sh              (the bucket's lower bound)

``lb`` is unique per bucket and monotone in ``c``, so it IS the bucket
id; buckets in [2^e, 2^(e+1)) have width 2^(e−b), giving the DDSketch
relative-error guarantee (est − v)/v ≤ 2^−b for the quantile estimates
below, while values under 2^b are EXACT (width-1 buckets).

Why this variant and not GK/KLL proper: GK and KLL compactions are
insertion-order-dependent, so a distributed run is only reproducible
if the operator pins partitioning AND intra-partition order — a replay
contract far heavier than the sketch itself. The fixed bucket function
makes the state (key, lb, count) and the merge COUNT ADDITION:
associative, commutative, order- and partition-free — Spark's
map-side partial aggregation IS the merge, and a SQL oracle replays
the whole pipeline with four integer operators (``bin``/length,
``>>``, ``<<``, windowed cumulative sum). Cross-engine exactness needs
no float anywhere.

Quantile extraction (type-1, the rank-th smallest): rank =
ceil(q·N) computed in INTEGER arithmetic from q = num/den, estimate =
min lb whose cumulative count ≥ rank. The estimate is the bucket
lower bound: est ≤ v < est·(1 + 2^−b) (tests/test_quantile_sketch.py
pins the bound against exact percentiles; a hypothesis test pins
merge = one-shot equality on arbitrary splits).

Scale shape: the state build is ONE shuffle at (key, bucket) grain
with map-side combine; everything downstream (cumsum window, rank
probe) runs on the bucket grain, which is bounded by the VALUE DOMAIN
(≤ ~(64 − b)·2^b buckets per key), not by the row count — the whole
point. Reference parity: the reference's per-field summary stats
(main.py percentile usage) are the exact-percentile form; this is the
documented 100 TB escape hatch of q:quantile_stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hdr_bucket_lb(c, b: int = 6):
    """Column expression: bucket lower bound of non-negative integer
    column ``c`` keeping 1 + ``b`` significant bits (module docstring).
    Pure JVM-side integer ops — bin()/length, shiftright, shiftleft."""
    c = F.col(c) if isinstance(c, str) else c
    e = F.length(F.bin(c)) - F.lit(1)
    sh = F.greatest(e - F.lit(b), F.lit(0))
    # call_function: the Python shiftright/shiftleft wrappers only take
    # int literals, but the underlying SQL expressions accept a column
    # shift amount.
    return F.call_function(
        "shiftleft", F.call_function("shiftright", c, sh), sh
    )


def quantile_sketch_state(
    df: DataFrame,
    key_cols: list,
    value_col: str,
    b: int = 6,
) -> DataFrame:
    """Build the mergeable sketch state: one row per (key, bucket_lb)
    with ``bucket_n`` = count. ``value_col`` must be a non-negative
    integral column (money goes through the exact-cents discipline
    first). The state is a plain DataFrame — persist it, union it with
    another state, re-aggregate: that IS the sketch merge."""
    return (
        df.select(*key_cols, hdr_bucket_lb(value_col, b).alias("bucket_lb"))
        .groupBy(*key_cols, "bucket_lb")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
    )


def merge_sketch_states(states: list, key_cols: list) -> DataFrame:
    """Merge sketch states: union + count re-aggregation. Associative
    and commutative by construction (integer addition on fixed bucket
    ids), so ANY merge tree — partitions, micro-batches, daily
    rollups — yields the identical state."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "bucket_lb").agg(
        F.sum("bucket_n").alias("bucket_n")
    )


def sketch_quantiles(
    state: DataFrame,
    key_cols: list,
    qs: list,
    out_col: str = "est",
) -> DataFrame:
    """Extract type-1 quantile estimates from a sketch state: for each
    q = (num, den, label) in ``qs``, rank = ceil(q·N) in integer
    arithmetic, estimate = min bucket_lb with cumulative count ≥ rank.
    Output: key_cols + (q double label, n_rows, ``out_col``).

    The cumsum window partitions at the BUCKET grain (domain-bounded,
    module docstring) — not a single-task global sort."""
    spark = state.sparkSession
    from ..util import local_df

    qdf = local_df(spark, qs, "num long, den long, q double")
    w = Window.partitionBy(*key_cols).orderBy("bucket_lb")
    wall = Window.partitionBy(*key_cols)
    cum = state.select(
        *key_cols,
        "bucket_lb",
        F.sum("bucket_n").over(w).alias("cum_n"),
        F.sum("bucket_n").over(wall).alias("n_rows"),
    )
    probed = cum.join(F.broadcast(qdf)).filter(
        F.col("cum_n")
        >= F.expr("(num * n_rows + den - 1) div den")
    )
    return probed.groupBy(*key_cols, "q").agg(
        F.max("n_rows").alias("n_rows"),
        F.min("bucket_lb").alias(out_col),
    )
