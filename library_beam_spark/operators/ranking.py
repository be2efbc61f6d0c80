"""Exact global percent-rank without a global row sort — the scalable
primitive under rank-fusion quality filters.

``percent_rank() OVER (ORDER BY s)`` is exact but plans as a
SINGLE-PARTITION sort of every row — the classic 100 TB scale-killer.
For a LOW-CARDINALITY signal (integer word counts, char counts,
bucketed scores) the same number decomposes:

    percent_rank(x) = (# rows with value < x) / (N − 1)

so the scalable form is: (1) groupBy(value).count() — one partial-agg
shuffle, output = one row per DISTINCT value; (2) a cumulative sum
window over that distinct-value table — single partition, but of
|distinct| rows, not N (the docstring contract: use this for signals
whose cardinality is bounded — int features, not raw doubles); (3) a
broadcast join back on the value. Ties share the minimum rank, exactly
SQL percent_rank's rule, and the final division is the same
integer-derived IEEE divide on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: exact_percent_rank's cardinality contract, enforced at execution:
#: the distinct-value table flows through a SINGLE-PARTITION window and
#: is broadcast back, so |distinct| beyond ~10⁶ silently rebuilds the
#: very bottleneck the operator exists to avoid. Past the bound the
#: plan RAISES (not degrades); use percent_rank_scalable instead.
MAX_DISTINCT = 1_000_000


def exact_percent_rank(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    max_distinct: int = MAX_DISTINCT,
) -> DataFrame:
    """Append ``out_col`` (default ``<col>_pr``) = exact SQL
    percent_rank of ``col`` over the whole frame, computed without
    sorting the rows globally (module docstring; per-value counts +
    distinct-value cumulative window + broadcast join). NULL-free
    input assumed (quality signals are).

    The cardinality contract is ENFORCED, not just documented: the
    distinct-value count is already materialized by the cumulative
    window, so a zero-extra-job ``assert_true`` woven into the rank
    expression raises loudly when |distinct| > ``max_distinct`` —
    misuse on a raw-double column fails instead of single-tasking the
    corpus. For genuinely high-cardinality keys use
    :func:`percent_rank_scalable` (range-partition rank machinery)."""
    out = out_col or f"{col}_pr"
    dist = df.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # assert_true returns NULL when the predicate holds and raises at
    # execution when it does not — when(·.isNull(), x) is therefore x
    # on the good path and a loud error past the bound, with no extra
    # Spark job and no eager evaluation in this lazy operator.
    guard = F.assert_true(
        F.count(F.lit(1)).over(whole) <= F.lit(max_distinct),
        F.lit(
            f"exact_percent_rank({col!r}): distinct-value count exceeds "
            f"max_distinct={max_distinct} — the distinct table is "
            "single-partition + broadcast by design; use "
            "percent_rank_scalable for high-cardinality keys"
        ),
    )
    ranks = dist.select(
        col,
        F.when(
            guard.isNull(), F.coalesce(F.sum("_c").over(w), F.lit(0))
        ).alias("_less"),
        F.sum("_c").over(whole).alias("_n"),
    ).select(
        col,
        (
            F.col("_less").cast("double")
            / F.greatest(F.col("_n") - F.lit(1), F.lit(1)).cast("double")
        ).alias(out),
    )
    return df.join(F.broadcast(ranks), col)


def percent_rank_scalable(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL percent_rank for UNBOUNDED-cardinality keys (raw
    doubles, unique ids) — no single-partition stage anywhere.

    percent_rank(x) = (#rows < x)/(N−1) = (min rank among x's ties − 1)
    /(N−1). The global rank comes from the range-partition prefix-scan
    machinery (packing.assign_row_ids: range exchange → local rank →
    broadcast per-partition offsets); ties then collapse to their
    MINIMUM rank via a ``partitionBy(col)`` window — hash-parallel, one
    exchange, never a global sort. Which tied row carried which raw
    rank is layout-dependent, but their min is (#rows < x) + 1 under
    ANY permutation, so the result is deterministic without a
    tiebreaker. One count scalar to the driver fixes N (the
    order_deciles_scalable discipline); the final divide is the same
    integer-derived IEEE operation on every engine."""
    from .packing import assign_row_ids

    out = out_col or f"{col}_pr"
    n = df.count()
    ranked = assign_row_ids(
        df, col, out_col="_rn", num_partitions=num_partitions
    )
    return (
        ranked.withColumn(
            "_minrn", F.min("_rn").over(Window.partitionBy(col))
        )
        .withColumn(
            out,
            (F.col("_minrn") - F.lit(1)).cast("double")
            / F.lit(float(max(n - 1, 1))),
        )
        .drop("_rn", "_minrn")
    )
