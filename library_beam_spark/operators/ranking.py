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


def exact_percent_rank(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` (default ``<col>_pr``) = exact SQL
    percent_rank of ``col`` over the whole frame, computed without
    sorting the rows globally (module docstring; per-value counts +
    distinct-value cumulative window + broadcast join). NULL-free
    input assumed (quality signals are)."""
    out = out_col or f"{col}_pr"
    dist = df.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    ranks = dist.select(
        col,
        F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_less"),
        F.sum("_c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    ).select(
        col,
        (
            F.col("_less").cast("double")
            / F.greatest(F.col("_n") - F.lit(1), F.lit(1)).cast("double")
        ).alias(out),
    )
    return df.join(F.broadcast(ranks), col)
