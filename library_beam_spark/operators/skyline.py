"""Skyline / Pareto-front operators (Börzsönyi, Kossmann & Stocker,
ICDE 2001) — the preference-query family: rows not DOMINATED by any
other row, where e dominates r iff e is at least as good on every
objective and strictly better on at least one.

Two shapes, matching the two places skylines appear in a pipeline:

- :func:`skyline_2d` — the data-grain two-objective case (price vs
  quality, cost vs recency). The textbook sort-based identity: with
  objectives (x MIN, y MAX), r is dominated iff
  ``max{y_e : x_e < x_r} ≥ y_r`` or ``max{y_e : x_e ≤ x_r} > y_r`` —
  two running maxima over the x order. A global RANGE window would be
  the single-task funnel, so the maxima come from the engine's
  range-partition discipline (operators/packing.distributed_cumsum,
  adapted from SUM to MAX): range-partition on x, per-partition RANGE
  windows keyed on the partition id, per-partition maxima prefix-
  combined over the (num_partitions)-row offsets table and broadcast
  back. Equal x values land in exactly one range partition, so an
  earlier partition's maximum is always a strictly-smaller-x
  contribution — the strict/non-strict split stays exact. One range
  exchange, node-bounded windows, no quadratic anywhere, ANY skyline
  size.

- :func:`skyline_dominance` — the general d-objective case on a
  BOUNDED grain (dimension rollups: nation × year), as a broadcast
  dominance anti-join — quadratic by nature (that is the d ≥ 3
  skyline lower bound without specialized partitioning), so the
  operator enforces its declared grain with a fail-loud row-count
  guard instead of silently degrading.

Ties: duplicate objective vectors dominate each other in NEITHER
direction (no strict objective), so both survive — the ICDE'01
convention, and what the NOT EXISTS oracle replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-objective skyline: ``x_col`` minimized, ``y_col`` maximized
    (flip signs at the call site for other orientations). ``x_col``
    must be numeric (RANGE window frames require it — cast money to
    integer cents first). Returns the input rows that are not
    dominated.

    The input is materialized once before the range exchange
    (repartitionByRange samples its lineage — the distributed_cumsum
    pinning rule).
    """
    from ..util import pin

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    t = (
        pin(df)
        .repartitionByRange(n, F.col(x_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # RANGE frame with offset −1 means x_e ≤ x − 1, which equals the
    # strict x_e < x ONLY on integer keys — hence the integer contract
    # (money as cents); comparisons then stay exact at any magnitude
    # (no double coercion of bigint maxima)
    w_lt = (
        Window.partitionBy("_pid")
        .orderBy(F.col(x_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy("_pid")
        .orderBy(F.col(x_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("_m_lt", F.max(y_col).over(w_lt)).withColumn(
        "_m_le", F.max(y_col).over(w_le)
    )
    # per-partition maxima, prefix-combined over earlier partitions —
    # the offsets table is num_partitions rows (the packing discipline)
    wp = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        t.groupBy("_pid")
        .agg(F.max(y_col).alias("_pmax"))
        .withColumn("_poff", F.max("_pmax").over(wp))
        .select("_pid", "_poff")
    )
    joined = local.join(F.broadcast(offsets), "_pid")
    # earlier partitions hold strictly smaller x (equal keys never
    # split across range partitions), so _poff feeds both maxima;
    # every comparison coalesces to false so empty maxima (first row,
    # first partition) never null out the filter
    y = F.col(y_col)
    dominated = (
        F.coalesce(F.col("_m_lt") >= y, F.lit(False))
        | F.coalesce(F.col("_m_le") > y, F.lit(False))
        | F.coalesce(F.col("_poff") >= y, F.lit(False))
    )
    return joined.filter(~dominated).drop(
        "_pid", "_m_lt", "_m_le", "_poff"
    )


def skyline_dominance(
    df: DataFrame,
    minimize: list,
    maximize: list,
    max_rows: int = 100_000,
) -> DataFrame:
    """General d-objective skyline on a BOUNDED grain via a broadcast
    dominance anti-join. ``minimize``/``maximize`` name the objective
    columns. Quadratic in the input by design — the declared contract
    is dimension-grain input (rollups, never raw rows), enforced
    fail-loud at ``max_rows``. The input is pinned once — the guard
    count, the probe side and the broadcast build side otherwise each
    re-run the caller's rollup lineage (the lorenz pin discipline)."""
    from ..util import pin

    df = pin(df)
    cnt = df.count()
    if cnt > max_rows:
        raise ValueError(
            f"skyline_dominance is a broadcast quadratic operator for "
            f"bounded grains: got {cnt} rows > max_rows={max_rows}; "
            "pre-aggregate or use skyline_2d's range-partition form"
        )
    cols = list(minimize) + list(maximize)
    other = df.select(
        *[F.col(c).alias(f"_o_{c}") for c in cols]
    )
    at_least = [
        F.col(f"_o_{c}") <= F.col(c) for c in minimize
    ] + [F.col(f"_o_{c}") >= F.col(c) for c in maximize]
    strictly = [
        F.col(f"_o_{c}") < F.col(c) for c in minimize
    ] + [F.col(f"_o_{c}") > F.col(c) for c in maximize]
    dominates = at_least[0]
    for p in at_least[1:]:
        dominates = dominates & p
    any_strict = strictly[0]
    for p in strictly[1:]:
        any_strict = any_strict | p
    return df.join(
        F.broadcast(other), dominates & any_strict, "left_anti"
    )
