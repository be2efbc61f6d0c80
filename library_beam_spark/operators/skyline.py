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

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _require_integral(df: DataFrame, cols: list, op: str) -> None:
    """Fail loudly when an objective column is not an integral type —
    the family's shared contract (money as cents). skyline_2d needs it
    for the RANGE −1 frame; skyline_grid's DIV quantization needs it
    for exact cells (int() truncation of a float lo would silently
    misbucket negative fractional bounds)."""
    dtypes = dict(df.dtypes)
    bad = [c for c in cols if dtypes.get(c) not in _INT_TYPES]
    if bad:
        raise TypeError(
            f"{op}: objective columns must be integral (got "
            f"{ {c: dtypes.get(c) for c in bad} }) — cast money to "
            "cents / quantize floats upstream"
        )


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

    _require_integral(df, [x_col, y_col], "skyline_2d")
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
    re-run the caller's rollup lineage (the lorenz pin discipline).

    NULL objectives are REJECTED fail-loud (checked inside the same
    guard aggregate, no extra action): a NULL makes the dominance
    predicate NULL, so the row would silently never dominate and never
    be dominated — always surviving — which is not a convention a
    preference query should adopt implicitly. Filter or impute NULLs
    upstream."""
    from ..util import pin

    df = pin(df)
    cols_all = list(minimize) + list(maximize)
    guard = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}")
            for c in cols_all
        ],
    ).collect()[0]
    cnt = guard["_n"]
    nulls = {c: guard[f"_nn_{c}"] for c in cols_all if guard[f"_nn_{c}"]}
    if nulls:
        raise ValueError(
            f"skyline_dominance: NULL objective values in {nulls} — a "
            "NULL row would silently always survive (dominance predicate "
            "is NULL both ways); filter or impute upstream"
        )
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


def skyline_grid(
    df: DataFrame,
    minimize: list,
    maximize: list,
    bits: int = 4,
    max_survivors: int = 200_000,
) -> DataFrame:
    """DATA-grain d-objective skyline via grid-cell pruning — the
    scalable path :func:`skyline_dominance` deliberately refuses
    (its broadcast quadratic is for bounded rollups only).

    Stage 1 (lossless prune): quantize each objective into 2^bits
    uniform integer cells ((v − min)·G DIV (max − min + 1) — pure
    integer, engine-exact). Cell ranges are disjoint, so a cell whose
    index is STRICTLY better on every objective contains only points
    that dominate every point of the worse cell — any row whose cell
    is strictly dominated by a NON-EMPTY cell is certainly dominated
    and is dropped by one broadcast anti-join against the distinct
    cell table (≤ G^d rows). Nothing in the true skyline is ever
    pruned: its cell cannot be strictly dominated by an occupied cell.

    Stage 2 (exact confirm): the full dominance anti-join runs on the
    SURVIVORS only — the grid-boundary band, not the corpus. Its size
    is data-dependent (anti-correlated objectives widen it), so the
    stage enforces ``max_survivors`` fail-loud rather than silently
    going quadratic on the full input.

    One pinned projection, two global min/max scalars (2-row collect),
    one broadcast cell anti-join, then the bounded confirm. Ties:
    duplicate vectors both survive (the shared convention). Objective
    columns must be INTEGRAL (asserted up front, mirroring
    skyline_2d's integer contract): the cell quantization is integer
    DIV with int() bounds, which would silently misbucket a float
    column with a negative fractional lo."""
    from ..util import pin

    cols = list(minimize) + list(maximize)
    _require_integral(df, cols, "skyline_grid")
    g = 1 << bits
    d = pin(df)
    bounds = d.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    if bounds[f"_lo_{cols[0]}"] is None:  # empty input
        return d

    def cell(c):
        lo, hi = int(bounds[f"_lo_{c}"]), int(bounds[f"_hi_{c}"])
        return F.expr(
            f"CAST(({c} - {lo}) * {g} DIV ({hi} - {lo} + 1) AS INT)"
        ).alias(f"_c_{c}")

    with_cells = d.select("*", *[cell(c) for c in cols])
    cells = with_cells.select(
        *[F.col(f"_c_{c}").alias(f"_o_{c}") for c in cols]
    ).distinct()
    strictly = [
        F.col(f"_o_{c}") < F.col(f"_c_{c}") for c in minimize
    ] + [F.col(f"_o_{c}") > F.col(f"_c_{c}") for c in maximize]
    dominates_cell = strictly[0]
    for p in strictly[1:]:
        dominates_cell = dominates_cell & p
    survivors = pin(
        with_cells.join(
            F.broadcast(cells), dominates_cell, "left_anti"
        ).drop(*[f"_c_{c}" for c in cols])
    )
    n_surv = survivors.count()
    if n_surv > max_survivors:
        raise ValueError(
            f"skyline_grid confirm stage got {n_surv} survivors > "
            f"max_survivors={max_survivors} — raise bits (finer cells "
            "prune more) or max_survivors"
        )
    return skyline_dominance(
        survivors, minimize, maximize, max_rows=max_survivors
    )
