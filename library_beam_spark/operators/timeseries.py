"""Time-series repair: per-entity gap filling with linear
interpolation.

``gap_filled_daily`` (registry) zero-fills a GLOBAL spine; this
operator repairs per-entity series — the shape feature pipelines need
(sensor feeds, per-user engagement, per-part demand) where "absent"
means *unobserved*, not zero, and downstream models want a dense,
smooth series.

Scale shape: everything is keyed by the entity. The per-entity
[min, max] bounds are one partial-agg shuffle; the spine explodes a
``sequence`` per entity (never a global cross join — an entity's spine
is only as long as ITS OWN observation span); the observed points join
back on (entity, t); both interpolation windows ride one entity-hash
partitioning. A single entity with a decade-long span at second
granularity is the skew case — bound it upstream by coarsening ``t``.

Determinism: inputs arrive as exact integers (time as an index, values
pre-scaled — the dsum discipline); the interpolation arithmetic is one
deterministic IEEE expression over those integers, portably rounded.
Leading/trailing gaps (no left/right neighbor) extend the nearest
observed value rather than extrapolating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import pround

__all__ = ["interpolate_gaps"]


def interpolate_gaps(
    observed: DataFrame,
    entity_col: str,
    t_col: str,
    v_col: str,
    digits: int = 4,
) -> DataFrame:
    """Dense (entity, t, v, observed) series per entity.

    ``observed`` holds one row per observation: integer ``t_col``
    (day number, epoch step — any unit-spaced index) and numeric
    ``v_col`` (pre-scaled to exact integers for cross-engine runs).
    Output covers every integer t in the entity's [min, max] span;
    gaps get the linear interpolation of the neighboring observations,
    edges extend the nearest value.
    """
    for col in ("_prev_v", "_prev_t", "_next_v", "_next_t", "observed"):
        if col in observed.columns:
            raise ValueError(f"input already has reserved column {col!r}")
    e, t, v = F.col(entity_col), F.col(t_col), F.col(v_col)
    spine = (
        observed.groupBy(entity_col)
        .agg(F.min(t).alias("_t0"), F.max(t).alias("_t1"))
        .select(
            entity_col,
            F.explode(F.sequence("_t0", "_t1")).alias(t_col),
        )
    )
    dense = spine.join(observed, [entity_col, t_col], "left")
    wp = (
        Window.partitionBy(entity_col)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(entity_col)
        .orderBy(t_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_obs = F.when(v.isNotNull(), t)
    filled = (
        dense.withColumn("_prev_v", F.last(v, ignorenulls=True).over(wp))
        .withColumn("_prev_t", F.last(t_obs, ignorenulls=True).over(wp))
        .withColumn("_next_v", F.first(v, ignorenulls=True).over(wn))
        .withColumn("_next_t", F.first(t_obs, ignorenulls=True).over(wn))
    )
    interp = (
        F.col("_prev_v").cast("double")
        + (F.col("_next_v") - F.col("_prev_v")).cast("double")
        * (t - F.col("_prev_t")).cast("double")
        / (F.col("_next_t") - F.col("_prev_t")).cast("double")
    )
    value = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(F.col("_prev_v").isNull(), F.col("_next_v").cast("double"))
        .when(F.col("_next_v").isNull(), F.col("_prev_v").cast("double"))
        .otherwise(interp)
    )
    return filled.select(
        entity_col,
        t_col,
        pround(value, digits).alias(v_col),
        v.isNotNull().alias("observed"),
    )


def ewma(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 16,
    out_col: str = "ewma",
    digits: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average with α = 1/2 over the
    last ``window`` observations per key — the standard smoothing pass
    of monitoring/feature pipelines, built CROSS-ENGINE EXACT: α = 0.5
    makes every weight a power of two (x·2⁻ᵏ is exact in binary
    floating point — no pow() ulp drift anywhere), and the recurrence
    s ← 0.5·s + 0.5·x evaluates as a LEFT FOLD over the frame's rows
    in window order (F.aggregate ⇄ DuckDB list_reduce with a prepended
    zero), so both engines execute the identical IEEE operation
    sequence — the list_inner_product discipline applied to a
    recurrence instead of a dot product. Truncation to ``window`` rows
    is what makes the operator distributable: the frame is bounded, so
    no scan-with-carry crosses partition boundaries.

    Scale shape: ONE hash-partitioned sort window per key (frame
    collect + fold are JVM-side codegen, no Python); output at the
    input grain."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    half = F.lit(0.5)
    folded = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc * half + x * half
    )
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.col(value_col),
        pround(folded, digits).alias(out_col),
    )
