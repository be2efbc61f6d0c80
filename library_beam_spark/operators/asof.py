"""As-of (nearest-timestamp) join.

For every left row, attach the single right row with the greatest
``right.ts <= left.ts`` (backward; forward is the mirror) within the same
key — the canonical event-enrichment / last-known-state join that plain
SQL can only express as a correlated subquery or a range join.

Spark-first plan: Spark has no ASOF physical operator, and a
``left.ts BETWEEN`` range join degenerates to a per-key cartesian
(O(n·m) per key). Instead, union both inputs tagged with a side marker
and run ONE window pass::

    union(left+side=1, right+side=0)
      → window PARTITION BY key ORDER BY (ts, side, ord)
      → last(right_payload IGNORE NULLS)       -- running last-known state
      → filter side = left

Cost: a single hash shuffle on the key (exactly what any join would pay)
plus a per-partition sort — no candidate blow-up, no skew amplification
beyond what the key distribution itself has. At 100 TB this is the plan
a hand-written MPP ASOF operator produces anyway (merge on co-sorted
runs); pre-bucketing both inputs by the key (operators/bucketing.py)
removes even that shuffle for repeated joins.

Tie semantics: at equal timestamps the inclusive variant lets the right
row match (DuckDB ``ASOF ... ON l.ts >= r.ts`` parity); ``strict=True``
excludes it. Among right rows sharing one timestamp the largest
``right_order`` wins — pass a unique column to make results total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    *,
    right_ts: str | None = None,
    right_order: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join; right columns appear prefixed. Rows with no match
    keep NULL right fields (left-join semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"_ts", "_side", "_p", "_ord", "_m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            f"rename input columns {sorted(clash)} first"
        )
    on_cols = [on] if isinstance(on, str) else list(on)
    rts = right_ts or ts

    payload_cols = [c for c in right.columns if c not in on_cols]
    payload = F.struct(*[F.col(c).alias(f"{prefix}{c}") for c in payload_cols])

    # Side ordering encodes the tie rule: inclusive → right sorts before
    # left at equal ts (so the frame up to the left row contains it);
    # strict → after. The window frame is (unbounded, current row].
    left_side, right_side = (1, 0) if not strict else (0, 1)

    l2 = (
        left.withColumn("_ts", F.col(ts))
        .withColumn("_side", F.lit(left_side))
    )
    r2 = (
        right.select(
            *on_cols,
            F.col(rts).alias("_ts"),
            F.lit(right_side).alias("_side"),
            payload.alias("_p"),
            *( [F.col(right_order).alias("_ord")] if right_order else [] ),
        )
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col("_ts"), F.col("_side")]
    if right_order:
        order.append(F.col("_ord"))
    if direction == "forward":
        order = [c.desc() for c in order[:1]] + order[1:]
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = F.last("_p", ignorenulls=True).over(w)
    out = (
        u.withColumn("_m", matched)
        .where(F.col("_side") == left_side)
        .drop("_ts", "_side", "_p", *( ["_ord"] if right_order else [] ))
    )
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_m.{prefix}{c}"))
    return out.drop("_m")
