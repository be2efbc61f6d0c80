"""Data-layout keys: Z-order (Morton) interleaving.

At 100 TB the dominant cost is what a query does NOT have to read.
Sorting a table by a single column gives min/max pruning on that column
only; writing it ordered by a Z-ORDER key interleaves the bits of two
dimensions so that file-level min/max statistics prune on BOTH (the
Delta/Iceberg OPTIMIZE ZORDER mechanism — here as a plain engine
function usable with ``df.repartitionByRange(zorder_key(...))`` +
sorted parquet writes, including the manifest table in
streaming/manifest.py).

The key is pure integer bit arithmetic (shift/and/or) — a JVM-side
projection inside WholeStageCodegen, no UDF — and engine-portable: the
DuckDB twin (:func:`sql_zorder_key`) emits the identical bit expression,
so layout decisions are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1.
    Returns a BIGINT; inputs are masked to ``bits`` first."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xm = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def sql_zorder_key(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` (same bit expression)."""
    mask = (1 << bits) - 1
    xm = f"(CAST({x_expr} AS BIGINT) & {mask})"
    ym = f"(CAST({y_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
