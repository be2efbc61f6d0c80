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


def hilbert_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert-curve index of the low ``bits`` of two non-negative
    ints — the locality-preserving alternative to :func:`zorder_key`:
    consecutive indices are always MANHATTAN-ADJACENT cells (the
    curve's defining unit-step property, pinned exhaustively in
    tests), where Morton order jumps across the grid at power-of-two
    seams, so range buckets span tighter rectangles.

    Built as the 4-STATE machine over the interleaved bit pairs of
    the ORIGINAL coordinates (tables derived from the textbook xy2d
    rotation group in _derive_hilbert_tables and verified against it
    exhaustively in tests) rather than the naive per-level coordinate
    rewrite: the rewrite references cx/cy three times per level, so
    Catalyst's projection collapse re-expands the expression 3^bits-
    fold (~100 s of analysis at bits = 8, measured); the state chain
    references one small column expression twice per level — linear.
    Returns BIGINT in [0, 4^bits)."""
    if not 1 <= bits <= 15:
        raise ValueError("bits must be in [1, 15]")
    dig, nxt = _HILBERT_DIGIT, _HILBERT_NEXT
    dig_arr = F.array(*[F.lit(v) for v in dig])
    nxt_arr = F.array(*[F.lit(v) for v in nxt])
    cx = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    cy = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    d = F.lit(0).cast("bigint")
    state = F.lit(0).cast("bigint")
    for level in range(bits - 1, -1, -1):
        q = (
            F.shiftleft(F.shiftright(cx, level).bitwiseAND(F.lit(1)), 1)
            + F.shiftright(cy, level).bitwiseAND(F.lit(1))
        )
        idx = (state * F.lit(4) + q + F.lit(1)).cast("int")
        d = d * F.lit(4) + F.element_at(dig_arr, idx)
        state = F.element_at(nxt_arr, idx).cast("bigint")
    return d.cast("bigint")


def _derive_hilbert_tables() -> tuple:
    """Derive the digit / next-state tables of the Hilbert 4-state
    machine from the xy2d rotation group: a state is (swap, c0, c1) —
    which original coordinate feeds each axis and whether it is
    complemented within the current quadrant — and the textbook rot
    step composes to (¬swap, c1, c0) on a plain swap and
    (¬swap, ¬c1, ¬c0) on reflect+swap. BFS from the identity reaches
    exactly four states."""
    start = (False, False, False)
    states = [start]
    index = {start: 0}
    digit_tab: list = []
    next_tab: list = []
    i = 0
    while i < len(states):
        sw, c0, c1 = states[i]
        for q in range(4):
            bx, by = q >> 1, q & 1
            a = by if sw else bx
            b = bx if sw else by
            rx, ry = a ^ c0, b ^ c1
            digit = (3 * rx) ^ ry
            if ry == 1:
                nxt = (sw, c0, c1)
            elif rx == 0:
                nxt = (not sw, c1, c0)
            else:
                nxt = (not sw, not c1, not c0)
            if nxt not in index:
                index[nxt] = len(states)
                states.append(nxt)
            digit_tab.append(digit)
            next_tab.append(index[nxt])
        i += 1
    assert len(states) == 4
    return tuple(digit_tab), tuple(next_tab)


_HILBERT_DIGIT, _HILBERT_NEXT = _derive_hilbert_tables()
