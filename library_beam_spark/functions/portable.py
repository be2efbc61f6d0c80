"""Engine-portable numeric helpers.

``ROUND`` disagrees between engines on exact .5 boundaries (Spark rounds
HALF_UP on the decimal string, DuckDB on the binary double), which breaks
value-hash comparison against the DuckDB oracle. ``floor(x*s + 0.5)/s`` is
pure IEEE arithmetic — bit-identical everywhere — so every rounded column
the engine emits uses this form, and every oracle uses ``sql_round``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int = 2) -> Column:
    """Portable round-half-up to ``n`` decimals (double out)."""
    s = float(10**n)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_round(expr: str, n: int = 2) -> str:
    """The DuckDB-side twin of :func:`pround`."""
    s = float(10**n)
    return f"FLOOR(({expr}) * {s} + 0.5) / {s}"


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM over a double column (double out).

    A plain double SUM accumulates in partition order, which Spark does not
    fix; when the rounded result lands on a half-up boundary the hash flips
    between runs (observed on the grand-total grouping set over ~600k
    lineitem rows). Fix: round each addend to an exact integer with the
    portable ``floor(x*s + 0.5)`` primitive (Spark's ``floor`` on a double
    already yields LONG), sum integers exactly — associative, so partition
    order is irrelevant — and divide once at the end. Deliberately avoids
    double→DECIMAL casts, whose half-way rounding differs between Spark
    (string-repr HALF_UP) and DuckDB (exact binary value).
    """
    s = float(10**scale)
    return (F.sum(F.floor(col * F.lit(s) + F.lit(0.5))) / F.lit(s)).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """The DuckDB-side twin of :func:`dsum`."""
    s = float(10**scale)
    return f"(SUM(CAST(FLOOR(({expr}) * {s} + 0.5) AS BIGINT)) / {s})"


def davg(col: Column, scale_in: int = 2, scale_out: int = 4) -> Column:
    """Order-independent AVG (double out): exact integer sum / count, then
    portable-rounded to ``scale_out`` decimals."""
    s = float(10**scale_in)
    avg = F.sum(F.floor(col * F.lit(s) + F.lit(0.5))) / F.lit(s) / F.count(F.lit(1))
    return pround(avg, scale_out)


def sql_davg(expr: str, scale_in: int = 2, scale_out: int = 4) -> str:
    """The DuckDB-side twin of :func:`davg`."""
    s = float(10**scale_in)
    inner = f"SUM(CAST(FLOOR(({expr}) * {s} + 0.5) AS BIGINT)) / {s} / COUNT(*)"
    return sql_round(inner, scale_out)
