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
