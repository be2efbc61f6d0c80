"""Small plan-shaping & data-quality utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and pass it to ``fn`` as a lambda variable.

    Catalyst's CollapseProject inlines a projected column into every
    consumer, so an expensive expression referenced N times is recomputed
    N× (O(n²) for per-element references inside array transforms). A
    higher-order-function lambda variable is bound by value — the
    shuffle-free alternative to persist()/explode+groupBy.
    """
    return F.get(F.transform(F.array(col), fn), 0)


def assert_expected_count(
    df: DataFrame, expected: int, tolerance: float = 0.0, label: str = "dataset"
) -> int:
    """Data-quality gate: the reference declared (but never used)
    EXPECTED_ENTRIES_IN_MEDLINE_BASELINE_FILE = 30000 (main.py:33); the
    engine makes the assertion real. Returns the count."""
    n = df.count()
    lo = expected * (1 - tolerance)
    hi = expected * (1 + tolerance) if tolerance else expected
    if not (lo <= n <= hi):
        raise AssertionError(
            f"{label}: expected {expected} (±{tolerance:.0%}) rows, got {n}"
        )
    return n


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up ONLY when the input has fewer partitions than the
    cluster has slots.

    Compute-heavy per-row operators (shingling, hashing, NLP kernels) over
    a small file get planned as 1-2 scan partitions — fine for I/O, fatal
    for CPU-bound work (measured 8×: 7.5s → 0.9s for minhash at sf0.1).
    At real scale the scan already yields thousands of partitions and this
    is a no-op; the guard keeps us from ever adding a gratuitous shuffle.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
