"""Count-min sketch: fixed-size mergeable frequency counters, used to
find heavy hitters WITHOUT a vocabulary-sized shuffle.

The problem at 100 TB: "which tokens appear ≥ T times corpus-wide?" The
direct plan — explode tokens, groupBy(token), HAVING — shuffles an
aggregation keyed by the full vocabulary (billions of distinct n-grams
for n ≥ 2). The sketch plan never keys anything by token:

1. **Sketch pass**: every token increments d counters, one per hash row,
   at column ``xxhash64(token, row_salt) mod w``. As a DataFrame this is
   explode → groupBy(row, bucket) → count, i.e. a partial-agg shuffle
   whose key space is the FIXED d×w grid (e.g. 4×8192), independent of
   vocabulary or corpus size. Sketches merge by elementwise addition
   (associative/commutative — per-partition, per-day, per-source
   sketches combine freely; same property the streaming path needs).
2. **Probe pass**: re-scan the corpus and keep a token occurrence iff
   its sketch estimate ``min_j counters[j][h_j(token)]`` ≥ T — an
   IN-ROW projection against the sketch carried by a broadcast 1-row
   join (util.attach_broadcast_array). CMS only ever OVER-estimates
   (collisions add, never subtract — Cormode & Muthukrishnan 2005), so
   every true heavy hitter survives: no false negatives.
3. **Exact confirm**: group ONLY the surviving occurrences — the key
   space is now the few candidate tokens — count exactly, HAVING ≥ T.

The final answer is EXACT (sketch = prune, exactness = re-check), which
is what lets a plain word-count SQL oracle verify a sketch-accelerated
plan — the same contract as operators/bloom.py.

Error bound: estimate ≤ true + εN with probability 1-δ for w = ⌈e/ε⌉,
d = ⌈ln 1/δ⌉; under-sizing w only admits more FALSE candidates into the
exact recount (more work, same answer).

The collected sketch is d×w bigints — bounded by configuration (256 KiB
at 4×8192), never by data size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import attach_broadcast_array

__all__ = [
    "cms_params",
    "cms_build",
    "cms_merge",
    "cms_collect",
    "cms_attach",
    "cms_estimate",
    "heavy_hitters",
]


def cms_params(epsilon: float = 0.0005, delta: float = 0.01) -> tuple[int, int]:
    """(depth, width) for additive error ≤ ε·N with confidence 1-δ."""
    if not (0 < epsilon < 1 and 0 < delta < 1):
        raise ValueError("epsilon and delta must be in (0, 1)")
    return math.ceil(math.log(1.0 / delta)), math.ceil(math.e / epsilon)


def _bucket(col: Column, row: int, width: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(f"cms:{row}")), F.lit(width))


def cms_build(items: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """SPARSE sketch over all rows of ``items[col]`` (duplicates count):
    (row int, bucket bigint, n bigint). One partial-agg shuffle over the
    fixed d×w grid; at most d×w rows out regardless of input size."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    _bucket(F.col(col), j, width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
    ).alias("_p")
    return (
        items.select(pairs)
        .groupBy(F.col("_p.row").alias("row"), F.col("_p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the multiset union: elementwise counter addition."""
    return (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("n").alias("n"))
    )


def cms_collect(sparse: DataFrame, depth: int, width: int) -> list[int]:
    """Densify to a single row-major d·w list (index = row*width +
    bucket) for :func:`cms_attach`. Driver transfer bounded by d×w."""
    flat = [0] * (depth * width)
    for r in sparse.collect():
        flat[r["row"] * width + int(r["bucket"])] = r["n"]
    return flat


def cms_attach(df: DataFrame, flat: list[int], name: str = "_cms") -> DataFrame:
    """Carry the dense sketch to every probe row via the broadcast
    1-row cross join (never a literal — util.attach_broadcast_array)."""
    return attach_broadcast_array(df, flat, name)


def cms_estimate(col: Column, sketch: Column, depth: int, width: int) -> Column:
    """Point-frequency estimate: min over the d counters the key hashes
    to. Pure projection — ≥ the true count, within ε·N of it w.h.p."""
    cells = [
        F.element_at(sketch, (F.lit(j * width) + _bucket(col, j, width) + F.lit(1)).cast("int"))
        for j in range(depth)
    ]
    return F.least(*cells)


def heavy_hitters(
    occurrences: DataFrame,
    col: str,
    threshold: int,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """EXACT (item, n) for every value of ``occurrences[col]`` appearing
    ≥ ``threshold`` times, without ever shuffling on the full key space:
    sketch pass → in-row estimate filter → exact count of survivors.
    ``occurrences`` is the exploded one-row-per-occurrence form (it is
    scanned twice — persist upstream if it is expensive to produce)."""
    flat = cms_collect(cms_build(occurrences, col, depth, width), depth, width)
    kept = cms_attach(occurrences, flat).where(
        cms_estimate(F.col(col), F.col("_cms"), depth, width) >= F.lit(threshold)
    )
    return (
        kept.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.lit(threshold))
    )
