"""Coreset selection: greedy k-center (farthest-first traversal,
Gonzalez 1985) — the diversity-selection primitive training-data
curation uses to pick a small set of maximally-spread exemplars (and
the classic 2-approximation to the k-center clustering objective).

Relation to the neighbors in this package: SemDeDup prunes points that
are TOO CLOSE to something kept; MMR (similarity.mmr_rerank) trades
relevance against redundancy over a bounded shortlist. k-center keeps
the points FARTHEST from everything kept so far, scanning the whole
corpus each round — the right tool when the goal is coverage of the
embedding space rather than query relevance.

Scale shape (100 TB): each of the k rounds is ONE map-side pass over
the corpus — fold the newest center (a broadcast 1-row cross join)
into a running min-distance column, then take the global argmax via
TakeOrderedAndProject (no full sort, no shuffle beyond the top-1
reduction). Total work k·|corpus|, per-round state one vector. pin()
between rounds keeps plan depth constant (the pick is referenced
twice: output row + distance fold).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import pin


def _dot(a: Column, b: Column) -> Column:
    # left-to-right accumulation — matches DuckDB list_inner_product,
    # the float-parity discipline every ANN oracle in this repo rests on
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dist2(v: Column, c: Column) -> Column:
    """Squared L2 via inner products, parenthesized identically to the
    SQL oracle: (v·v - 2·(v·c)) + c·c."""
    return (_dot(v, v) - F.lit(2.0) * _dot(v, c)) + _dot(c, c)


def kcenter_select(
    emb: DataFrame,
    k: int,
    seed_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Pick ``k`` centers after the (arbitrary, deterministic) seed
    point ``seed_id`` by farthest-first traversal; ties on the argmax
    break by ascending id. Returns one row per pick:
    (center_rank 1..k, id, radius2) where radius2 is the squared
    max-min distance that caused the pick — the non-increasing sequence
    whose first element bounds the optimal k-center radius within 2×.
    """
    seed = emb.filter(F.col(id_col) == seed_id).select(
        F.col(vec_col).alias("_cv")
    )
    cand = pin(
        emb.filter(F.col(id_col) != seed_id)
        .crossJoin(F.broadcast(seed))
        .withColumn("_min_d", _dist2(F.col(vec_col), F.col("_cv")))
        .drop("_cv")
    )
    picks = []
    for step in range(1, k + 1):
        pick = pin(cand.orderBy(F.desc("_min_d"), F.col(id_col)).limit(1))
        picks.append(
            pick.select(
                F.lit(step).alias("center_rank"),
                F.col(id_col),
                F.col("_min_d").alias("radius2"),
            )
        )
        pv = pick.select(
            F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv")
        )
        cand = pin(
            cand.crossJoin(F.broadcast(pv))
            .filter(F.col(id_col) != F.col("_pid"))
            .withColumn(
                "_min_d",
                F.least(F.col("_min_d"), _dist2(F.col(vec_col), F.col("_pv"))),
            )
            .drop("_pid", "_pv")
        )
    return reduce(DataFrame.unionAll, picks)
