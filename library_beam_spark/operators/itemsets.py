"""Apriori frequent-itemset mining (Agrawal & Srikant 1994) over
basket-shaped data — the classic market-basket operator, re-expressed
as staged DataFrame joins with the Apriori downward-closure prune.

Levels L1 (items), L2 (pairs), L3 (triples), each with its exact
support count. The candidate space never materializes globally:

Scale shape (100 TB of baskets):
- L1 is one partial-agg groupBy;
- baskets are pruned to L1 items FIRST (broadcast semi-join — the
  frequent vocabulary is tiny by construction: at most n_baskets/s
  items can be frequent), so the in-basket pair self-join is quadratic
  only in the FREQUENT items per basket (baskets are short; the join
  key is basket_id, so the quadratic never crosses baskets);
- L3 candidates are generated in-basket from L2-pruned pairs: every
  sub-pair of a surviving triple must itself be frequent (downward
  closure), enforced by three broadcast semi-joins against L2 BEFORE
  the count — the standard Apriori candidate cut that keeps the triple
  stage linear in true-candidate occurrences rather than in all
  in-basket triples;
- every support count is exact, so the DuckDB oracle replays the whole
  lattice with plain joins + HAVING (the prune is result-preserving —
  agreement verifies downward closure, not just the counts).

Output: (itemset, k, support) — itemset is the '|'-joined sorted member
list (a portable join key for the oracle hash), k its size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apriori_frequent_itemsets(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = 10,
    max_k: int = 3,
) -> DataFrame:
    """Frequent itemsets up to size ``max_k`` (≤3) with exact support
    ≥ ``min_support`` baskets."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_k not in (1, 2, 3):
        raise ValueError(f"max_k must be 1, 2 or 3, got {max_k}")
    from ..util import pin

    # the basket relation feeds L1, the prune, and (through ``pairs``)
    # both the L2 and L3 union branches; Catalyst has no cross-branch
    # common-subexpression elimination, so without a checkpoint the
    # basket join/distinct re-evaluates once per consumer (guide §1:
    # don't compute things you throw away — event-log profile showed
    # the upstream join running 4x per action)
    b = pin(
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("it")
        ).distinct()
    )

    l1 = b.groupBy("it").agg(F.count(F.lit(1)).alias("support")).filter(
        F.col("support") >= min_support
    )
    out = l1.select(
        F.col("it").alias("itemset"),
        F.lit(1).alias("k"),
        F.col("support").cast("bigint").alias("support"),
    )
    if max_k == 1:
        return out

    # prune baskets to the frequent vocabulary before anything quadratic
    bf = b.join(F.broadcast(l1.select("it")), "it", "semi")
    p1, p2 = bf.alias("p1"), bf.alias("p2")
    pairs = p1.join(
        p2,
        (F.col("p1.bid") == F.col("p2.bid"))
        & (F.col("p1.it") < F.col("p2.it")),
    ).select(
        F.col("p1.bid").alias("bid"),
        F.col("p1.it").alias("a"),
        F.col("p2.it").alias("b"),
    )
    if max_k == 3:
        # pairs feeds BOTH the L2 count and the L3 candidate build —
        # materialize once (in-basket pair grain, bounded by the
        # frequent-vocabulary quadratic)
        pairs = pin(pairs)
    l2 = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("support")
    ).filter(F.col("support") >= min_support)
    out = out.unionByName(
        l2.select(
            F.concat_ws("|", "a", "b").alias("itemset"),
            F.lit(2).alias("k"),
            F.col("support").cast("bigint").alias("support"),
        )
    )
    if max_k == 2:
        return out

    # triples from in-basket L2 pairs sharing the low item, with the
    # third sub-pair checked against L2 too (downward closure)
    bp = pairs.join(F.broadcast(l2.select("a", "b")), ["a", "b"], "semi")
    t1, t2 = bp.alias("t1"), bp.alias("t2")
    triples = t1.join(
        t2,
        (F.col("t1.bid") == F.col("t2.bid"))
        & (F.col("t1.a") == F.col("t2.a"))
        & (F.col("t1.b") < F.col("t2.b")),
    ).select(
        F.col("t1.bid").alias("bid"),
        F.col("t1.a").alias("a"),
        F.col("t1.b").alias("b"),
        F.col("t2.b").alias("c"),
    )
    triples = triples.join(
        F.broadcast(
            l2.select(F.col("a").alias("b"), F.col("b").alias("c"))
        ),
        ["b", "c"],
        "semi",
    )
    l3 = triples.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("support")
    ).filter(F.col("support") >= min_support)
    return out.unionByName(
        l3.select(
            F.concat_ws("|", "a", "b", "c").alias("itemset"),
            F.lit(3).alias("k"),
            F.col("support").cast("bigint").alias("support"),
        )
    )
