"""Skew mitigation: salting for hot keys (SURVEY 'Optimize for scale').

AQE's skew-join splitting (on by default, session.py) handles most
sort-merge-join skew at runtime. Salting remains necessary for:

- **aggregation skew**: a groupBy where one key holds 10% of all rows
  bottlenecks a single reducer — AQE cannot split a single hash
  partition mid-aggregate. ``salted_aggregate`` runs a two-phase
  (key+salt → key) aggregation so the hot key fans out over N reducers.
  (For algebraic aggregates Catalyst's partial agg already dampens this;
  salting matters when cardinality-per-key is huge or the agg buffer is
  large, e.g. collect_list / max_by of wide structs.)
- **broadcast-impossible skewed joins**: ``salted_join`` replicates the
  small side N× with explicit salt values and spreads the big side's hot
  keys by a deterministic row-hash salt.

Both transformations are semantically invisible: results are identical
to the unsalted form (tests pin this).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE1 = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "collect_set": F.collect_set,
}
# phase-2 combiner per agg kind
_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summation
    "min": F.min,
    "max": F.max,
    "collect_set": lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
}


def salted_topk(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    payload_cols: list[str] | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-safe top-k per key: the window form
    (row_number over partitionBy(key)) sorts EVERY row of a hot key in
    one task; this two-phase form aggregates a bounded k-row buffer per
    (key, salt) map-side, then merges ≤ n_salt·k survivors per key —
    per-task state is O(k), independent of key skew.

    ``order_cols`` are ranking expressions, best first (descending
    semantics supplied by the caller via tuple encoding — pass the
    columns already negated/inverted as needed), and must be NON-NULL:
    ``sort_array`` ranks a NULL struct field first (best) while a
    window's ``desc()`` puts NULLs last, so nullable ranks would
    diverge from the window form — wrap them in ``coalesce`` with a
    sentinel. Results are then identical to the window form (the
    registry query pins this against the same oracle).
    """
    payload = payload_cols or [c for c in df.columns if c not in key_cols]
    rank = F.struct(*order_cols)
    row = F.struct(rank.alias("_r"), F.struct(*payload).alias("_p"))
    salted = df.withColumn("_salt", _row_salt(df, n_salt))
    # phase 1: per (key, salt) keep the k best rows — sort_array on the
    # rank struct, slice to k; the agg buffer never exceeds the salted
    # group, and the shuffled output is ≤ k rows per (key, salt)
    phase1 = (
        salted.groupBy(*key_cols, "_salt")
        .agg(F.slice(F.sort_array(F.collect_list(row)), 1, k).alias("_top"))
        .select(*key_cols, F.explode("_top").alias("_row"))
    )
    # phase 2: merge the ≤ n_salt·k candidates per key
    merged = (
        phase1.groupBy(*key_cols)
        .agg(F.slice(F.sort_array(F.collect_list("_row")), 1, k).alias("_top"))
        .select(*key_cols, F.explode("_top").alias("_row"))
    )
    return merged.select(*key_cols, "_row._p.*")


def _row_salt(df: DataFrame, n: int) -> Column:
    """Deterministic per-row salt: hash of the whole row mod n (uniform,
    reproducible — no rand())."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (input_col, kind) with kind in
    sum|count|min|max|collect_set. Phase 1 aggregates (keys, salt);
    phase 2 combines per key. 'avg' is intentionally absent — compose it
    as sum/count by the caller (algebraic decomposition).
    """
    for _, (_, kind) in aggs.items():
        if kind not in _PHASE1:
            raise ValueError(f"unsupported agg kind: {kind}")
    salted = df.withColumn("_salt", _row_salt(df, n_salt))
    p1 = salted.groupBy(*key_cols, "_salt").agg(
        *[_PHASE1[kind](col).alias(name) for name, (col, kind) in aggs.items()]
    )
    p2 = p1.groupBy(*key_cols).agg(
        *[_PHASE2[kind](name).alias(name) for name, (_, kind) in aggs.items()]
    )
    return p2


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a deterministic row-salt,
    the small side is exploded n_salt× (one copy per salt value), and the
    join key becomes (key, salt). Output columns = big ∪ small minus the
    duplicate key, exactly like ``big.join(small, on)``.

    Use when the small side is too big to broadcast but the big side's
    key distribution is skewed and AQE splitting isn't available
    (e.g. shuffle-hash joins, or pre-3.2 clusters).

    Only big-side-preserving modes are supported: the small side is
    replicated ``n_salt``×, so right/full outer joins would surface each
    unmatched small-side row ``n_salt`` times — breaking the
    'exactly like big.join(small, on)' contract.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    b = big.withColumn("_salt", _row_salt(big, n_salt))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    joined = b.join(s, on=[on, "_salt"], how=how).drop("_salt")
    return joined
