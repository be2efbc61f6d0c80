"""Exact heavy hitters by two-pass candidate pruning — the
frequent-items complement to the CMS sketch (operators/cms.py): where
`cms_heavy_hitter_terms` trades exactness for one pass, this operator
returns the EXACT answer (every item with global count > n/denom, with
its exact count) while still never shuffling the long tail.

The pruning argument (Misra–Gries / lossy-counting pigeonhole): if an
item's global count exceeds n/denom, then in at least one map-side
batch its batch count exceeds n_b/denom (otherwise summing the per-
batch bound gives total ≤ n/denom). So the union of per-batch local
heavy hitters — at most `denom` items per batch, found exactly and
vectorized with a pandas value_counts, no per-row Python — is a
SUPERSET of the true heavy hitters. A second pass counts only the
candidates exactly and applies the threshold. The result is therefore
EXACT (oracle: plain GROUP BY ... HAVING), but:

Scale shape (100 TB):
- pass 1 is map-only: each Arrow batch emits ≤ denom candidate items;
  nothing data-sized ever shuffles. The candidate distinct() moves
  (batches × denom) short rows — bounded kilobytes per task;
- pass 2 broadcasts the candidate set as a semi-join filter, so the
  exact groupBy aggregates only rows belonging to ~denom-sized
  candidate vocabulary — a shuffle of at most |candidates| groups
  after map-side partial aggregation;
- the total row count is a shuffle-free scalar aggregate.
At scale, raise spark.sql.execution.arrow.maxRecordsPerBatch so the
per-batch threshold n_b/denom stays selective (bigger batches → fewer,
better-pruned candidates).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items_exact(
    df: DataFrame, item_col: str, denom: int = 200
) -> DataFrame:
    """Exact (item, cnt) for every item with count * denom > total.

    Output columns: (item_col, cnt BIGINT, total BIGINT) — total is the
    corpus size the threshold was applied against, carried so the
    result is self-describing.
    """
    if denom < 2:
        raise ValueError(f"denom must be >= 2, got {denom}")

    def local_heavy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_b = len(pdf)
            if n_b == 0:
                continue
            vc = pdf[item_col].value_counts()
            # strict: count_b * denom > n_b  (≤ denom survivors)
            cand = vc[vc * denom > n_b]
            yield pd.DataFrame({item_col: cand.index.to_numpy()})

    items = df.select(item_col)
    candidates = (
        items.mapInPandas(local_heavy, schema=items.schema).distinct()
    )
    total = items.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        items.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * denom > F.col("total"))
        .select(
            item_col,
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("total").cast("bigint").alias("total"),
        )
    )
