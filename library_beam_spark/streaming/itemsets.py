"""Streaming frequent itemsets — the Apriori lattice maintained as
BASKETS arrive (whole baskets per micro-batch: an in-basket combination
can only be derived when its basket is complete, so the stream contract
is basket-atomic arrival — the same whole-unit contract the CC fold
states for orders).

The fold is a plain mergeable COUNT: per batch, enumerate each new
basket's distinct items, pairs and triples (the batch operator's
in-basket joins, run on the batch only) and ADD them into the committed
per-itemset counts, plus the basket tally. Counts are associative and
commutative, so the fold is order-free; redelivered batches are dropped
by the batch-id commit check (exactly-once via the shared atomic
CURRENT-pointer).

State grain — stated plainly: the fold keeps RAW counts for every
itemset ever observed in a basket (no Apriori prune: a combination
below today's threshold may cross it tomorrow, so pruning state would
make the fold lossy). The batch operator prunes mid-flight because it
re-scans; the stream trades that state for single-pass incrementality.
For dimension-valued items (brands here) the lattice is vocabulary-
bounded (|V| + |V|²/2 + |V|³/6 keys at worst); for open-vocabulary
items the k=3 tier is the cost driver and ``max_k=2`` is the scale
knob.

Support thresholding is a RESULT-time view (ceil(frac · n_baskets)
over the committed tally), so one state serves any threshold —
the same late-binding the KMV/theta folds use.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _check_config, _commit, _read_meta


def _batch_counts(batch: DataFrame, max_k: int) -> DataFrame:
    """(itemset, k, cnt) for one micro-batch's whole baskets."""
    b = batch.select(
        F.col("basket_id").alias("bid"), F.col("item").alias("it")
    ).distinct()
    out = b.groupBy(F.col("it").alias("itemset")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn("k", F.lit(1))
    if max_k >= 2:
        p1, p2 = b.alias("p1"), b.alias("p2")
        pairs = p1.join(
            p2,
            (F.col("p1.bid") == F.col("p2.bid"))
            & (F.col("p1.it") < F.col("p2.it")),
        ).select(
            F.col("p1.bid").alias("bid"),
            F.col("p1.it").alias("a"),
            F.col("p2.it").alias("b"),
        )
        out = out.unionByName(
            pairs.groupBy(
                F.concat_ws("|", "a", "b").alias("itemset")
            ).agg(F.count(F.lit(1)).alias("cnt")).withColumn("k", F.lit(2))
        )
        if max_k >= 3:
            t1, t2 = pairs.alias("t1"), pairs.alias("t2")
            triples = t1.join(
                t2,
                (F.col("t1.bid") == F.col("t2.bid"))
                & (F.col("t1.a") == F.col("t2.a"))
                & (F.col("t1.b") < F.col("t2.b")),
            ).select(
                F.col("t1.a").alias("a"),
                F.col("t1.b").alias("b"),
                F.col("t2.b").alias("c"),
            )
            out = out.unionByName(
                triples.groupBy(
                    F.concat_ws("|", "a", "b", "c").alias("itemset")
                ).agg(F.count(F.lit(1)).alias("cnt")).withColumn(
                    "k", F.lit(3)
                )
            )
    return out.select("itemset", "k", F.col("cnt").cast("bigint").alias("cnt"))


def itemsets_stream_batches(index_dir: str, max_k: int = 3):
    """``writeStream.foreachBatch`` body factory (module docstring).
    Batch schema: (basket_id, item). Committed state at
    ``index_dir/batch=N``: counts/ (itemset, k, cnt) and a 1-row
    baskets/ tally."""
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    cfg = {"max_k": max_k}

    def step(batch: DataFrame, batch_id: int) -> None:
        committed, base = _read_meta(index_dir)
        _check_config(
            index_dir,
            cfg,
            "itemsets_stream_batches",
            "lattice depth would silently change mid-stream; restart "
            "with the same max_k or a fresh index_dir",
        )
        if batch_id <= committed:
            return
        spark = batch.sparkSession
        counts = _batch_counts(batch, max_k)
        nb = batch.select("basket_id").distinct().count()
        prev_dir = os.path.join(index_dir, f"batch={committed}")
        if committed >= 0 and not os.path.isdir(prev_dir):
            # fail-loud discipline: a committed pointer whose state
            # partition vanished is external corruption — silently
            # rebuilding from only the new batch would commit wrong
            # cumulative counts under the same pointer protocol
            raise RuntimeError(
                f"committed pointer batch={committed} has no state "
                f"directory under {index_dir} — state store corrupted; "
                "refusing to fold from a partial prefix"
            )
        if committed >= 0:
            counts = counts.unionByName(
                spark.read.parquet(os.path.join(prev_dir, "counts"))
            )
            nb += (
                spark.read.parquet(os.path.join(prev_dir, "baskets"))
                .collect()[0]["n_baskets"]
            )
        merged = counts.groupBy("itemset", "k").agg(
            F.sum("cnt").cast("bigint").alias("cnt")
        )
        out = os.path.join(index_dir, f"batch={batch_id}")
        try:
            merged.write.mode("overwrite").parquet(
                os.path.join(out, "counts")
            )
            spark.createDataFrame(
                [(nb,)], "n_baskets bigint"
            ).write.mode("overwrite").parquet(os.path.join(out, "baskets"))
        except Exception:
            shutil.rmtree(out, ignore_errors=True)
            raise
        _commit(index_dir, batch_id, batch_id, cfg)
        for j in range(base, batch_id):
            shutil.rmtree(
                os.path.join(index_dir, f"batch={j}"), ignore_errors=True
            )

    return step


def itemsets_result(spark, index_dir: str, frac: float = 0.005) -> DataFrame:
    """Result-time threshold view: (itemset, k, support) with support ≥
    ceil(frac · committed basket tally)."""
    import math

    committed, _ = _read_meta(index_dir)
    if committed < 0:
        raise ValueError(f"no committed state in {index_dir}")
    d = os.path.join(index_dir, f"batch={committed}")
    nb = spark.read.parquet(os.path.join(d, "baskets")).collect()[0][
        "n_baskets"
    ]
    s = math.ceil(frac * nb)
    return (
        spark.read.parquet(os.path.join(d, "counts"))
        .filter(F.col("cnt") >= s)
        .select("itemset", "k", F.col("cnt").alias("support"))
    )
