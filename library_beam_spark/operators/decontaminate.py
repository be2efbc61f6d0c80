"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

The standard contamination rule (GPT-3 appendix C / PaLM / Llama data
cards): a training document is contaminated if it shares at least one
word n-gram (n=13 by convention) with any benchmark document. Detection
is an equi-join on shingle hashes — NOT a similarity search; a single
hit is disqualifying.

Scale shape (100 TB train / small eval): the eval side is a benchmark
suite — thousands of documents, millions of shingles at most — so its
shingle set is **broadcast**; the train side is never shuffled, and the
whole check is a map-side hash probe folded into the train scan. The
overlap report aggregates per (train, eval) pair AFTER the broadcast
join, shuffling only matched rows (contamination is rare by
construction).

Shingle keys are the 16-hex-char md5 prefix (64 bits) of the space-joined
lowercase word gram — engine-portable (DuckDB twin: ``substr(md5(g),
1, 16)``) and 5× smaller than a raw 13-word string key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..util import ensure_min_parallelism


def shingle_keys(col: Column, n: int = 13) -> Column:
    """Distinct 64-bit-hex shingle keys of the word n-grams of ``col``."""
    wds = tokenize(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(wds) - n + 1),
        lambda i: F.substring(F.md5(F.concat_ws(" ", F.slice(wds, i, n))), 1, 16),
    )
    # sequence(1, m) counts DOWN for m < 1 — short docs shingle to empty
    return F.array_distinct(
        F.when(F.size(wds) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def _exploded(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(shingle_keys(F.col(text_col), n)).alias("_key")
    )


def ngram_overlap_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, eval_id, n_common) for every contaminated pair —
    n_common counts distinct shared n-grams."""
    t = _exploded(train, train_id, text_col, n).withColumnRenamed(train_id, "train_id")
    e = _exploded(eval_df, eval_id, text_col, n).withColumnRenamed(eval_id, "eval_id")
    return (
        t.join(F.broadcast(e), on="_key")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    train_id: str = "doc_id",
    text_col: str = "text",
    eval_id: str | None = None,
    eval_text_col: str | None = None,
) -> DataFrame:
    """Training rows with every contaminated document removed (one shared
    n-gram disqualifies). Implemented as a broadcast left-anti join
    against the eval shingle set — train rows stream through unshuffled.

    ``eval_id``/``eval_text_col`` default to the train-side names; pass
    them when the eval set uses different column names."""
    e_keys = _exploded(
        eval_df, eval_id or train_id, eval_text_col or text_col, n
    ).select("_key").distinct()
    t = ensure_min_parallelism(train).withColumn(
        "_keys", shingle_keys(F.col(text_col), n)
    )
    hit = t.select(F.col(train_id), F.explode("_keys").alias("_key")).join(
        F.broadcast(e_keys), on="_key", how="left_semi"
    ).select(train_id).distinct()
    return train.join(F.broadcast(hit), on=train_id, how="left_anti")
