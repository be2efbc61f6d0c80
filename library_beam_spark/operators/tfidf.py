"""TF-IDF term scoring — the classic corpus-statistics operator a
training-data pipeline uses for keyword extraction, quality weighting,
and boilerplate detection.

No reference twin (the reference's analyzer is an ES-side concern); this
is part of the LLM-data surface (SURVEY §6).

Scale shape (100 TB):
- term frequencies: one explode + groupBy(doc, term) with map-side
  partial aggregation;
- document frequencies: a second groupBy over the (doc, term) pairs —
  output is vocabulary-sized, orders of magnitude smaller than the
  corpus, so it is **broadcast** back; the corpus-sized side is never
  shuffled a second time;
- the corpus document count joins in as a broadcast scalar;
- top-k per document is a bounded window keyed on doc_id (k rows kept
  per key; the alternative max_by-struct form trades readability for
  one fewer sort and is not worth it at k≤10).
At web scale the vocabulary of a cleaned corpus is tens of millions of
terms (~hundreds of MB) — still broadcastable; past that, switch the
idf join to a shuffle hash join by passing ``broadcast_idf=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..util import ensure_min_parallelism
from .dedup import _words


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword score per document for a FIXED query term list.

    Designed for oracle-grade determinism: per-term tf comes from an
    in-row array filter (no explode), the per-term partial scores sum in
    the FIXED term order as one expression — never a float aggregation
    whose partition order Spark doesn't pin — and the corpus stats
    (N, per-term df, total length) are exact integer aggregates joined
    in as a broadcast single row. Scale: one pass over the corpus for
    stats, one for scores; nothing shuffles but the 1-row stats.

    Returns (id, bm25) for documents matching ≥1 term.
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    w = _words(F.col(text_col))
    tf_cols = [
        F.size(F.filter(w, lambda x: x == F.lit(t))).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    base = ensure_min_parallelism(df).select(
        F.col(id_col), F.size(w).alias("_len"), *tf_cols
    )
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_len").alias("_tot_len"),
            *[
                F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
                for i in range(len(terms))
            ],
        )
    )
    scored = base.crossJoin(stats)
    n = F.col("_n").cast("double")
    avglen = F.col("_tot_len").cast("double") / n
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        denom = tf + k1 * (1.0 - b + b * F.col("_len").cast("double") / avglen)
        score = score + idf * (tf * (k1 + 1.0)) / denom
    tf_cols_out = [F.col(f"_tf{i}") for i in range(len(terms))]
    # greatest() needs ≥2 columns; a single-term query matches on its tf
    matched = (
        tf_cols_out[0] if len(tf_cols_out) == 1 else F.greatest(*tf_cols_out)
    ) > 0
    return scored.where(matched).select(
        F.col(id_col), score.alias("bm25")
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_idf: bool = True,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tfidf = tf · ln(N / df) with raw counts (no smoothing — every term
    scored appears in ≥1 doc so df ≥ 1). Ties break by term text so the
    result is total-ordered and oracle-comparable.
    Returns (id, term, tf, tfidf) with tfidf portable-rounded to 1e-6.
    """
    words = ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_df"))
    if broadcast_idf:
        dfreq = F.broadcast(dfreq)
    total = F.broadcast(df.agg(F.count(F.lit(1)).alias("n_docs")))
    score = (
        F.col("tf")
        * F.log(F.col("n_docs").cast("double") / F.col("n_df").cast("double"))
    )
    w = Window.partitionBy(id_col).orderBy(score.desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(total)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("bigint").alias("tf"),
            pround(score, 6).alias("tfidf"),
        )
    )
