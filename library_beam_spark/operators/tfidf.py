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
