"""RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
Extraction from Individual Documents") — the classic unsupervised
phrase-scoring operator a training-data pipeline uses for document
labeling, topic routing, and index-term generation.

No reference twin (the reference's keyword surface is its MeSH /
chemical metadata); this extends the LLM-data text-analysis surface
(SURVEY §6) alongside TF-IDF (operators/tfidf.py).

Semantics (stated exactly so the DuckDB oracle can replay them):
- tokens = lowercased alphanumeric runs in document order (the engine's
  standard tokenization; punctuation is consumed by the split, so —
  deliberately simpler than the paper — only STOPWORDS delimit
  candidate phrases, not punctuation);
- a candidate phrase = a maximal run of consecutive non-stopword
  tokens;
- per document: freq(w) = number of phrase slots holding w,
  deg(w) = sum of the lengths of the phrases containing w (each
  occurrence counts — deg(w) >= freq(w), equality iff w only ever
  appears in singleton phrases);
- word score = deg(w)/freq(w), phrase score = sum over its member
  SLOTS (multiplicity kept) of the member's word score. Scores are
  integer-exact: deg(w)*SCALE // freq(w), summed as BIGINTs — float
  summation order never enters, so Spark and the oracle agree bit-for-
  bit;
- identical phrase texts inside one document necessarily tie (same
  member words, same per-doc stats) — the output keeps one row per
  (doc, phrase) with its occurrence count;
- top-k per document by (score DESC, phrase ASC).

Scale shape (100 TB):
- everything is keyed by doc_id: the posexplode, the segment window,
  both groupBys and the word-stats join all share the doc_id prefix —
  after the first shuffle the plan stays co-partitioned (AQE coalesces
  the tail);
- the stopword membership test is a Catalyst InSet probe (O(1) per
  token), broadcast implicitly as a literal;
- per-document state is bounded by document length; no corpus-wide
  joins exist at all, so the operator is embarrassingly parallel at
  any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _words

SCALE = 1_000_000

# Compact, frozen phrase-delimiter list (a RAKE stop list is a *phrase
# boundary* list, not an analyzer list — it must stay small and closed
# so candidate phrases keep content words). Shared verbatim with the
# registry oracle.
RAKE_STOPS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "has", "have", "in", "is", "it", "its", "of", "on", "or",
    "that", "the", "this", "to", "was", "were", "which", "will",
    "with",
]


def rake_keywords(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Top-k RAKE phrases per document.

    Returns (id_col, phrase, plen, n_occ, score_scaled) — score_scaled
    is the integer-exact phrase score at SCALE=1e6 (BIGINT).
    """
    stops = stopwords if stopwords is not None else RAKE_STOPS
    toks = df.select(
        F.col(id_col),
        F.posexplode(_words(F.col(text_col))).alias("pos", "w"),
    ).withColumn("is_stop", F.col("w").isin(stops).cast("int"))

    # phrase id = running count of stopword boundaries before this slot
    seg = toks.withColumn(
        "seg",
        F.sum("is_stop").over(
            Window.partitionBy(id_col).orderBy("pos")
        ),
    ).filter(F.col("is_stop") == 0)

    # one row per phrase: length + the ordered text
    phrases = seg.groupBy(id_col, "seg").agg(
        F.count(F.lit(1)).alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
    )

    # per-document word stats over phrase SLOTS
    wordstats = (
        seg.join(phrases.select(id_col, "seg", "plen"), [id_col, "seg"])
        .groupBy(id_col, "w")
        .agg(
            F.sum("plen").alias("deg"),
            F.count(F.lit(1)).alias("freq"),
        )
        .select(
            id_col,
            "w",
            F.expr(f"deg * {SCALE} DIV freq").alias("wscore"),
        )
    )

    scored = (
        seg.join(wordstats, [id_col, "w"])
        .groupBy(id_col, "seg")
        .agg(F.sum("wscore").alias("score_scaled"))
        .join(phrases, [id_col, "seg"])
        .groupBy(id_col, "phrase")
        .agg(
            F.max("plen").alias("plen"),
            F.count(F.lit(1)).alias("n_occ"),
            F.max("score_scaled").alias("score_scaled"),
        )
    )

    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("score_scaled").desc(), F.col("phrase")
        )
    )
    return (
        scored.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .select(
            id_col,
            "phrase",
            F.col("plen").cast("bigint").alias("plen"),
            F.col("n_occ").cast("bigint").alias("n_occ"),
            F.col("score_scaled").cast("bigint").alias("score_scaled"),
        )
    )
