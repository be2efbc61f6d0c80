"""DSIR — Data Selection via Importance Resampling (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS 2023)
over hashed n-gram features, fully relational.

The canonical LLM pre-training data-selection recipe: given a small
TARGET corpus (the distribution you want — curated text) and a large
RAW corpus, estimate bag-of-hashed-ngram distributions p̂_target and
p̂_raw, weight every raw document by its log importance ratio
log(p̂_t/p̂_r) summed over its grams, then GUMBEL TOP-K resample — which
draws without replacement proportionally to the importance weights
instead of greedily taking the top (greedy selection collapses onto
near-duplicates of the target; the paper resamples for exactly this
reason).

Relational shape (100 TB discipline):

1. **Features** — unigram + bigram hashes bucketed mod ``buckets``:
   ONE pass over text (explode → groupBy (doc, bucket), map-side
   partial aggregation), pinned at ≤ buckets rows/doc
   (:func:`dsir_bucket_counts`) — every later stage is count-grain.
   No vocabulary is materialized anywhere — that is the point of
   hashing (production runs 10⁴-10⁵ buckets; tests use 64).
2. **Distributions** — per-bucket target and raw gram counts are sums
   of c over the pinned table (target membership is a broadcast flag);
   the bucket table is ``buckets`` rows — broadcast.
3. **Log ratios** — add-one smoothing, and the ratio argument is a
   product of EXACT BIGINT-derived doubles
   ((c_t+1)·(T_r+B)) / ((c_r+1)·(T_t+B)) — every factor ≤ ~2^53 so
   both engines take LN of bit-identical doubles; the result is
   portably rounded to 1e-6 (the engine log discipline
   q:bigram_cross_entropy established).
4. **Per-doc weight** — join the (doc, bucket, c) counts against the
   broadcast ratio table; each term c·ratio is an exact multiple of
   1e-6, summed with ``dsum`` (exact integer accumulation) — partition
   order can never flip a bit.
5. **Resample** — per-doc Gumbel g = −ln(−ln(u)) from the engine's
   hash-derived uniform (operators/sampling.hash_value), portably
   rounded; key = logw + g (two exact 1e-6 multiples); global top-k =
   orderBy + limit → TakeOrderedAndProject (per-partition heaps).

Documents with zero grams have no feature rows and are not candidates
(no information to weigh them by) — both engines share the rule by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import dsum, pround
from ..functions.text import tokenize
from ..util import ensure_min_parallelism, pin
from .sampling import HASH_SPACE, hash_value

__all__ = [
    "doc_grams",
    "dsir_bucket_counts",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_select",
]


def doc_grams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, gram) exploded unigrams + word bigrams (analyzer
    tokenization). One pass, no shuffle."""
    w = tokenize(F.col(text_col))

    def bigrams(words: Column) -> Column:
        return F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - F.lit(1)),
                lambda i: F.concat_ws(
                    " ", F.get(words, i - 1), F.get(words, i)
                ),
            ),
        ).otherwise(F.array())

    grams = F.concat(w, bigrams(w))
    return ensure_min_parallelism(docs).select(
        F.col(id_col), F.explode(grams).alias("gram")
    )


def dsir_bucket_counts(
    docs: DataFrame,
    target_ids: DataFrame,
    buckets: int = 64,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, c, _t): per-document hashed-bucket gram counts with
    the target-membership flag — the ONE materialization every later
    DSIR stage derives from (r7 sweep lesson: evaluating the gram
    explode separately for the distribution pass and the weighting
    pass doubled the dominant cost; this table is ≤ ``buckets`` rows
    per document, pinned, and everything downstream is count-grain).
    The explode itself rides ensure_min_parallelism — document parquet
    at coarse file splits would otherwise run the tokenize on a
    handful of tasks."""
    g = doc_grams(docs, id_col, text_col)
    counts = (
        g.select(
            id_col,
            F.pmod(
                hash_value(F.col("gram"), salt), F.lit(buckets)
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return pin(
        counts.join(
            F.broadcast(
                target_ids.select(F.col(id_col), F.lit(True).alias("_t"))
            ),
            id_col,
            "left",
        ).withColumn("_t", F.coalesce("_t", F.lit(False)))
    )


def dsir_log_ratios(
    counts: DataFrame,
    buckets: int = 64,
    digits: int = 6,
) -> DataFrame:
    """(bucket, ratio): smoothed per-bucket log importance ratio
    ln(p̂_target[b] / p̂_raw[b]) — ``buckets`` rows, derived entirely
    from the count-grain table of :func:`dsir_bucket_counts` (sums of
    c, never a second pass over text). "Raw" is every non-target gram
    occurrence."""
    per_bucket = counts.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("ct"),
        F.sum(F.when(~F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("cr"),
    )
    totals = counts.agg(
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("tt"),
        F.sum(F.when(~F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("tr"),
    )
    # exact-integer ratio argument: ((ct+1)(tr+B)) / ((cr+1)(tt+B));
    # factors < 2^53, so the LN argument is bit-identical cross-engine
    num = (F.col("ct") + F.lit(1)).cast("double") * (
        F.col("tr") + F.lit(buckets)
    ).cast("double")
    den = (F.col("cr") + F.lit(1)).cast("double") * (
        F.col("tt") + F.lit(buckets)
    ).cast("double")
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket", pround(F.log(num / den), digits).alias("ratio")
    )


def dsir_weights(
    docs: DataFrame,
    target_ids: DataFrame,
    buckets: int = 64,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """(id, logw) for every NON-target document with at least one gram:
    logw = Σ_b c_b · ln(p̂_t[b]/p̂_r[b]). Terms are exact 1e-6 multiples
    accumulated with dsum — deterministic under any partitioning. Text
    is read ONCE (dsir_bucket_counts); the ratio table is ``buckets``
    rows and broadcast."""
    counts = dsir_bucket_counts(
        docs, target_ids, buckets, salt, id_col, text_col
    )
    ratios = dsir_log_ratios(counts, buckets, digits)
    return (
        counts.where(~F.col("_t"))
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(dsum(F.col("c") * F.col("ratio"), digits).alias("logw"))
    )


def dsir_select(
    docs: DataFrame,
    target_ids: DataFrame,
    k: int = 100,
    buckets: int = 64,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """(id, logw, sel_key): the ``k`` raw documents drawn by Gumbel
    top-k — P(doc) ∝ exp(logw), without replacement — the paper's
    resampling step (greedy top-logw collapses onto near-copies of the
    target; perturbed keys sample diversely). The Gumbel uses the
    engine's deterministic hash uniform, so both engines draw the
    identical sample; the global top-k plans as
    TakeOrderedAndProject. The uniform maps hash ∈ [0, HASH_SPACE) to
    the OPEN interval via (h + 0.5)/HASH_SPACE: h = HASH_SPACE-1 under
    the naive (h+1)/HASH_SPACE form hits u = 1.0 exactly, where
    -ln(-ln(u)) takes ln(0) — Spark NULLs the key (doc silently
    dropped) while strict engines raise, so the two sides diverge."""
    w = dsir_weights(
        docs, target_ids, buckets, salt, id_col, text_col, digits
    )
    u = (
        hash_value(F.col(id_col), salt + ":gumbel") + F.lit(0.5)
    ) / F.lit(float(HASH_SPACE))
    g = pround(-F.log(-F.log(u)), digits)
    return (
        w.select(
            id_col,
            "logw",
            pround(F.col("logw") + g, digits).alias("sel_key"),
        )
        .orderBy(F.desc("sel_key"), F.asc(id_col))
        .limit(k)
    )
