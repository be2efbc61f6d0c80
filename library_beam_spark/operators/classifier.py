"""Linear text classifier application at corpus scale — the
"fasttext-style quality model" leg of an LLM data pipeline (score every
document with a trained linear model, gate on the sign).

The heuristic quality scorers (functions/quality.py) are closed-form
per-row expressions; this operator covers the *model-driven* form: a
vocabulary→weight table learned offline, applied as

    score(doc) = bias + Σ_token weight[token]        (per occurrence)

Spark-first application shape — the one that survives a million-word
vocabulary where a literal in-expression map cannot:

1. explode the tokenized corpus once (the same single corpus pass every
   explode-family operator here uses);
2. equi-join the weight table on the token — Catalyst broadcasts while
   the model fits (the plan test pins it), and degrades to a shuffle
   join for embedding-matrix-sized vocabularies with NO code change;
3. per-doc partial-agg SUM — map-side combine keeps the shuffle at
   O(docs), not O(tokens).

Weights are INTEGER milli-units end to end: scores are exact BIGINTs,
so label boundaries cannot float-flip between engines (the dsum
lesson, functions/portable.py). Documents with zero vocabulary hits
still score (bias alone) via left join + coalesce.

The default model here is a deterministic seed-derived weight table
(crc32-keyed over the engine's common-words corpus) — a stand-in with
the exact mechanics of a trained model; swap ``weights`` for real
coefficients without touching the plan.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = ["seed_weights", "weights_df", "score_documents"]


def seed_weights(n: int = 400) -> list[tuple[str, int]]:
    """Deterministic (token, weight_milli) pairs: every 10th common word
    by crc32 bucket, weight in [-1000, 1000] milli-units. Pure function
    of the corpus list — both engines' tables are literal twins."""
    from ..kernels.corpora import COMMON_WORDS_FULL

    out = []
    for w in sorted(COMMON_WORDS_FULL):
        h = zlib.crc32(w.encode("utf-8"))
        if h % 10 == 0:
            out.append((w, (h // 10) % 2001 - 1000))
            if len(out) == n:
                break
    return out


def weights_df(
    spark: SparkSession, weights: list[tuple[str, int]]
) -> DataFrame:
    from ..util import local_df

    return local_df(spark, weights, "token string, weight_milli bigint")


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    bias_milli: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_weights: bool = True,
) -> DataFrame:
    """(id, score_milli, n_hits, label): exact integer score per doc,
    ``label`` = score > 0.

    ``broadcast_weights`` pins the hint explicitly — a weight table
    built from ``createDataFrame`` carries no stats, so Catalyst would
    otherwise shuffle the *exploded corpus* on the token key (observed:
    SortMergeJoin over every token occurrence). Set False only when the
    model genuinely exceeds executor memory; the join then degrades to
    the shuffle form by design.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    w = F.broadcast(weights) if broadcast_weights else weights
    scored = (
        toks.join(w, "token", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("weight_milli", F.lit(0))).alias("_w"),
            F.count("weight_milli").alias("n_hits"),
        )
        .select(
            id_col,
            (F.col("_w") + F.lit(bias_milli)).alias("score_milli"),
            "n_hits",
        )
    )
    # docs with NO tokens at all (empty text) never reach the groupBy;
    # restore them at bias score via a left join from the doc spine
    spine = docs.select(id_col)
    return (
        spine.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("score_milli", F.lit(bias_milli)).alias("score_milli"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (
                F.coalesce("score_milli", F.lit(bias_milli)) > 0
            ).alias("label"),
        )
    )


# ---------------------------------------------------------------------------
# In-engine training: hard-sigmoid logistic regression
# ---------------------------------------------------------------------------

_LR_STOPS = ("the", "of", "and", "to", "in", "a", "is", "for", "with", "that")


def lr_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The 3-feature quality design matrix both engines can derive
    bit-identically: every feature is a ratio of EXACT INTEGERS (word
    count, character mass, stopword hits), so the doubles agree with the
    SQL twin without any rounding step. Rows with zero words are
    excluded (no ratio exists). Returns (doc_id, y, f1, f2, f3):
    y = 1 when n_chars > 400 (a length-derived label the trainer can
    demonstrably learn), f1 = words/100, f2 = mean word length / 10,
    f3 = stopword ratio — all scaled into the same ~unit range so one
    learning rate serves every coordinate."""
    w = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    nw = F.size("_w")
    chars = F.aggregate(
        F.transform("_w", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    stops = F.size(
        F.filter("_w", lambda x: x.isin(*_LR_STOPS))
    )
    return (
        docs.withColumn("_w", w)
        .where(F.size("_w") > 0)
        .select(
            "doc_id",
            F.when(F.col("n_chars") > 400, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
            (nw / F.lit(100.0)).alias("f1"),
            (chars / (nw * F.lit(10.0))).alias("f2"),
            (stops / nw).alias("f3"),
        )
    )


def train_hard_sigmoid_lr(
    feats: DataFrame,
    iters: int = 20,
    lr: float = 4.0,
    dsum_scale: int = 6,
) -> tuple[list[float], float, int]:
    """Full-batch gradient descent on hard-sigmoid logistic regression —
    in-engine MODEL TRAINING with the same cross-engine determinism
    contract as the analytical operators (pagerank's integer rank mass,
    OLS's exact moments):

    - the link is the HARD sigmoid clamp(0.5 + z/4, 0, 1): pure
      arithmetic, so no libm exp() whose last-ulp behavior differs
      between engines — the standard trick for portable fixed-point
      logistic training;
    - z accumulates in one fixed expression order
      (((w1·f1 + w2·f2) + w3·f3) + b), mirrored in the SQL replay;
    - gradient sums use ``dsum`` (addends rounded to exact integers,
      summed associatively) — partition order can never flip a bit;
    - weight updates happen on the driver on the exact aggregate
      values: w += lr·(Σerr·f / n), the same IEEE ops the oracle's
      unrolled iteration CTEs perform.

    Per iteration: ONE aggregation job (4 dsum columns + count) — the
    corpus never moves; driver traffic is 5 scalars/round. Returns
    ([w1, w2, w3], bias, n_rows)."""
    from ..functions.portable import dsum

    w = [0.0, 0.0, 0.0]
    b = 0.0
    n = 0
    for _ in range(iters):
        z = (
            (F.col("f1") * F.lit(w[0]) + F.col("f2") * F.lit(w[1]))
            + F.col("f3") * F.lit(w[2])
        ) + F.lit(b)
        p = F.greatest(
            F.lit(0.0), F.least(F.lit(1.0), F.lit(0.5) + z / F.lit(4.0))
        )
        err = F.col("y") - p
        row = feats.agg(
            dsum(err * F.col("f1"), dsum_scale).alias("g1"),
            dsum(err * F.col("f2"), dsum_scale).alias("g2"),
            dsum(err * F.col("f3"), dsum_scale).alias("g3"),
            dsum(err, dsum_scale).alias("gb"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = row["n"]
        w = [
            w[0] + lr * (row["g1"] / n),
            w[1] + lr * (row["g2"] / n),
            w[2] + lr * (row["g3"] / n),
        ]
        b = b + lr * (row["gb"] / n)
    return w, b, n


def hard_sigmoid_quality(
    docs: DataFrame,
    w: list[float],
    b: float,
    text_col: str = "text",
    out_col: str = "quality",
    digits: int = 6,
) -> DataFrame:
    """Apply TRAINED hard-sigmoid LR weights to documents: appends
    ``out_col`` = pround(clamp(0.5 + z/4, 0, 1)) over the same
    3-feature design matrix as :func:`lr_features` (word count /
    mean word length / stopword ratio — label-free, so no ``n_chars``
    requirement: the scoring path serves streams that carry only
    text). Documents with ZERO words are excluded — no ratio features
    exist for them, the same rule the trainer applies. The z expression
    accumulates in the trainer's fixed order, so an oracle replaying
    the training trajectory scores identical bits."""
    from ..functions.portable import pround

    wcol = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    nw = F.size("_w")
    chars = F.aggregate(
        F.transform("_w", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    stops = F.size(F.filter("_w", lambda x: x.isin(*_LR_STOPS)))
    f1 = nw / F.lit(100.0)
    f2 = chars / (nw * F.lit(10.0))
    f3 = stops / nw
    z = ((f1 * F.lit(w[0]) + f2 * F.lit(w[1])) + f3 * F.lit(w[2])) + F.lit(b)
    q = pround(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.lit(0.5) + z / F.lit(4.0))),
        digits,
    )
    return (
        docs.withColumn("_w", wcol)
        .where(F.size("_w") > 0)
        .withColumn(out_col, q)
        .drop("_w")
    )
