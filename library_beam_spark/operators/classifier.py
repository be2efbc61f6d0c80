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
    return spark.createDataFrame(
        weights, "token string, weight_milli bigint"
    )


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
