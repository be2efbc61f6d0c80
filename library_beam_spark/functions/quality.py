"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", table A1 — the de-facto standard
pretraining quality filter, reused by MassiveText/RefinedWeb/Dolma).

Every rule is a deterministic built-in expression over the token array —
no UDF, no shuffle; the filter folds into the scan at any scale. The
token array is bound once as a higher-order-function lambda variable
(CollapseProject would otherwise recompute the tokenizer per rule — see
operators/winnowing._bound).

Rules implemented (thresholds are the published ones):
- word count in [50, 100_000]
- mean word length in [3, 10]
- symbol-to-word ratio (``#`` or ``...``) < 0.1
- fraction of words containing an alphabetic character > 0.80
- at least 2 distinct required stopwords present ("stop word filter")
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..util import bind_once as _bound
from .portable import pround
from .text import tokenize

#: Gopher's required-stopword list (the published filter uses these 8).
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_FRAC = 0.80
MIN_STOPWORD_HITS = 2



def gopher_features(text: Column) -> Column:
    """Struct of the raw rule features + the final ``passes`` verdict."""
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), 0))
    stops = F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS])

    def build(w: Column) -> Column:
        n = F.size(w)
        safe_n = F.greatest(n, F.lit(1))
        mean_len = pround(
            F.aggregate(w, F.lit(0).cast("bigint"),
                        lambda acc, x: acc + F.length(x)) / safe_n,
            4,
        )
        alpha_frac = pround(
            F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / safe_n, 4
        )
        sym_ratio = pround(n_symbols / safe_n, 4)
        n_stop = F.size(F.array_intersect(F.array_distinct(w), stops))
        passes = (
            n.between(MIN_WORDS, MAX_WORDS)
            & mean_len.between(MIN_MEAN_LEN, MAX_MEAN_LEN)
            & (sym_ratio < MAX_SYMBOL_RATIO)
            & (alpha_frac > MIN_ALPHA_FRAC)
            & (n_stop >= MIN_STOPWORD_HITS)
        )
        return F.struct(
            n.alias("word_count"),
            mean_len.alias("mean_word_len"),
            sym_ratio.alias("symbol_ratio"),
            alpha_frac.alias("alpha_frac"),
            n_stop.alias("n_stopwords"),
            passes.alias("passes"),
        )

    return _bound(tokenize(text), build)


def gopher_filter(df, text_col: str = "text"):
    """Rows passing every Gopher rule."""
    return df.where(gopher_features(F.col(text_col)).getField("passes"))


def sql_gopher_features(words_expr: str, text_expr: str = "text") -> dict[str, str]:
    """DuckDB twins of each feature, keyed by output column name."""
    stops = "[" + ", ".join(f"'{s}'" for s in REQUIRED_STOPWORDS) + "]"
    n = f"len({words_expr})"
    safe_n = f"GREATEST({n}, 1)"
    mean_len = (
        f"FLOOR((list_sum(list_transform({words_expr}, x -> CAST(length(x) AS BIGINT)))"
        f" / {safe_n}) * 10000.0 + 0.5) / 10000.0"
    )
    alpha = (
        f"FLOOR((len(list_filter({words_expr}, x -> regexp_matches(x, '[a-z]')))"
        f" / {safe_n}) * 10000.0 + 0.5) / 10000.0"
    )
    sym = (
        f"FLOOR((len(regexp_extract_all({text_expr}, '#|\\.\\.\\.'))"
        f" / {safe_n}) * 10000.0 + 0.5) / 10000.0"
    )
    n_stop = f"len(list_intersect(list_distinct({words_expr}), {stops}))"
    passes = (
        f"({n} BETWEEN {MIN_WORDS} AND {MAX_WORDS}"
        f" AND ({mean_len}) BETWEEN {MIN_MEAN_LEN} AND {MAX_MEAN_LEN}"
        f" AND ({sym}) < {MAX_SYMBOL_RATIO}"
        f" AND ({alpha}) > {MIN_ALPHA_FRAC}"
        f" AND ({n_stop}) >= {MIN_STOPWORD_HITS})"
    )
    return {
        "word_count": f"CAST({n} AS INTEGER)",
        "mean_word_len": mean_len,
        "symbol_ratio": sym,
        "alpha_frac": alpha,
        "n_stopwords": f"CAST({n_stop} AS INTEGER)",
        "passes": passes,
    }


# ---------------------------------------------------------------------------
# Repetition rules (Gopher table A1's "repetitious text" family)
# ---------------------------------------------------------------------------

#: Gopher flags documents whose most frequent word 2-gram covers > 0.20
#: of the bigram stream, or with > 0.30 duplicate words.
MAX_TOP_BIGRAM_FRAC = 0.20
MAX_DUP_WORD_FRAC = 0.30


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition features:

    - ``dup_word_frac``: 1 − distinct/total words (map-side);
    - ``top_bigram`` / ``top_bigram_n`` / ``top_bigram_frac``: the modal
      word 2-gram and its share of the bigram stream — computed by
      explode → count → per-doc top-1 window (ONE shuffle keyed on
      (doc, gram) with map-side partial counts; the all-array
      alternative is O(n²) per row);
    - ``repetitive``: either threshold tripped.

    Ties on the modal bigram break lexicographically — deterministic on
    both engines. Documents with < 2 words get ('' , 0, 0.0).
    """
    from pyspark.sql import Window

    wds = tokenize(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(wds).alias("_nw"),
        F.size(F.array_distinct(wds)).alias("_nu"),
        wds.alias("_w"),
    )

    bigrams = base.select(
        id_col,
        F.explode(
            F.when(
                F.col("_nw") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("_nw") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_g"),
    )
    counts = bigrams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_n"), F.asc("_g"))
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_g").alias("top_bigram"), F.col("_n").alias("top_bigram_n"))
    )

    dup_frac = pround(1 - F.col("_nu") / F.greatest(F.col("_nw"), F.lit(1)), 6)
    top_frac = pround(
        F.coalesce(F.col("top_bigram_n"), F.lit(0))
        / F.greatest(F.col("_nw") - 1, F.lit(1)),
        6,
    )
    return (
        base.drop("_w")
        .join(top, on=id_col, how="left")
        .select(
            id_col,
            dup_frac.alias("dup_word_frac"),
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_n", F.lit(0)).cast("bigint").alias("top_bigram_n"),
            top_frac.alias("top_bigram_frac"),
            (
                (dup_frac > MAX_DUP_WORD_FRAC) | (top_frac > MAX_TOP_BIGRAM_FRAC)
            ).alias("repetitive"),
        )
    )
