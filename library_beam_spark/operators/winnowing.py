"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS algorithm).

Hash every word k-gram, slide a window of ``w`` consecutive hashes, and
keep the minimum of each window. The selected set is a *local* document
fingerprint with the guarantee that any shared run of at least
``w + k - 1`` words between two documents yields at least one shared
fingerprint — the standard primitive for plagiarism / contamination
detection where MinHash (a *global* sketch) can't localize the overlap.

Spark-first: the whole pipeline is array expressions inside one
projection — tokenize → transform(k-grams) → transform(md5-prefix
hashes) → transform(window array_min) → array_distinct → explode. No
shuffle at all until the caller aggregates; WholeStageCodegen keeps it
JVM-side, and at 100 TB the cost is the scan plus O(len·w) arithmetic
per document.

The gram hash is the engine-portable 24-bit md5 prefix
(operators/sampling.hash_value), so a DuckDB oracle reproduces the exact
fingerprint values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..util import bind_once as _bound
from ..util import ensure_min_parallelism
from .sampling import hash_value


def _gram_hash_expr(wds: Column, k: int, salt: str) -> Column:
    """Ordered (non-distinct) k-gram hash array over a bound token array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(wds) - k + 1),
        lambda i: F.concat_ws(" ", F.slice(wds, i, k)),
    )
    # sequence(1, n) counts DOWN when n < 1 — guard short docs explicitly
    grams = F.when(F.size(wds) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.transform(grams, lambda g: hash_value(g, salt))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    salt: str = "win",
) -> DataFrame:
    """(id, fingerprint) rows — the distinct window-minimum hash set.

    Documents with fewer than ``w`` k-grams (but at least one) get the
    single global minimum; gram-less documents produce no rows.
    """
    def _select(h: Column) -> Column:
        n_win = F.size(h) - w + 1
        return (
            F.when(
                n_win >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda j: F.array_min(F.slice(h, j, w)),
                ),
            )
            .when(F.size(h) >= 1, F.array(F.array_min(h)))
            .otherwise(F.array().cast("array<bigint>"))
        )

    fps = _bound(
        tokenize(F.col(text_col)),
        lambda wds: _bound(_gram_hash_expr(wds, k, salt), _select),
    )
    return ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias("fingerprint")
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_common: int = 2,
    salt: str = "win",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_common`` winnowing fingerprints —
    overlap-detection over the fingerprint inverted index. Equi-join on
    the fingerprint value (same shape as the shingle candidate join in
    dedup.ngram_jaccard_pairs, and amenable to the same df-cutoff if a
    fingerprint ever goes hot)."""
    fp = winnow_fingerprints(df, text_col, id_col, k=k, w=w, salt=salt)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, on="fingerprint")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
