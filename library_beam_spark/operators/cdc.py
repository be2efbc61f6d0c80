"""Content-defined chunking (CDC) dedup — the variable-size chunk
family (Muthitacharoen et al., LBFS SOSP'01; FastCDC, USENIX ATC'16),
word-grain: chunk boundaries are decided by the CONTENT (a k-gram
hash mask), not by fixed offsets, so inserting or deleting a run of
words shifts only the chunks it touches — the property fixed-width
chunking lacks and the reason storage/dedup systems (LBFS, borg,
restic) and crawl-dedup pipelines use CDC for partial-overlap
detection between document versions.

Rule (deterministic, shift-resistant): tokenize; hash every word
k-gram with the engine-portable 24-bit md5 prefix
(operators/sampling.hash_value — the DuckDB oracle replays it
digit-by-digit); a CUT falls immediately before gram position i
(2 ≤ i ≤ n−k+1) when ``hash % 2^mask_bits == 0`` — expected chunk
length 2^mask_bits tokens, geometric. Chunks are the token spans
between cuts; identity is the full md5 hex of the joined span (full
width — a 24-bit id would birthday-collide at ~4k chunks). Documents
shorter than k+1 tokens yield one whole-document chunk; empty token
lists yield none.

Spark-first: the entire chunker is ONE array-expression projection
(sequence → transform k-gram hashes → filter cuts → slice spans) —
no shuffle, WholeStageCodegen keeps it JVM-side, the
winnow_fingerprints cost shape. Dedup then shuffles once on the
chunk id with map-side partial counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..util import bind_once as _bound
from ..util import ensure_min_parallelism
from .sampling import hash_value


def _chunk_structs(wds: Column, k: int, mask: int) -> Column:
    """Array<struct(chunk_idx, start_pos, n_tokens, chunk_md5)> for a
    bound token array."""
    n = F.size(wds)
    cut_candidates = F.when(
        n - k + 1 >= 2, F.sequence(F.lit(2), n - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(
        cut_candidates,
        lambda i: hash_value(F.concat_ws(" ", F.slice(wds, i, k)), "cdc")
        % mask
        == 0,
    )
    starts = F.concat(F.array(F.lit(1)), cuts)
    ends = F.concat(F.transform(cuts, lambda c: c - 1), F.array(n))
    structs = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            s.alias("start_pos"),
            (e - s + 1).alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.slice(wds, s, e - s + 1))).alias(
                "chunk_md5"
            ),
        ),
    )
    # token-less documents produce NO chunks (not one empty chunk)
    return F.when(n > 0, structs).otherwise(
        F.array().cast(
            "array<struct<start_pos:int,n_tokens:int,chunk_md5:string>>"
        )
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    mask_bits: int = 5,
) -> DataFrame:
    """(doc_id, chunk_idx, start_pos, n_tokens, chunk_md5) rows —
    1-based token positions, chunk_idx in document order."""
    mask = 1 << mask_bits
    out = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            _bound(
                tokenize(F.col(text_col)),
                lambda w: _chunk_structs(w, k, mask),
            )
        ).alias("chunk_idx", "c"),
    )
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("c.start_pos").cast("bigint").alias("start_pos"),
        F.col("c.n_tokens").cast("bigint").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"),
    )


def cdc_duplicate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    mask_bits: int = 5,
    min_tokens: int = 4,
) -> DataFrame:
    """Cross-document duplicate chunks: chunk ids seen in ≥ 2 distinct
    documents, with occurrence/document counts and the dedup savings
    (tokens beyond the first copy). ``min_tokens`` drops trivial
    slivers the mask produces at chunk edges. One shuffle on the chunk
    id (map-side partial aggs); the long singleton tail never survives
    the HAVING."""
    ch = cdc_chunks(df, text_col, id_col, k=k, mask_bits=mask_bits)
    return (
        ch.filter(F.col("n_tokens") >= min_tokens)
        .groupBy("chunk_md5", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
        .withColumn(
            "dup_tokens",
            ((F.col("n_occurrences") - 1) * F.col("n_tokens")).cast(
                "bigint"
            ),
        )
    )
