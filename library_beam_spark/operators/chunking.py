"""Overlapping context-window chunking (RAG / long-document splitting).

Retrieval and long-context training pipelines split each document into
fixed-size token windows with overlap (stride < size), so that content
near a chunk boundary is fully contained in at least one chunk. This is
the standard RAG chunker (LangChain/LlamaIndex defaults are the same
shape) expressed as a pure Spark projection:

- tokenize → one array column, bound ONCE via ``util.bind_once`` (the
  CollapseProject-recompute trap: the word array is referenced by every
  emitted chunk);
- chunk starts are ``sequence(0, n-1, stride)`` — generated in-row, no
  join, no driver loop;
- each chunk is an ``F.slice`` of the bound array; explode yields the
  (doc, chunk_idx) grain.

Scale notes (100 TB): the whole operator is scan → project → generate
(explode) — zero shuffles, stays in WholeStageCodegen except the
explode itself, and the output grain is bounded by
``ceil(n_words / stride)`` per document. Column pruning still reaches
the parquet scan (only id + text are read).

Determinism: starts/slices are pure functions of the word array, so the
chunk set is reproducible and engine-portable (DuckDB twin:
``generate_series(1, len(w), stride)`` + array slicing — see
registry.chunk_overlap_windows).

Tail semantics: the last chunks may be shorter than ``size`` (a trailing
window is emitted for every start < n_words). A start whose window is
entirely covered by the previous chunk can only arise when
stride > size, which is rejected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from ..util import bind_once


def overlapping_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
    words_col: Column | None = None,
) -> DataFrame:
    """Split ``text_col`` into overlapping word windows.

    Returns one row per (document, chunk): ``id_col``, ``chunk_idx``
    (0-based, = start // stride), ``n_words`` (<= size; shorter at the
    tail) and ``chunk_text`` (space-joined). Documents with no tokens
    produce no rows. ``words_col`` overrides the default tokenizer with a
    caller-supplied array<string> column.
    """
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    words = words_col if words_col is not None else tokenize(F.col(text_col))

    def chunks_of(w: Column) -> Column:
        starts = F.sequence(F.lit(0), F.size(w) - 1, F.lit(stride))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("int").alias("chunk_idx"),
                F.slice(w, s + 1, size).alias("w"),
            ),
        )

    exploded = (
        # Pre-filter empty docs BEFORE building chunk starts: sequence()
        # with stop < start and a positive step is an error under ANSI.
        df.where(F.size(words) > 0)
        .select(F.col(id_col), bind_once(words, chunks_of).alias("_chunks"))
        .select(id_col, F.explode("_chunks").alias("c"))
    )
    return exploded.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.w").cast("int").alias("n_words"),
        F.array_join("c.w", " ").alias("chunk_text"),
    )
