"""Distributed BPE tokenizer induction (learn) and application (encode).

A large-scale training-data pipeline does not just *apply* a tokenizer —
it periodically *re-learns* one from the corpus it curates (Sennrich et
al., "Neural Machine Translation of Rare Words with Subword Units",
ACL'16). The reference engine has no tokenizer-induction surface (its
tokenization is the fixed analyzer chain, SURVEY §2.8 T10/T15); this
module adds the induction step as a first-class distributed operator.

Spark-first shape — the classic two-level BPE decomposition maps cleanly
onto DataFrame ops:

1. **Corpus → word-type table, once.** BPE statistics are a function of
   the *word frequency table*, not the token stream: ``groupBy(word)``
   with map-side partial counts collapses a 100 TB corpus into a
   vocabulary-sized table (millions of rows, not trillions). Every
   subsequent iteration runs on that small table; the corpus is never
   rescanned.
2. **Per-iteration pair counts are one partial agg.** Adjacent symbol
   pairs are generated per word with a JVM-side ``transform`` over the
   symbol array (no Python, no explode of the raw corpus) and summed
   weighted by word count. The winning pair is a 1-row ``first()`` —
   the only driver transfer per iteration, O(1) bytes.
3. **Merge application is a greedy left-to-right fold** expressed with
   ``F.aggregate`` over the symbol array. NOTE: a string
   ``replace(' a a ', ' aa ')`` over a space-joined form is WRONG for
   runs (``b a a a a`` → resume-after-replacement skips the shared
   boundary space and merges only one pair; the regex form in the
   original BPE merges two). The fold reproduces the reference
   semantics exactly: scan symbols, merge when (tail == left ∧ cur ==
   right), the merged token immediately eligible as a new left.
4. **Lineage is truncated every round** with ``localCheckpoint`` —
   20 rounds of nested lambda expressions would otherwise grow the
   analyzer tree exponentially. The checkpointed table is
   vocabulary-sized, so materialization is cheap. (On a real cluster,
   ``checkpoint()`` against a durable dir survives executor loss.)

Learning yields two artifacts:
- the **merge table** (rank, left, right, merged, pair_count) — the
  tokenizer model;
- the **encoded word table** (word, wcount, syms) — every distinct
  word already segmented by all learned merges. Encoding a corpus is
  then a broadcast/equi join on ``word``, NOT a re-application of k
  merges per token (the standard fast path; ``apply_merges`` exists
  for unseen/streaming text).

Determinism contract (oracle-checked cross-engine): ties in pair counts
break by (count DESC, left ASC, right ASC) under binary UTF-8
comparison — identical in Spark and DuckDB for the [a-z0-9] alphabet
produced by ``functions.text.tokenize``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = [
    "word_symbol_table",
    "learn_bpe",
    "apply_merges",
    "encode_corpus",
]


def _chars(col: Column) -> Column:
    """Split a word into single-character symbols (array<string>)."""
    return F.filter(F.split(col, ""), lambda c: c != "")


def _merge_fold(col: Column, left: str, right: str, merged: str) -> Column:
    """Greedy left-to-right application of one merge over a symbol array.

    ``try_element_at`` (not ``element_at``) keeps the tail probe legal on
    the empty accumulator under ANSI mode — NULL never equals ``left``,
    so the first symbol always lands in the else branch.
    """
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, wcount, syms) word-type table.

    The single corpus-sized shuffle of the whole algorithm: explode
    tokenized words, partial-agg counts per word. Single-character
    words generate no pairs, so they never influence learning, but
    keeping them means the final table encodes EVERY seen word (the
    unseen-word backoff in ``encode_corpus`` is for genuinely new
    text only).
    """
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .withColumn("syms", _chars(F.col("word")))
    )


def _adjacent_pairs(wt: DataFrame) -> DataFrame:
    """(left_sym, right_sym, cnt): adjacent-pair occurrences weighted by
    word count. Every occurrence counts (including overlapping runs,
    matching the reference BPE's ``get_stats``)."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (s, i) -> struct(s AS left_sym,"
        " element_at(syms, i + 2) AS right_sym))"
    )
    return (
        wt.select(F.explode(pairs).alias("p"), "wcount")
        .groupBy("p.left_sym", "p.right_sym")
        .agg(F.sum("wcount").alias("cnt"))
    )


def learn_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[list[tuple[str, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, encoded_words)``: the ordered merge list
    [(left, right, merged, pair_count)] and the word-type table with
    ``syms`` reflecting all merges (the corpus encoding via join).

    Stops early when no pair reaches ``min_count`` (merging hapax pairs
    memorizes the corpus rather than learning subwords).

    Each iteration collects exactly ONE row (the argmax pair) — the
    driver never sees data-sized state.

    The word table is repartitioned once after the corpus shuffle:
    iteration stages run over the vocabulary (≪ corpus), and inheriting
    the corpus' shuffle partitioning would pay per-task overhead ×
    ``shuffle.partitions`` twenty times over. One partition per ~64k
    word types keeps tasks meaningfully sized at any scale.
    """
    # checkpoint FIRST (one corpus scan materializes the vocabulary-
    # sized table), THEN count the cheap checkpointed table to size the
    # iteration partitioning — count-then-checkpoint would run the
    # corpus shuffle twice
    wt0 = word_symbol_table(docs, text_col).localCheckpoint(eager=True)
    n_parts = max(4, wt0.count() // 65536 + 1)
    wt = wt0.repartition(int(n_parts)).localCheckpoint(eager=True)
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(num_merges):
        best = (
            _adjacent_pairs(wt)
            .orderBy(F.desc("cnt"), F.asc("left_sym"), F.asc("right_sym"))
            .first()
        )
        if best is None or best["cnt"] < min_count:
            break
        left, right = best["left_sym"], best["right_sym"]
        merged = left + right
        merges.append((left, right, merged, int(best["cnt"])))
        wt = wt.withColumn(
            "syms", _merge_fold(F.col("syms"), left, right, merged)
        ).localCheckpoint(eager=True)
    return merges, wt


def merges_to_df(spark, merges: list[tuple[str, str, str, int]]) -> DataFrame:
    """Merge list → (rank, left_sym, right_sym, merged, pair_count)."""
    rows = [
        (i + 1, left, right, m, c) for i, (left, right, m, c) in enumerate(merges)
    ]
    from ..util import local_df

    return local_df(
        spark,
        rows,
        "rank int, left_sym string, right_sym string, merged string,"
        " pair_count bigint",
    )


def apply_merges(
    col: Column, merges: list[tuple[str, str, str, int]]
) -> Column:
    """Encode one word (string column) with the learned merges, in rank
    order — the unseen-text / streaming path. k chained folds, all
    JVM-side; for bulk corpus encoding prefer the ``encode_corpus``
    join against the already-encoded word table."""
    syms = _chars(col)
    for left, right, merged, _ in merges:
        syms = _merge_fold(syms, left, right, merged)
    return syms


def encode_corpus(
    docs: DataFrame,
    encoded_words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, token) stream: explode corpus words, equi-join the
    encoded word table, explode subword symbols. Unseen words fall
    back to their character symbols — BPE's standard backoff — via a
    left join + coalesce.

    The join key is the word string; Catalyst picks broadcast when the
    vocabulary fits (typical: vocab ≪ corpus), else a shuffle join on
    an evenly distributed key.
    """
    words = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word")
    )
    enc = encoded_words.select("word", "syms")
    return (
        words.join(enc, "word", "left")
        .select(
            id_col,
            F.explode(
                F.coalesce(F.col("syms"), _chars(F.col("word")))
            ).alias("token"),
        )
    )
