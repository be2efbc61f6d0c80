"""Distributed Bloom filter: a fixed-size, mergeable bit sketch built as
a DataFrame aggregation, used to prune a huge probe side BEFORE an exact
re-check.

Why this exists at 100 TB: the decontamination / blocklist / known-key
anti-join family (operators/decontaminate.py) broadcasts the small
side's exact key set. That works while the key set fits the broadcast
budget as strings (~millions of 16-byte keys). When the reference set
grows past that — a billion-shingle benchmark union, a multi-GB URL
blocklist — the exact set no longer ships, but its BLOOM FILTER does:
m bits cover n keys at a false-positive rate of ~(1 - e^{-kn/m})^k, so
1 GB of filter summarizes ~1e9 keys at <1% FPR. The pattern is then

    sketch (one pass over the small side, fixed-size state)
    -> map-side prune of the huge side (no join, no shuffle; survivors
       are true matches plus an FPR-sized sliver)
    -> exact re-check of the sliver only (broadcast join as before)

and the final result is EXACT — the filter admits false positives,
never false negatives, so pruning before an exact re-check preserves
semantics bit-for-bit. That is what makes the operator oracle-checkable:
registry queries using it compare against plain exact SQL.

Construction is pure DataFrame algebra and fully mergeable:

- k bit positions per key by Kirsch–Mitzenmacher double hashing
  (pos_j = h1 + j*h2 mod m, h1/h2 = xxhash64 with distinct salts) —
  two hash evaluations give k independent-enough probes (Kirsch &
  Mitzenmacher, "Less Hashing, Same Performance", ESA 2006);
- the filter is array<bigint>: bit p lives in word p>>6 at bit p&63;
- building = explode positions -> groupBy(word_idx).agg(bit_or(mask)) —
  a partial-agg-friendly shuffle over AT MOST m/64 distinct keys,
  independent of input size; two partially-built filters merge by the
  same bit_or (associative, commutative — executor/partition order
  free);
- probing = element_at on the filter as a LITERAL array (constant-
  folded into the plan; stays inside WholeStageCodegen, no UDF, no
  join). The driver-side collect is of the m/64-word filter itself —
  bounded by the configured m, never by data size.

Spark-side only (no DuckDB twin needed): the filter is a pruning
structure, not a result — every query built on it re-checks exactly,
so oracles stay plain SQL.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "optimal_params",
    "bit_positions",
    "bloom_build",
    "bloom_merge",
    "bloom_collect",
    "bloom_attach",
    "might_contain",
]


def optimal_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) minimizing size for ``n_keys`` at target ``fpr``:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2 — rounded up, m to a
    multiple of 64 so the word array is dense."""
    if n_keys <= 0:
        return 64, 1
    if not 0.0 < fpr < 1.0:
        raise ValueError("fpr must be in (0, 1)")
    m = math.ceil(-n_keys * math.log(fpr) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def bit_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """The k filter positions of a key, each in [0, m_bits).

    Double hashing: h1 and h2 are two xxhash64 evaluations separated by
    a salt column (xxhash64 folds every argument into the state, so the
    extra literal is a different 64-bit function, not a concat). The
    j-th probe is (h1 + j*h2) mod m, computed with both hashes REDUCED
    mod m first — identical by modular arithmetic, and the intermediate
    j*h2m < k*m never overflows a bigint (Spark 4 runs ANSI mode, where
    wrap-around is an error, so headroom is a correctness requirement,
    not a style point). h2m is forced into [1, m-1]: a zero step would
    collapse all k probes onto one bit and quietly spike the
    false-positive rate for that key."""
    h1m = F.pmod(F.xxhash64(col), F.lit(m_bits))
    h2m = F.pmod(F.xxhash64(col, F.lit("bloom:h2")), F.lit(m_bits - 1)) + F.lit(1)
    return [F.pmod(h1m + F.lit(j) * h2m, F.lit(m_bits)) for j in range(k)]


def _word_and_mask(pos: Column) -> tuple[Column, Column]:
    word_idx = F.call_function("shiftright", pos, F.lit(6)).cast("int")
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return word_idx, mask


def bloom_build(
    keys: DataFrame, col: str, m_bits: int, k: int
) -> DataFrame:
    """SPARSE filter over the distinct values of ``keys[col]``:
    (word_idx int, word bigint), one row per word with at least one bit
    set. This is the mergeable/distributed form — at most m_bits/64
    rows regardless of input size, built with one partial-agg shuffle
    whose key space is word indices, not data keys."""
    if m_bits % 64 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    pos = F.explode(F.array(*bit_positions(F.col(col), m_bits, k))).alias("_pos")
    word_idx, mask = _word_and_mask(F.col("_pos"))
    return (
        keys.select(pos)
        .select(word_idx.alias("word_idx"), mask.alias("_mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of the key sets behind two same-(m,k) sparse filters —
    bitwise OR per word. Associative and commutative, so any tree or
    sequence of merges (per-partition, per-day, per-source) yields the
    identical filter."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )


def bloom_collect(sparse: DataFrame, m_bits: int) -> list[int]:
    """Densify a sparse filter to the m_bits/64-long word list used by
    :func:`might_contain`. The ONLY driver-side transfer in the
    operator, bounded by the configured m_bits (e.g. 2 MiB for m=2^24)
    — never by data size."""
    words = [0] * (m_bits // 64)
    for row in sparse.collect():
        words[row["word_idx"]] = row["word"]
    return words


def bloom_attach(df: DataFrame, words: list[int], name: str = "_bloom") -> DataFrame:
    """Attach the dense filter to every row of ``df`` as column ``name``
    via a BROADCAST 1-row cross join — the probe-side carrier (see
    util.attach_broadcast_array for why a literal array is a trap)."""
    from ..util import attach_broadcast_array

    return attach_broadcast_array(df, words, name)


def might_contain(
    col: Column, filt: Column | list[int], m_bits: int, k: int
) -> Column:
    """True iff every one of the key's k bits is set — i.e. the key MAY
    be in the set (false positives at the configured rate, never false
    negatives). Pure projection, shuffle-free; callers follow with an
    exact re-check of survivors when exactness is required.

    ``filt`` is the dense word array: pass the :func:`bloom_attach`
    column for anything but tiny filters (see the literal-expansion trap
    documented there); a plain list is accepted for small filters and
    tests."""
    lit_words = F.lit(filt) if isinstance(filt, list) else filt
    checks = []
    for pos in bit_positions(col, m_bits, k):
        word_idx, mask = _word_and_mask(pos)
        word = F.element_at(lit_words, word_idx + F.lit(1))
        checks.append(word.bitwiseAND(mask) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
