"""Deterministic hash-based sampling.

A training-data pipeline needs samples that are (a) reproducible across
reruns and engines, (b) stable under repartitioning, and (c) consistent
per *key* — the same document lands in the same split everywhere, so a
train/test boundary never leaks when upstream partitioning changes.
Spark's ``df.sample`` gives none of that (it is seeded per-partition), so
these operators derive the sampling decision from a content hash of the
key itself.

The hash is the first 6 hex digits of md5 over ``salt|key`` — 24 bits,
i.e. granularity 1/16,777,216 ≈ 6e-8, engine-portable (DuckDB computes
the identical value digit-by-digit; see :func:`sql_hash_bucket`).

Scale notes (100 TB):
- every operator here is a pure per-row projection/filter — no shuffle,
  no driver state, no RNG; Catalyst keeps it inside WholeStageCodegen and
  column pruning still reaches the scan;
- ``stratified_sample`` resolves the per-stratum fraction with a chained
  ``CASE WHEN`` over a driver-side dict (strata counts are small by
  definition), NOT a join — zero extra stages;
- md5 costs ~100ns/row JVM-side; at 100 TB the scan dominates it.

Reference parity: the reference pipeline has no sampling stage (it
processes the full corpus); this extends the engine for LLM-data work
per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 24-bit hash space: 16**6.
HASH_SPACE = 16_777_216


def hash_value(key: Column, salt: str = "") -> Column:
    """Uniform 24-bit integer derived from md5 of ``salt|key``.

    ``F.conv`` parses the 6-hex-digit prefix in one JVM call; DuckDB has
    no hex→int builtin that matches, so the oracle twin
    (:func:`sql_hash_value`) expands the same number digit-by-digit.
    """
    h = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint")


def sql_hash_value(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_value` (digit-by-digit hex parse)."""
    h = f"md5('{salt}|' || CAST({key_expr} AS VARCHAR))"
    terms = [
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided per key.

    Rows whose key hashes below ``fraction * HASH_SPACE`` are kept, so
    samples are *nested*: the 1% sample is a subset of the 10% sample
    with the same salt — the standard trick for growing a validated
    subset without resampling.
    """
    cut = int(round(fraction * HASH_SPACE))
    return df.where(hash_value(F.col(key_col), salt) < cut)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (strata absent from
    ``fractions`` are dropped, matching ``df.sampleBy`` semantics)."""
    h = hash_value(F.col(key_col), salt)
    cond = F.lit(False)
    for stratum, frac in fractions.items():
        cut = int(round(frac * HASH_SPACE))
        cond = cond | ((F.col(strata_col) == stratum) & (h < cut))
    return df.where(cond)


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label (e.g. train/valid/test) by hash
    range. Weights are normalized; boundaries are cumulative, so the
    assignment is exhaustive and disjoint. Per-key determinism makes the
    split leak-proof: a key can never cross splits between runs."""
    total = sum(weights.values())
    h = hash_value(F.col(key_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = int(round(acc * HASH_SPACE))
        expr = F.when(h < cut, name) if expr is None else expr.when(h < cut, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)
