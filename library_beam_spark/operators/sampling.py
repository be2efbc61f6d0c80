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


def per_group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically.

    The web-pipeline "per-domain cap": hot domains (or sources, or
    licenses) are throttled to a fixed budget while small groups pass
    through whole. Selection order is the key hash (uniform — an unbiased
    sample of the group), tie-broken by the key itself, so the kept set
    is stable across runs, partitionings, and engines.

    Scale: one hash-partitioned window per group. When group sizes dwarf
    the cap (billions of rows, cap in the thousands) pre-prune first with
    ``sample_fraction(df, key_col, safety * cap / n_group, salt)`` and
    window the survivors — the prefilter is shuffle-free and cuts the
    sort input by orders of magnitude; it trades exactness of the
    selected *set* (never of the cap) for that speedup, so it is not
    applied implicitly here.
    """
    from pyspark.sql import Window

    rn_col = "_cap_rn"
    if rn_col in df.columns:
        raise ValueError(f"input already has reserved column {rn_col!r}")
    w = Window.partitionBy(group_col).orderBy(
        hash_value(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .where(F.col(rn_col) <= cap)
        .drop(rn_col)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_fraction: float,
    salt: str = "",
) -> DataFrame:
    """Resample sources toward the alpha=0.5 temperature mixture.

    Multilingual/multi-source training sets are rebalanced by sampling
    source s proportionally to n_s^alpha (alpha<1 upweights small
    sources — the mBERT/XLM-R exponent-smoothing rule). This implements
    alpha = 0.5 with a per-key deterministic keep decision:

        p_s   = sqrt(n_s) / SUM_t sqrt(n_t)
        f_s   = min(1, target_fraction * N * p_s / n_s)
        keep  <=> hash(key) < floor(f_s * HASH_SPACE + 0.5)

    Engine-portability discipline: sqrt is IEEE-correctly-rounded (thus
    bit-identical across engines) — this is why alpha is fixed at 0.5
    rather than a general pow(); and each sqrt weight is scaled to an
    integer (floor(sqrt(n)*1e6 + 0.5)) BEFORE summing, so the normalizer
    is an exact integer sum — associative, partition-order-independent —
    and every downstream float op is a deterministic IEEE expression.
    The DuckDB twin in registry.temperature_mixture_counts replays the
    identical arithmetic.

    Scale: one partial-agg shuffle over the (tiny) group dimension; the
    per-group weights and the two grand totals are broadcast back; the
    keep decision is a shuffle-free projection on the fact side.
    """
    for c in ("_n", "_wi", "_tot_n", "_tot_w"):
        if c in df.columns:
            raise ValueError(f"input already has reserved column {c!r}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    weights = counts.select(
        group_col,
        "_n",
        F.floor(F.sqrt(F.col("_n").cast("double")) * 1e6 + F.lit(0.5)).alias("_wi"),
    )
    totals = weights.agg(
        F.sum("_n").alias("_tot_n"), F.sum("_wi").alias("_tot_w")
    )
    f = F.least(
        F.lit(1.0),
        F.lit(target_fraction)
        * F.col("_tot_n").cast("double")
        * (F.col("_wi").cast("double") / F.col("_tot_w").cast("double"))
        / F.col("_n").cast("double"),
    )
    cut = F.floor(f * F.lit(float(HASH_SPACE)) + F.lit(0.5))
    keyed = df.join(F.broadcast(weights), group_col).join(F.broadcast(totals))
    return keyed.where(hash_value(F.col(key_col), salt) < cut).select(*df.columns)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    digits: int = 9,
    score_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: ``k`` rows
    per group, inclusion probability proportional to ``weight_col``
    (Efraimidis & Spirakis, IPL 2006 — the A-ES reservoir order).

    A-ES ranks rows by ``u^(1/w)`` with u ~ Uniform(0,1]; the top-k per
    group is exactly a weighted sample without replacement. Here u is
    the engine's deterministic md5-derived uniform (same machinery as
    :func:`sample_fraction`), and the rank key is the monotone form
    ``ln(u)/w`` — one log + one divide per row, all JVM-side. The
    sample is therefore reproducible across runs, partitionings, AND
    engines; changing ``salt`` redraws it.

    The score is portably rounded before ranking (ties then break on
    the key) so a last-ulp libm divergence between engines cannot flip
    the k-boundary. Weights must be strictly positive — ENFORCED: a
    zero, negative, or NULL weight raises at execution time rather
    than producing a NaN/-inf score whose sort position is
    engine-specific (which would silently corrupt the sample).

    Scale: one hash-partitioned window per group — identical shape to
    :func:`per_group_cap`, same pre-prune advice for cap ≪ group size.

    Output schema equals the input schema; pass ``score_col`` to also
    keep the rank key under that (caller-owned) name.
    """
    from pyspark.sql import Window

    from ..functions.portable import pround

    sc_col = score_col or "_ws_score"
    for col in ("_ws_rn", sc_col if score_col is None else None):
        if col is not None and col in df.columns:
            raise ValueError(f"input already has reserved column {col!r}")
    if score_col is not None and score_col in df.columns:
        raise ValueError(f"score_col {score_col!r} already exists in input")
    u = (hash_value(F.col(key_col), salt) + F.lit(1)) / F.lit(
        float(HASH_SPACE)
    )
    w_d = F.col(weight_col).cast("double")
    score = F.when(w_d > 0, pround(F.log(u) / w_d, digits)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "weighted_sample_per_group: weight must be strictly"
                    f" positive; got {weight_col}="
                ),
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    # rank on the materialized column, not the expression — md5+log
    # evaluate once per row
    w = Window.partitionBy(group_col).orderBy(
        F.col(sc_col).desc(), F.col(key_col).asc()
    )
    out = (
        df.withColumn(sc_col, score)
        .withColumn("_ws_rn", F.row_number().over(w))
        .where(F.col("_ws_rn") <= k)
        .drop("_ws_rn")
    )
    return out if score_col is not None else out.drop(sc_col)
