"""Similarity search over embedding columns (LLM-data extension, north
star in BASELINE.json — the reference has no vector surface).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products via ``F.zip_with``+``F.aggregate`` (JVM-side, no Python).
- ``lsh_topk``: random-hyperplane LSH bucketing as the scale path — only
  vectors sharing a bucket are compared; hyperplanes are derived
  deterministically from a seed so results are reproducible.

Scale notes (100 TB / billions of vectors):
- Brute force is O(Q·N) dot products; it exists to verify recall of the
  LSH path at small SF and for small broadcast-able query sets.
- In both paths the query side is broadcast (queries ≪ corpus);
  the corpus is never shuffled — scans stay partition-local, and the only
  shuffle is the final per-query top-k (tiny: k rows per partition after
  partial ORDER BY LIMIT under AQE).
- Norms are precomputed once per side (no repeated sqrt over the array).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..util import ensure_min_parallelism


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    q_i = round_half_up(x_i / scale) — the storage/transport form
    embedding pipelines write (4x smaller than float32, exact dot
    products in int32). Shuffle-free projection; the rounding uses the
    portable floor(x+0.5) primitive so the int codes are engine-exact.
    Returns (id, scale, qvec array<int>); zero vectors get scale 0 and
    all-zero codes."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).cast("double")
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col), scale.alias("scale"), q.alias("qvec")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Plan: broadcast(queries) × corpus → window top-k per query.
    Returns (query_id, neighbor_id, sim) — sim rounded to 6 dp so results
    are engine-portable (oracle-comparable).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            pround(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure Python, driver
    side, tiny). Reproducible across runs/engines — no RNG state."""
    planes = []
    x = seed
    for _ in range(n_planes):
        vec = []
        for _ in range(dim):
            # xorshift64* — deterministic, portable
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            u = (x % 10_000_019) / 10_000_019.0
            vec.append(2.0 * u - 1.0)
        n = math.sqrt(sum(v * v for v in vec)) or 1.0
        planes.append([v / n for v in vec])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one sign bit per plane, packed into a
    string bucket key. Built-ins only; the plane constants are literals
    folded into the plan (they're small: n_planes × dim doubles).

    NB: deliberately the zip_with/aggregate form. Flattening the dot
    products into 64-term arithmetic expressions (32 planes × 64 dims)
    was tried and is 5× SLOWER end-to-end — the generated Java explodes
    and janino compile time dominates. Higher-order-function
    interpretation is fine here: bucketing is O(rows·planes·dim) on
    numbers already in memory."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(v)) for v in p])
        bits.append(F.when(_dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_buckets_col(
    vec: Column, planes: Column, n_tables: int, n_planes: int
) -> Column:
    """All tables' bucket keys in ONE pass against an ATTACHED plane
    matrix column (util.attach_broadcast_matrix; flattened to
    n_tables·n_planes rows of dim doubles — table t's plane j is row
    t·n_planes + j). The matrix is referenced, never rebuilt: same fix
    as ivf.attach_centroids, and what keeps the per-row cost and the
    plan text independent of the table count. Bit values are identical
    to :func:`lsh_bucket` (same dots, same left-to-right accumulation).

    Returns array<string> of length n_tables, ready for ``posexplode``.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                lambda j: F.when(
                    _dot(
                        vec,
                        F.element_at(
                            planes, (t * F.lit(n_planes) + j + F.lit(1)).cast("int")
                        ),
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0")),
            ),
            "",
        ),
    )


def lsh_buckets(vec: Column, tables: list[list[list[float]]]) -> Column:
    """All tables' bucket keys in ONE pass: the full plane set is a 3-D
    array literal and nested higher-order functions traverse it, so the
    per-row plan holds one expression tree instead of n_tables ×
    n_planes separate aggregate trees (whose generated-code volume
    dominated compile time in the per-plane form). Bit values are
    identical to :func:`lsh_bucket`: the dot product accumulates
    left-to-right either way. Prefer :func:`lsh_buckets_col` for
    anything data-sized — the literal form pays a per-row rebuild of
    the plane tensor (see util.attach_broadcast_matrix).

    Returns array<string> of length n_tables, ready for ``posexplode``.
    """
    t3 = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(v)) for v in p]) for p in tbl])
            for tbl in tables
        ]
    )
    return F.transform(
        t3,
        lambda tbl: F.array_join(
            F.transform(
                tbl,
                lambda p: F.when(_dot(vec, p) >= 0, F.lit("1")).otherwise(F.lit("0")),
            ),
            "",
        ),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent sign-LSH bucketings;
    candidates = corpus rows sharing any bucket with the query; exact
    cosine + top-k over candidates only.

    The equi-join on (table, bucket) replaces the cross join — at N
    vectors per bucket the comparison count drops from Q·N to
    Q·N/2^n_planes per table.
    """
    tables = [
        _hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)
    ]

    flat = [p for tbl in tables for p in tbl]

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        from ..util import attach_broadcast_matrix

        df = attach_broadcast_matrix(ensure_min_parallelism(df), flat, "_planes")
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.posexplode(
                lsh_buckets_col(F.col(vec_col), F.col("_planes"), n_tables, n_planes)
            ).alias("tbl", "bucket"),
        )

    cb = bucketed(corpus, "c")
    qb = bucketed(queries, "q")
    cand = cb.join(F.broadcast(qb), ["tbl", "bucket"]).filter(
        F.col("c_id") != F.col("q_id")
    )
    # score BEFORE deduplicating: a pair colliding in multiple tables gets
    # the same sim, and deduping post-score shuffles 3 scalar columns
    # instead of two 64-double vectors per row
    scored = (
        cand.select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            pround(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-space near-duplicate pairs: (id_a < id_b, sim ≥ threshold).

    The scale path generates candidates by sign-LSH bucket collision
    (only vectors sharing a bucket are compared); ``use_lsh=False`` is
    the exact all-pairs baseline for small inputs / recall checks. At
    threshold ≥0.95 the vectors are nearly parallel, so shallow-table
    LSH recall is excellent (opposite regime from top-k search).
    """
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    )
    if use_lsh:
        tables = [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
        b = c.select(
            "_id",
            "_vec",
            F.posexplode(lsh_buckets(F.col("_vec"), tables)).alias("tbl", "bucket"),
        )
        pairs = (
            b.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                pround(cosine(F.col("a._vec"), F.col("b._vec")), 6).alias("sim"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.max("sim").alias("sim"))
        )
    else:
        pairs = (
            c.alias("a")
            .join(c.alias("b"), F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                pround(cosine(F.col("a._vec"), F.col("b._vec")), 6).alias("sim"),
            )
        )
    return pairs.filter(F.col("sim") >= threshold)


# --------------------------------------------------------------------------
# Label-centroid evaluation: how separable are the embedding clusters?
# --------------------------------------------------------------------------

#: Per-dimension values are quantized to 1e-9 before the exact centroid
#: sum, per-dimension products to 1e-12 before the exact dot sum.
CENTROID_SCALE = 1e9
DOT_SCALE = 1e12


def label_centroids(emb: DataFrame,
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Mean embedding per label as (label, dim, c) rows.

    Float sums are partition-order-dependent, so the mean accumulates
    exact integers instead: each value is scaled by 1e9 and floored
    (deterministic IEEE), summed exactly (associative), and divided once
    at the end — the statistical_moments discipline applied to vectors.
    Output is the exploded form (L·d rows — tiny) ready for a broadcast
    join against vector dims.
    """
    e = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "v"),
    )
    return (
        e.groupBy("label", "dim")
        .agg(
            F.sum(
                F.floor(F.col("v").cast("double") * F.lit(CENTROID_SCALE) + F.lit(0.5))
            ).alias("sv"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "label",
            "dim",
            (F.col("sv").cast("double") / F.lit(CENTROID_SCALE) / F.col("n")).alias("c"),
        )
    )


def centroid_confusion(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Nearest-centroid confusion matrix over an embedding table.

    The standard embedding-quality probe: assign every vector to the
    label whose centroid maximizes the dot product, then count
    (true_label, assigned_label) pairs. Scoring uses exact integer-scaled
    per-dimension products (order-independent — both engines agree to the
    row; ties break toward the smaller label).

    Plan shape: centroids are an L·d partial agg; the vector side joins
    them BROADCAST on dim (map-side, corpus never shuffled for scoring);
    the only data-sized shuffles are the V·L dot aggregation and the
    per-vector argmax. L is a label space — small by definition; for
    large candidate sets use operators/ivf instead.
    """
    cents = label_centroids(emb, vec_col, label_col).select(
        F.col("label").alias("cand"), "dim", "c"
    )
    dims = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("true_label"),
        F.posexplode(vec_col).alias("dim", "v"),
    )
    dots = (
        dims.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cand")
        .agg(
            F.min("true_label").alias("true_label"),
            F.sum(
                F.floor(
                    (F.col("v").cast("double") * F.col("c")) * F.lit(DOT_SCALE)
                    + F.lit(0.5)
                )
            ).alias("ds"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ds").desc(), F.col("cand").asc())
    assigned = dots.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        assigned.groupBy("true_label", F.col("cand").alias("assigned_label"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def mmr_rerank(
    shortlist: DataFrame,
    k: int,
    lam: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998)
    over a BOUNDED shortlist: greedily pick k items maximizing
    ``lam * relevance - (1 - lam) * max_cosine_to_already_selected``,
    ties broken by ascending id. Returns one row per pick:
    (mmr_rank, id, rel, mmr_score).

    Scale shape: MMR is inherently sequential in k, so production
    systems always run it as a RERANK stage over a shortlist the
    distributed top-k already bounded (N in the tens-to-hundreds) —
    never over the corpus. Each of the k steps is a tiny job over <= N
    rows: score, take top-1 (TakeOrderedAndProject), fold the pick's
    vector into a running max-sim column via a broadcast 1-row cross
    join. pin() between steps keeps the plan depth constant (the pick
    is referenced twice: output row + similarity update)."""
    from functools import reduce as _reduce

    from ..util import pin

    cand = pin(
        shortlist.withColumn("_max_sim", F.lit(None).cast("double"))
    )
    picks = []
    for step in range(k):
        scored = cand.withColumn(
            "_score",
            F.lit(lam) * F.col(rel_col)
            - F.lit(1.0 - lam) * F.coalesce(F.col("_max_sim"), F.lit(0.0)),
        )
        pick = pin(
            scored.orderBy(F.desc("_score"), F.col(id_col)).limit(1)
        )
        picks.append(
            pick.select(
                F.lit(step).alias("mmr_rank"),
                F.col(id_col),
                F.col(rel_col),
                F.col("_score").alias("mmr_score"),
            )
        )
        pv = pick.select(
            F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv")
        )
        cand = pin(
            cand.crossJoin(F.broadcast(pv))
            .filter(F.col(id_col) != F.col("_pid"))
            .withColumn(
                "_max_sim",
                # greatest() skips nulls: the first fold replaces the
                # null seed, so the penalty is the TRUE max cosine
                # (negative similarities stay negative — genuinely
                # diverse picks are rewarded, not clamped to 0)
                F.greatest(
                    F.col("_max_sim"), cosine(F.col(vec_col), F.col("_pv"))
                ),
            )
            .drop("_pid", "_pv")
        )
    return _reduce(DataFrame.unionAll, picks)
