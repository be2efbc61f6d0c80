"""IVF-style approximate nearest neighbor search (inverted file index:
coarse quantization into centroid cells, probe the ``nprobe`` closest
cells per query — the FAISS IVF-Flat structure re-expressed relationally).

Index build = ONE map-side projection: every corpus vector gets the id
of its nearest centroid — argmax dot against the centroid table, which
rides along as a BROADCAST 1-row matrix (util.attach_broadcast_matrix):
no explode, no shuffle, and the plan stays O(1) in m. The older
constant-folded-literal form (:func:`assign_cell`) is kept for small
fixed-m uses, but a literal matrix is REBUILT per row per evaluation
and costs O(m·dim) plan text — with the r5 adaptive m ∝ N it turned
assignment into the dominant cost (semdedup_adaptive at sf0.1:
5.1 s → 1.1 s from switching to the carrier). Search = explode each
query into its
``nprobe`` probe cells, broadcast the (tiny) query side, equi-join on
the cell id, exact cosine over candidates only, per-query top-k.

The corpus is never shuffled and never compared across cells — at N
vectors and m cells the comparison count is Q·N·(nprobe/m) instead of
Q·N. Setting ``nprobe=m`` provably degenerates to exact brute force
(tested), which makes recall measurable by construction.

Centroids: deterministic seed-derived unit vectors by default (engine-
portable, so the DuckDB oracle can embed them as literals) —
"IVF with random anchors". :func:`refine_centroids` runs spherical
k-means Lloyd rounds on top when data-adaptive cells are worth the extra
passes (each round = one map-side assign + one groupBy avg shuffle of
m·dim doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..util import bind_once, ensure_min_parallelism
from .similarity import _dot, _hyperplanes, cosine


def seed_centroids(dim: int = 64, m: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-vector centroids (xorshift, driver-side)."""
    return _hyperplanes(dim, m, seed)


def adaptive_cell_count(
    n_vectors: int, target_per_cell: int = 1024, min_m: int = 16
) -> int:
    """Cell count that SCALES WITH THE CORPUS: m = max(min_m,
    ceil(N / target)) keeps the expected cell population — and with it
    the within-cell quadratic work of SemDeDup / IVF probing — constant
    as N grows. A fixed m is the classic 100× trap: cells get 100×
    heavier, so within-cell pair work grows 10⁴× (N²/m with m pinned);
    with m ∝ N it stays N · target, i.e. linear. The paper-scale
    anchors agree: SemDeDup runs k ≈ 11k cells for 600M docs ≈ 55k
    docs/cell; FAISS guidance is √N…N/1k cells for IVF."""
    if n_vectors <= 0:
        return min_m
    return max(min_m, -(-n_vectors // max(1, target_per_cell)))


def sampled_centroids(
    corpus: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "cells",
    lloyd_iters: int = 0,
    digits: int = 6,
) -> list[list[float]]:
    """Data-adaptive centroid seeds: the ``m`` corpus vectors with the
    lowest deterministic hash of their id (a uniform sample that any
    engine can reproduce — the DuckDB oracle computes the identical
    seed set in SQL via :func:`..sampling.sql_hash_value`), unit-
    normalized and portably rounded to ``digits`` so both engines use
    bit-identical centroid literals. Cell ids are the hash order
    (ties → lower id), matching the oracle's ``row_number``.

    One TakeOrderedAndProject over the corpus (per-partition heaps, no
    global sort); the driver holds only m·dim floats. Pass
    ``lloyd_iters`` to run spherical k-means refinement on top
    (:func:`refine_centroids`) when data-adaptive CELL SHAPES are worth
    the extra passes — the sampled seeds already give data-adaptive
    cell COUNT and placement density (dense regions draw
    proportionally more seeds, exactly what SemDeDup wants)."""
    import math

    from .sampling import hash_value

    rows = (
        corpus.select(F.col(id_col).alias("_k"), F.col(vec_col).alias("_v"))
        .orderBy(hash_value(F.col("_k"), salt), F.col("_k"))
        .limit(m)
        .collect()
    )
    scale = float(10**digits)
    cents = []
    for r in rows:
        v = [float(x) for x in r["_v"]]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([math.floor(x / n * scale + 0.5) / scale for x in v])
    if lloyd_iters > 0:
        cents = refine_centroids(corpus, cents, iters=lloyd_iters, vec_col=vec_col)
    return cents


def _centroid_literal(centroids: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )


def _sims(vec: Column, centroids: list[list[float]]) -> Column:
    return F.transform(_centroid_literal(centroids), lambda c: _dot(vec, c))


def assign_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based id of the nearest centroid by dot product (vectors and
    centroids unit-normalized ⇒ dot ≡ cosine ranking). Ties take the
    first index — deterministic, and the rule DuckDB's list_position
    shares."""
    return bind_once(
        _sims(vec, centroids),
        lambda s: F.array_position(s, F.array_max(s)).cast("int") - 1,
    )


def probe_cells(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The ``nprobe`` nearest cell ids, best first (ties → lower id)."""
    m = len(centroids)

    def top(s: Column) -> Column:
        ranked = F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.struct((-F.get(s, i)).alias("neg"), i.alias("i")),
            )
        )
        return F.transform(
            F.slice(ranked, 1, nprobe), lambda p: p.getField("i").cast("int")
        )

    return bind_once(_sims(vec, centroids), top)


def attach_centroids(
    df: DataFrame, centroids: list[list[float]], name: str = "_cents"
) -> DataFrame:
    """Carry the centroid matrix to every row as column ``name`` via a
    broadcast 1-row cross join — the scalable alternative to the
    constant-folded literal (see module docstring / util
    .attach_broadcast_matrix for the measured trap)."""
    from ..util import attach_broadcast_matrix

    return attach_broadcast_matrix(df, centroids, name)


def sims_col(vec: Column, cents: Column) -> Column:
    """Dot product of ``vec`` against every row of an attached centroid
    matrix column. One HOF pass; the matrix is referenced, never
    rebuilt."""
    return F.transform(cents, lambda c: _dot(vec, c))


def assign_cell_col(vec: Column, cents: Column) -> Column:
    """:func:`assign_cell` against an attached centroid matrix column —
    identical semantics (argmax dot, ties → first index)."""
    return bind_once(
        sims_col(vec, cents),
        lambda s: F.array_position(s, F.array_max(s)).cast("int") - 1,
    )


def probe_cells_col(vec: Column, cents: Column, nprobe: int) -> Column:
    """:func:`probe_cells` against an attached centroid matrix column:
    the ``nprobe`` nearest cell ids, best first (ties → lower id). m is
    read from the matrix itself, so the expression is m-agnostic."""

    def top(s: Column) -> Column:
        ranked = F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.size(s) - F.lit(1)),
                lambda i: F.struct((-F.get(s, i)).alias("neg"), i.alias("i")),
            )
        )
        return F.transform(
            F.slice(ranked, 1, nprobe), lambda p: p.getField("i").cast("int")
        )

    return bind_once(sims_col(vec, cents), top)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim): exact cosine top-k within the probed
    cells. Each corpus vector lives in exactly one cell and probe lists
    are distinct, so no candidate dedup pass is needed (unlike the
    multi-table LSH path)."""
    c = attach_centroids(ensure_min_parallelism(corpus), centroids).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        assign_cell_col(F.col(vec_col), F.col("_cents")).alias("cell"),
    )
    q = attach_centroids(queries, centroids).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            probe_cells_col(F.col(vec_col), F.col("_cents"), nprobe)
        ).alias("cell"),
    )
    cand = c.join(F.broadcast(q), on="cell").filter(F.col("c_id") != F.col("q_id"))
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        pround(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: list[list[float]],
    iters: int = 2,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means Lloyd rounds. Per round: map-side cell assign,
    element-wise mean per cell via posexplode + groupBy (one shuffle of
    m·dim partial sums thanks to partial aggregation), unit-normalize.
    Empty cells keep their previous centroid. Driver holds only m·dim
    floats."""
    import math

    m, dim = len(centroids), len(centroids[0])
    for _ in range(iters):
        comp = (
            attach_centroids(ensure_min_parallelism(corpus), centroids)
            .select(
                assign_cell_col(F.col(vec_col), F.col("_cents")).alias("cell"),
                F.posexplode(F.col(vec_col)).alias("pos", "x"),
            )
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        fresh = [[0.0] * dim for _ in range(m)]
        seen = set()
        for r in comp:
            fresh[r.cell][r.pos] = float(r.mu)
            seen.add(r.cell)
        out = []
        for ci in range(m):
            if ci not in seen:
                out.append(centroids[ci])
                continue
            n = math.sqrt(sum(v * v for v in fresh[ci])) or 1.0
            out.append([v / n for v in fresh[ci]])
        centroids = out
    return centroids
