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


#: switch corpus assignment to the numpy kernel once the per-row HOF
#: work (m·dim interpreted multiply-adds) outgrows the Python-worker
#: round-trip — ~a 64-cell/64-dim table; tiny fixed-m uses stay JVM-only
_VECTORIZE_THRESHOLD = 4096


def assign_cells_vectorized(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Corpus → nearest-cell assignment as an Arrow-batched numpy kernel
    (mapInPandas) — the fast path for adaptive cell counts.

    Why a Pandas UDF here, against the house rule: higher-order-function
    expressions run INTERPRETED (no whole-stage codegen, no common-
    subexpression elimination), which prices a multiply-add at
    ~100-300 ns; with the adaptive m ∝ N the N·m·dim assignment became
    the dominant engine cost (9.2 s for 20k×834×64 at sf1). Dense
    matmul is the canonical vectorized-UDF case — this kernel does the
    same arithmetic at numpy speed (sf1 assignment 10.1 s → 2.9 s
    end-to-end; the arithmetic itself is ms-scale, the remainder is
    Arrow transfer of the vectors — which the HOF path also cannot
    avoid reading).

    BIT-IDENTICAL to :func:`assign_cell_col` / the DuckDB oracle, not
    approximately equal: the score matrix accumulates one DIMENSION at
    a time (S += outer(V[:,d], C[:,d]) for d = 0..dim-1), so every
    (row, cell) dot adds products in exactly the left-to-right IEEE
    order of the HOF ``aggregate`` and DuckDB's list_inner_product, and
    ``argmax`` takes the first maximum — the same tie rule as
    array_position. A plain ``V @ C.T`` would NOT qualify: BLAS pairwise
    summation reorders the adds and can flip near-tie argmaxes.
    """
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]
    schema = StructType(df.schema.fields + [StructField(out_col, IntegerType())])
    cols = [f.name for f in df.schema.fields]

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            S = np.zeros((len(pdf), C.shape[0]))
            for d in range(dim):
                S += np.outer(V[:, d], C[:, d])
            out = pdf[cols].copy()
            out[out_col] = S.argmax(axis=1).astype(np.int32)
            yield out

    return ensure_min_parallelism(df).mapInPandas(fn, schema=schema)


def two_level_groups(centroids: list[list[float]]) -> list[list[int]]:
    """Partition the m centroids into g = ceil(√m) groups around the
    first g centroids as anchors — the IMI/two-level coarse structure.

    Membership is deterministic and engine-replayable: anchor j < g
    anchors its OWN group (so no group is ever empty, even under
    duplicate seeds); every other centroid joins the group of its
    best-dot anchor, dots accumulated per-dimension (the engine-standard
    left-to-right IEEE order), ties to the first index. Member lists
    are ascending, so a first-occurrence argmax over a group picks the
    LOWEST global cell id — the tie rule every other assignment path
    uses. Driver-side cost is m·g·dim flops in numpy: ~1.5 M at the
    test scale, and at production m it is itself the thing the two
    levels exist to keep sub-quadratic (g ∝ √m)."""
    import math

    import numpy as np

    m = len(centroids)
    g = math.ceil(math.sqrt(m))
    C = np.asarray(centroids, dtype=np.float64)
    A = C[:g]
    S = np.zeros((m, g))
    for d in range(C.shape[1]):
        S += np.outer(C[:, d], A[:, d])
    grp = S.argmax(axis=1)
    grp[:g] = np.arange(g)  # anchors own their groups
    groups: list[list[int]] = [[] for _ in range(g)]
    for j, c in enumerate(grp):
        groups[int(c)].append(j)
    return groups


def assign_cells_two_level(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Two-level (IMI-style) nearest-cell assignment: rank the
    g = ceil(√m) anchors, then argmax over ONLY the member centroids of
    the TOP-2 coarse groups — per-row cost O(√m·dim) instead of the
    flat O(m·dim). Probing two coarse groups is the standard IMI recall
    lever: a vector near a coarse boundary still reaches its true cell
    (measured on the clustered test embeddings, m=36: mean chosen-
    centroid dot 0.264 → 0.288 vs flat 0.318 from the second probe;
    hash-sampled anchors are the floor — refined anchors close the
    rest when the extra driver-side Lloyd passes are worth it).

    This is the complexity fix the adaptive cell count needs at true
    scale: with m ∝ N the flat assignment is N²·dim/target flops no
    matter how fast each flop is (numpy bought a constant, not a
    shape); two levels make it N^1.5. The price is approximation — the
    nearest centroid can hide in a non-best coarse group — but the
    assignment is a deterministic, engine-replayable DEFINITION (same
    dots, same first-index ties on both levels), so a DuckDB oracle
    verifies it exactly, and the SemDeDup keep-rule is centroid-
    agnostic: any deterministic assignment yields valid verdicts
    (operators/semdedup.py). FAISS's IVF answers the same problem with
    IMI or an HNSW quantizer; this is the relational-engine form."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    groups = two_level_groups(centroids)
    C = np.asarray(centroids, dtype=np.float64)
    A = C[: len(groups)]
    dim = C.shape[1]
    member_idx = [np.asarray(g_, dtype=np.int64) for g_ in groups]
    schema = StructType(df.schema.fields + [StructField(out_col, IntegerType())])
    cols = [f.name for f in df.schema.fields]

    nprobe_coarse = min(2, len(groups))

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Sg = np.zeros((len(pdf), A.shape[0]))
            for d in range(dim):
                Sg += np.outer(V[:, d], A[:, d])
            # stable sort on the negated scores = descending with the
            # first-index tie rule, matching the SQL window's
            # (dot DESC, anchor_id ASC)
            top = np.argsort(-Sg, axis=1, kind="stable")[:, :nprobe_coarse]
            cell = np.empty(len(pdf), dtype=np.int32)
            keys = [tuple(sorted(set(t))) for t in top.tolist()]
            for key in set(keys):
                rows = np.flatnonzero([k == key for k in keys])
                idx = np.sort(np.concatenate([member_idx[c] for c in key]))
                M = C[idx]
                Sm = np.zeros((len(rows), len(idx)))
                for d in range(dim):
                    Sm += np.outer(V[rows, d], M[:, d])
                cell[rows] = idx[Sm.argmax(axis=1)]  # members ascending →
                # first-occurrence argmax = lowest global cell id
            out = pdf[cols].copy()
            out[out_col] = cell
            yield out

    return ensure_min_parallelism(df).mapInPandas(fn, schema=schema)


def probe_cells_two_level(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "probes",
) -> DataFrame:
    """Two-level probe list: rank the anchors, take the member cells of
    the TOP-2 coarse groups, rank THOSE by (dot desc, id asc), keep the
    first ``nprobe`` — the query-side twin of
    :func:`assign_cells_two_level`, same O(√m·dim) per row, same
    deterministic definition (so the DuckDB oracle can replay it).
    Appends ``out_col`` as array<int>, best cell first."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    groups = two_level_groups(centroids)
    C = np.asarray(centroids, dtype=np.float64)
    A = C[: len(groups)]
    dim = C.shape[1]
    member_idx = [np.asarray(g_, dtype=np.int64) for g_ in groups]
    nprobe_coarse = min(2, len(groups))
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(IntegerType()))]
    )
    cols = [f.name for f in df.schema.fields]

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Sg = np.zeros((len(pdf), A.shape[0]))
            for d in range(dim):
                Sg += np.outer(V[:, d], A[:, d])
            top = np.argsort(-Sg, axis=1, kind="stable")[:, :nprobe_coarse]
            probes = []
            for r in range(len(pdf)):
                idx = np.sort(
                    np.concatenate([member_idx[c] for c in sorted(set(top[r]))])
                )
                M = C[idx]
                s = np.zeros(len(idx))
                for d in range(dim):
                    s += V[r, d] * M[:, d]
                # stable sort on -s: dot desc, then ascending global id
                order = np.argsort(-s, kind="stable")[:nprobe]
                probes.append([int(idx[j]) for j in order])
            out = pdf[cols].copy()
            out[out_col] = probes
            yield out

    return df.mapInPandas(fn, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
    two_level: bool = False,
    exclude_label_col: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, sim): exact cosine top-k within the probed
    cells. Each corpus vector lives in exactly one cell and probe lists
    are distinct, so no candidate dedup pass is needed (unlike the
    multi-table LSH path).

    ``materialize=True`` (default) persists the corpus→cell assignment
    for the duration of the call and eagerly checkpoints the (tiny q×k)
    result so the cache can be released before returning. Pass False to
    get the fully LAZY plan — for plan inspection or composition into a
    larger query — at the cost of the assignment being re-evaluated per
    plan reference (HOF expressions get no codegen CSE).

    ``two_level=True`` routes BOTH sides through the IMI-style
    coarse/fine kernels (assign_cells_two_level /
    probe_cells_two_level): O(√m·dim) per row on index build and query
    probe — the N^1.5 total that survives m ∝ N.

    ``exclude_label_col`` turns the search into HARD-NEGATIVE MINING:
    candidates whose label equals the query's are dropped INSIDE the
    cell join (both sides carry the label through the assign/probe
    kernels, which preserve all input columns), so the exclusion rides
    the same broadcast equi-join — candidates stay bounded by the
    probed cells, never label-filtered after a full scan.

    NULL-label contract: the exclusion filter is ``c_lbl != q_lbl``
    under SQL three-valued logic, so a candidate OR query whose label
    is NULL is dropped (``NULL <> x`` is NULL, which filters out).
    Callers with nullable labels who want "label unknown ⇒ keep as
    negative" must coalesce the label to a sentinel before calling, or
    the NULL-labeled rows silently vanish from the candidate pool."""
    lbl_c = (
        [F.col(exclude_label_col).alias("c_lbl")] if exclude_label_col else []
    )
    lbl_q = (
        [F.col(exclude_label_col).alias("q_lbl")] if exclude_label_col else []
    )
    if two_level:
        c = assign_cells_two_level(corpus, centroids, id_col, vec_col).select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            "cell",
            *lbl_c,
        )
    elif len(centroids) * len(centroids[0]) >= _VECTORIZE_THRESHOLD:
        c = assign_cells_vectorized(corpus, centroids, id_col, vec_col).select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            "cell",
            *lbl_c,
        )
    else:
        c = attach_centroids(ensure_min_parallelism(corpus), centroids).select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("c_vec"),
            assign_cell_col(F.col(vec_col), F.col("_cents")).alias("cell"),
            *lbl_c,
        )
    # MATERIALIZE the assignment (docstring): at real scale this step IS
    # the index build — FAISS stores exactly this corpus → cell table,
    # and callers with a precomputed index should join against it
    # instead of recomputing.
    if materialize:
        c = c.persist()
    if two_level:
        q = probe_cells_two_level(
            queries, centroids, nprobe, id_col, vec_col
        ).select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode("probes").alias("cell"),
            *lbl_q,
        )
    else:
        q = attach_centroids(queries, centroids).select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                probe_cells_col(F.col(vec_col), F.col("_cents"), nprobe)
            ).alias("cell"),
            *lbl_q,
        )
    cand = c.join(F.broadcast(q), on="cell").filter(F.col("c_id") != F.col("q_id"))
    if exclude_label_col:
        cand = cand.filter(F.col("c_lbl") != F.col("q_lbl"))
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("neighbor_id"),
        pround(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    if materialize:
        # materialize, then release the index cache — a library operator
        # must not leak executor storage to its caller (the q×k result
        # is tiny by construction). pin() honors SPARK_GRAFT_LAZY_PLANS,
        # so plan dumps see the topology; the unpersist is harmless then
        # (the lazy plan recomputes what the cache would have held).
        from ..util import pin

        out = pin(out)
        c.unpersist()
    return out


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
        if m * dim >= _VECTORIZE_THRESHOLD:
            assigned = assign_cells_vectorized(
                corpus.select(F.col(vec_col)), centroids, vec_col=vec_col
            )
        else:
            assigned = attach_centroids(
                ensure_min_parallelism(corpus), centroids
            ).select(
                F.col(vec_col),
                assign_cell_col(F.col(vec_col), F.col("_cents")).alias("cell"),
            )
        comp = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
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
