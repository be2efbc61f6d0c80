"""Product quantization (PQ) for embedding similarity search — the
MEMORY-compression scale path of the ANN family (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; the same design
FAISS ships as IndexPQ/IVFPQ).

Where IVF (operators/ivf.py) prunes which vectors a query LOOKS AT,
PQ compresses what each vector COSTS: split the dim-d space into
``n_sub`` orthogonal subspaces, learn a ``ksub``-entry codebook per
subspace, and store each vector as ``n_sub`` small integers. At
64-dim/float32 → 8 codes of 4 bits, a 64× memory reduction — the
difference between an embedding corpus that fits executor memory and
one that doesn't. Query scoring is ADC (asymmetric distance
computation): one ``n_sub × ksub`` lookup table per query, then every
document costs ``n_sub`` table lookups + adds instead of ``dim``
multiply-adds.

Cross-engine determinism discipline (the house rule for every ANN
operator here — see ivf.py):

- codebook seeds are the ``ksub`` corpus vectors with the lowest
  deterministic hash of their id (operators/sampling.hash_value; the
  DuckDB oracle reproduces the identical seed set), components rounded
  portably to 1e-6 (floor(x·1e6 + 0.5)/1e6 — FLOOR matches on
  negatives, unlike a truncating cast);
- encoding is TRUE L2 assignment expressed through dots:
  argmin_c ‖v_s − c‖² = argmax_c (v_s·c − ½‖c‖²) since ‖v_s‖² is
  constant across candidates. Both engines accumulate the dot
  left-to-right over the subspace (F.aggregate(zip_with) ⇄ DuckDB
  list_inner_product) and break ties on the FIRST index, so code
  assignments are bit-identical, not approximately equal;
- the ½‖c‖² term rides as an EXTRA trailing element of each broadcast
  codebook row (computed once, same left-to-right sum both sides), so
  the scoring expression needs no second literal table;
- ADC estimates sum the per-subspace LUT terms in subspace order on
  both sides (F.aggregate over an ascending sequence ⇄ an ordered
  list_inner_product against a ones vector), and final ranks tie-break
  on vec_id.

Scale notes (10⁹ vectors): the codebook is ksub·(dim/n_sub + 1)·n_sub
doubles — kilobytes — broadcast once per executor
(util.attach_broadcast_matrix; a constant-folded literal would blow
codegen, see that docstring). Encoding is one corpus scan, no shuffle.
ADC is corpus-codes × queries with the query LUTs broadcast: per-doc
work O(n_sub), per-query memory n_sub·ksub doubles. Top-k is a
per-query window over the scored rows — compose with the IVF cell
filter (IVFPQ) when the corpus also needs candidate pruning.

The top-k window is NOT a full-scored-row shuffle: the row_number ≤ k
filter pattern triggers Catalyst's rank-limit pushdown, which inserts
``WindowGroupLimit(Partial)`` map-side BEFORE the Exchange — each map
partition forwards only its local top-k per query, so the shuffle into
per-qid partitions is bounded at k · n_map_partitions · n_queries rows
regardless of corpus size (plan-pinned:
tests/test_plans.py::test_pq_family_topk_window_input_bounded).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..util import attach_broadcast_matrix, bind_once, ensure_min_parallelism


def _round6(x: float) -> float:
    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right IEEE dot — the order list_inner_product uses."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "pq",
) -> list[list[float]]:
    """Flat PQ codebook: ``n_sub · ksub`` rows, row ``s·ksub + c`` =
    subspace-s slice of seed c, with ``½‖·‖²`` appended as the trailing
    element. Seeds are the ksub lowest-hash corpus vectors (ties → lower
    id), components rounded to 1e-6 — the same derivation the SQL
    oracle replays, so the table is engine-shared by construction.

    One TakeOrderedAndProject over the corpus; the driver holds
    ksub·dim floats. (A k-means refinement would improve quantization
    error but needs the same iterate-and-collect loop as
    ivf.refine_centroids — seeds alone already give data-placed
    codewords, which is what the determinism contract wants.)"""
    from .sampling import hash_value

    rows = (
        corpus.select(F.col(id_col).alias("_k"), F.col(vec_col).alias("_v"))
        .orderBy(hash_value(F.col("_k"), salt), F.col("_k"))
        .limit(ksub)
        .collect()
    )
    if not rows:
        raise ValueError("pq_codebooks: empty corpus")
    if len(rows) < ksub:
        # An underfilled codebook would leave [] rows in the flat table;
        # pq_encode's F.get against an empty row then yields NULL
        # assignment scores — silently degrading code assignment. Surface
        # the degenerate corpus instead; callers can lower ksub.
        raise ValueError(
            f"pq_codebooks: corpus has only {len(rows)} vectors for "
            f"ksub={ksub} codewords per subspace — lower ksub to "
            f"<= {len(rows)} or grow the corpus"
        )
    dim = len(rows[0]["_v"])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub = dim // n_sub
    flat: list[list[float]] = [[] for _ in range(n_sub * ksub)]
    for c, r in enumerate(rows):
        v = [_round6(float(x)) for x in r["_v"]]
        for s in range(n_sub):
            cw = v[s * sub : (s + 1) * sub]
            acc = 0.0
            for x in cw:  # left-to-right, the shared accumulation order
                acc = acc + x * x
            flat[s * ksub + c] = cw + [0.5 * acc]
    return flat


def refine_pq_codebooks(
    df: DataFrame,
    codebooks: list[list[float]],
    iters: int = 2,
    n_sub: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd refinement of a PQ codebook — per round: encode against the
    current codebook (one scan), recompute each codeword as the
    element-wise mean of its assigned subvectors (posexplode → one
    partial-agg shuffle of ≤ n_sub·ksub·sub_dim cells), keep unassigned
    codewords. The PQ twin of ivf.refine_centroids, and like it NOT part
    of the oracle-replayed derivation (a float mean is accumulation-
    order-dependent): sampled seeds are the cross-engine-verified form,
    trained codebooks the quality knob on top. Final components are
    rounded portably and half-norms recomputed, so the result plugs into
    the same encode/ADC machinery. Driver holds one codebook per round.

    Measured quality delta (20 queries, 500-vector corpus, 8×4-bit —
    tests/test_pq.py::test_trained_codebook_rerank_recall_vs_seed):
    the win concentrates where the ADC shortlist is TIGHT — rerank
    recall@10 at shortlist 30 is seed 0.505 → 2 rounds 0.530 →
    4 rounds 0.545, while at shortlist 50 it is a wash (0.680 vs
    0.665-0.670: a loose shortlist lets exact re-rank recover
    regardless). Training buys a smaller shortlist for the same
    recall; reconstruction MSE drops on both raw and residual
    encodings (0.757→0.571 / 1.119→0.807 after 2 rounds)."""
    sub = (len(codebooks[0]) - 1) if codebooks else 0
    for _ in range(iters):
        coded = pq_encode(df, codebooks, n_sub, ksub, vec_col)
        comp = (
            coded.select("codes", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .select(
                (F.col("pos") / sub).cast("int").alias("s"),
                (F.col("pos") % sub).alias("p"),
                F.col("x"),
                F.get("codes", (F.col("pos") / sub).cast("int")).alias("c"),
            )
            .groupBy("s", "c", "p")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        fresh = {}
        for r in comp:
            fresh.setdefault((r.s, r.c), [0.0] * sub)[r.p] = float(r.mu)
        out = []
        for s in range(n_sub):
            for c in range(ksub):
                cw = fresh.get((s, c))
                if cw is None:
                    out.append(codebooks[s * ksub + c])
                    continue
                cw = [_round6(x) for x in cw]
                acc = 0.0
                for x in cw:
                    acc = acc + x * x
                out.append(cw + [0.5 * acc])
        codebooks = out
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[float]],
    n_sub: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col``: array<int> of length n_sub — per-subspace
    nearest-codeword ids (exact L2, deterministic first-index ties).
    Pure built-in expressions against the broadcast codebook: one scan,
    no shuffle, no Python."""
    sub = (len(codebooks[0]) - 1) if codebooks else 0
    out = attach_broadcast_matrix(
        ensure_min_parallelism(df), codebooks, "_pq_cb"
    )

    def code_for(s: Column) -> Column:
        return bind_once(
            F.transform(
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda c: _dot(
                    F.slice(vec_col, s * sub + 1, sub),
                    F.slice(F.get("_pq_cb", s * ksub + c), 1, sub),
                )
                - F.get(F.get("_pq_cb", s * ksub + c), sub),
            ),
            lambda sc: F.array_position(sc, F.array_max(sc)).cast("int") - 1,
        )

    return out.withColumn(
        out_col,
        F.transform(F.sequence(F.lit(0), F.lit(n_sub - 1)), code_for),
    ).drop("_pq_cb")


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[float]],
    k: int = 10,
    n_sub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: (qid, vec_id, est, rank) — the k corpus vectors with
    the highest ESTIMATED dot product per query, where the estimate
    reconstructs each document from its PQ codes
    (est = Σ_s  q_s · codebook[s][code_s]).

    The per-query lookup tables (n_sub·ksub partial dots, computed once
    on the driver from the collected — bounded, query-batch-sized —
    query vectors with the shared left-to-right accumulation) ship as
    ONE broadcast row per query; every document then costs n_sub
    lookups + adds. The corpus is scanned once, encoded in-row, and
    never shuffled except the final per-query top-k — whose shuffle
    input is itself bounded: WindowGroupLimit(Partial) keeps only the
    map-local top-k per query ahead of the Exchange (module docstring;
    plan-pinned in tests/test_plans.py)."""
    spark = corpus.sparkSession
    sub = (len(codebooks[0]) - 1) if codebooks else 0
    q_rows = queries.select(
        F.col(id_col).alias("_q"), F.col(vec_col).alias("_v")
    ).collect()
    luts = []
    for r in q_rows:
        qv = [float(x) for x in r["_v"]]
        lut = []
        for s in range(n_sub):
            qs = qv[s * sub : (s + 1) * sub]
            for c in range(ksub):
                cw = codebooks[s * ksub + c][:sub]
                acc = 0.0
                for x, y in zip(qs, cw):
                    acc = acc + x * y
                lut.append(acc)
        luts.append((int(r["_q"]), lut))
    from ..util import local_df

    lut_df = local_df(spark, luts, "qid long, _lut array<double>")

    coded = pq_encode(corpus, codebooks, n_sub, ksub, vec_col).select(
        id_col, "codes"
    )
    est = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.get("_lut", s * ksub + F.get("codes", s)),
    )
    scored = coded.crossJoin(F.broadcast(lut_df)).select(
        "qid", F.col(id_col), pround(est, 6).alias("est")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("est"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "est", F.col("rank").cast("int"))
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    n_sub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF × PQ — the two ANN scale levers composed (FAISS IVFPQ's
    shape): the IVF cells bound WHICH documents a query scores
    (nprobe · cell-population candidates instead of the corpus), PQ
    bounds WHAT each scored document costs (n_sub lookups instead of
    dim multiplies). Per query: O(nprobe · pop · n_sub) work against
    state of n_sub codes/doc.

    Plumbing: corpus is assigned a cell and PQ-encoded in ONE scan
    (both against broadcast tables — no shuffle); the query probe
    pairs (qid, cell) and per-query LUTs broadcast; the only shuffle
    is the pruning equi-join on the cell id plus the final top-k
    window (itself bounded map-side by WindowGroupLimit(Partial) —
    module docstring). Self-matches are excluded, mirroring ivf_topk's contract.
    This variant quantizes RAW vectors with the shared codebook;
    production FAISS encodes per-cell residuals for tighter estimates
    — same plumbing, finer codebook semantics — at the cost of
    per-(query, cell) LUT terms.

    Returns (qid, vec_id, est, rank ≤ k), ranks tie-broken on vec_id,
    estimates portably rounded — cross-engine replayable end to end
    (the `ivfpq_topk` oracle chains the IVF assignment/probe CTEs with
    the PQ codebook/LUT CTEs)."""
    from .ivf import assign_cell_col, attach_centroids, probe_cells_col

    spark = corpus.sparkSession
    sub = (len(codebooks[0]) - 1) if codebooks else 0

    coded = pq_encode(
        attach_centroids(
            ensure_min_parallelism(corpus), centroids, "_ivf_cents"
        ).withColumn("cell", assign_cell_col(F.col(vec_col), F.col("_ivf_cents"))),
        codebooks,
        n_sub,
        ksub,
        vec_col,
    ).select(id_col, "cell", "codes")

    probes = (
        attach_centroids(queries, centroids, "_ivf_cents")
        .select(
            F.col(id_col).alias("qid"),
            F.explode(
                probe_cells_col(F.col(vec_col), F.col("_ivf_cents"), nprobe)
            ).alias("cell"),
        )
    )

    q_rows = queries.select(
        F.col(id_col).alias("_q"), F.col(vec_col).alias("_v")
    ).collect()
    luts = []
    for r in q_rows:
        qv = [float(x) for x in r["_v"]]
        lut = []
        for s in range(n_sub):
            qs = qv[s * sub : (s + 1) * sub]
            for c in range(ksub):
                cw = codebooks[s * ksub + c][:sub]
                acc = 0.0
                for x, y in zip(qs, cw):
                    acc = acc + x * y
                lut.append(acc)
        luts.append((int(r["_q"]), lut))
    from ..util import local_df

    lut_df = local_df(spark, luts, "qid long, _lut array<double>")

    est = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.get("_lut", s * ksub + F.get("codes", s)),
    )
    scored = (
        coded.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("qid"))
        .join(F.broadcast(lut_df), "qid")
        .select("qid", F.col(id_col), pround(est, 6).alias("est"))
        # a document can sit in several probed cells of the same query
        # only if cells overlapped — they don't (hard assignment), so no
        # distinct needed; the probe pairs are distinct by construction
    )
    w = Window.partitionBy("qid").orderBy(F.desc("est"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "est", F.col("rank").cast("int"))
    )


def cell_residuals(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "cell",
    out_col: str = "residual",
) -> DataFrame:
    """Assign each vector to its nearest centroid and append the
    RESIDUAL (v − centroid[cell]) — the quantity production IVFPQ
    quantizes instead of the raw vector. The textbook motivation
    (residuals concentrate near the origin) pays off when the coarse
    quantizer has many tight cells; measured on the test corpus (16
    cells over 500 clustered unit vectors) raw-vector PQ actually
    quantizes tighter — both paths are exposed and the test records
    both numbers, so callers choose empirically. Exact IEEE elementwise
    subtraction (the oracle's list arithmetic reproduces it
    bit-for-bit); one scan, broadcast centroids, no shuffle."""
    from .ivf import assign_cell_col, attach_centroids

    out = attach_centroids(ensure_min_parallelism(corpus), centroids, "_rc")
    out = out.withColumn(cell_col, assign_cell_col(F.col(vec_col), F.col("_rc")))
    return out.withColumn(
        out_col,
        F.zip_with(
            F.col(vec_col), F.get("_rc", F.col(cell_col)), lambda x, y: x - y
        ),
    ).drop("_rc")


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    n_sub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ with RESIDUAL encoding — the full FAISS IVFPQ estimate:
    each document is reconstructed as centroid[cell] + decode(residual
    codes), so a query's estimated dot splits into
    q·centroid[cell]  (one term per (query, probed cell) — rides the
    tiny broadcast probe table)  +  Σ_s LUT[s][code_s]  (the shared
    residual-codebook lookups). Whether residual coding beats raw-
    vector PQ at the same bit budget depends on how well the coarse
    cells fit the data (see cell_residuals — at test scale raw wins,
    at FAISS's many-tight-cells scale residual is the standard).

    ``codebooks`` must be built on the residuals
    (pq_codebooks(cell_residuals(...), vec_col='residual')). Plumbing
    matches :func:`ivfpq_topk`: one corpus scan assigns + encodes, the
    pruning equi-join on cell is the only corpus shuffle, probe pairs
    (with their q·centroid base terms) and LUTs broadcast."""
    from .ivf import attach_centroids, probe_cells_col

    spark = corpus.sparkSession
    sub = (len(codebooks[0]) - 1) if codebooks else 0

    resid = cell_residuals(corpus, centroids, vec_col)
    coded = pq_encode(resid, codebooks, n_sub, ksub, "residual").select(
        id_col, "cell", "codes"
    )

    # probe pairs with the per-(query, cell) base term q·centroid[cell]
    probes = (
        attach_centroids(queries, centroids, "_qc")
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("_qv"),
            F.explode(
                probe_cells_col(F.col(vec_col), F.col("_qc"), nprobe)
            ).alias("cell"),
            F.col("_qc"),
        )
        .select(
            "qid",
            "cell",
            _dot("_qv", F.get("_qc", F.col("cell"))).alias("_base"),
        )
    )

    q_rows = queries.select(
        F.col(id_col).alias("_q"), F.col(vec_col).alias("_v")
    ).collect()
    luts = []
    for r in q_rows:
        qv = [float(x) for x in r["_v"]]
        lut = []
        for s in range(n_sub):
            qs = qv[s * sub : (s + 1) * sub]
            for c in range(ksub):
                cw = codebooks[s * ksub + c][:sub]
                acc = 0.0
                for x, y in zip(qs, cw):
                    acc = acc + x * y
                lut.append(acc)
        luts.append((int(r["_q"]), lut))
    from ..util import local_df

    lut_df = local_df(spark, luts, "qid long, _lut array<double>")

    est = F.col("_base") + F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.get("_lut", s * ksub + F.get("codes", s)),
    )
    scored = (
        coded.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("qid"))
        .join(F.broadcast(lut_df), "qid")
        .select("qid", F.col(id_col), pround(est, 6).alias("est"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("est"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "est", F.col("rank").cast("int"))
    )


def pq_adc_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[float]],
    k: int = 10,
    shortlist: int = 50,
    n_sub: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ in its production composition: ADC SHORTLIST + EXACT RE-RANK
    (how FAISS IndexPQ is actually deployed — quantized estimates
    nominate ``shortlist`` candidates per query, then the true dot
    product is computed for those rows only and the top ``k`` kept).

    Cost model at scale: the full corpus pays only the O(n_sub) ADC
    lookups; the O(dim) exact dots touch ``shortlist`` rows per query
    — recall is governed by P(true top-k ⊆ ADC top-shortlist), which
    the shortlist knob trades directly against re-rank cost. The
    shortlist ids semi-join back to the corpus vectors (id-first,
    fingerprints-after — the house candidate-join pattern), so full
    vectors never ride the scoring shuffle. Returns
    (qid, vec_id, dot, rank) with the EXACT portably-rounded dot."""
    spark = corpus.sparkSession
    short = pq_adc_topk(
        corpus, queries, codebooks, shortlist, n_sub, ksub, id_col, vec_col
    ).select("qid", id_col)
    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv")
    )
    cand = (
        short.join(
            corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")), id_col
        )
        .join(F.broadcast(q_rows), "qid")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc(id_col))
    return (
        cand.select(
            "qid", F.col(id_col), pround(_dot("_qv", "_cv"), 6).alias("dot")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "dot", F.col("rank").cast("int"))
    )
