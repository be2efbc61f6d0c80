"""IVF ANN (operators/ivf.py)."""

import math

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.ivf import (
    assign_cell,
    ivf_topk,
    probe_cells,
    refine_centroids,
    seed_centroids,
)
from library_beam_spark.operators.similarity import cosine_topk
from tests.conftest import SF_SMALL

M = 16


@pytest.fixture(scope="module")
def emb(spark):
    from library_beam_spark.tables import table

    return table(spark, SF_SMALL, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


@pytest.fixture(scope="module")
def centroids():
    return seed_centroids(dim=64, m=M, seed=7)


def test_every_vector_gets_exactly_one_valid_cell(spark, emb, centroids):
    cells = emb.select(
        "vec_id", assign_cell(F.col("embedding"), centroids).alias("cell")
    )
    assert cells.count() == emb.count()
    lo, hi = cells.agg(F.min("cell"), F.max("cell")).first()
    assert 0 <= lo and hi < M


def test_probe_cells_are_distinct_and_start_with_own_cell(spark, emb, centroids):
    r = emb.select(
        assign_cell(F.col("embedding"), centroids).alias("cell"),
        probe_cells(F.col("embedding"), centroids, 4).alias("probes"),
    ).first()
    assert len(set(r.probes)) == 4
    assert r.probes[0] == r.cell  # nearest cell is the assigned cell


def test_full_probe_equals_exact_bruteforce(spark, emb, centroids):
    q = emb.where(F.col("vec_id") < 3)
    approx = sorted(
        (r.query_id, r.neighbor_id, r.sim)
        for r in ivf_topk(emb, q, centroids, k=5, nprobe=M).collect()
    )
    exact = sorted(
        (r.query_id, r.neighbor_id, r.sim)
        for r in cosine_topk(emb, q, k=5).collect()
    )
    assert approx == exact


def test_partial_probe_recall(spark, emb, centroids):
    q = emb.where(F.col("vec_id") < 10)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, centroids, k=5, nprobe=6).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, q, k=5).collect()
    }
    recall = len(approx & exact) / len(exact)
    # uniform synthetic vectors are ANN's worst case; 6/16 cells must
    # still recover a solid fraction and the join must stay non-trivial
    assert recall >= 0.3, recall


def test_refine_centroids_improves_quantization(spark, emb, centroids):
    def objective(cents):
        from library_beam_spark.operators.ivf import _sims

        return emb.select(
            F.array_max(_sims(F.col("embedding"), cents)).alias("s")
        ).agg(F.avg("s")).first()[0]

    refined = refine_centroids(emb, centroids, iters=2)
    assert len(refined) == M and all(len(c) == 64 for c in refined)
    for c in refined:
        assert math.isclose(sum(v * v for v in c), 1.0, rel_tol=1e-9)
    assert objective(refined) > objective(centroids)


def test_plan_broadcast_no_cartesian(spark, emb, centroids):
    plan = (
        # materialize=False: the lazy plan, so the join strategy is visible
        ivf_topk(
            emb, emb.where(F.col("vec_id") < 3), centroids, k=5, nprobe=4,
            materialize=False,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # the cell equi-join
    assert "CartesianProduct" not in plan
    # the ONLY nested-loop joins allowed are the broadcast 1-row centroid
    # carriers (attach_centroids) — never a data-sized all-pairs join.
    # r16: the carrier is a JVM LocalTableScan (util.local_df routes
    # literal tables through Arrow instead of a pickled Python RDD);
    # pre-r16 it planned as Scan ExistingRDD — accept either so the
    # fallback path stays covered.
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_carrier = plan.count("Scan ExistingRDD[_cents") + plan.count(
        "LocalTableScan [_cents"
    )
    assert n_bnlj == n_carrier and n_carrier >= 1, plan[:2000]


def test_vectorized_assignment_bit_parity_with_hof(spark, emb):
    """The numpy kernel must agree with the HOF path on EVERY row — the
    per-dimension accumulation keeps IEEE add order identical, so this
    is exact equality, not approximate."""
    from library_beam_spark.operators.ivf import (
        assign_cell_col,
        assign_cells_vectorized,
        attach_centroids,
        sampled_centroids,
    )

    # enough cells to cross _VECTORIZE_THRESHOLD in production use; the
    # parity check itself runs both paths explicitly
    cents = sampled_centroids(emb, 72, "vec_id", "embedding", salt="parity")
    got = {
        (r["vec_id"], r["cell"])
        for r in assign_cells_vectorized(emb, cents).select("vec_id", "cell").collect()
    }
    want = {
        (r["vec_id"], r["cell"])
        for r in attach_centroids(emb, cents)
        .select(
            "vec_id", assign_cell_col(F.col("embedding"), F.col("_cents")).alias("cell")
        )
        .collect()
    }
    assert got == want


def test_vectorized_assignment_tie_breaks_to_first_cell(spark):
    """A vector equidistant from two identical centroids must take the
    LOWER cell id on both paths (np.argmax first-occurrence ==
    array_position first-match)."""
    from library_beam_spark.operators.ivf import (
        assign_cell_col,
        assign_cells_vectorized,
        attach_centroids,
    )

    dup = [0.6, 0.8, 0.0]
    cents = [[0.0, 1.0, 0.0], dup, [1.0, 0.0, 0.0], dup]
    rows = spark.createDataFrame(
        [(1, dup), (2, [0.0, 0.0, 1.0])], "vec_id int, embedding array<double>"
    )
    np_cells = {
        r["vec_id"]: r["cell"]
        for r in assign_cells_vectorized(rows, cents).collect()
    }
    hof_cells = {
        r["vec_id"]: r["cell"]
        for r in attach_centroids(rows, cents)
        .select("vec_id", assign_cell_col(F.col("embedding"), F.col("_cents")).alias("cell"))
        .collect()
    }
    assert np_cells == hof_cells
    assert np_cells[1] == 1  # the FIRST of the two identical best cells


def test_two_level_groups_partition_and_anchor_ownership():
    from library_beam_spark.operators.ivf import seed_centroids, two_level_groups

    cents = seed_centroids(dim=16, m=40, seed=3)
    groups = two_level_groups(cents)
    assert len(groups) == 7  # ceil(sqrt(40))
    flat = sorted(j for g in groups for j in g)
    assert flat == list(range(40))  # exact partition, nothing lost/duplicated
    for i, g in enumerate(groups):
        assert i in g  # anchors own their groups -> never empty
        assert g == sorted(g)  # ascending members = lowest-id tie rule


def test_two_level_assignment_lands_in_chosen_coarse_group(spark, emb):
    from library_beam_spark.operators.ivf import (
        assign_cells_two_level,
        sampled_centroids,
        two_level_groups,
    )

    cents = sampled_centroids(emb, 36, "vec_id", "embedding", salt="2lv")
    groups = two_level_groups(cents)
    cell_to_group = {j: gi for gi, g in enumerate(groups) for j in g}
    rows = assign_cells_two_level(emb, cents).select("vec_id", "cell").collect()
    assert len(rows) == emb.count()
    # every assigned cell is a real centroid id inside SOME group
    assert all(r["cell"] in cell_to_group for r in rows)


def test_two_level_quantization_close_to_flat(spark, emb):
    """Two-level is an approximation of flat argmax: exact cell ids are
    config-sensitive near cell boundaries, but the QUANTIZATION QUALITY
    (dot of each vector with its chosen centroid) must stay close to
    the flat optimum, or the coarse routing is broken."""
    import numpy as np

    from library_beam_spark.operators.ivf import (
        assign_cells_two_level,
        assign_cells_vectorized,
        sampled_centroids,
    )

    cents = sampled_centroids(emb, 36, "vec_id", "embedding", salt="2lv")
    C = np.asarray(cents)
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb.collect()}

    def mean_dot(assignment):
        return float(
            np.mean([vecs[k] @ C[cell] for k, cell in assignment.items()])
        )

    tl = {r["vec_id"]: r["cell"] for r in assign_cells_two_level(emb, cents).collect()}
    fl = {r["vec_id"]: r["cell"] for r in assign_cells_vectorized(emb, cents).collect()}
    q_tl, q_fl = mean_dot(tl), mean_dot(fl)
    assert q_fl > 0  # sanity: clustered unit vectors
    assert q_tl >= 0.85 * q_fl, f"two-level {q_tl:.4f} vs flat {q_fl:.4f}"




def test_two_level_probe_list_contract(spark, emb):
    """Probes: nprobe distinct real cells, drawn only from the union of
    the top-2 coarse groups, ordered best-first by (dot desc, id asc)."""
    import numpy as np

    from library_beam_spark.operators.ivf import (
        probe_cells_two_level,
        sampled_centroids,
        two_level_groups,
    )

    cents = sampled_centroids(emb, 36, "vec_id", "embedding", salt="2lv")
    groups = two_level_groups(cents)
    C = np.asarray(cents)
    rows = probe_cells_two_level(
        emb.where(F.col("vec_id") < 20), cents, nprobe=4
    ).collect()
    assert len(rows) == 20
    for r in rows:
        p = r["probes"]
        assert len(p) == 4 and len(set(p)) == 4
        v = np.asarray(r["embedding"])
        # group membership: all probes from at most 2 coarse groups
        gs = {gi for gi, g in enumerate(groups) for c in p if c in g}
        assert len(gs) <= 2
        # best-first: dots non-increasing along the probe list
        dots = [float(v @ C[c]) for c in p]
        assert all(dots[i] >= dots[i + 1] - 1e-12 for i in range(3))


def test_label_exclusion_inside_cell_join(spark, emb, centroids):
    """exclude_label_col drops same-label candidates INSIDE the cell
    join: no returned negative shares its anchor's label, and with
    nprobe=m the result equals the exact broadcast hard-negative form
    (brute-force cosine over all different-label vectors)."""
    from library_beam_spark.operators.similarity import cosine

    q = emb.where(F.col("vec_id") < 5)
    mined = ivf_topk(
        emb, q, centroids, k=5, nprobe=M, exclude_label_col="label"
    )
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    got = [(r.query_id, r.neighbor_id, r.sim) for r in mined.collect()]
    assert got, "empty mining result"
    for qid, nid, _ in got:
        assert labels[nid] != labels[qid]

    from pyspark.sql import Window
    from library_beam_spark.functions.portable import pround

    a = q.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    exact = (
        emb.join(
            F.broadcast(a),
            (F.col("label") != F.col("ql")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            pround(cosine(F.col("qv"), F.col("embedding")), 6).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
            ),
        )
        .where(F.col("rn") <= 5)
    )
    want = sorted((r.q_id, r.n_id, r.sim) for r in exact.collect())
    assert sorted(got) == want


def test_hard_negative_ivf_partial_probe_recall(spark, emb, centroids):
    """nprobe=6 cell pruning must recover a solid fraction of the exact
    different-label top-5 (uniform synthetic vectors are ANN's worst
    case — same 0.3 bar as test_partial_probe_recall)."""
    q = emb.where(F.col("vec_id") < 10)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, q, centroids, k=5, nprobe=6, exclude_label_col="label"
        ).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, q, centroids, k=5, nprobe=M, exclude_label_col="label"
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, recall
