"""MMR rerank semantics: on a shortlist with a redundant cluster, pure
relevance keeps the near-duplicates; MMR (the Carbonell & Goldstein
trade-off) must break them up."""

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.similarity import mmr_rerank


@pytest.fixture(scope="module")
def shortlist(spark):
    # Three near-identical high-relevance vectors (a redundant cluster)
    # plus two orthogonal lower-relevance ones. rel is cosine to the
    # cluster direction, so pure top-3 = the cluster.
    rows = [
        (1, [1.0, 0.0, 0.0], 1.0),
        (2, [0.999, 0.04, 0.0], 0.999),
        (3, [0.998, 0.06, 0.0], 0.998),
        (4, [0.0, 1.0, 0.0], 0.30),
        (5, [0.0, 0.0, 1.0], 0.25),
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>, rel double")


def test_mmr_breaks_up_redundant_cluster(shortlist):
    out = mmr_rerank(shortlist, k=3, lam=0.5).orderBy("mmr_rank").collect()
    picked = [r.vec_id for r in out]
    # rank 0 is pure relevance; after that the cluster's twins are
    # penalized by ~cos≈1 and the orthogonal vectors win
    assert picked[0] == 1
    assert set(picked[1:]) == {4, 5}
    assert [r.mmr_rank for r in out] == [0, 1, 2]


def test_mmr_lambda_one_is_pure_relevance(shortlist):
    out = mmr_rerank(shortlist, k=3, lam=1.0).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in out] == [1, 2, 3]


def test_mmr_negative_similarity_not_clamped(spark):
    # An anti-correlated pick must REWARD the candidate (penalty term
    # negative), not clamp to zero: with lam=0.5, candidate 2
    # (cos=-1 to pick 1) scores 0.5*0.1 + 0.5*1.0 = 0.55 over
    # candidate 3 (cos=0, rel=0.4 -> 0.2).
    rows = [
        (1, [1.0, 0.0], 0.9),
        (2, [-1.0, 0.0], 0.1),
        (3, [0.0, 1.0], 0.4),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, rel double")
    out = mmr_rerank(df, k=2, lam=0.5).orderBy("mmr_rank").collect()
    assert [r.vec_id for r in out] == [1, 2]


def test_ivf_mmr_degenerates_to_exact_at_full_probe(spark):
    """With nprobe = m the IVF prune is a no-op, so the IVF-pruned MMR
    pipeline must pick the IDENTICAL sequence as the exact-shortlist
    form — the ivf_ann_topk recall discipline applied to the composed
    rerank."""
    from library_beam_spark.operators.ivf import assign_cell, probe_cells
    from library_beam_spark.operators.similarity import cosine
    from library_beam_spark.registry import _ivf_params, queries

    sf = "/root/testdata/sf0.001"
    centroids, _, _ = _ivf_params()
    m = len(centroids)
    from library_beam_spark.tables import table as _t

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") != 0).withColumn(
        "cell", assign_cell(F.col("v"), centroids)
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"),
        F.explode(probe_cells(F.col("v"), centroids, m)).alias("cell"),
    )
    cand = (
        corpus.join(F.broadcast(q), "cell")
        .withColumn("rel", cosine(F.col("v"), F.col("qv")))
        .drop("qv", "cell")
    )
    from library_beam_spark.operators.similarity import mmr_rerank

    short = cand.orderBy(F.desc("rel"), "vec_id").limit(40).select(
        "vec_id", "v", "rel"
    )
    full = [
        (r.mmr_rank, r.vec_id)
        for r in mmr_rerank(short, k=8, lam=0.7).collect()
    ]
    exact = [
        (r.mmr_rank, r.vec_id)
        for r in queries()["mmr_diversified_topk"](spark, sf).collect()
    ]
    assert sorted(full) == sorted(exact)
