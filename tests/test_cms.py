"""Count-min sketch (operators/cms.py): never under-estimates, merges
element-wise, and the sketch-prune heavy-hitter path is EXACT."""

import math

from pyspark.sql import functions as F

from library_beam_spark.operators.cms import (
    cms_attach,
    cms_build,
    cms_collect,
    cms_estimate,
    cms_merge,
    cms_params,
    heavy_hitters,
)


def _zipf(spark, n=20_000):
    # item id ~ floor(sqrt(id)): item v appears ~2v+1 times — a planted
    # skewed multiset with exactly known counts.
    return spark.range(n).select(
        F.concat(F.lit("t"), F.floor(F.sqrt(F.col("id"))).cast("int")).alias("term")
    )


def test_params_textbook_point():
    d, w = cms_params(epsilon=0.001, delta=0.01)
    assert d == math.ceil(math.log(100))  # 5
    assert w == math.ceil(math.e / 0.001)  # 2719


def test_estimate_never_below_true_count(spark):
    occ = _zipf(spark)
    d, w = 4, 1024
    flat = cms_collect(cms_build(occ, "term", d, w), d, w)
    true = occ.groupBy("term").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_attach(true, flat).select(
        "term",
        "true_n",
        cms_estimate(F.col("term"), F.col("_cms"), d, w).alias("est"),
    )
    assert est.where(F.col("est") < F.col("true_n")).count() == 0
    # and with a decently-sized sketch the over-estimate is tight
    n_total = occ.count()
    slack = est.select(F.max(F.col("est") - F.col("true_n"))).first()[0]
    assert slack <= math.e / w * n_total * 3  # 3x the epsilon*N bound


def test_merge_equals_build_of_union(spark):
    occ = _zipf(spark)
    d, w = 3, 512
    whole = cms_collect(cms_build(occ, "term", d, w), d, w)
    a = cms_build(occ.where(F.col("term") < "t5"), "term", d, w)
    b = cms_build(occ.where(F.col("term") >= "t5"), "term", d, w)
    assert cms_collect(cms_merge(a, b), d, w) == whole


def test_heavy_hitters_exact_vs_direct(spark):
    occ = _zipf(spark).persist()
    got = {
        (r["term"], r["n"])
        for r in heavy_hitters(occ, "term", threshold=150, depth=4, width=512).collect()
    }
    want = {
        (r["term"], r["n"])
        for r in occ.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 150)
        .collect()
    }
    occ.unpersist()
    assert got == want and len(want) > 0


def test_tiny_sketch_still_exact_just_more_candidates(spark):
    # undersized width => heavy collisions => more false candidates into
    # the exact recount — the ANSWER must not change.
    occ = _zipf(spark, n=5000).persist()
    got = {
        (r["term"], r["n"])
        for r in heavy_hitters(occ, "term", threshold=80, depth=2, width=16).collect()
    }
    want = {
        (r["term"], r["n"])
        for r in occ.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 80)
        .collect()
    }
    occ.unpersist()
    assert got == want
