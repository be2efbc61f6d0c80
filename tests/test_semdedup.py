"""SemDeDup keep-policy invariants on planted duplicate groups."""

from pyspark.sql import functions as F


def _unit(v):
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v]


def test_semantic_dedup_planted_groups(spark):
    from library_beam_spark.operators.ivf import seed_centroids
    from library_beam_spark.operators.semdedup import semantic_dedup

    dim = 8
    cents = seed_centroids(dim=dim, m=4, seed=7)
    base_a = _unit([1.0, 0.2, -0.5, 0.3, 0.9, -0.1, 0.0, 0.4])
    base_b = _unit([-0.8, 0.1, 0.7, -0.3, 0.2, 0.6, -0.4, 0.1])
    eps = 1e-4
    rows = [
        # group A: three paraphrases (near-identical embeddings)
        (10, base_a),
        (11, _unit([x + eps for x in base_a])),
        (12, _unit([x - eps for x in base_a])),
        # group B: two paraphrases
        (20, base_b),
        (21, _unit([x + eps for x in base_b])),
        # singleton far from both groups
        (30, _unit([0.1, -0.9, 0.2, 0.8, -0.3, 0.1, 0.5, -0.2])),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, cents, threshold=0.99).collect()}

    # lowest id of each similar group kept, the rest dropped
    assert out[10]["keep"] and not out[11]["keep"] and not out[12]["keep"]
    assert out[20]["keep"] and not out[21]["keep"]
    assert out[30]["keep"]
    # near-identical vectors must land in the same cell (sanity that the
    # verdicts above exercised the within-cell path)
    assert out[10]["cell"] == out[11]["cell"] == out[12]["cell"]


def test_semantic_dedup_no_cartesian_one_corpus_shuffle(spark):
    """The candidate join must be an equi-join on the cell id with the
    assignment Exchange reused — never a cartesian product."""
    from library_beam_spark.registry import queries

    df = queries()["semdedup_keep"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_threshold_monotone(spark):
    """Raising τ can only keep MORE documents."""
    from library_beam_spark.operators.ivf import seed_centroids
    from library_beam_spark.operators.semdedup import semantic_dedup
    from library_beam_spark.tables import table

    cents = seed_centroids(dim=64, m=16, seed=7)
    emb = table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    kept_lo = semantic_dedup(emb, cents, threshold=0.7).filter("keep").count()
    kept_hi = semantic_dedup(emb, cents, threshold=0.95).filter("keep").count()
    assert kept_lo <= kept_hi
