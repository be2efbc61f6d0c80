"""ANN quality: the LSH path must recover most of the exact top-k
(recall vs brute force), and both paths must be deterministic."""

from pyspark.sql import functions as F


def _emb(spark):
    from library_beam_spark.tables import table

    return table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_lsh_recall_vs_bruteforce(spark):
    from library_beam_spark.operators.similarity import cosine_topk, lsh_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5)
    # Uniform random embeddings are the worst case for sign-LSH (top
    # neighbors are near-orthogonal): shallow tables (4 planes), more of
    # them. Real clustered corpora allow deeper tables.
    approx = lsh_topk(emb, queries, k=5, dim=64, n_planes=4, n_tables=8)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_cosine_topk_deterministic(spark):
    from library_beam_spark.operators.similarity import cosine_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    r1 = sorted(map(tuple, cosine_topk(emb, q, k=5).collect()))
    r2 = sorted(map(tuple, cosine_topk(emb, q, k=5).collect()))
    assert r1 == r2


def test_simhash_near_dup_detects_planted(spark):
    from library_beam_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
            (3, "completely different text about spark catalyst optimizer and parquet files"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(df, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_near_dup_lsh_recall(spark):
    from library_beam_spark.operators.similarity import embedding_near_dup_pairs

    emb = _emb(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.45, use_lsh=False).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.45, use_lsh=True, n_planes=4, n_tables=8
        ).collect()
    }
    assert approx <= exact  # LSH never invents pairs
    if exact:
        assert len(approx) / len(exact) >= 0.5


def test_quantize_int8_roundtrip_accuracy(spark):
    """Codes stay in [-127, 127]; dequantized vectors reconstruct the
    original within one quantization step per element."""
    from library_beam_spark.operators.similarity import quantize_int8
    from library_beam_spark.tables import table as load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = quantize_int8(emb).join(emb, "vec_id")
    rows = q.select(
        F.array_max(F.transform("qvec", lambda x: F.abs(x))).alias("amax"),
        F.array_max(
            F.zip_with(
                "embedding", "qvec",
                lambda x, c: F.abs(x - c.cast("double") * F.col("scale")),
            )
        ).alias("err"),
        "scale",
    ).collect()
    for r in rows:
        assert r["amax"] <= 127
        assert r["err"] <= r["scale"] * 0.5 + 1e-12


# --- centroid confusion ---------------------------------------------------


def test_centroid_confusion_separable_clusters(spark):
    from library_beam_spark.operators.similarity import centroid_confusion

    # Three well-separated axis clusters with small deterministic jitter.
    rows = []
    for lab, axis in [(0, 0), (1, 1), (2, 2)]:
        for i in range(20):
            v = [0.0, 0.0, 0.0]
            v[axis] = 1.0
            v[(axis + 1) % 3] = 0.01 * (i % 5)
            rows.append((lab * 100 + i, v, lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = centroid_confusion(emb).collect()
    got = {(r.true_label, r.assigned_label): r.n_vectors for r in out}
    assert got == {(0, 0): 20, (1, 1): 20, (2, 2): 20}


def test_centroid_confusion_broadcasts_centroids(spark):
    from library_beam_spark.operators.similarity import centroid_confusion

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0], i % 3) for i in range(30)],
        "vec_id long, embedding array<float>, label int",
    )
    plan = centroid_confusion(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_int8_ann_recall_vs_float(spark):
    """The quantized top-10 must substantially agree with the float
    dot-product ranking (measured 0.8-0.9 here; gate at 0.7) — int8
    quantization is an approximation knob, not a different query."""
    from library_beam_spark.registry import queries
    from library_beam_spark.tables import table as _t

    sf = "/root/testdata/sf0.001"
    q8 = {r.vec_id for r in queries()["int8_ann_topk"](spark, sf).collect()}
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    exact = {
        r.vec_id
        for r in emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .withColumn("d", dot)
        .orderBy(F.desc("d"), "vec_id")
        .limit(10)
        .collect()
    }
    assert len(q8 & exact) / 10 >= 0.7
