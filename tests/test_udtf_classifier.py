"""UDTF mechanism + linear classifier application."""

from pyspark.sql import functions as F


def test_udtf_lateral_executes_python_udtf(spark):
    from library_beam_spark.registry import queries

    df = queries()["udtf_ngram_spans"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "UDTF" in plan  # BatchEvalPythonUDTF / ArrowEvalPythonUDTF
    rows = df.filter(F.col("doc_id") == 0).orderBy("pos").collect()
    # positions are dense from 0
    assert [r["pos"] for r in rows] == list(range(len(rows)))
    assert all(len(r["ngram"].split(" ")) == 3 for r in rows)


def test_classifier_matches_python_reference(spark):
    import re

    from library_beam_spark.operators.classifier import (
        score_documents,
        weights_df,
    )

    w = [("apple", 500), ("bad", -800), ("ok", 10)]
    docs = [
        (1, "Apple pie is OK, apple!"),   # 2*500 + 10 = 1010
        (2, "bad Bad BAD"),               # -2400
        (3, "nothing matches here"),      # 0 hits → bias only
        (4, ""),                          # empty text → bias only
    ]
    out = {
        r["doc_id"]: (r["score_milli"], r["n_hits"], r["label"])
        for r in score_documents(
            spark.createDataFrame(docs, "doc_id long, text string"),
            weights_df(spark, w),
            bias_milli=-100,
        ).collect()
    }
    wd = dict(w)
    for did, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        score = -100 + sum(wd.get(t, 0) for t in toks)
        hits = sum(1 for t in toks if t in wd)
        assert out[did] == (score, hits, score > 0), did


def test_classifier_broadcasts_weight_table(spark):
    from library_beam_spark.registry import queries

    df = queries()["linear_classifier_scores"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hard_sigmoid_lr_learns_the_length_label(spark):
    """The label is length-derived, and f1/f2 are length-coupled, so
    training must (a) move weights off zero in a way that separates the
    classes better than the 0-iteration constant model, and (b) be
    exactly reproducible run to run (the determinism contract the
    oracle also checks cross-engine)."""
    from library_beam_spark.operators.classifier import (
        lr_features,
        train_hard_sigmoid_lr,
    )
    from library_beam_spark.tables import table
    from pyspark.sql import functions as F

    feats = lr_features(table(spark, "/root/testdata/sf0.01", "documents"))
    feats = feats.localCheckpoint(eager=True)
    w, b, n = train_hard_sigmoid_lr(feats)  # 20 iters, lr=4.0
    assert n == feats.count()
    w2, b2, _ = train_hard_sigmoid_lr(feats)
    assert (w, b) == (w2, b2)  # bit-identical replay

    z = (
        (F.col("f1") * F.lit(w[0]) + F.col("f2") * F.lit(w[1]))
        + F.col("f3") * F.lit(w[2])
    ) + F.lit(b)
    p = F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.lit(0.5) + z / F.lit(4.0)))
    correct = feats.where(
        ((F.col("y") == 1.0) & (p > 0.5)) | ((F.col("y") == 0.0) & (p <= 0.5))
    ).count()
    majority = max(
        feats.where(F.col("y") == 1.0).count(),
        feats.where(F.col("y") == 0.0).count(),
    )
    assert correct / n > majority / n, (correct, majority, n, w, b)


def test_rho_loss_prefers_learnable_points(spark):
    """RHO-loss semantics (Mindermann et al. 2022): a point the
    HOLDOUT model predicts well but the CURRENT model predicts badly
    has high reducible loss; a point BOTH models fail (label noise)
    scores near zero and must rank below it. Verified directly on the
    loss arithmetic the registry query uses."""
    from library_beam_spark.operators.classifier import (
        train_hard_sigmoid_lr,
    )
    from pyspark.sql import functions as F

    # learnable cluster: y follows f1 cleanly; noise points: y flipped
    rows = []
    for i in range(40):
        f1 = 1.0 if i % 2 else 0.0
        rows.append((i, float(i % 2), f1, 0.5, 0.5))  # clean
    for i in range(40, 44):
        f1 = 1.0 if i % 2 else 0.0
        rows.append((i, float(1 - i % 2), f1, 0.5, 0.5))  # label noise
    feats = spark.createDataFrame(
        rows, "doc_id long, y double, f1 double, f2 double, f3 double"
    )
    holdout = feats.filter(F.col("doc_id") < 20)          # clean only
    pool = feats.filter(F.col("doc_id") >= 20)
    w_h, b_h, _ = train_hard_sigmoid_lr(holdout, iters=20, lr=4.0)
    w_t, b_t, _ = train_hard_sigmoid_lr(pool.limit(0), iters=0, lr=4.0)

    def p(w, b):
        z = (
            (F.col("f1") * F.lit(w[0]) + F.col("f2") * F.lit(w[1]))
            + F.col("f3") * F.lit(w[2])
        ) + F.lit(b)
        return F.greatest(
            F.lit(0.0), F.least(F.lit(1.0), F.lit(0.5) + z / F.lit(4.0))
        )

    e_t = F.col("y") - p(w_t, b_t)   # untrained current model
    e_h = F.col("y") - p(w_h, b_h)
    scored = pool.select(
        "doc_id", "y", ((e_t * e_t) - (e_h * e_h)).alias("rho")
    ).collect()
    clean = [r.rho for r in scored if r.doc_id < 40]
    noisy = [r.rho for r in scored if r.doc_id >= 40]
    # clean learnable points: holdout model is right, current isn't →
    # positive reducible loss; noise: holdout model is ALSO wrong →
    # its irreducible loss cancels the current loss
    assert min(clean) > max(noisy), (clean, noisy)
