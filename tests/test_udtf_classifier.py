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
