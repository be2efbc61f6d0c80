"""Benchmark decontamination (operators/decontaminate.py)."""

from library_beam_spark.operators.decontaminate import (
    decontaminate,
    ngram_overlap_pairs,
)

EVAL_RUN = "zero one two three four five six seven eight nine ten eleven twelve"  # 13 words


def _frames(spark):
    train = spark.createDataFrame(
        [
            (1, f"clean document with its own words and nothing borrowed at all ok {'filler ' * 5}"),
            (2, f"some head text then {EVAL_RUN} and then a tail"),       # contaminated
            (3, "short doc"),                                             # < 13 words
            (4, f"another clean one about completely different topics {'pad ' * 10}"),
        ],
        "doc_id INT, text STRING",
    )
    eval_df = spark.createDataFrame(
        [(100, f"benchmark question: {EVAL_RUN} answer choices follow")],
        "doc_id INT, text STRING",
    )
    return train, eval_df


def test_overlap_pairs_find_planted_contamination(spark):
    train, eval_df = _frames(spark)
    rows = ngram_overlap_pairs(train, eval_df, n=13).collect()
    assert [(r.train_id, r.eval_id) for r in rows] == [(2, 100)]
    assert rows[0].n_common == 1  # exactly the one shared 13-gram


def test_decontaminate_removes_only_contaminated(spark):
    train, eval_df = _frames(spark)
    kept = sorted(r.doc_id for r in decontaminate(train, eval_df, n=13).collect())
    assert kept == [1, 3, 4]


def test_case_and_punctuation_insensitive(spark):
    train = spark.createDataFrame(
        [(1, f"prefix {EVAL_RUN.upper()}, suffix!")], "doc_id INT, text STRING"
    )
    eval_df = spark.createDataFrame(
        [(9, f"x {EVAL_RUN} y")], "doc_id INT, text STRING"
    )
    assert ngram_overlap_pairs(train, eval_df, n=13).count() == 1


def test_overlap_below_n_is_clean(spark):
    twelve = " ".join(EVAL_RUN.split()[:12])
    train = spark.createDataFrame(
        [(1, f"a b c {twelve} d e f")], "doc_id INT, text STRING"
    )
    eval_df = spark.createDataFrame([(9, EVAL_RUN)], "doc_id INT, text STRING")
    assert ngram_overlap_pairs(train, eval_df, n=13).count() == 0


def test_eval_side_is_broadcast(spark):
    train, eval_df = _frames(spark)
    plan = (
        ngram_overlap_pairs(train, eval_df, n=13)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_decontaminate_custom_eval_columns(spark):
    """eval set with differently-named id/text columns works (r2 ADVICE)."""
    from library_beam_spark.operators.decontaminate import decontaminate

    train, eval_df = _frames(spark)
    renamed = (
        eval_df.withColumnRenamed("doc_id", "bench_id")
        .withColumnRenamed("text", "prompt")
    )
    base = {r["doc_id"] for r in decontaminate(train, eval_df, n=13).collect()}
    got = {
        r["doc_id"]
        for r in decontaminate(
            train, renamed, n=13, eval_id="bench_id", eval_text_col="prompt"
        ).collect()
    }
    assert got == base and len(base) < train.count()
