"""Physical-plan property tests for the round-14 changes — the same
100 TB design assertions as tests/test_plans*.py.

Round 14's plan-shaped claims: the WordPiece UNK scan stays a pure
JVM column chain on the distinct-word grain (no Python eval anywhere);
the tombstone-skyline resurrection read pushes its scalar region
prefilter down to the parquet scan of the points log (the log is only
opened on front-delete batches — io_log-pinned in
tests/test_streaming_skyline.py — and when it IS opened, the scan
must not read outside the deleted points' bounding box).
"""

from pyspark.sql import functions as F

from library_beam_spark import registry
from library_beam_spark.plans import (
    assert_filter_pushed,
    assert_no_python_eval,
)

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return registry.queries()[name](spark, SF)


def test_wordpiece_unk_pure_column_chain(spark):
    """The UNK contract adds one CASE per step (the restricted char
    fallback) and a final is_unk projection — still zero Python."""
    df = _q(spark, "wordpiece_unk_counts")
    assert_no_python_eval(df)


def test_skyline_resurrection_prefilter_is_pushed(spark, tmp_path):
    """The resurrection candidate read's scalar bounding-box prefilter
    (x >= min deleted x, y <= max deleted y) must reach the parquet
    scan of the points log as PushedFilters — at 100 TB the log is
    large and the deleted region is the small side, so the scan, not
    the join, must do the cutting. Reproduces the exact read shape the
    fold builds (streaming/skyline.py resurrection branch)."""
    log_dir = str(tmp_path / "points")
    spark.createDataFrame(
        [(i, i % 97, (7 * i) % 89) for i in range(500)],
        "id long, x long, y long",
    ).write.parquet(log_dir)
    cand = spark.read.parquet(log_dir).filter(
        (F.col("x") >= F.lit(40)) & (F.col("y") <= F.lit(30))
    )
    assert_filter_pushed(cand, "x")
    assert_filter_pushed(cand, "y")


def test_mpeg_synth_same_kernel_shape_as_decode(spark):
    """The synthesis query is the decode query's mapInPandas kernel
    shape: per-row, no shuffle before the kernel (one Exchange at most
    from ensure_min_parallelism's round-robin)."""
    from library_beam_spark.plans import formatted_plan

    df = _q(spark, "multimodal_mpeg_audio_synth")
    full = formatted_plan(df)
    assert "SortMergeJoin" not in full and "HashAggregate" not in full


def test_pmi_collocations_plan(spark):
    """Count-grain law: partial aggregation collapses occurrences
    map-side, the global top-25 on the rounded score is
    TakeOrderedAndProject (per-partition heaps, never a global sort),
    and the whole statistic is JVM-only."""
    from library_beam_spark.plans import (
        assert_no_python_eval,
        assert_partial_aggregation,
        formatted_plan,
    )

    df = _q(spark, "pmi_collocations")
    assert_no_python_eval(df)
    assert_partial_aggregation(df)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_association_rules_plan(spark):
    """In-basket enumeration: no self-join of the basket relation (the
    pair fan-out is an array expression inside one row), the dimension
    joins broadcast, runtime exchange reuse dedupes the identical
    basket subtrees, and the rule relation is bounded at
    brands·(brands−1) rows."""
    from library_beam_spark.plans import (
        assert_broadcast_join,
        assert_no_python_eval,
        executed_plan,
        formatted_plan,
    )

    df = _q(spark, "association_rules")
    assert_no_python_eval(df)
    assert_broadcast_join(df, expect=3)
    # no sort-merge self-join anywhere: the basket pair build is an
    # in-row array expression, not a join
    assert "SortMergeJoin" not in formatted_plan(df)
    rows = df.collect()
    assert 0 < len(rows) <= 25 * 24
    assert executed_plan(df).count("ReusedExchange") >= 2, (
        "identical basket subtrees were not deduped at runtime"
    )


def test_reservoir_merge_rank_is_partial_window_group_limit(spark):
    """The bounded-state sample merge ships ≤ k rows per stratum per
    task: the row_number ≤ k filter must ride Spark 4's partial
    WindowGroupLimit before the exchange (the operators/kmv.py plan
    law, carried to the payload-bearing sample state)."""
    import re

    from library_beam_spark.plans import (
        assert_no_python_eval,
        formatted_plan,
    )
    from library_beam_spark.streaming.sample import reservoir_merge
    from pyspark.sql import functions as F

    from library_beam_spark.operators.kmv import kmv_hash_col

    rows = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("lang"),
        F.col("id").alias("doc_id"),
        (F.col("id") * 10).alias("n_chars"),
        kmv_hash_col("id").alias("res_h"),
    )
    merged = reservoir_merge([rows], ["lang"], "doc_id", k=16)
    assert_no_python_eval(merged)
    assert re.search(r"row_number\(\), \d+, Partial", formatted_plan(merged)), (
        "rank-k filter not pushed to a partial WindowGroupLimit"
    )


def test_chi2_term_lang_plan(spark):
    """Count-grain law + bounded rank: term totals derive from the
    (term, lang) count grain (never occurrences), lang totals and N
    ride broadcasts, the per-lang top-10 filter lands in a
    WindowGroupLimit, all JVM-side."""
    import re

    from library_beam_spark.plans import (
        assert_broadcast_join,
        assert_no_python_eval,
        assert_partial_aggregation,
        formatted_plan,
    )

    df = _q(spark, "chi2_term_lang")
    assert_no_python_eval(df)
    assert_partial_aggregation(df)
    assert_broadcast_join(df, expect=2)
    assert re.search(r"WindowGroupLimit", formatted_plan(df)), (
        "per-lang top-10 not bounded by WindowGroupLimit"
    )
