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
