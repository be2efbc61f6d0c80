"""Bucketized range join — the scalable plan for point-in-interval
joins when NEITHER side fits in a broadcast.

Spark's native answer to ``v BETWEEN lo AND hi`` is a
BroadcastNestedLoopJoin (fine while one side is small — the
range_join_events query) or, worse, a cartesian product. When both
sides are large the standard fix is grid bucketization (the
O'Neil-style band join; Databricks ships the same idea as
``SKEW`` / range-join binning hints):

1. choose a bucket width W on the value axis;
2. every interval [lo, hi) is exploded to the buckets it covers —
   ``sequence(floor(lo/W), floor(hi/W))`` — fan-out = interval
   length / W + 1, bounded by construction when intervals are short
   relative to W;
3. every probe row maps to its single bucket ``floor(v/W)``;
4. equi-join on the bucket id (hash shuffle both sides — co-located,
   skew-safe for any number of rows), then re-check the exact
   predicate.

Each (probe, interval) pair meets in EXACTLY one bucket — the probe's
own — so the join needs no post-dedup. Pick W near the typical
interval width: too small multiplies the interval fan-out, too large
degrades each bucket toward a local nested loop. Degenerate long
intervals (≫ W) are the skew knob — split them upstream or raise W.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketized_range_join"]


def _bucket(col: Column, width: float) -> Column:
    return F.floor(col.cast("double") / F.lit(float(width))).cast("bigint")


def bucketized_range_join(
    probes: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Rows of ``probes`` × ``intervals`` with
    ``lo <= value < hi`` (half-open), joined via bucket equi-join.

    Column names must be disjoint between the two inputs (the result
    carries both sides' columns).
    """
    if not bucket_width > 0:
        raise ValueError(
            f"bucket_width must be positive, got {bucket_width!r} "
            "(zero divides to infinite buckets, negative inverts the "
            "grid ordering)"
        )
    overlap = set(probes.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"overlapping columns between sides: {overlap}")
    # Inverted intervals (lo > hi) match nothing by definition — guard
    # them to an EMPTY bucket array. Without this, F.sequence steps -1
    # and fans the malformed row out to every bucket it "descends"
    # through: the exact re-check still discards the rows, but only
    # after paying shuffle volume proportional to the inversion size.
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.when(
                F.col(lo_col) <= F.col(hi_col),
                F.sequence(
                    _bucket(F.col(lo_col), bucket_width),
                    _bucket(F.col(hi_col), bucket_width),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )
    pr = probes.withColumn(
        "_rj_bucket", _bucket(F.col(value_col), bucket_width)
    )
    return (
        pr.join(iv, "_rj_bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_rj_bucket")
    )
