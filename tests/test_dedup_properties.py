"""Dedup properties (SURVEY §5 strategy 4): idempotence, count law,
winner membership; plus partitioned-write round trip and the count gate."""

import pytest
from pyspark.sql import functions as F


def _dedup(df):
    from library_beam_spark.operators.dedup import latest_version

    return latest_version(
        df,
        key_cols=["l_orderkey"],
        version_cols=["l_shipdate", "l_linenumber", "l_extendedprice"],
    )


def test_latest_version_idempotent(spark):
    from library_beam_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem")
    once = _dedup(li)
    twice = _dedup(once)
    a = sorted(map(tuple, once.select("l_orderkey", "l_linenumber").collect()))
    b = sorted(map(tuple, twice.select("l_orderkey", "l_linenumber").collect()))
    assert a == b


def test_latest_version_count_and_membership(spark):
    from library_beam_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem")
    out = _dedup(li)
    assert out.count() == li.select("l_orderkey").distinct().count()
    # every output row is an input row (no synthesis)
    assert out.exceptAll(li.select(*out.columns)).count() == 0


def test_exact_dedup_idempotent(spark):
    from library_beam_spark.operators.dedup import exact_dedup
    from library_beam_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    once = exact_dedup(docs).drop("fingerprint")
    twice = exact_dedup(once).drop("fingerprint")
    assert once.count() == twice.count()


def test_partitioned_write_roundtrip(spark, tmp_path):
    from library_beam_spark.io import write_parquet
    from library_beam_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_parquet(ev, path, partition_by=["day"])
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # partition filter prunes at the scan (PartitionFilters, not data filter)
    from library_beam_spark.plans import formatted_plan

    one_day = back.filter(F.col("day") == ev.select(F.min("day")).first()[0])
    assert "PartitionFilters: [isnotnull(day" in formatted_plan(one_day)
    assert one_day.count() > 0


def test_assert_expected_count(spark):
    from library_beam_spark.tables import table
    from library_beam_spark.util import assert_expected_count

    r = table(spark, "/root/testdata/sf0.001", "region")
    assert assert_expected_count(r, 5) == 5
    assert assert_expected_count(r, 4, tolerance=0.5) == 5
    with pytest.raises(AssertionError):
        assert_expected_count(r, 100)
