"""Deterministic hash sampling (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators import sampling as S


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumnRenamed("id", "key")


def test_sample_is_deterministic_and_partition_stable(spark, ids):
    a = sorted(r.key for r in S.sample_fraction(ids, "key", 0.1).collect())
    b = sorted(
        r.key
        for r in S.sample_fraction(ids.repartition(13), "key", 0.1).collect()
    )
    assert a == b and len(a) > 0


def test_samples_are_nested(spark, ids):
    small = {r.key for r in S.sample_fraction(ids, "key", 0.01).collect()}
    big = {r.key for r in S.sample_fraction(ids, "key", 0.10).collect()}
    assert small < big


def test_sample_fraction_is_close(spark, ids):
    n = S.sample_fraction(ids, "key", 0.2).count()
    assert 0.17 < n / 20_000 < 0.23


def test_salt_changes_membership(spark, ids):
    a = {r.key for r in S.sample_fraction(ids, "key", 0.1, salt="a").collect()}
    b = {r.key for r in S.sample_fraction(ids, "key", 0.1, salt="b").collect()}
    assert a != b and len(a & b) < len(a)  # overlap ~1% of rows, not 10%


def test_stratified_fractions(spark, ids):
    df = ids.withColumn("g", (F.col("key") % 2 == 0).cast("string"))
    out = S.stratified_sample(df, "g", {"true": 0.3, "false": 0.05}, "key")
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert 0.25 < counts["true"] / 10_000 < 0.35
    assert 0.02 < counts["false"] / 10_000 < 0.08


def test_stratified_drops_unlisted_strata(spark, ids):
    df = ids.withColumn("g", (F.col("key") % 3).cast("string"))
    out = S.stratified_sample(df, "g", {"0": 1.0}, "key")
    assert out.select("g").distinct().collect() == [("0",)]


def test_split_assign_exhaustive_disjoint_and_weighted(spark, ids):
    out = S.split_assign(ids, "key", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 20_000  # exhaustive: every row labelled
    assert 0.75 < counts["train"] / 20_000 < 0.85
    assert 0.07 < counts["valid"] / 20_000 < 0.13
    assert 0.07 < counts["test"] / 20_000 < 0.13


def test_split_assign_single_split(spark, ids):
    out = S.split_assign(ids, "key", {"all": 1.0})
    assert out.where(F.col("split") != "all").count() == 0


def test_hash_matches_sql_twin(spark):
    """Spark hash_value and the generated DuckDB expression agree row-for-row."""
    import duckdb

    df = spark.range(0, 500).select(
        F.col("id"), S.hash_value(F.col("id"), salt="x").alias("h")
    )
    got = {r.id: r.h for r in df.collect()}
    want = dict(
        duckdb.sql(
            f"SELECT id, {S.sql_hash_value('id', salt='x')} AS h "
            "FROM range(0, 500) t(id)"
        ).fetchall()
    )
    assert got == want
