"""Salting must be semantically invisible: salted == unsalted results."""

from pyspark.sql import functions as F


def test_salted_aggregate_equals_plain(spark):
    from library_beam_spark.operators.skew import salted_aggregate
    from library_beam_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_extendedprice").alias("mx"),
            F.min("l_shipdate").alias("mn"),
        )
    )
    salted = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "sq": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "mx": ("l_extendedprice", "max"),
            "mn": ("l_shipdate", "min"),
        },
        n_salt=8,
    )
    a = {r["l_returnflag"]: (r["sq"], r["n"], r["mx"], r["mn"]) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["sq"], r["n"], r["mx"], r["mn"]) for r in salted.collect()}
    assert a == b


def test_salted_join_equals_plain(spark):
    from library_beam_spark.operators.skew import salted_join
    from library_beam_spark.tables import table

    o = table(spark, "/root/testdata/sf0.001", "orders")
    c = table(spark, "/root/testdata/sf0.001", "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, on="o_custkey", n_salt=8).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert plain.count() == salted.count()


def test_salted_join_rejects_small_side_outer_modes(spark):
    """right/full outer would surface each unmatched small-side row
    n_salt times — the operator refuses rather than silently diverging."""
    import pytest

    from library_beam_spark.operators.skew import salted_join
    from library_beam_spark.tables import table

    o = table(spark, "/root/testdata/sf0.001", "orders")
    c = table(spark, "/root/testdata/sf0.001", "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(o, c, on="o_custkey", how=how)
