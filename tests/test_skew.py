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


def test_salted_topk_matches_window_form(spark):
    """Randomized parity: two-phase salted top-k == window row_number
    top-k, including on a pathologically hot key."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from library_beam_spark.operators.skew import salted_topk

    rng = random.Random(11)
    rows = [("hot" if rng.random() < 0.6 else f"k{rng.randrange(5)}",
             rng.randrange(1000), i) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "score", "rid"])

    got = {
        (r.k, r.rid)
        for r in salted_topk(
            df, key_cols=["k"],
            order_cols=[(-F.col("score")).alias("_s"), F.col("rid").alias("_r")],
            k=5, payload_cols=["score", "rid"], n_salt=8,
        ).collect()
    }
    w = Window.partitionBy("k").orderBy(F.desc("score"), F.asc("rid"))
    want = {
        (r.k, r.rid)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).collect()
    }
    assert got == want
