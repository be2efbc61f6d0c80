"""Bucketed co-located joins: the plan must contain NO Exchange."""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # session warehouse is fixed at startup; tables land wherever it
    # points — use unique names and drop after.
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    from library_beam_spark.operators.bucketing import bucketed_join, write_bucketed
    from library_beam_spark.plans import formatted_plan
    from library_beam_spark.tables import table

    sf = "/root/testdata/sf0.001"
    write_bucketed(
        table(spark, sf, "orders"), "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    li = table(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    # at toy scale Catalyst prefers broadcast (which also avoids the
    # shuffle); force sort-merge to demonstrate the bucketed co-location
    # a 100 TB fact-to-fact join would rely on
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
        # and it is correct
        plain = table(spark, sf, "orders").join(li, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
