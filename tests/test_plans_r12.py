"""Physical-plan property tests for the round-12 operators — the same
100 TB design assertions as tests/test_plans.py."""

from library_beam_spark import registry
from library_beam_spark.plans import (
    assert_broadcast_join,
    assert_no_python_eval,
    assert_partial_aggregation,
    formatted_plan,
)

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return registry.queries()[name](spark, SF)


def test_rake_is_jvm_side_and_copartitioned(spark):
    df = _q(spark, "rake_keywords")
    plan = formatted_plan(df)
    assert_no_python_eval(df)
    # no cartesian anywhere (all joins keyed on doc_id prefixes)
    assert "CartesianProduct" not in plan


def test_frequent_terms_verify_pass_broadcasts(spark):
    # pass 2 must semi-join the candidate set BROADCAST — the corpus
    # side never shuffles for the exact verify
    df = _q(spark, "frequent_terms_exact")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_containment_no_cartesian(spark):
    plan = formatted_plan(_q(spark, "containment_pairs"))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_acf_lag_join_broadcasts_series(spark):
    df = _q(spark, "acf_daily_revenue")
    assert_broadcast_join(df, expect=1)
    assert_partial_aggregation(df)
    assert_no_python_eval(df)


def test_itemsets_semi_joins_broadcast(spark):
    plan = formatted_plan(_q(spark, "frequent_itemsets"))
    # L1 basket prune + L2 closure checks are broadcast semi-joins
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_unigram_dp_is_jvm_side(spark):
    df = _q(spark, "unigram_viterbi_cost")
    assert_no_python_eval(df)
    plan = formatted_plan(df)
    # the word-cost table joins back via broadcast (vocabulary-sized)
    assert "BroadcastHashJoin" in plan


def test_cusum_partial_agg(spark):
    df = _q(spark, "cusum_changepoint")
    assert_partial_aggregation(df)
    assert_no_python_eval(df)


def test_weighted_sssp_no_cartesian(spark):
    plan = formatted_plan(_q(spark, "copurchase_weighted_paths"))
    assert "CartesianProduct" not in plan
