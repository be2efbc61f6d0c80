"""Distributed Bloom filter (operators/bloom.py): no false negatives,
measured false-positive rate near theory, merge = build-of-union, and
the prune-then-recheck pattern is EXACT."""

import math

from pyspark.sql import functions as F

from library_beam_spark.operators.bloom import (
    bloom_attach,
    bloom_build,
    bloom_collect,
    bloom_merge,
    might_contain,
    optimal_params,
)


def _keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("k")
    )


def test_optimal_params_textbook_point():
    # n=1e6, p=1%: m ≈ 9.585e6 bits, k ≈ 7 (Bloom 1970 / standard tables)
    m, k = optimal_params(1_000_000, 0.01)
    assert abs(m - 9_585_059) < 256  # rounded up to /64
    assert k == 7


def test_no_false_negatives_and_fpr_near_theory(spark):
    n = 2000
    m, k = optimal_params(n, 0.01)
    words = bloom_collect(bloom_build(_keys(spark, 0, n), "k", m, k), m)
    members = _keys(spark, 0, n).where(might_contain(F.col("k"), words, m, k))
    assert members.count() == n  # every inserted key answers yes
    negatives = 20_000
    fp = (
        _keys(spark, n, n + negatives)
        .where(might_contain(F.col("k"), words, m, k))
        .count()
    )
    # generous bound: 3x the designed 1% on 20k trials
    assert fp / negatives < 0.03, f"FPR {fp/negatives:.3%} vs designed 1%"


def test_merge_equals_build_of_union(spark):
    m, k = optimal_params(1000, 0.01)
    whole = bloom_collect(bloom_build(_keys(spark, 0, 1000), "k", m, k), m)
    a = bloom_build(_keys(spark, 0, 400), "k", m, k)
    b = bloom_build(_keys(spark, 400, 1000), "k", m, k)
    assert bloom_collect(bloom_merge(a, b), m) == whole


def test_prune_then_recheck_is_exact(spark):
    # the load-bearing property: bloom(prune) ∘ exact(recheck) == exact
    ref = _keys(spark, 0, 500, prefix="r").withColumnRenamed("k", "key")
    probe = (
        spark.range(3000)
        .select(
            F.when(F.col("id") % 3 == 0, F.concat(F.lit("r"), F.col("id") % 500))
            .otherwise(F.concat(F.lit("x"), F.col("id")))
            .alias("key")
        )
    )
    m, k = optimal_params(500, 0.05)
    words = bloom_collect(bloom_build(ref, "key", m, k), m)
    pruned = bloom_attach(probe, words).where(
        might_contain(F.col("key"), F.col("_bloom"), m, k)
    )
    got = (
        pruned.join(F.broadcast(ref), "key", "left_semi")
        .groupBy("key")
        .count()
    )
    want = probe.join(F.broadcast(ref), "key", "left_semi").groupBy("key").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_attach_carries_filter_without_shuffle(spark):
    m, k = optimal_params(100, 0.01)
    words = bloom_collect(bloom_build(_keys(spark, 0, 100), "k", m, k), m)
    df = bloom_attach(_keys(spark, 0, 10), words)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # 1-row broadcast carrier
    assert "Exchange hashpartitioning" not in plan


def test_zero_step_guard_keeps_k_distinct_probes(spark):
    # h2 ≡ 0 mod (m-1) would collapse probes; the +1 guard forbids it:
    # over many keys, the k positions per key are almost always distinct.
    from library_beam_spark.operators.bloom import bit_positions

    m, k = 64 * 8, 4
    pos = spark.range(500).select(
        F.array_distinct(
            F.array(*bit_positions(F.concat(F.lit("z"), F.col("id")), m, k))
        ).alias("p")
    )
    collapsed = pos.where(F.size("p") < k).count()
    assert collapsed < 50  # birthday collisions only, never systematic
