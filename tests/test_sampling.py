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


# --- per_group_cap --------------------------------------------------------


@pytest.fixture(scope="module")
def grouped(spark):
    # Three groups with sizes 5 / 50 / 500 — below, near, and far above
    # the cap under test.
    return spark.range(0, 555).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 5, "tiny")
        .when(F.col("id") < 55, "mid")
        .otherwise("huge")
        .alias("grp"),
    )


def test_per_group_cap_sizes(spark, grouped):
    kept = S.per_group_cap(grouped, "grp", "key", cap=20)
    sizes = {r.grp: r.n for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"tiny": 5, "mid": 20, "huge": 20}


def test_per_group_cap_partition_stable(spark, grouped):
    a = sorted(r.key for r in S.per_group_cap(grouped, "grp", "key", cap=7).collect())
    b = sorted(
        r.key
        for r in S.per_group_cap(grouped.repartition(17), "grp", "key", cap=7).collect()
    )
    assert a == b


def test_per_group_cap_kept_set_is_hash_prefix(spark, grouped):
    # cap=7 winners must be exactly the 7 smallest hashes in each group —
    # i.e. a uniform subsample, not "first rows seen".
    kept = {r.key for r in S.per_group_cap(grouped, "grp", "key", cap=7).collect()}
    rows = grouped.select(
        "grp", "key", S.hash_value(F.col("key")).alias("h")
    ).collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r.grp, []).append((r.h, r.key))
    expect = {k for g in by_grp.values() for _, k in sorted(g)[:7]}
    assert kept == expect


def test_per_group_cap_reserved_column(spark, grouped):
    with pytest.raises(ValueError, match="_cap_rn"):
        S.per_group_cap(grouped.withColumn("_cap_rn", F.lit(1)), "grp", "key", 3)


# --- temperature_mixture --------------------------------------------------


def test_temperature_mixture_upweights_small_sources(spark, grouped):
    kept = S.temperature_mixture(grouped, "grp", "key", target_fraction=0.5)
    n = {r.grp: r.n for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    tot = {r.grp: r.n for r in grouped.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # alpha=0.5: keep-rate must be monotonically DECREASING in group size.
    rate = {g: n.get(g, 0) / tot[g] for g in tot}
    assert rate["tiny"] >= rate["mid"] >= rate["huge"]
    assert rate["tiny"] == 1.0  # tiny source saturates (f capped at 1)
    # overall budget is approximately met (hash granularity + saturation
    # push the total above the naive target; it must stay in range)
    assert 0.3 < sum(n.values()) / 555 < 0.75


def test_temperature_mixture_deterministic(spark, grouped):
    a = sorted(r.key for r in S.temperature_mixture(grouped, "grp", "key", 0.4).collect())
    b = sorted(
        r.key
        for r in S.temperature_mixture(
            grouped.repartition(11), "grp", "key", 0.4
        ).collect()
    )
    assert a == b and len(a) > 0


def test_temperature_mixture_keeps_schema(spark, grouped):
    out = S.temperature_mixture(grouped, "grp", "key", 0.4)
    assert out.columns == grouped.columns


def test_weighted_sample_statistical_bias(spark):
    """Heavier rows must be sampled more often across salts: with
    weights 10:1, the heavy half should dominate the sample."""
    from pyspark.sql import functions as F

    from library_beam_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [("g", i, 10.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, k long, w double")
    heavy = 0
    for salt in ("s0", "s1", "s2", "s3", "s4"):
        got = weighted_sample_per_group(
            df, "g", "k", "w", k=10, salt=salt
        ).collect()
        assert len(got) == 10
        heavy += sum(1 for r in got if r["k"] < 50)
    # E[heavy] ≈ 45/50 of draws under 10:1 odds; require a loose majority
    assert heavy > 30


def test_weighted_sample_deterministic_and_salt_sensitive(spark):
    from library_beam_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = spark.createDataFrame(
        [("g", i, float(i + 1)) for i in range(40)],
        "g string, k long, w double",
    )
    # output schema equals input schema (no internal columns leak)
    assert weighted_sample_per_group(df, "g", "k", "w", k=5).columns == df.columns
    a = {r["k"] for r in
         weighted_sample_per_group(df, "g", "k", "w", k=5).collect()}
    b = {r["k"] for r in
         weighted_sample_per_group(df, "g", "k", "w", k=5).collect()}
    c = {r["k"] for r in
         weighted_sample_per_group(df, "g", "k", "w", k=5, salt="x").collect()}
    assert a == b        # reproducible
    assert a != c        # redrawn under a new salt
    # nested-k property: top-3 is a subset of top-5 (same order key)
    d = {r["k"] for r in
         weighted_sample_per_group(df, "g", "k", "w", k=3).collect()}
    assert d < a


def test_weighted_sample_rejects_non_positive_weight(spark):
    """Zero/negative/NULL weights raise at execution instead of
    yielding NaN/-inf scores with engine-specific sort positions."""
    import pytest

    from library_beam_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    for bad in (0.0, -1.0, None):
        df = spark.createDataFrame(
            [("g", 1, 2.0), ("g", 2, bad)], "g string, k long, w double"
        )
        with pytest.raises(Exception, match="strictly positive"):
            weighted_sample_per_group(df, "g", "k", "w", k=2).collect()


def test_cluster_safe_split_no_leakage(spark):
    """The cluster-keyed split never separates near-duplicates: the
    straddle audit is 0, splits are exhaustive over the corpus, and
    every member of a dup cluster lands in the SAME split as its
    cluster's canonical doc (checked directly against the per-doc
    assignment, not just the aggregate)."""
    from library_beam_spark.operators import sampling as SAMP
    from library_beam_spark.operators.clustering import resolve_duplicates
    from library_beam_spark.operators.dedup import ngram_jaccard_pairs
    from library_beam_spark.registry import queries
    from library_beam_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = queries()["cluster_safe_split"](spark, sf).collect()
    n_total = table(spark, sf, "documents").count()
    assert sum(r.n_docs for r in rows) == n_total
    assert all(r.straddling_groups == 0 for r in rows)

    # direct per-doc re-check: a doc's split == its cluster key's split
    d = table(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, n=5, threshold=0.5, max_df=100)
    comps = resolve_duplicates(pairs).select("doc_id", "cluster_id")
    g = (
        d.select("doc_id")
        .join(comps, "doc_id", "left")
        .withColumn("gk", F.coalesce("cluster_id", "doc_id"))
    )
    assigned = SAMP.split_assign(
        g, "gk", {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="split"
    )
    leaked = (
        assigned.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert leaked == 0
    # and the dup graph is non-trivial at this SF, so the test bites
    assert assigned.where(F.col("cluster_id").isNotNull()).count() > 0
