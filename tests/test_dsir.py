"""DSIR importance resampling (operators/dsir.py): semantic properties
(target-like text outweighs off-target text), resampling vs greedy
behavior, determinism, and the plan contract. Cross-engine value
correctness is the registry oracle (q:dsir_selected_docs)."""

from pyspark.sql import functions as F


TARGETISH = "spark join window shuffle partition broadcast hash merge"
OFFTARGET = "medieval pottery glaze kiln ceramic excavation monastery"


def _corpus(spark):
    rows = []
    # 6 target docs establish the target distribution
    for i in range(6):
        rows.append((i, TARGETISH + f" extra{i}", "target"))
    # candidates: 4 target-like, 4 off-target
    for i in range(4):
        rows.append((10 + i, TARGETISH + f" variant{i}", "raw"))
        rows.append((20 + i, OFFTARGET + f" variant{i}", "raw"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_targetlike_docs_outweigh_offtarget(spark):
    from library_beam_spark.operators.dsir import dsir_weights

    docs = _corpus(spark)
    target = docs.where(F.col("kind") == "target").select("doc_id")
    w = {r.doc_id: r.logw for r in dsir_weights(docs, target).collect()}
    assert set(w) == {10, 11, 12, 13, 20, 21, 22, 23}  # non-target only
    worst_targetlike = min(w[i] for i in (10, 11, 12, 13))
    best_offtarget = max(w[i] for i in (20, 21, 22, 23))
    assert worst_targetlike > best_offtarget, w


def test_gumbel_resampling_is_sampling_not_greedy(spark):
    """With k < n the Gumbel keys must be able to pass over a
    higher-logw doc (that is the point of resampling); and the draw is
    deterministic — same inputs, same sample."""
    from library_beam_spark.operators.dsir import dsir_select, dsir_weights

    docs = _corpus(spark)
    target = docs.where(F.col("kind") == "target").select("doc_id")
    sel = dsir_select(docs, target, k=4)
    ids1 = [r.doc_id for r in sel.collect()]
    ids2 = [r.doc_id for r in dsir_select(docs, target, k=4).collect()]
    assert ids1 == ids2  # deterministic draw
    greedy = [
        r.doc_id
        for r in dsir_weights(docs, target)
        .orderBy(F.desc("logw"), F.asc("doc_id"))
        .limit(4)
        .collect()
    ]
    # the perturbed order need not equal the greedy order, but the
    # sample still leans toward weight: at least half of the greedy
    # top-4 survives the perturbation on this sharply separated corpus
    assert len(set(ids1) & set(greedy)) >= 2, (ids1, greedy)


def test_dsir_plan_contract(spark):
    """Ratio table broadcast, partial-agg feature counts, global top-k
    as TakeOrderedAndProject, nothing in Python."""
    from library_beam_spark import registry
    from library_beam_spark.plans import (
        assert_no_python_eval,
        assert_partial_aggregation,
        formatted_plan,
    )

    df = registry.queries()["dsir_selected_docs"](
        spark, "/root/testdata/sf0.001"
    )
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # ratio table + target ids
    assert "CartesianProduct" not in plan
    assert_no_python_eval(df)
    assert_partial_aggregation(df)


def test_empty_gram_docs_are_not_candidates(spark):
    from library_beam_spark.operators.dsir import dsir_weights

    docs = spark.createDataFrame(
        [(1, "spark join window"), (2, "!!! ...")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(1,)], "doc_id long")
    out = dsir_weights(docs, target).collect()
    assert out == []  # doc 2 has no grams; doc 1 is target


def test_exact_percent_rank_matches_sql_semantics(spark):
    """exact_percent_rank (per-value counts + distinct-value cumulative
    window + broadcast join) must equal SQL percent_rank exactly,
    including tie handling (ties share the min rank) and the N=1
    degenerate frame (rank 0)."""
    from library_beam_spark.operators.ranking import exact_percent_rank

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 30), (5, 5)], "id long, v long"
    )
    got = {
        r.id: r.v_pr for r in exact_percent_rank(df, "v").collect()
    }
    # N=5 → denominator 4; ranks: 5→0, 10→1/4, 20→2/4 (both), 30→4/4
    assert got == {5: 0.0, 1: 0.25, 2: 0.5, 3: 0.5, 4: 1.0}
    one = exact_percent_rank(
        spark.createDataFrame([(1, 7)], "id long, v long"), "v"
    ).collect()
    assert one[0].v_pr == 0.0


def test_exact_percent_rank_differential_vs_duckdb(spark):
    """Property check: for arbitrary integer multisets (ties, negatives,
    singletons), the two-phase decomposition equals DuckDB's
    percent_rank() bit for bit."""
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from library_beam_spark.operators.ranking import exact_percent_rank

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=1,
                 max_size=40)
    )
    def check(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        )
        got = {r.id: r.v_pr for r in exact_percent_rank(df, "v").collect()}
        con = duckdb.connect()
        want = {
            i: pr
            for i, pr in con.execute(
                "SELECT id, percent_rank() OVER (ORDER BY v) FROM "
                "(SELECT unnest(range(len($1))) AS id, unnest($1) AS v)",
                [vals],
            ).fetchall()
        }
        assert got == want, (vals, got, want)

    check()


def test_exact_percent_rank_cardinality_guard(spark):
    """Past max_distinct the plan RAISES at execution (assert_true woven
    into the rank expression) instead of silently single-tasking a
    high-cardinality distinct table; at the bound it still computes."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from library_beam_spark.operators.ranking import exact_percent_rank

    df = spark.range(10).select(
        F.col("id"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(SparkRuntimeException, match="max_distinct"):
        exact_percent_rank(df, "v", max_distinct=9).collect()
    ok = exact_percent_rank(df, "v", max_distinct=10).collect()
    assert {r.v_pr for r in ok} == {i / 9 for i in range(10)}


def test_percent_rank_scalable_matches_duckdb(spark):
    """The range-partition form (rank machinery + min-rank-per-tie-group
    window) equals DuckDB percent_rank bit for bit on arbitrary
    multisets — same property the bounded form carries, without any
    single-partition stage."""
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from library_beam_spark.operators.ranking import percent_rank_scalable

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=1,
                 max_size=40)
    )
    def check(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        )
        got = {
            r.id: r.v_pr
            for r in percent_rank_scalable(df, "v", num_partitions=4).collect()
        }
        con = duckdb.connect()
        want = {
            i: pr
            for i, pr in con.execute(
                "SELECT id, percent_rank() OVER (ORDER BY v) FROM "
                "(SELECT unnest(range(len($1))) AS id, unnest($1) AS v)",
                [vals],
            ).fetchall()
        }
        assert got == want, (vals, got, want)

    check()
