"""§3.3 LINK query path end-to-end: run the pipeline on the XML
fixtures, load the four tables, answer the ES-DSL-shaped questions with
Spark SQL over the views (term aggs, nested sentences, co-occurrence)."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import RESOURCES

MEDLINE = os.path.join(RESOURCES, "medline")


@pytest.fixture(scope="module")
def link_tables(spark, vocab, tmp_path_factory):
    from library_beam_spark.pipelines import run_enrich, run_load, run_split

    enriched = run_enrich(
        spark, f"{MEDLINE}/baseline/*.xml", f"{MEDLINE}/updates/*.xml.gz", vocab=vocab
    )
    base = str(tmp_path_factory.mktemp("link") / "tables")
    run_load(run_split(enriched), base)
    return base


def test_keyword_term_aggregation(spark, link_tables):
    """ES keyword term agg (publication.json:815-827) → GROUP BY over
    exploded tag categories on the bioentity index."""
    out = spark.sql(
        """
        SELECT e.category, COUNT(*) AS n
        FROM bioentities LATERAL VIEW explode(entities) AS e
        GROUP BY e.category ORDER BY n DESC
        """
    ).collect()
    cats = {r["category"]: r["n"] for r in out}
    assert cats.get("DISEASE", 0) >= 1 and cats.get("GENE", 0) >= 1


def test_relation_pair_cooccurrence(spark, link_tables):
    """concept.relations fielddata agg (concept.json:860-875): pair-token
    counts over the concept index."""
    pairs = spark.sql(
        """
        SELECT pair, COUNT(*) AS n
        FROM concepts LATERAL VIEW explode(relations.directed) AS pair
        GROUP BY pair
        """
    ).collect()
    got = {r["pair"] for r in pairs}
    assert "ENSG00000120907|EFO_0000270" in got


def test_publication_fulltext_search(spark, link_tables):
    """Analyzed full-text predicate (publication.json:845-849) via the
    engine's english analyzer over the publication view."""
    from library_beam_spark.functions.text import analyze_english

    hits = (
        spark.table("publication")
        .filter(F.array_contains(analyze_english(F.col("title")), "asthma"))
        .select("pub_id")
        .collect()
    )
    assert {r["pub_id"] for r in hits} == {"101"}


def test_adjacency_matrix_over_concepts(spark, link_tables):
    """README.md:96-104 adjacency matrix over real concept docs:
    entity co-occurrence within a publication."""
    from library_beam_spark.operators.cooccurrence import cooccurrence_counts

    mentions = spark.sql(
        """
        SELECT pub_id, t.reference[0] AS entity
        FROM concepts LATERAL VIEW explode(subject_tags) AS t
        WHERE t.category <> 'CONCEPT'
        UNION ALL
        SELECT pub_id, t.reference[0] AS entity
        FROM concepts LATERAL VIEW explode(object_tags) AS t
        WHERE t.category <> 'CONCEPT'
        """
    )
    counts = cooccurrence_counts(mentions, unit_col="pub_id", entity_col="entity")
    pairs = {(r["entity_a"], r["entity_b"]) for r in counts.collect()}
    assert ("EFO_0000270", "ENSG00000120907") in pairs


def test_winsorized_price_stats_clip_fraction(spark):
    """~10% of rows clip at [p05, p95]; the bounds ride a broadcast."""
    from pyspark.sql import functions as F

    from library_beam_spark.registry import queries

    df = queries()["winsorized_price_stats"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    rows = df.collect()
    n = sum(r["n"] for r in rows)
    clipped = sum(r["n_clipped"] for r in rows)
    assert 0.05 <= clipped / n <= 0.15


def test_referential_integrity_audit_detects_planted_orphan(spark):
    """Healthy testdata audits clean; a planted orphan surfaces in the
    right check (the operator, not just the happy path)."""
    from pyspark.sql import functions as F

    from library_beam_spark.registry import queries

    clean = {
        r["check_name"]: r["n_violations"]
        for r in queries()["referential_integrity_audit"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(clean) == {
        "lineitem_without_order", "order_without_customer",
        "customer_without_nation", "supplier_without_nation",
    }
    assert all(v == 0 for v in clean.values()), clean

    # planted break: an order pointing at a customer that doesn't exist
    from library_beam_spark.tables import table

    o = table(spark, "/root/testdata/sf0.001", "orders").select("o_custkey")
    c = table(spark, "/root/testdata/sf0.001", "customer").select("c_custkey")
    bad = o.unionAll(spark.createDataFrame([(999999999,)], "o_custkey long"))
    n = bad.join(
        F.broadcast(c), bad.o_custkey == c.c_custkey, "left_anti"
    ).count()
    assert n == 1
