"""Pipeline-level goldens (SURVEY §5 strategy 3): baseline+update XML
fixtures → parse → latest-version dedup → tombstone deletion → NLP
enrich → 4-way split. The fixture pair mirrors the reference's
test-medlinexml design (update file wins; DeleteCitation removes)."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import RESOURCES

MEDLINE = os.path.join(RESOURCES, "medline")


@pytest.fixture(scope="module")
def enriched(spark, vocab):
    from library_beam_spark.pipelines import run_enrich

    return run_enrich(
        spark,
        f"{MEDLINE}/baseline/*.xml",
        f"{MEDLINE}/updates/*.xml.gz",
        vocab=vocab,
    ).cache()


def test_parse_fields(spark):
    from library_beam_spark.io import read_medline_xml

    df = read_medline_xml(spark, f"{MEDLINE}/baseline/*.xml")
    rows = {r["pub_id"]: r for r in df.collect()}
    assert set(rows) == {"101", "102", "103"}
    r = rows["101"]
    assert r["title"].startswith("Asthma and airway inflammation")
    assert "Fanconi anemia (FA)" in r["abstract"]
    assert r["journal"]["medlineAbbreviation"] == "J. Respir."
    assert r["journal_reference"]["volume"] == "12"
    assert r["journal_reference"]["pgn"] == "100-110"
    assert r["doi"] == "10.1000/jresp.2018.101"
    assert str(r["pub_date"]) == "2018-12-05"
    assert str(r["first_publication_date"]) == "2019-01-15"
    assert r["authors"][0]["short_name"] == "Garcia M"
    assert r["authors"][0]["full_name"] == "Maria Garcia"
    assert r["pub_type"] == ["Journal Article", "Review"]
    assert r["mesh_headings"][0]["id"] == "D001249"
    assert r["chemicals"][0]["name"] == "Formaldehyde"
    assert r["keywords"] == ["asthma", "inflammation"]
    # PubDate default day/month fill (main.py:365): year-only → Jan 1
    assert str(rows["102"]["pub_date"]) == "2019-01-01"


def test_tombstone_rows_parsed(spark):
    from library_beam_spark.io import read_medline_xml

    df = read_medline_xml(spark, f"{MEDLINE}/updates/*.xml.gz")
    dels = df.filter("is_deleted").select("pub_id").collect()
    assert [r["pub_id"] for r in dels] == ["102"]


def test_latest_version_and_tombstones(enriched):
    rows = {r["pub_id"]: r for r in enriched.collect()}
    # 102 deleted by tombstone; 104 arrives via update; 101 updated wins
    assert set(rows) == {"101", "103", "104"}
    assert "updated overview" in rows["101"]["title"]
    assert rows["101"]["filename"].startswith("pubmed24n1101")


def test_enrichment_contents(enriched):
    r = {x["pub_id"]: x for x in enriched.collect()}["101"]
    nlp = r["text_mined_entities"]["nlp"]
    matches = {(t["match"].lower(), t["category"]) for t in nlp["tagged_entities"]}
    assert ("asthma", "DISEASE") in matches
    assert ("airway inflammation", "PHENOTYPE") in matches
    assert ("adra1d", "GENE") in matches
    # GENE+DISEASE co-occurrence synthesis (NLP.py:643-650)
    assert any(t["category"] == "TARGET&DISEASE" for t in nlp["tagged_entities"])
    triples = {(c["subject"], c["verb"], c["object"]) for c in nlp["concepts"]}
    assert ("ADRA1D", "be involved in", "asthma") in triples
    abbrevs = {(a["short"], a["long"]) for x in [r] for a in
               x["text_mined_entities"]["noun_phrases"]["abbreviations"]}
    # G-CSF abbreviation lives in 104
    r104 = {x["pub_id"]: x for x in enriched.collect()}["104"]
    a104 = r104["text_mined_entities"]["noun_phrases"]["abbreviations"]
    assert ("G-CSF", "Granulocyte colony-stimulating factor") in {
        (a["short"], a["long"]) for a in a104
    }


def test_split_outputs(enriched, tmp_path):
    from library_beam_spark.pipelines import run_load, run_split

    outputs = run_split(enriched, persist=True)
    concepts = outputs["concepts"]
    crows = concepts.filter(F.col("pub_id") == "101").collect()
    assert crows, "101 must yield concepts"
    c = next(
        r for r in crows if (r["subject"], r["object"]) == ("ADRA1D", "asthma")
    )
    # relation pairs: ENSG|EFO directed, both orders undirected
    assert "ENSG00000120907|EFO_0000270" in c["relations"]["directed"]
    assert "EFO_0000270|ENSG00000120907" in c["relations"]["undirected"]
    # self-CONCEPT tags injected (main.py:598-623)
    assert any(t["category"] == "CONCEPT" for t in c["subject_tags"])
    assert any(t["category"] == "CONCEPT" for t in c["object_tags"])

    bio = outputs["bioentities"]
    assert bio.columns == ["pub_id", "entities"]
    assert bio.count() == 3

    tt = {r["pub_id"]: r for r in outputs["taggedtext"].collect()}
    assert "<mark-" in tt["101"]["title"] or "<mark-" in tt["101"]["abstract"]

    pub = outputs["publication"]
    nlp_fields = [
        f.name
        for f in pub.schema["text_mined_entities"].dataType["nlp"].dataType.fields
    ]
    for heavy in ("tagged_text", "tagged_entities", "concepts", "embedding_text"):
        assert heavy not in nlp_fields  # P9 drop (main.py:691-716)

    paths = run_load(outputs, str(tmp_path / "tables"))
    assert set(paths) == {"concepts", "bioentities", "taggedtext", "publication"}
    spark = enriched.sparkSession
    assert spark.table("concepts").count() == concepts.count()


def test_malformed_xml_recovers_pmid(spark, tmp_path):
    from library_beam_spark.io import parse_citation_block

    bad = "<MedlineCitation><PMID Version=\"1\">999</PMID><Article><broken></MedlineCitation>"
    recs = list(parse_citation_block(bad, "f.xml"))
    assert recs and recs[0]["pub_id"] == "999" and recs[0]["is_deleted"] is False


def test_json_roundtrip_enriched(enriched, tmp_path):
    """S6 sink + S5 re-entry: enriched → gzip JSON lines → read back with
    the declared schema (never inferred) → identical rows."""
    from library_beam_spark.io import read_enriched_json, write_json_gz

    path = str(tmp_path / "enriched_json")
    write_json_gz(enriched, path)
    back = read_enriched_json(enriched.sparkSession, path, enriched.schema)
    assert back.schema == enriched.schema
    a = {r["pub_id"]: r for r in enriched.collect()}
    b = {r["pub_id"]: r for r in back.collect()}
    assert set(a) == set(b)
    for pid in a:
        assert a[pid]["title"] == b[pid]["title"]
        assert (
            a[pid]["text_mined_entities"]["nlp"]["tagged_entities"]
            == b[pid]["text_mined_entities"]["nlp"]["tagged_entities"]
        )


def test_es_writer_options_contract():
    """The ES sink contract (reference load2es.py:23-50, 90-98, 209-220)
    without a live cluster: 3 of 4 indexes key documents by pub_id,
    concepts auto-id; index naming follows the prefix pattern; bulk chunk
    sizing is applied."""
    from library_beam_spark.pipelines.load import INDEX_CONFIG, es_writer_options

    assert set(INDEX_CONFIG) == {"publication", "bioentities", "taggedtext",
                                 "concepts"}
    for name in ("publication", "bioentities", "taggedtext"):
        opts = es_writer_options(name, "es:9200")
        assert opts["es.mapping.id"] == "pub_id", name
    # concept docs get an auto id (load2es.py:48 pub_id=False)
    c = es_writer_options("concepts", "es:9200")
    assert "es.mapping.id" not in c
    # index naming: publication is the bare prefix, others suffixed
    assert es_writer_options("publication", "es:9200")["es.resource"] == "pubmed-20"
    assert c["es.resource"] == "pubmed-20-concept"
    assert es_writer_options("bioentities", "es:9200",
                             index_prefix="x")["es.resource"] == "x-bioentity"
    # bulk chunk sizing (load2es.py:214) and nodes plumb through
    assert c["es.batch.size.entries"] == "1000"
    assert c["es.nodes"] == "es:9200"


def test_write_elasticsearch_raises_without_connector(spark):
    """No silent fallback: without the connector jar the sink raises with
    instructions."""
    import pytest

    from library_beam_spark.pipelines.load import write_elasticsearch

    df = spark.createDataFrame([("1",)], "pub_id string")
    with pytest.raises(RuntimeError, match="elasticsearch-spark"):
        write_elasticsearch(df, "publication", "localhost:9200")
