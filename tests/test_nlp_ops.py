"""nlp_enrich on Spark: nested schema round-trip, empty-text guard,
broadcast-tagger reuse."""

from pyspark.sql import functions as F


def test_nlp_enrich_schema_and_content(spark, vocab):
    from library_beam_spark.nlp_ops import nlp_enrich

    df = spark.createDataFrame(
        [
            ("1", "Asthma is a chronic disease characterized by airway inflammation."),
            ("2", "TNF does not induce apoptosis. ADRA1D is involved in asthma."),
            ("3", None),
            ("4", "   "),
        ],
        "pub_id string, text_to_analyze string",
    )
    out = nlp_enrich(df, vocab=vocab).cache()
    assert out.count() == 4
    rows = {r["pub_id"]: r for r in out.collect()}

    nlp1 = rows["1"]["text_mined_entities"]["nlp"]
    assert {t["match"].lower() for t in nlp1["tagged_entities"]} >= {
        "asthma", "airway inflammation"
    }
    assert ("Asthma", "be", "chronic disease") in {
        (c["subject"], c["verb"], c["object"]) for c in nlp1["concepts"]
    }
    # tag offsets align with the analyzed text (reference invariant,
    # text_nlp.py:451-464)
    # (normalized text == input here: ascii, single spaces)
    text = "Asthma is a chronic disease characterized by airway inflammation."
    for t in nlp1["tagged_entities"]:
        if t["category"] != "TARGET&DISEASE":
            assert text[t["start"]:t["end"]].lower() == t["match"].lower()

    nlp2 = rows["2"]["text_mined_entities"]["nlp"]
    cats = {t["category"] for t in nlp2["tagged_entities"]}
    assert "TARGET&DISEASE" in cats  # GENE+DISEASE sentence synthesis
    negated = [c for c in nlp2["concepts"] if c["negated"]]
    assert negated and negated[0]["subject"] == "TNF"

    # empty/null guard (P11): empty enrichment, no crash
    for pid in ("3", "4"):
        nlp = rows[pid]["text_mined_entities"]["nlp"]
        assert nlp["tagged_entities"] == [] and nlp["concepts"] == []


def test_top_chunks_invariant_on_corpus(spark, vocab):
    """len(top_chunks) <= 5 and top ⊆ recurring ⊆ chunks across docs
    (reference invariant text_nlp.py:431)."""
    from library_beam_spark.nlp_ops import nlp_enrich
    from library_beam_spark.tables import table

    docs = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .limit(40)
        .select(F.col("doc_id").cast("string").alias("pub_id"),
                F.col("text").alias("text_to_analyze"))
    )
    out = nlp_enrich(docs, vocab=vocab)
    for r in out.select("text_mined_entities.noun_phrases").collect():
        np = r["noun_phrases"]
        assert len(np["top_chunks"]) <= 5
        assert set(np["top_chunks"]) <= set(np["recurring_chunks"])
        assert set(np["recurring_chunks"]) <= set(np["chunks"])
