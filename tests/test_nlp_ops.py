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


def test_common_words_as_genes_trap():
    """The common-words-as-genes precision trap (mirrors the reference's
    tests/resources/common_words_as_genes.txt contract): GENE tags whose
    match is a short/common English word survive ONLY in exact dictionary
    case. Long non-common symbols are untouched."""
    from library_beam_spark.kernels.tagger import BioEntityTagger
    from library_beam_spark.nlp_ops import _filter_case_sensitive

    vocab = {
        # common-word collisions (all real HGNC-style traps)
        "was": [{"category": "GENE", "reference_db": "OT", "ids": ["g1"],
                 "pref_name": "WAS"}],
        "impact": [{"category": "GENE", "reference_db": "OT", "ids": ["g2"],
                    "pref_name": "IMPACT"}],
        "kit": [{"category": "GENE", "reference_db": "OT", "ids": ["g3"],
                 "pref_name": "KIT"}],
        "mice": [{"category": "GENE", "reference_db": "OT", "ids": ["g4"],
                  "pref_name": "MICE"}],
        # long, not a common word: no case check applies
        "adra1d": [{"category": "GENE", "reference_db": "OT", "ids": ["g5"],
                    "pref_name": "ADRA1D"}],
        # non-case-sensitive category: never filtered
        "insulitis": [{"category": "DISEASE", "reference_db": "OT",
                       "ids": ["d1"], "pref_name": "insulitis"}],
    }
    tagger = BioEntityTagger(vocab)
    text = ("The study was performed on NOD mice with insulitis. "
            "KIT signalling and adra1d expression rose, while the impact "
            "of WAS remained unclear.")
    tags = tagger.tag(text)
    kept = _filter_case_sensitive(tags)
    kept_spans = {(t.match, t.category) for t in kept}

    # exact-case dictionary spellings survive
    assert ("KIT", "GENE") in kept_spans
    assert ("WAS", "GENE") in kept_spans
    # lowercase commons are dropped: 'was' (aux verb), 'mice' (animals),
    # 'impact' (the noun)
    assert ("was", "GENE") not in kept_spans
    assert ("mice", "GENE") not in kept_spans
    assert ("impact", "GENE") not in kept_spans
    # long non-common symbol passes in any case
    assert ("adra1d", "GENE") in kept_spans
    # non-case-sensitive categories are untouched
    assert ("insulitis", "DISEASE") in kept_spans


def test_filter_case_sensitive_dash_variants():
    """Dash variants count as exact case (NLP.py:630-636): a <4-char
    match passes the always-on case check when stripping or spacing its
    dash reproduces the label; a 4-6 char NON-common word skips the
    check entirely."""
    from library_beam_spark.kernels.tagger import MatchedTag
    from library_beam_spark.nlp_ops import _filter_case_sensitive

    def tag(match, label):
        return MatchedTag(match=match, start=0, end=len(match),
                          category="GENE", reference_db="OT", reference=[],
                          original_value=label.lower(), label=label)

    kept = _filter_case_sensitive([
        tag("TF", "TF"),      # exact → keep
        tag("T-F", "TF"),     # dash-stripped exact → keep
        tag("t-f", "TF"),     # wrong case, <4 → drop
        tag("tnfa", "TNFA"),  # 4 chars, not a common word → no check
    ])
    assert [t.match for t in kept] == ["TF", "T-F", "tnfa"]


def test_mid_length_common_word_symbols_suppressed():
    """The r2 VERDICT trap class: mid-length (4-6 char) English words used
    as gene symbols — 'IMPACT', 'BRIDGE', and extension-band words like
    'ANCHOR'/'SIGNAL'/'SHIELD' — must be case-checked, so lowercase prose
    occurrences are dropped while exact dictionary case survives."""
    from library_beam_spark.kernels.corpora import COMMON_WORDS_FULL
    from library_beam_spark.kernels.tagger import MatchedTag
    from library_beam_spark.nlp_ops import _filter_case_sensitive

    symbols = ["IMPACT", "BRIDGE", "ANCHOR", "SIGNAL", "SHIELD", "CASTLE",
               "MARBLE", "TURTLE", "HAZARD", "SADDLE"]
    # every trap word must be covered by the corpus for the filter to fire
    for s in symbols:
        assert s.lower() in COMMON_WORDS_FULL, f"{s.lower()} missing"

    def tag(match, label):
        return MatchedTag(match=match, start=0, end=len(match),
                          category="GENE", reference_db="OT", reference=[],
                          original_value=label.lower(), label=label)

    for s in symbols:
        kept = _filter_case_sensitive([tag(s.lower(), s), tag(s, s)])
        assert [t.match for t in kept] == [s], s


def test_heuristic_pos_classes():
    from library_beam_spark.nlp_ops import _heuristic_pos

    assert _heuristic_pos("is") == "VERB"
    assert _heuristic_pos("regulates") == "VERB"
    assert _heuristic_pos("characterized") == "VERB"
    assert _heuristic_pos("signaling") == "VERB"
    assert _heuristic_pos("with") == "ADP"
    assert _heuristic_pos("the") == "DET"
    assert _heuristic_pos("rapidly") == "ADV"
    assert _heuristic_pos("dangerous") == "ADJ"
    assert _heuristic_pos("reversible") == "ADJ"
    assert _heuristic_pos("42") == "NUM"
    assert _heuristic_pos("3.5") == "NUM"
    assert _heuristic_pos("kinase") == "NOUN"
    assert _heuristic_pos("family") == "NOUN"  # -ly noun exception list
