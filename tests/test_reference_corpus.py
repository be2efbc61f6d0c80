"""Per-abstract invariant sweep over the reference's own 28-abstract test
corpus plus the chromosome8p fixture (SURVEY §5: text_nlp.py:417-431,
451-464, 486-498 ran the same checks). The corpus and fixture are read
IN PLACE from the read-only reference checkout — nothing is copied —
and skipped if absent. Assertions are the reference's documented
invariants and content expectations re-expressed on this engine's
contract (the NLP stack differs by design)."""

import os
import re

import pytest

CORPUS = "/root/reference/tests/resources/test_abstract_nlp.txt"
TEXT_NLP = "/root/reference/tests/text_nlp.py"


def _load_chromosome8p() -> str:
    """Extract the chromosome8p fixture from the reference test file in
    place (it is a python2 string literal; the module itself cannot be
    imported)."""
    with open(TEXT_NLP, encoding="utf-8", errors="replace") as f:
        src = f.read()
    m = re.search(
        r"chromosome8p_text = (.*?)\n\n", src, flags=re.S
    )
    assert m, "fixture literal not found"
    parts = re.findall(r"u'((?:[^'\\]|\\.)*)'", m.group(1))
    text = "".join(parts)
    return text.encode().decode("unicode_escape")


@pytest.mark.skipif(not os.path.exists(CORPUS), reason="reference corpus absent")
def test_corpus_sweep_invariants(vocab):
    from library_beam_spark.kernels.normalize import normalize
    from library_beam_spark.kernels.tagger import BioEntityTagger
    from library_beam_spark.nlp_ops import analyze_document

    with open(CORPUS, encoding="utf-8", errors="replace") as f:
        abstracts = [line.strip() for line in f if line.strip()]
    assert len(abstracts) >= 20

    tagger = BioEntityTagger(vocab)
    for text in abstracts:
        r = analyze_document(text, tagger)
        nlp, nps = r["nlp"], r["noun_phrases"]
        # STRICT per-abstract chunk lattice — the reference's exact
        # assertion (text_nlp.py:431: assertLess(top, chunks))
        assert len(nps["top_chunks"]) < len(nps["chunks"])
        assert len(nps["top_chunks"]) <= 5
        assert set(nps["top_chunks"]) <= set(nps["recurring_chunks"])
        assert set(nps["recurring_chunks"]) <= set(nps["chunks"])
        # every abstract yields at least one SVO concept (the grammar
        # covers the corpus — r2 VERDICT: answers pinned per abstract)
        assert len(nlp["concepts"]) >= 1
        # tag offsets slice to their matches (text_nlp.py:451-464)
        norm = normalize(text)
        for t in nlp["tagged_entities"]:
            if t["category"] == "TARGET&DISEASE":
                continue
            assert norm[t["start"]:t["end"]].lower() == t["match"].lower()
        # concept ranges inside their sentences, text/range agreement
        for c in nlp["concepts"]:
            s = c["sentence_text"]
            sr, orr = c["subject_range"], c["object_range"]
            for rng in (sr, orr):
                assert 0 <= rng["start"] < rng["end"] <= len(s)
            assert s[sr["start"]:sr["end"]] == c["subject"]
            assert s[orr["start"]:orr["end"]] == c["object"]
            # attached tags slice their sentence text (text_nlp.py:460-464)
            for bucket in ("subject_tags", "object_tags"):
                for t in c[bucket]:
                    assert s[t["start"]:t["end"]].lower() == t["match"].lower()


@pytest.fixture(scope="module")
def vocab8p():
    """Hand-built vocabulary for the chromosome8p fixture: the 8p genes
    the reference dictionary would tag, plus the diseases (ids are the
    public Ensembl/EFO identifiers)."""
    genes = {
        "PPP3CC": "ENSG00000120910",
        "ADRA1A": "ENSG00000120907",
        "NRG1": "ENSG00000157168",
        "FGFR1": "ENSG00000077782",
        "SFRP1": "ENSG00000104332",
        "FGF17": "ENSG00000158815",
    }
    v = {
        sym: [{"category": "GENE", "reference_db": "OPENTARGETS",
               "ids": [ensg], "pref_name": sym}]
        for sym, ensg in genes.items()
    }
    for disease, efo in (("schizophrenia", "EFO_0000692"),
                         ("autism", "EFO_0003756"),
                         ("cancer", "EFO_0000311")):
        v[disease] = [{"category": "DISEASE", "reference_db": "OPENTARGETS",
                       "ids": [efo], "pref_name": disease}]
    return v


@pytest.mark.skipif(not os.path.exists(TEXT_NLP), reason="reference absent")
def test_chromosome8p_tags_in_concepts(vocab8p):
    """text_nlp.py:451-464 port: concepts with PPP3CC in the object
    exist; their object_tags carry GENE entries whose offsets slice the
    sentence text to the matched string."""
    from library_beam_spark.kernels.tagger import BioEntityTagger
    from library_beam_spark.nlp_ops import analyze_document

    text = _load_chromosome8p()
    assert "PPP3CC" in text
    r = analyze_document(text, BioEntityTagger(vocab8p))
    concepts = [c for c in r["nlp"]["concepts"] if "PPP3CC" in c["object"]]
    assert concepts != []
    for c in concepts:
        tag_types = {t["category"] for t in c["object_tags"]}
        assert "GENE" in tag_types
        for t in c["object_tags"]:
            if t["category"] != "GENE":
                continue
            matched = t["match"].lower()
            positions = c["sentence_text"][t["start"]:t["end"]].lower()
            assert matched == positions


@pytest.mark.skipif(not os.path.exists(TEXT_NLP), reason="reference absent")
def test_chromosome8p_embedding_text_forms(vocab8p):
    """text_nlp.py:486-498 port on this engine's contract: the plain
    form is punctuation-free and merges the 'molecular genetics' noun
    chunk to one underscore token; the POS form tags it NOUN; the
    entity form embeds refid|CATEGORY|LABEL for the tagged genes."""
    from library_beam_spark.kernels.tagger import BioEntityTagger
    from library_beam_spark.nlp_ops import analyze_document

    text = _load_chromosome8p()
    emb = analyze_document(text, BioEntityTagger(vocab8p))["nlp"]["embedding_text"]
    assert "," not in emb["plain"]
    assert "molecular_genetics" in emb["plain"]
    assert "molecular_genetics|NOUN" in emb["pos_tag"]
    assert "ensg00000120910|GENE|PPP3CC" in emb["ent_tag"]
    assert "ensg00000120907|GENE|ADRA1A" in emb["ent_tag"]
