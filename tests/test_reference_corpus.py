"""Invariant sweep over the reference's own 28-abstract test corpus
(SURVEY §5: text_nlp.py:417-431 ran the same sweep). The corpus is read
IN PLACE from the read-only reference checkout — nothing is copied —
and skipped if absent. Assertions are the reference's documented
invariants, not golden outputs (the NLP stack differs by design)."""

import os

import pytest

CORPUS = "/root/reference/tests/resources/test_abstract_nlp.txt"


@pytest.mark.skipif(not os.path.exists(CORPUS), reason="reference corpus absent")
def test_corpus_sweep_invariants(vocab):
    from library_beam_spark.kernels.tagger import BioEntityTagger
    from library_beam_spark.nlp_ops import analyze_document

    with open(CORPUS, encoding="utf-8", errors="replace") as f:
        abstracts = [line.strip() for line in f if line.strip()]
    assert len(abstracts) >= 20

    tagger = BioEntityTagger(vocab)
    for text in abstracts:
        r = analyze_document(text, tagger)
        nlp, nps = r["nlp"], r["noun_phrases"]
        # top/recurring/chunks lattice (text_nlp.py:431)
        assert len(nps["top_chunks"]) <= 5
        assert set(nps["top_chunks"]) <= set(nps["recurring_chunks"])
        assert set(nps["recurring_chunks"]) <= set(nps["chunks"])
        # tag offsets slice to their matches (text_nlp.py:451-464)
        from library_beam_spark.kernels.normalize import normalize

        norm = normalize(text)
        for t in nlp["tagged_entities"]:
            if t["category"] == "TARGET&DISEASE":
                continue
            assert norm[t["start"]:t["end"]].lower() == t["match"].lower()
        # concept ranges inside their sentences
        for c in nlp["concepts"]:
            s = c["sentence_text"]
            for rng in (c["subject_range"], c["object_range"]):
                assert 0 <= rng["start"] < rng["end"] <= len(s)
