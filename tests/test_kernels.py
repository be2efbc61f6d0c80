"""Kernel goldens + properties (SURVEY §5: engine test strategy 2/4/5).

The golden sentences mirror the reference's tests/text_nlp.py coverage:
asthma SVO triples (86-112), FA abbreviation (218-227), tokenizer
complex-token goldens (311-389), tag-offset invariants (451-464).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from library_beam_spark.kernels.abbreviations import digest_as_dict
from library_beam_spark.kernels.chunker import digest
from library_beam_spark.kernels.normalize import normalize, transliterate_greek
from library_beam_spark.kernels.sentences import split_sentences, tokenize
from library_beam_spark.kernels.svo import analyse_sentence
from library_beam_spark.kernels.tagger import (
    BioEntityTagger,
    MatchedTag,
    get_tags_in_range,
    mark_tags_in_text,
    remove_nested_matches,
)


# --- normalize (T1) -------------------------------------------------------

def test_greek_transliteration():
    assert transliterate_greek("TNF-α and IFN-γ") == "TNF-alpha and IFN-gamma"
    assert transliterate_greek("Ω-3") == "Omega-3"


def test_normalize_collapses_and_folds():
    assert normalize("a  b\t\tc") == "a b c"
    assert normalize("naïve café") == "naive cafe"


# --- abbreviations (T2, golden from reference tests/text_nlp.py:218-227) --

def test_fanconi_anemia_golden():
    assert digest_as_dict("Fanconi anemia (FA) is a rare disease.") == {
        "FA": "Fanconi anemia"
    }


def test_abbreviation_variants():
    assert digest_as_dict(
        "Granulocyte colony-stimulating factor (G-CSF) was given."
    ) == {"G-CSF": "Granulocyte colony-stimulating factor"}
    assert digest_as_dict("heat shock protein 90 (HSP90) binds.") == {
        "HSP90": "heat shock protein 90"
    }
    # first definition wins
    assert digest_as_dict(
        "Fatty acid (FA) then Fanconi anemia (FA)."
    ) == {"FA": "Fatty acid"}


def test_abbreviation_rejects_non_candidates():
    assert digest_as_dict("Something (whichever phrase here is long).") == {}
    assert digest_as_dict("pH (7) only digits.") == {}


# --- tokenizer (T10, goldens from text_nlp.py:311-389 contract) -----------

def test_complex_tokens_stay_whole():
    toks = tokenize("a concentration of 10(-7) M was used")
    assert "10(-7)" in toks
    toks = tokenize("the (Na++K+)-ATPase pump.")
    assert "(Na++K+)-ATPase" in toks
    assert "pump" in toks


def test_sentence_split_offsets():
    text = "First sentence here. Second one (e.g. with a guard) stays. Third."
    spans = split_sentences(text)
    assert [text[a:b] for _, a, b in spans] == [s for s, _, _ in spans]
    assert len(spans) == 3


# --- tagger (T3-T8) -------------------------------------------------------

def _tagger(vocab):
    return BioEntityTagger(vocab)


def test_tagger_offsets_slice_to_match(vocab):
    t = _tagger(vocab)
    text = "Asthma involves airway inflammation; TNF and ttf-1 and TTF1 too."
    for tag in t.tag(text):
        assert text[tag.start : tag.end] == tag.match


def test_tagger_word_boundaries(vocab):
    t = _tagger(vocab)
    # embedded in alnum runs: no match; dash is a separator, so the
    # 'TNF' of 'TNF-like' DOES match (dash-variant semantics,
    # BioentityTagger.py:77-88)
    assert t.tag("TNFX and xTNF") == []
    assert [x.match for x in t.tag("TNF-like")] == ["TNF"]


def test_tagger_nested_span_removal(vocab):
    t = _tagger(vocab)
    tags = t.tag("airway inflammation")
    # 'inflammation' (same group HPO|PHENOTYPE) must be removed as nested
    matches = [x.match for x in tags]
    assert "airway inflammation" in matches
    assert "inflammation" not in matches


def test_tagger_dash_variant(vocab):
    t = _tagger(vocab)
    assert {x.match for x in t.tag("TTF1 and TTF-1")} == {"TTF1", "TTF-1"}


def test_remove_nested_is_antichain():
    def mk(s, e):
        return MatchedTag(
            match="m", start=s, end=e, category="C", reference_db="D",
            reference=[], original_value="m", label="m",
        )

    kept = remove_nested_matches([mk(0, 10), mk(2, 5), mk(5, 12), mk(0, 10)])
    for a in kept:
        for b in kept:
            if a is not b:
                assert not (a.start <= b.start and b.end <= a.end)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 15)).map(
            lambda p: (p[0], p[0] + p[1])
        ),
        max_size=12,
    )
)
@settings(max_examples=50, deadline=None)
def test_remove_nested_property(spans):
    tags = [
        MatchedTag(match="x", start=s, end=e, category="C", reference_db="D",
                   reference=[], original_value="x", label="x")
        for s, e in spans
    ]
    kept = remove_nested_matches(tags)
    # antichain under strict containment
    for a in kept:
        for b in kept:
            if a is not b:
                assert not (
                    a.start <= b.start and b.end <= a.end
                    and (a.start, a.end) != (b.start, b.end)
                )
    # every dropped span is contained in some kept span
    kept_set = {(t.start, t.end) for t in kept}
    for s, e in spans:
        assert any(ks <= s and e <= ke for ks, ke in kept_set) or (s, e) in kept_set


def test_mark_tags_in_text(vocab):
    t = _tagger(vocab)
    text = "Asthma is bad."
    marked = mark_tags_in_text(text, t.tag(text))
    assert marked == "<mark-1>Asthma</mark-1> is bad."


def test_get_tags_in_range(vocab):
    t = _tagger(vocab)
    text = "Asthma here. TNF there."
    tags = t.tag(text)
    assert [x.match for x in get_tags_in_range(tags, 0, 12)] == ["Asthma"]


# --- SVO (T11, goldens from text_nlp.py:86-112 contract) ------------------

def test_asthma_golden_triples():
    got = {
        (c["subject"], c["verb"], c["object"])
        for c in analyse_sentence(
            "Asthma is a chronic disease characterized by airway inflammation."
        )
    }
    assert ("Asthma", "be", "chronic disease") in got
    assert ("Asthma", "be characterized by", "airway inflammation") in got


def test_negation_detection():
    (c,) = analyse_sentence("TNF does not induce apoptosis in these cells.")
    assert c["negated"] is True
    assert (c["subject"], c["verb"], c["object"]) == ("TNF", "induce", "apoptosis")


def test_concept_ranges_within_sentence():
    s = "Asthma is characterized by airway inflammation."
    for c in analyse_sentence(s):
        for rng, txt in ((c["subject_range"], c["subject"]),
                         (c["object_range"], c["object"])):
            assert 0 <= rng["start"] < rng["end"] <= len(s)
            assert s[rng["start"]:rng["end"]] == txt


# --- chunker (T13/A2-A6) --------------------------------------------------

def test_chunker_invariants():
    d = digest(
        "Fanconi anemia (FA) is a rare disease. FA patients often develop "
        "cancer. Cancer risk is high in FA patients."
    )
    chunks = set(d["chunks"])
    recurring = set(d["recurring_chunks"])
    top = set(d["top_chunks"])
    assert top <= recurring <= chunks
    assert len(d["top_chunks"]) <= 5
    assert {"short": "FA", "long": "Fanconi anemia"} in d["abbreviations"]


def test_chunker_plural_merge():
    d = digest("The biomarker was found. Two biomarkers were found. One biomarker failed.")
    assert "biomarker" in d["chunks"] and "biomarkers" not in d["chunks"]


@given(st.text(alphabet=string.printable, max_size=200))
@settings(max_examples=50, deadline=None)
def test_kernels_never_crash(text):
    digest(text)
    digest_as_dict(text)
    analyse_sentence(text)
    normalize(text)


# --- fuzzy (F12) + partial-match tagging (T3 optional path) ---------------

def test_token_sort_ratio():
    from library_beam_spark.kernels.fuzzy import levenshtein, ratio, token_sort_ratio

    assert levenshtein("kitten", "sitting") == 3
    assert token_sort_ratio("anemia Fanconi", "Fanconi anemia") == 100
    assert token_sort_ratio("abc", "abc") == 100
    assert token_sort_ratio("totally different", "heat shock protein") < 50


def test_partial_match_fuzzy_gate():
    from library_beam_spark.kernels.tagger import BioEntityTagger

    vocab = {
        "breast cancer gene": [
            {"category": "GENE", "reference_db": "OT", "ids": ["G1"],
             "pref_name": "BRCA"}
        ]
    }
    t = BioEntityTagger(vocab, partial_match=True)
    # full term matches; nested partial-token hits removed
    assert [x.match for x in t.tag("the breast cancer gene region")] == [
        "breast cancer gene"
    ]
    # lone token in an unrelated context: rejected by the ratio>90 gate
    assert t.tag("pancreatic cancer here") == []


# --- reference goldens ported from tests/text_nlp.py:86-240 ----------------

def _triples(text):
    return {(c["subject"], c["verb"], c["object"]) for c in analyse_sentence(text)}


def test_asthma_conjunct_objects_golden():
    """text_nlp.py:86-112: each coordinated object emits its own concept."""
    got = _triples(
        "Asthma is a chronic disease characterized by airway inflammation, "
        "obstruction and hyperresponsiveness."
    )
    assert ("Asthma", "be", "chronic disease") in got
    for obj in ("airway inflammation", "obstruction", "hyperresponsiveness"):
        assert ("Asthma", "be characterized by", obj) in got


def test_fanconi_golden():
    """text_nlp.py:218-240: abbreviation aside dropped from the subject,
    adjectival participle stripped from the conjunct NP."""
    got = _triples(
        "Fanconi anemia (FA) is a genetic disease characterized by bone "
        "marrow failure and increased cancer risk."
    )
    assert ("Fanconi anemia", "be", "genetic disease") in got
    assert ("Fanconi anemia", "be characterized by", "bone marrow failure") in got
    assert ("Fanconi anemia", "be characterized by", "cancer risk") in got


def test_serum_level_comparative_golden():
    """text_nlp.py:142-160: copula + comparative folds into the verb;
    the of-chain head is a subject; the than-branch gets its own verb;
    the '(p<0.05)' aside never enters an NP."""
    got = _triples(
        "The serum levels of CA125, CA15.3, and HE4 were significantly "
        "higher in the TTF-1-positive group than in the TTF-1-negative "
        "group (p<0.05)."
    )
    assert ("serum levels", "be higher", "TTF-1-positive group") in got
    assert ("serum levels", "be higher than", "TTF-1-negative group") in got
    assert not any("p<0.05" in s or "p<0.05" in o for s, _, o in got)


def test_clinical_trials_infinitive_golden():
    """text_nlp.py:114-141: passive + infinitive chain; every NP in the
    object subtree becomes a concept (effects / antibodies / asthma);
    'have been' defers to the inner aux (no bogus 'have' concepts)."""
    got = _triples(
        "Recently, more and more clinical trials have been performed to "
        "evaluate the effects of anti-interleukin antibodies in "
        "eosinophilic asthma."
    )
    verb = "be performed to evaluate"
    for obj in ("effects", "anti-interleukin antibodies", "eosinophilic asthma"):
        assert ("clinical trials", verb, obj) in got
    assert not any(v == "have" for _, v, _ in got)


def test_negation_stays_single_object():
    got = _triples("TNF does not induce apoptosis in these cells.")
    assert got == {("TNF", "induce", "apoptosis")}
    (c,) = analyse_sentence("TNF does not induce apoptosis in these cells.")
    assert c["negated"] is True


def test_custom_tokenizer_reference_corpus_golden():
    """text_nlp.py:311-389: the full complex-token contract — bio
    compounds survive whole, sentence punctuation strips."""
    from library_beam_spark.kernels.sentences import tokenize

    text = (
        "the antagonistic action of propranolol (1 X 10(-7) M) in a "
        "Ca++-containing or. Cell growth and quabain-sensitive 86Rg+ uptake "
        "and (Na++K+)-ATPase activity in 3T3 and SV40 transformed 3T3 "
        "fibroblasts. The uptake measured at 60 min was 4.5- and 2.7-fold "
        "greater respectively for SV40 transformed 3T3 cells compared to "
        "3T3 cells. Ouabain-sensitive 86Rb+ uptake was found to be a "
        "sensitive indicator of protein synthesis. This is a test, for a "
        "complex entity name: th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se . "
    )
    toks = tokenize(text)
    for want in ("10(-7)", "(Na++K+)-ATPase", "2.7-fold", "4.5-", "86Rb+",
                 "86Rg+", "Ca++-containing", "Ouabain-sensitive",
                 "th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se"):
        assert want in toks, want
    for bad in ("cells,", "(1", "fibroblasts."):
        assert bad not in toks, bad


def test_plk1_appositive_subject_golden():
    """text_nlp.py:163-190: the outer NP before an appositive aside is
    the subject ('PLK1, an essential mitotic kinase regulator, is ...'),
    and the gerund clause ('in regulating ...') attaches its own
    subject/objects."""
    got = _triples(
        "Here we report that the Polo-like kinase PLK1, an essential "
        "mitotic kinase regulator, is an important downstream effector "
        "of c-ABL in regulating the growth of cervical cancer."
    )
    assert ("Polo-like kinase PLK1", "be", "important downstream effector") in got
    assert ("Polo-like kinase PLK1", "be", "c-ABL") in got
    assert ("c-ABL", "regulate", "cervical cancer") in got
    assert ("c-ABL", "regulate", "growth") in got


def test_schistosoma_verb_conjunct_golden():
    """text_nlp.py:192-216: a lexical verb after 'and' is a verb
    conjunct sharing the previous clause's subject — 'infection reduces
    the severity of asthma and prevent atopy' keeps 'infection' as the
    subject of 'prevent'."""
    got = _triples(
        "Studies have suggested that Schistosoma mansoni infection "
        "reduces the severity of asthma and prevent atopy."
    )
    assert ("Schistosoma mansoni infection", "reduce", "severity") in got
    assert ("Schistosoma mansoni infection", "reduce", "asthma") in got
    assert ("Schistosoma mansoni infection", "prevent", "atopy") in got
    # the conjunct verb must NOT grab the nearest NP as its subject
    assert ("asthma", "prevent", "atopy") not in got


def test_noun_phrase_reference_set_goldens():
    """text_nlp.py expected_noun_phrases ports (case-folded — the
    engine's chunks are lowercase by contract). Asthma and Fanconi match
    EXACTLY; the serum/trials sentences assert the reference's NPs are
    present with no fused or parenthetical junk (the reference's own
    extraction admits a tokenizer TODO there)."""
    from library_beam_spark.kernels.chunker import extract_noun_phrases

    got = set(extract_noun_phrases(
        "Asthma is a chronic disease characterized by airway inflammation, "
        "obstruction and hyperresponsiveness."
    ))
    assert got == {"asthma", "chronic disease", "airway inflammation",
                   "obstruction", "hyperresponsiveness"}

    got = set(extract_noun_phrases(
        "Fanconi anemia (FA) is a genetic disease characterized by bone "
        "marrow failure and increased cancer risk."
    ))
    assert got == {"fanconi anemia", "genetic disease",
                   "bone marrow failure", "cancer risk"}

    got = set(extract_noun_phrases(
        "The serum levels of CA125, CA15.3, and HE4 were significantly "
        "higher in the TTF-1-positive group than in the TTF-1-negative "
        "group (p<0.05)."
    ))
    assert {"serum levels", "ttf-1-positive group",
            "ttf-1-negative group"} <= got
    assert "p" not in got and not any("p<0.05" in c for c in got)

    got = set(extract_noun_phrases(
        "Recently,  more and more clinical trials have been performed to "
        "evaluate the effects of anti-interleukin (IL)-5 antibodies in "
        "eosinophilic asthma."
    ))
    assert {"clinical trials", "effects", "eosinophilic asthma",
            "anti-interleukin"} <= got
    assert "recently" not in got


def test_ly_noun_chunks_survive():
    """-ly NOUNS are chunks, -ly adverbs are not (code-review r3)."""
    from library_beam_spark.kernels.chunker import extract_noun_phrases

    got = set(extract_noun_phrases(
        "Mutations in this family are common in cancer. The assembly of "
        "the spliceosome requires ATP. Results improved significantly."
    ))
    assert "family" in got and "assembly" in got
    assert "significantly" not in got


# --- relative-clause grammar goldens (NLP.py:994-1008 relcl + ancestry) ---

def test_relative_clause_matrix_subject_golden():
    """When the matrix clause resumes after a subject-attached relative
    clause, the matrix verb re-attaches to the ANTECEDENT, not to the
    relative clause's object (the relcl edge + verb-ancestry walk of the
    reference, NLP.py:994-1008)."""
    triples = {
        (c["subject"], c["verb"], c["object"])
        for c in analyse_sentence("Genes that regulate apoptosis include BCL2.")
    }
    assert ("Genes", "regulate", "apoptosis") in triples
    assert ("Genes", "include", "BCL2") in triples
    assert not any(s == "apoptosis" for s, _, _ in triples)


def test_relative_clause_conjunct_verbs_share_antecedent():
    triples = {
        (c["subject"], c["verb"], c["object"])
        for c in analyse_sentence(
            "Proteins that bind DNA and regulate transcription include p53."
        )
    }
    assert ("Proteins", "bind", "DNA") in triples
    assert ("Proteins", "regulate", "transcription") in triples
    assert ("Proteins", "include", "p53") in triples


def test_relative_clause_of_hop_still_resumes_matrix():
    triples = {
        (c["subject"], c["verb"], c["object"])
        for c in analyse_sentence(
            "Genes that regulate expression of cytokines include TNF."
        )
    }
    assert ("Genes", "include", "TNF") in triples


def test_nod_mouse_appositive_relative_golden():
    """Reference corpus sentence (test_abstract_nlp.txt:27): the
    comma-closed relative clause's objects attach to 'develop', and the
    matrix copula re-attaches to the antecedent."""
    triples = {
        (c["subject"], c["verb"], c["object"])
        for c in analyse_sentence(normalize(
            "The NOD mouse, which spontaneously develops insulitis and "
            "overt diabetes, is a model of autoimmune type I diabetes "
            "mellitus."
        ))
    }
    assert ("NOD mouse", "develop", "insulitis") in triples
    assert ("NOD mouse", "develop", "overt diabetes") in triples
    assert ("NOD mouse", "be", "model") in triples
    assert not any(s in ("insulitis", "overt diabetes") for s, _, _ in triples)


def test_adverb_never_subject_or_object():
    """Adverb-shaped tokens are not NP material (LY_NOUNS carves out the
    family/assembly noun collisions)."""
    for c in analyse_sentence(
        "The kinase rapidly phosphorylates tau and strongly disrupts "
        "microtubule assembly."
    ):
        assert c["subject"] == "kinase"
        assert not c["subject"].endswith("ly")
        assert c["object"] in ("tau", "microtubule assembly")


# --- per-abstract content goldens over the reference's 28-abstract corpus

_CORPUS = "/root/reference/tests/resources/test_abstract_nlp.txt"

# One text-grounded (subject⊇, verb=, object⊇) triple per abstract —
# the claim the abstract actually makes, pinned as a content golden
# (the reference ran the same corpus through its spaCy stack,
# tests/text_nlp.py:417-431; these pin THIS engine's answers so grammar
# regressions surface per-abstract, not just as count invariants).
_ABSTRACT_GOLDENS = [
    ("proteome", "reveal", "associations"),                      # 0
    ("activity", "be associated with", "cognitive impairment"),  # 1
    ("Falls", "be", "prevalent"),                                # 2
    ("urinary incontinence", "be associated with", "incident parkinsonism"),
    ("transgenic mice", "express", "presenilin"),                # 4
    ("Cervical cancer growth", "be regulated by", "c-ABL-PLK1 signaling axis"),
    ("muscular dystrophies", "be", "heterogeneous group"),       # 6
    ("thyroid transcription factor-1", "predict", "recurrence"), # 7
    ("developmental processes", "be thought to contribute", "susceptibility"),
    ("Fanconi anemia", "be characterized by", "bone marrow failure"),
    ("Cilia", "play", "essential roles"),                        # 10
    ("GWAS", "have revealed", "susceptibility genes"),           # 11
    ("Usp8", "regulate", "alpha-synuclein clearance"),           # 12
    ("PINK1", "accumulate on", "defective mitochondria"),        # 13
    ("platform", "be designed to", "support identification"),    # 14
    ("melanoma brain metastasis", "be", "symptomatic"),          # 15
    ("Endometrial lesions", "affect", "women's health"),         # 16
    ("treatments", "target", "different inflammatory mediators"),
    ("Asthma", "be characterized by", "airway inflammation"),    # 18
    ("IgG1 monoclonal antibody", "bind to", "IL-5 receptor"),    # 19
    ("Long-read sequencing", "have", "complementary strengths"), # 20
    ("meta-analysis", "assess", "overall efficacy"),             # 21
    ("clinical trials", "be performed to evaluate", "effects"),  # 22
    ("Snurportin1", "enhance", "m3G-capdependent nuclear import"),
    ("Karyopherin-beta family", "mediate", "nuclear transport"), # 24
    ("investigation", "report", "CSF biomarkers"),               # 25
    ("NOD mouse", "develop", "insulitis"),                       # 26
    ("BRAF(T1799A) transversion", "be",
     "frequent morphotype-specific somatic mutation"),           # 27
]


def test_corpus_per_abstract_concept_goldens():
    """Corpus-wide content sweep: every abstract yields its pinned SVO
    claim (subject/object by containment — NP extents may legitimately
    grow — verb exact)."""
    import os

    import pytest as _pytest

    if not os.path.exists(_CORPUS):
        _pytest.skip("reference corpus absent")
    with open(_CORPUS, encoding="utf-8", errors="replace") as f:
        abstracts = [line.strip() for line in f if line.strip()]
    assert len(abstracts) == len(_ABSTRACT_GOLDENS)
    failures = []
    for idx, (text, (gs, gv, go)) in enumerate(zip(abstracts, _ABSTRACT_GOLDENS)):
        norm = normalize(text)
        concepts = []
        for si, (s_text, _, _) in enumerate(split_sentences(norm)):
            concepts.extend(analyse_sentence(s_text, si))
        if not any(
            gs in c["subject"] and c["verb"] == gv and go in c["object"]
            for c in concepts
        ):
            failures.append((idx, gs, gv, go))
    assert not failures, f"abstracts missing their pinned claim: {failures}"


def test_ewma_matches_python_fold(spark):
    """EWMA: the window fold must equal the reference recurrence
    s = 0.5·s + 0.5·x over each key's last-16 frame, including the
    truncation boundary (17th-oldest value falls out entirely)."""
    from library_beam_spark.operators.timeseries import ewma

    rows = [
        (1, k, float((7 * k) % 23) + 0.25) for k in range(20)
    ] + [(2, k, float(k)) for k in range(3)]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = {
        (r.user_id, r.ts): r.ewma
        for r in ewma(df, order_cols=("ts",), window=16).collect()
    }
    import math

    for uid in (1, 2):
        vals = [v for u, _t, v in rows if u == uid]
        for t in range(len(vals)):
            frame = vals[max(0, t - 15) : t + 1]
            s = 0.0
            for x in frame:
                s = s * 0.5 + x * 0.5
            want = math.floor(s * 1_000_000.0 + 0.5) / 1_000_000.0
            assert out[(uid, t)] == want, (uid, t)
