"""T11 — subject–verb–object concept extraction.

The reference extracts SVO "concepts" from a spaCy dependency parse
(SentenceAnalysisSpacy.analyse, NLP.py:804-1114). spaCy and its models
are unavailable in this environment, so the extractor is re-expressed as
a deterministic pattern grammar over tokens. The OUTPUT CONTRACT is the
reference's (SURVEY §1.1 Concept): one dict per concept with

    subject, subject_range{start,end}, verb, verb_path[], object,
    object_range{start,end}, negated, sentence_text, sentence

and it reproduces the reference's golden triples
(tests/text_nlp.py:86-112), e.g.
    "Asthma is a chronic disease" → (Asthma, be, chronic disease)
    "Asthma is characterized by airway inflammation"
        → (Asthma, be characterized by, airway inflammation).

Grammar (documented heuristic, kernel-private just like the spaCy
internals were — SURVEY §2.8 T11):
- verb group = AUX [neg] [participle [prep]] | lexical-verb [prep]
- subject   = noun-phrase run immediately left of the verb group
- object    = noun-phrase run immediately right of it
- negated   = {no, not, n't, never, none, false} inside the clause
  (NLP.py:851-861's trigger set).

If spaCy IS importable (full deploy), ``svo_spacy.py`` would slot in
behind the same contract; the registry/test surface does not change.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .stopwords import STOPLIST

AUX = {"is", "are", "was", "were", "am", "be", "been", "being"}
HAVE = {"has", "have", "had"}
MODAL = {"can", "could", "may", "might", "must", "shall", "should", "will", "would"}
NEGATION = {"no", "not", "n't", "never", "none", "false"}
PREPS = {"by", "with", "in", "as", "to", "of", "for", "from", "on", "into"}

_IRREGULAR_PART = {
    "shown", "known", "found", "seen", "given", "made", "done", "held",
    "kept", "left", "lost", "met", "put", "set", "told", "thought",
    "associated", "linked", "related", "characterized", "characterised",
    "caused", "induced", "mediated", "regulated", "activated", "expressed",
}

_VERB_LEMMAS = {
    "increase", "decrease", "inhibit", "induce", "cause", "affect",
    "regulate", "activate", "suppress", "reduce", "improve", "require",
    "show", "suggest", "indicate", "play", "remain", "include", "contain",
    "involve", "lead", "result", "occur", "develop", "produce", "express",
    "mediate", "promote", "prevent", "enhance", "trigger", "modulate",
    "bind", "encode", "target", "block",
}


def _verb_forms() -> dict[str, str]:
    forms: dict[str, str] = {}
    for lemma in _VERB_LEMMAS:
        forms[lemma] = lemma
        forms[lemma + "s"] = lemma
        forms[lemma + "es"] = lemma
        if lemma.endswith("e"):
            forms[lemma + "d"] = lemma
            forms[lemma[:-1] + "ing"] = lemma
        else:
            forms[lemma + "ed"] = lemma
            forms[lemma + "ing"] = lemma
    return forms


_VERB_FORM_TO_LEMMA = _verb_forms()

_TOKEN_RE = re.compile(r"\S+")


@dataclass
class _Tok:
    text: str
    start: int
    end: int

    @property
    def low(self) -> str:
        return self.text.lower().strip(".,;:!?()\"'")


def _tokens(sentence: str) -> list[_Tok]:
    return [_Tok(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(sentence)]


def _is_participle(tok: str) -> bool:
    return tok in _IRREGULAR_PART or (len(tok) > 4 and tok.endswith("ed"))


def _is_content(tok: str) -> bool:
    """Noun-phrase material: not a stopword/prep, and not verb-shaped
    (verbs and participles terminate an NP run)."""
    t = tok
    return (
        bool(t)
        and t not in STOPLIST
        and t not in PREPS
        and t not in AUX
        and t not in HAVE
        and t not in MODAL
        and t not in NEGATION
        and t not in _VERB_FORM_TO_LEMMA
        and not _is_participle(t)
        and any(c.isalpha() or c.isdigit() for c in t)
    )


def _np_left(tokens: list[_Tok], before: int) -> tuple[int, int] | None:
    """Index range [i, j) of the content-word run ending just before
    ``before`` (skipping stopwords in between)."""
    j = before - 1
    while j >= 0 and not _is_content(tokens[j].low):
        j -= 1
    if j < 0:
        return None
    i = j
    while i - 1 >= 0 and _is_content(tokens[i - 1].low):
        i -= 1
    return (i, j + 1)


def _np_right(tokens: list[_Tok], after: int) -> tuple[int, int] | None:
    n = len(tokens)
    i = after
    # skip determiners/stopwords/negation particles
    while i < n and not _is_content(tokens[i].low):
        i += 1
    if i >= n:
        return None
    j = i
    while j + 1 < n and _is_content(tokens[j + 1].low):
        j += 1
    return (i, j + 1)


def _span_text(sentence: str, tokens: list[_Tok], rng: tuple[int, int]) -> tuple[str, int, int]:
    start = tokens[rng[0]].start
    end = tokens[rng[1] - 1].end
    return sentence[start:end].strip(".,;:!?\"'"), start, start + len(
        sentence[start:end].strip(".,;:!?\"'")
    )


def analyse_sentence(sentence: str, sentence_idx: int = 0) -> list[dict]:
    """All SVO concepts in one sentence."""
    tokens = _tokens(sentence)
    concepts: list[dict] = []
    i = 0
    n = len(tokens)
    # subject of the clause's auxiliary, remembered so a later standalone
    # participle ("is a disease characterized by X") attaches to the same
    # subject — the dependency-ancestor behavior of NLP.py:863-890.
    aux_subject: tuple[int, int] | None = None
    while i < n:
        low = tokens[i].low
        verb_path: list[str] = []
        verb_text: str | None = None
        negated = False
        subj_override: tuple[int, int] | None = None
        j = i
        if low in AUX or low in HAVE or low in MODAL:
            lemma = "be" if low in AUX else ("have" if low in HAVE else low)
            verb_path = [lemma]
            j = i + 1
            # negation particle directly after the aux
            while j < n and tokens[j].low in NEGATION:
                negated = True
                j += 1
            if j < n and (_is_participle(tokens[j].low) or tokens[j].low in _VERB_FORM_TO_LEMMA):
                verb_path.append(tokens[j].low)
                j += 1
                if j < n and tokens[j].low in PREPS:
                    verb_path.append(tokens[j].low)
                    j += 1
            verb_text = " ".join(verb_path)
        elif low in _VERB_FORM_TO_LEMMA:
            lemma = _VERB_FORM_TO_LEMMA[low]
            verb_path = [lemma]
            j = i + 1
            if j < n and tokens[j].low in PREPS - {"of"}:
                verb_path.append(tokens[j].low)
                j += 1
            verb_text = " ".join(verb_path)
        elif _is_participle(low) and aux_subject is not None:
            # standalone participle after a copula clause: "X is a Y
            # characterized by Z" → (X, be characterized by, Z); the verb
            # inherits the ancestor aux lemma (NLP.py:892-912).
            verb_path = ["be", low]
            j = i + 1
            if j < n and tokens[j].low in PREPS:
                verb_path.append(tokens[j].low)
                j += 1
            verb_text = " ".join(verb_path)
            subj_override = aux_subject

        if verb_text is not None:
            subj = subj_override or _np_left(tokens, i)
            if low in AUX and subj is not None:
                aux_subject = subj
            obj = _np_right(tokens, j)
            if subj and obj:
                # clause-level negation scan (NLP.py:851-861 trigger set)
                clause_negated = negated or any(
                    t.low in NEGATION for t in tokens[subj[1]:obj[0]]
                )
                s_text, s_start, s_end = _span_text(sentence, tokens, subj)
                o_text, o_start, o_end = _span_text(sentence, tokens, obj)
                concepts.append(
                    {
                        "subject": s_text,
                        "subject_range": {"start": s_start, "end": s_end},
                        "verb": verb_text,
                        "verb_path": verb_path,
                        "object": o_text,
                        "object_range": {"start": o_start, "end": o_end},
                        "negated": clause_negated,
                        "sentence_text": sentence,
                        "sentence": sentence_idx,
                    }
                )
            i = j
        else:
            i += 1
    return concepts
