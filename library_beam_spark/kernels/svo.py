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
              | AUX + predicate-adjective + to-infinitive chain
                ('are likely to contribute to' → 'be contribute to',
                the xcomp hop on the verb-ancestry path NLP.py:994-1008)
- subject   = noun-phrase run immediately left of the verb group, PLUS
  its coordination conjuncts ('neuromodulin and neurogranin are' emits
  both — the conj edges on nsubj, NLP.py:863-890) and the of-chain head
- object    = noun-phrase run immediately right of it, split into
  comma/and conjuncts; a parenthesized enumeration after the object NP
  ('21 genes in this region (ADRA1A, ..., PPP3CC)') contributes its
  members — the appositive subtree span text_nlp.py:453-464 asserts
- relative clauses: 'genes that are ... to contribute to X' attach the
  antecedent NP as subject (the stop-word scan crosses the pronoun); and
  when the MATRIX clause resumes after a subject-attached relative
  clause — 'genes that regulate apoptosis include BCL2' — the matrix
  verb re-attaches to the antecedent ('genes include BCL2'), not to the
  relative clause's object (the relcl edge + verb ancestry,
  NLP.py:994-1008)
- negated   = {no, not, n't, never, none, false} inside the clause
  (NLP.py:851-861's trigger set).

If spaCy IS importable (full deploy), ``svo_spacy.py`` would slot in
behind the same contract; the registry/test surface does not change.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .stopwords import LY_NOUNS, STOPLIST

AUX = {"is", "are", "was", "were", "am", "be", "been", "being"}
HAVE = {"has", "have", "had"}
MODAL = {"can", "could", "may", "might", "must", "shall", "should", "will", "would"}
NEGATION = {"no", "not", "n't", "never", "none", "false"}
# relative pronouns: crossing one on the subject scan marks the verb as
# a relative-clause verb whose naive left NP is the ANTECEDENT
_REL_PRONOUNS = {"that", "which", "who", "whom"}
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
    "bind", "encode", "target", "block", "evaluate", "demonstrate",
    "perform", "report", "observe", "confirm", "reveal", "identify",
    "contribute", "describe", "discuss", "establish", "examine",
    "investigate", "determine", "assess", "compare", "measure", "predict",
    "propose", "define", "highlight", "summarize", "implicate",
    # biomedical verbs with no common noun homograph (noun-ambiguous
    # forms — control(s), correlate(s), study, aim, drive, rescue —
    # are deliberately EXCLUDED: they appear as nouns in abstracts
    # ('healthy controls', 'neural correlates') and would truncate NPs)
    "phosphorylate", "methylate", "acetylate", "cleave", "transcribe",
    "dimerize", "localize", "colocalize", "interact", "stimulate",
    "attenuate", "abolish", "exacerbate", "accelerate", "ameliorate",
    "impair", "disrupt", "downregulate", "upregulate", "overexpress",
    "restore", "underlie", "confer", "elicit", "evoke", "abrogate",
    "potentiate", "sensitize", "mitigate", "diminish", "augment",
    "facilitate", "hinder", "alter", "persist", "proliferate",
    "differentiate", "accumulate", "worsen",
}

# comparative adjectives that fold into a copula verb group:
# "were significantly higher in X" → verb 'be higher', object X
# (the reference's verb-descriptor collection, tests/text_nlp.py:142-160)
_COMPARATIVES = {
    "higher", "lower", "greater", "smaller", "larger", "better", "worse",
    "faster", "slower", "stronger", "weaker", "older", "younger",
}
_ADVERB = re.compile(r".{3,}ly$")


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


def _is_parenthetical(raw: str) -> bool:
    """A fully parenthesized token — '(p<0.05)' — is an aside, not NP
    material (but '(Na++K+)-ATPase' and '10(-7)' are not fully wrapped)."""
    t = raw.rstrip(".,;:!?\"'")
    return len(t) > 1 and t.startswith("(") and t.endswith(")")


def _np_tok(tok: _Tok) -> bool:
    """NP material: content-shaped, not an aside, and not adverb-shaped —
    'which spontaneously develops' must not make 'spontaneously' a
    one-token subject run that hides the antecedent (LY_NOUNS carves the
    family/assembly/supply noun collisions out of the -ly heuristic)."""
    return (
        _is_content(tok.low)
        and not _is_parenthetical(tok.text)
        and not (_ADVERB.match(tok.low) and tok.low not in LY_NOUNS)
    )


def _np_left(tokens: list[_Tok], before: int) -> tuple[int, int] | None:
    """Index range [i, j) of the content-word run ending just before
    ``before`` (skipping stopwords in between)."""
    j = before - 1
    while j >= 0 and not _np_tok(tokens[j]):
        j -= 1
    if j < 0:
        return None
    i = j
    while i - 1 >= 0 and _np_tok(tokens[i - 1]):
        i -= 1
    return (i, j + 1)


def _np_right(tokens: list[_Tok], after: int) -> tuple[int, int] | None:
    n = len(tokens)
    i = after
    # skip determiners/stopwords/negation particles
    while i < n and not _np_tok(tokens[i]):
        i += 1
    if i >= n:
        return None
    j = i
    while j + 1 < n and _np_tok(tokens[j + 1]):
        j += 1
    return (i, j + 1)


def _span_text(
    sentence: str,
    tokens: list[_Tok],
    rng: tuple[int, int],
    extra_strip: str = "",
) -> tuple[str, int, int]:
    start = tokens[rng[0]].start
    end = tokens[rng[1] - 1].end
    raw = sentence[start:end]
    chars = ".,;:!?\"'" + extra_strip
    stripped = raw.strip(chars)
    # unbalanced edge parens are enumeration syntax, not span content:
    # 'VMAT1/SLC18A1)' → trim; '(Na++K+)-ATPase' is balanced → keep
    if stripped.endswith(")") and "(" not in stripped:
        stripped = stripped[:-1].rstrip(chars)
    if stripped.startswith("(") and ")" not in stripped:
        stripped = stripped[1:].lstrip(chars)
    # the reported start must follow any LEFT-stripped chars, not assume
    # stripping only trimmed the right side
    lead = raw.find(stripped) if stripped else 0
    return stripped, start + lead, start + lead + len(stripped)


def _is_verbish(low: str) -> bool:
    return (
        low in AUX or low in HAVE or low in MODAL
        or low in _VERB_FORM_TO_LEMMA or _is_participle(low)
    )


def _is_finite_verbish(low: str) -> bool:
    """Verb-shaped but NOT participle-shaped: participles between a
    conjunction and an NP are adjectival ('and increased cancer risk'),
    while finite forms start a verb conjunct ('and prevent atopy')."""
    return _is_verbish(low) and not _is_participle(low)


def _split_commas(tokens: list[_Tok], rng: tuple[int, int]) -> list[tuple[int, int]]:
    """Split a content run into conjuncts at token-final commas:
    'CA125, CA15.3, and HE4' → three groups."""
    i, j = rng
    groups, cur = [], i
    for idx in range(i, j):
        if tokens[idx].text.rstrip(".;:!?\"'").endswith(","):
            groups.append((cur, idx + 1))
            cur = idx + 1
    if cur < j:
        groups.append((cur, j))
    return groups


def _paren_appositive(
    tokens: list[_Tok], at: int
) -> tuple[list[tuple[int, int]], int] | None:
    """A parenthesized list directly after an object NP — '21 genes in
    this region (ADRA1A, ..., PPP3CC and VMAT1/SLC18A1)' — is an
    appositive enumeration of that NP: the dependency parse spans the
    whole subtree, so the reference's concepts carry each listed entity
    as object material (text_nlp.py:453-464 asserts PPP3CC-in-object).
    Returns (conjunct groups inside the parens, index after ')'), or
    None when ``at`` does not open a parenthetical / it never closes."""
    n = len(tokens)
    if at >= n or not tokens[at].text.startswith("("):
        return None
    close = None
    for k in range(at, min(n, at + 60)):
        if tokens[k].text.rstrip(".,;:!?\"'").endswith(")"):
            close = k
            break
    if close is None:
        return None
    groups, cur = [], at
    for idx in range(at, close + 1):
        t = tokens[idx].text.rstrip(")").rstrip(".;:!?\"'")
        if t.endswith(",") or tokens[idx].low in ("and", "or") or idx == close:
            hi = idx + 1 if idx == close or t.endswith(",") else idx
            if hi > cur:
                groups.append((cur, hi))
            cur = idx + 1
    return ([g for g in groups if g[1] > g[0]], close + 1)


def _object_conjuncts(
    tokens: list[_Tok], after: int
) -> list[tuple[int, int, bool]]:
    """Object NP groups right of the verb as (i, j, in_paren), one per
    conjunct — the coordination splitting the reference gets from the
    dependency parse (conj edges, NLP.py:863-890): commas split a run,
    'and|or' extends to the next NP unless an intervening verb signals a
    new clause, and a parenthesized enumeration right after a run adds
    its members (appositive subtree). A leading participle ('increased
    cancer risk') is skipped by the NP scan, matching the reference's
    noun-chunk texts."""
    first = _np_right(tokens, after)
    if first is None:
        return []
    n = len(tokens)
    groups = [(i, j, False) for i, j in _split_commas(tokens, first)]
    end = first[1]
    # appositive parenthetical enumeration: '21 genes in this region
    # (A, B, C and D)' — the dependency subtree spans the whole NP, so
    # the listed entities are object material (text_nlp.py:453-464).
    # Scan ahead over NP/stop/prep tokens only (a verb ends the clause).
    par = None
    for p in range(end, min(n, end + 8)):
        if tokens[p].text.startswith("("):
            par = _paren_appositive(tokens, p)
            break
        if _is_verbish(tokens[p].low):
            break
    if par is not None and len(par[0]) >= 2:
        groups.extend((i, j, True) for i, j in par[0])
        end = par[1]
    while end < n and tokens[end].low in ("and", "or"):
        nxt = _np_right(tokens, end + 1)
        if nxt is None or nxt[0] - (end + 1) > 2:
            break
        if any(_is_finite_verbish(t.low) for t in tokens[end + 1 : nxt[0]]):
            break  # 'and prevent atopy' — a verb conjunct, not an NP one
        after_tok = tokens[nxt[1]].low if nxt[1] < n else ""
        comma_closed = tokens[nxt[1] - 1].text.rstrip(".;:!?\"'").endswith(",")
        if _is_verbish(after_tok) and not comma_closed:
            # 'and Z inhibits W' — Z is a new clause's subject; but a
            # comma-closed NP before the verb ('which develops insulitis
            # and overt diabetes, is a model') is still an object
            # conjunct — the comma closes the (relative) clause
            break
        groups.extend((i, j, False) for i, j in _split_commas(tokens, nxt))
        end = nxt[1]
    return groups


def _hop_runs(
    tokens: list[_Tok], groups: list[tuple[int, int]]
) -> set[tuple[int, int]]:
    """Object runs plus their of/in-chained sub-NP runs — the full set of
    NPs a relative clause's object region covers ('expression of
    cytokines' covers both runs), mirroring ``_emit``'s hop walk."""
    n = len(tokens)
    runs: set[tuple[int, int]] = set()
    for g in groups:
        runs.add(g)
        nxt = g
        for _ in range(2):
            k = nxt[1]
            if k < n and tokens[k].low in ("of", "in"):
                hop = _np_right(tokens, k + 1)
                if hop is not None and hop[0] - (k + 1) <= 2:
                    runs.add(hop)
                    nxt = hop
                    continue
            break
    return runs


def analyse_sentence(sentence: str, sentence_idx: int = 0) -> list[dict]:
    """All SVO concepts in one sentence.

    The grammar mirrors the dependency-parse behaviors the reference
    goldens pin (tests/text_nlp.py:86-240): coordinated objects emit one
    concept per conjunct; 'of'-chained NPs emit extra subject/object
    concepts (the subtree-spanning of NLP.py:863-890); a copula +
    comparative folds into the verb ('were higher in X than in Y' →
    (be higher, X) and (be higher than, Y))."""
    tokens = _tokens(sentence)
    concepts: list[dict] = []
    i = 0
    n = len(tokens)
    # subject of the clause's auxiliary, remembered so a later standalone
    # participle ("is a disease characterized by X") attaches to the same
    # subject — the dependency-ancestor behavior of NLP.py:863-890.
    aux_subject: tuple[int, int] | None = None
    # subject of the last realized clause: a lexical verb directly after
    # 'and/or' is a VERB conjunct sharing it ('infection reduces X and
    # prevent atopy' → infection prevents atopy, the conj-on-verb edge)
    last_clause_subj: tuple[int, int] | None = None
    # open relative clause: (antecedent NP, object runs inside the
    # clause). When the matrix clause resumes — the next verb's naive
    # subject IS one of those object runs — the antecedent re-attaches
    # as subject ('genes that regulate apoptosis include BCL2' →
    # genes include BCL2, the relcl edge NLP.py:994-1008).
    rel_clause: dict | None = None

    def _emit(subj, verb_path, obj_groups, allow_in_hop=False):
        verb_text = " ".join(verb_path)
        # subject variants: the run itself, its coordination conjuncts
        # (the reference's conj edges on nsubj, NLP.py:863-890:
        # 'neuromodulin and neurogranin are associated' emits BOTH), and
        # the of-chain head left of the coordination ("serum levels of
        # CA125, CA15.3, and HE4 were" → HE4 AND serum levels)
        subjects = [subj]
        left = subj[0]
        while True:
            k = left - 1
            if k >= 0 and tokens[k].low in ("and", "or"):
                k -= 1
            elif not (
                k >= 0
                and _np_tok(tokens[k])
                and tokens[k].text.rstrip(".;:!?\"'").endswith(",")
            ):
                break
            run = _np_left(tokens, k + 1)
            if run is None or run[0] >= left:
                break
            for g in _split_commas(tokens, run):
                # a group whose paren opens mid-span ('region (ADRA1A')
                # mixes prose with an enumeration — not a conjunct; a
                # leading '(' is just list syntax and trims away
                raw = sentence[tokens[g[0]].start : tokens[g[1] - 1].end]
                if "(" in raw and not raw.startswith("("):
                    continue
                if g not in subjects:
                    subjects.append(g)
            left = run[0]
        k = left - 1
        if k >= 0 and tokens[k].low == "of":
            head = _np_left(tokens, k)
            if head is not None and head not in subjects:
                subjects.append(head)
        # appositive: 'NP1, an NP2, is ...' — the outer NP1 is the true
        # subject (the appos edge, NLP.py:863-890). Fire only when a
        # determiner/stopword chain separates the comma-ended head from
        # the inner NP (bare 'In patients, treatment is' must not).
        k, hops = left - 1, 0
        while (
            k >= 0
            and hops < 3
            and tokens[k].low in STOPLIST
            and not tokens[k].text.rstrip(".;:!?\"'").endswith(",")
        ):
            k -= 1
            hops += 1
        if (
            hops >= 1
            and k >= 0
            and _np_tok(tokens[k])
            and tokens[k].text.rstrip(".;:!?\"'").endswith(",")
        ):
            head = _np_left(tokens, k + 1)
            if head is not None and head not in subjects:
                subjects.append(head)
        # object variants: each conjunct + chained NP hops — 'of' always
        # (a sub-NP), 'in' only for copula-ish predicates where it is the
        # complement ("evaluated ... in eosinophilic asthma")
        hops = ("of", "in") if allow_in_hop else ("of",)
        all_objs = list(obj_groups)
        for g in obj_groups:
            if g[2]:
                continue  # no hops out of a parenthesized member
            nxt = g
            for _ in range(2):
                k = nxt[1]
                if k < n and tokens[k].low in hops:
                    hop = _np_right(tokens, k + 1)
                    if hop is not None and hop[0] - (k + 1) <= 2:
                        all_objs.append((hop[0], hop[1], False))
                        nxt = hop
                        continue
                break
        for s in subjects:
            for g in all_objs:
                clause_negated = negated or any(
                    t.low in NEGATION for t in tokens[s[1] : g[0]]
                )
                s_text, s_start, s_end = _span_text(sentence, tokens, s)
                o_text, o_start, o_end = _span_text(
                    sentence, tokens, (g[0], g[1]), extra_strip="()" if g[2] else ""
                )
                if not s_text or not o_text or s_text == o_text:
                    continue
                concepts.append(
                    {
                        "subject": s_text,
                        "subject_range": {"start": s_start, "end": s_end},
                        "verb": verb_text,
                        "verb_path": list(verb_path),
                        "object": o_text,
                        "object_range": {"start": o_start, "end": o_end},
                        "negated": clause_negated,
                        "sentence_text": sentence,
                        "sentence": sentence_idx,
                    }
                )

    while i < n:
        low = tokens[i].low
        verb_path: list[str] = []
        verb_text: str | None = None
        negated = False
        subj_override: tuple[int, int] | None = None
        comparative = False
        j = i
        if low in AUX or low in HAVE or low in MODAL:
            lemma = "be" if low in AUX else ("have" if low in HAVE else low)
            verb_path = [lemma]
            j = i + 1
            # negation particle directly after the aux
            while j < n and tokens[j].low in NEGATION:
                negated = True
                j += 1
            # 'have been performed' / 'will be' — defer to the inner aux
            if low not in AUX and j < n and tokens[j].low in AUX:
                i = j
                continue
            # optional adverbs, then a comparative folds into the verb
            k = j
            while k < n and _ADVERB.match(tokens[k].low):
                k += 1
            if k < n and tokens[k].low in _COMPARATIVES:
                verb_path.append(tokens[k].low)
                j = k + 1
                comparative = True
            elif j < n and (
                _is_participle(tokens[j].low) or tokens[j].low in _VERB_FORM_TO_LEMMA
            ):
                verb_path.append(tokens[j].low)
                j += 1
                if j < n and tokens[j].low in PREPS:
                    verb_path.append(tokens[j].low)
                    j += 1
                    # infinitive chain: 'been performed to evaluate X'
                    if (
                        verb_path[-1] == "to"
                        and j < n
                        and tokens[j].low in _VERB_FORM_TO_LEMMA
                    ):
                        verb_path.append(tokens[j].low)
                        j += 1
            else:
                # predicate adjective + infinitive: 'are (most) likely to
                # contribute to X' → verb 'be contribute to' — the xcomp
                # hop on the verb-ancestry path (NLP.py:994-1008)
                k2, hops = j, 0
                while (
                    k2 < n
                    and hops < 3
                    and tokens[k2].low != "to"
                    and (tokens[k2].low in STOPLIST or _ADVERB.match(tokens[k2].low))
                ):
                    k2 += 1
                    hops += 1
                if (
                    k2 < n
                    and tokens[k2].low == "to"
                    and k2 + 1 < n
                    and tokens[k2 + 1].low in _VERB_FORM_TO_LEMMA
                ):
                    verb_path.append(_VERB_FORM_TO_LEMMA[tokens[k2 + 1].low])
                    j = k2 + 2
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
            conj_verb = (
                low in _VERB_FORM_TO_LEMMA
                and i > 0
                and (
                    tokens[i - 1].low in ("and", "or")
                    or (
                        i > 1
                        and _ADVERB.match(tokens[i - 1].low)
                        and tokens[i - 2].low in ("and", "or")
                    )
                )
            )
            if conj_verb and last_clause_subj is not None:
                subj = last_clause_subj
            else:
                subj = subj_override or _np_left(tokens, i)
            # relative-clause bookkeeping: a verb whose subject scan
            # crossed a relative pronoun is a relcl verb — its naive left
            # NP is the antecedent. When the MATRIX clause resumes (the
            # next verb's naive subject is one of the relcl's object
            # runs), the antecedent re-attaches as subject: 'genes that
            # regulate apoptosis include BCL2' → (genes, include, BCL2),
            # the relcl edge + verb-ancestry walk of NLP.py:994-1008.
            crossed = (
                subj is not None
                and subj_override is None
                and not conj_verb
                and any(t.low in _REL_PRONOUNS for t in tokens[subj[1] : i])
            )
            if (
                not crossed
                and not conj_verb
                and subj_override is None
                and rel_clause is not None
            ):
                if subj is not None and subj in rel_clause["objs"]:
                    subj = rel_clause["antecedent"]
                rel_clause = None
            if low in AUX and subj is not None:
                aux_subject = subj
            groups = _object_conjuncts(tokens, j)
            if subj and groups:
                last_clause_subj = subj
                runs = _hop_runs(tokens, [(g[0], g[1]) for g in groups])
                if crossed:
                    rel_clause = {"antecedent": subj, "objs": runs}
                elif (
                    conj_verb
                    and rel_clause is not None
                    and rel_clause["antecedent"] == subj
                ):
                    # a conj verb sharing the antecedent is still inside
                    # the relative clause — its objects extend the region
                    rel_clause["objs"] |= runs
                _emit(subj, verb_path, groups, allow_in_hop=verb_path[0] == "be")
                if comparative:
                    # 'higher in X than in Y' → (be higher than, Y)
                    g_end = groups[0][1]
                    if g_end < n and tokens[g_end].low == "than":
                        than_groups = _object_conjuncts(tokens, g_end + 1)
                        if than_groups:
                            _emit(subj, verb_path + ["than"], than_groups)
            i = j
        else:
            i += 1
    return concepts
