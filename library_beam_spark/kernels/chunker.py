"""T13 + A2-A6 — noun-phrase statistics (reference: NounChuncker,
NLP.py:226-348).

The reference extracts NPs with TextBlob/NLTK POS patterns; neither is
available here, so extraction is a stopword-boundary heuristic (maximal
runs of content words). The *counting pipeline* downstream of extraction
is reproduced exactly per the survey:

- A2 frequency: each NP counted by substring scan of the lowercased doc;
- A3 plural merge: counts of ``np + 's'`` fold into ``np``;
- A4 abbreviation merge: short-form counts fold into the long form;
- A5 substring co-count: for NP pair (k ⊂ s), k inherits s's count;
- A6 top-k: count>1 → recurring; top 5 of those → top_chunks, with a
  total order (count desc, term asc) so results are reproducible
  (the reference's Counter.most_common ties arbitrarily — SURVEY §4).

MAX_CHUNKS bounds the quadratic A5 loop (NLP.py:160).
"""

from __future__ import annotations

import re

from .abbreviations import digest_as_dict
from .sentences import split_sentences
from .stopwords import DOMAIN_STOP_WORDS, STOPLIST

MAX_CHUNKS = 100

_WORD_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9+'\-]*")


def _is_np_word(lw: str) -> bool:
    from .svo import AUX, HAVE, MODAL, _VERB_FORM_TO_LEMMA, _is_participle

    return (
        lw not in STOPLIST
        and lw not in DOMAIN_STOP_WORDS
        and lw not in AUX
        and lw not in HAVE
        and lw not in MODAL
        and lw not in _VERB_FORM_TO_LEMMA
        and not _is_participle(lw)
        and any(c.isalpha() for c in lw)
    )


def extract_noun_phrases(text: str) -> list[str]:
    """Heuristic NP extraction: per sentence, maximal runs of content
    tokens (stopwords, verbs, participles break a run), lowercased,
    1..6 words."""
    chunks: list[str] = []
    for sentence, _, _ in split_sentences(text):
        run: list[str] = []
        for m in _WORD_RE.finditer(sentence):
            lw = m.group(0).lower()
            if not _is_np_word(lw):
                if run:
                    chunks.append(" ".join(run))
                    run = []
                continue
            run.append(lw)
            if len(run) == 6:
                chunks.append(" ".join(run))
                run = []
        if run:
            chunks.append(" ".join(run))
    # de-dup preserving order (NLP.py:559 set semantics, made stable)
    seen: set[str] = set()
    out = []
    for c in chunks:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out[:MAX_CHUNKS]


def count_chunks(text: str, chunks: list[str], abbreviations: dict[str, str] | None = None) -> dict[str, int]:
    """The A2-A5 counting pipeline over a document."""
    low = text.lower()
    counts: dict[str, int] = {}
    for c in chunks:
        counts[c] = low.count(c)  # A2: substring scan (NLP.py:562-566)
    # A3: plural merge
    for c in list(counts):
        plural = c + "s"
        if plural in counts:
            counts[c] += counts.pop(plural)
    # A4: abbreviation merge (short form counts fold into long form)
    for short, long in (abbreviations or {}).items():
        s, l = short.lower(), long.lower()
        if l in counts:
            counts[l] += low.count(s)
            counts.pop(s, None)
    # A5: substring co-count — k ⊂ s ⇒ k += count(s)
    keys = list(counts)
    for k in keys:
        for s in keys:
            if k != s and k in s:
                counts[k] += counts[s]
    return counts


def digest(text: str) -> dict:
    """The noun_phrases struct (NLP.py:342-345 contract):
    chunks / recurring_chunks / top_chunks / abbreviations."""
    abbreviations = digest_as_dict(text)
    chunks = extract_noun_phrases(text)
    counts = count_chunks(text, chunks, abbreviations)
    # A6 with a total order: count desc, term asc
    recurring = sorted(
        (c for c, n in counts.items() if n > 1),
        key=lambda c: (-counts[c], c),
    )
    return {
        "chunks": sorted(counts),
        "recurring_chunks": recurring,
        "top_chunks": recurring[:5],
        "abbreviations": [
            {"short": s, "long": l} for s, l in sorted(abbreviations.items())
        ],
    }
