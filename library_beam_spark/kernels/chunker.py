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
from functools import lru_cache

from .abbreviations import digest_as_dict
from .sentences import split_sentences
from .stopwords import STOPLIST
from .svo import (
    AUX,
    HAVE,
    MODAL,
    _COMPARATIVES,
    _VERB_FORM_TO_LEMMA,
    _is_participle,
)

MAX_CHUNKS = 100

_WORD_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9+'\-]*")

# Words that can never be NP material: one frozen union instead of six
# membership probes per token (the hottest test in the enrichment
# kernel — ~54 probes/doc before folding).
_NP_NON_WORDS = frozenset(
    set(STOPLIST)
    | set(AUX)
    | set(HAVE)
    | set(MODAL)
    | set(_VERB_FORM_TO_LEMMA)
    | set(_COMPARATIVES)
)


@lru_cache(maxsize=65536)
def _is_np_word(lw: str) -> bool:
    """NP-material test. Domain words ('group', 'levels', 'effects') ARE
    noun-phrase material — the reference filters only WHOLE chunks
    against its stop set (NLP.py:505-506: ``if np not in stopwords``),
    so 'TTF-1-positive group' and 'serum levels' survive intact
    (text_nlp.py:142-160 pins them). Pure word→bool, so memoized per
    executor: vocabulary is tiny next to token count."""
    return (
        lw not in _NP_NON_WORDS
        and not _is_participle(lw)
        and any(c.isalpha() for c in lw)
    )


_BREAK_CHARS = set(",;:()[]{}.")
_ADVERB_RE = re.compile(r".{3,}ly$")
_ASIDE_RE = re.compile(r"\(([^()]{0,20})\)")


def extract_noun_phrases(text: str) -> list[str]:
    """Heuristic NP extraction: per sentence, maximal runs of content
    tokens, lowercased, 1..6 words. Runs break at verbs/participles/
    function words AND at punctuation between tokens (a comma list
    yields one chunk per member, not a fused run). Short non-list
    parentheticals — '(FA)', '(p<0.05)' — are asides, excluded entirely;
    long or comma-bearing ones (gene lists) stay. Single-token chunks
    that are adverb-shaped ('recently') or one letter are noise, not
    NPs."""
    chunks: list[str] = []
    for sentence, _, _ in split_sentences(text):
        asides = [
            (m.start(), m.end())
            for m in _ASIDE_RE.finditer(sentence)
            if "," not in m.group(1)
        ]
        run: list[str] = []
        last_end: int | None = None

        def flush() -> None:
            if run:
                chunks.append(" ".join(run))
                run.clear()

        for m in _WORD_RE.finditer(sentence):
            gap = sentence[last_end : m.start()] if last_end is not None else ""
            last_end = m.end()
            if any(ch in _BREAK_CHARS for ch in gap):
                flush()
            if any(s <= m.start() < e for s, e in asides):
                flush()
                continue
            lw = m.group(0).lower()
            if not _is_np_word(lw):
                flush()
                continue
            run.append(lw)
            if len(run) == 6:
                flush()
        flush()
    # de-dup preserving order (NLP.py:559 set semantics, made stable);
    # single-token noise filter
    from .stopwords import LY_NOUNS

    seen: set[str] = set()
    out = []
    for c in chunks:
        if " " not in c and (
            len(c) == 1 or (_ADVERB_RE.match(c) and c not in LY_NOUNS)
        ):
            continue
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
