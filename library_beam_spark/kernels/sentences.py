"""T9/T10 — sentence segmentation and tokenization.

The reference uses spaCy's sentencizer and a custom tokenizer whose infix
rules keep complex bio tokens intact (``10(-7)``, ``(Na++K+)-ATPase`` —
asserted in reference tests/text_nlp.py:311-389). spaCy is unavailable
here, so both are re-expressed as deterministic regex kernels honoring
the same contracts:

- sentences split on [.!?] + whitespace + capital/digit start, with a
  guard list for common abbreviations (e.g., i.e., et al., Fig.);
- tokens are maximal runs of non-space characters with *balanced* outer
  punctuation stripped — parenthesized/hyphenated compounds survive as
  single tokens.
"""

from __future__ import annotations

import re

_ABBREV_GUARD = (
    "e.g", "i.e", "et al", "etc", "vs", "Fig", "fig", "Dr", "St", "ca",
    "approx", "no", "No", "cf",
)

_SENT_BOUNDARY = re.compile(r"(?<=[.!?])\s+(?=[A-Z0-9(\[])")


def split_sentences(text: str) -> list[tuple[str, int, int]]:
    """Return [(sentence_text, start, end)] with char offsets into text."""
    spans: list[tuple[str, int, int]] = []
    start = 0
    for m in _SENT_BOUNDARY.finditer(text):
        candidate_end = m.start()
        left = text[start:candidate_end]
        # don't split right after a guarded abbreviation
        if any(left.rstrip(".").endswith(g) for g in _ABBREV_GUARD):
            continue
        seg = text[start:candidate_end]
        if seg.strip():
            spans.append((seg, start, candidate_end))
        start = m.end()
    tail = text[start:]
    if tail.strip():
        spans.append((tail, start, len(text)))
    return spans


_TOKEN_RE = re.compile(r"\S+")
# outer punctuation that may be stripped when unbalanced
_STRIP_CHARS = ".,;:!?\"'"


def _strip_outer(token: str) -> str:
    """Strip sentence punctuation from token edges, but keep balanced
    brackets: '(Na++K+)-ATPase' stays whole, '(word' loses the paren only
    if its mate is absent; a trailing '.' always strips."""
    t = token.strip(_STRIP_CHARS)
    # unbalanced leading/trailing brackets
    while t and t[0] in "([{" and _mate(t[0]) not in t:
        t = t[1:]
    while t and t[-1] in ")]}" and _mate(t[-1]) not in t:
        t = t[:-1]
    return t


def _mate(ch: str) -> str:
    return {"(": ")", ")": "(", "[": "]", "]": "[", "{": "}", "}": "{"}[ch]


def tokenize(text: str) -> list[str]:
    """Bio-aware whitespace tokenizer (T10 contract): complex tokens like
    ``10(-7)`` and ``(Na++K+)-ATPase`` remain single tokens."""
    out = []
    for m in _TOKEN_RE.finditer(text):
        t = _strip_outer(m.group(0))
        if t:
            out.append(t)
    return out
