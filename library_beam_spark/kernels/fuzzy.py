"""F12 — fuzzy string scoring (reference: fuzz.token_sort_ratio gate at
BioentityTagger.py:173-174).

Pure-Python re-implementation of the public token-sort-ratio definition
(fuzzywuzzy): normalize → tokenize → sort tokens → Levenshtein ratio of
the rejoined strings, scaled 0..100. Used by the tagger's optional
partial-token match path (production disables it, main.py:515, so this
is correctness-surface only — never in the Spark hot path).
"""

from __future__ import annotations

import re

_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def _normalize(s: str) -> str:
    return " ".join(sorted(t for t in _NON_ALNUM.split(s.lower()) if t))


def levenshtein(a: str, b: str) -> int:
    """Classic O(len(a)·len(b)) edit distance, two-row DP."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> int:
    """Levenshtein similarity ratio scaled to 0..100:
    100·(1 − dist/max(len))."""
    if not a and not b:
        return 100
    return round(100 * (1 - levenshtein(a, b) / max(len(a), len(b))))


def token_sort_ratio(a: str, b: str) -> int:
    """Order-insensitive ratio: tokens sorted before comparison."""
    return ratio(_normalize(a), _normalize(b))
