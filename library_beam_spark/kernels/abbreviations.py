"""T2 — abbreviation-definition extraction (Schwartz–Hearst).

Re-implements the published Schwartz & Hearst 2003 algorithm ("A simple
algorithm for identifying abbreviation definitions in biomedical text"),
which is what the reference packages (AbbreviationFinder.py:51-323).
Candidate rules per the reference's digest (SURVEY §2.8 T2):

- a candidate short form appears in parentheses: ``long form (SF)``;
- 2..10 chars, at most 2 tokens, contains at least one letter, first
  char alphanumeric;
- the long form is searched in at most ``min(|SF|+5, |SF|*2)`` tokens
  of left context; characters of SF must appear in order in the long
  form, and the first SF char must start a word;
- first definition wins per short form (AbbreviationFinder.py:62-68).

Golden: "Fanconi anemia (FA)" → {"FA": "Fanconi anemia"}
(reference tests/text_nlp.py:218-227).
"""

from __future__ import annotations

import re

_PAREN_RE = re.compile(r"\(([^()]+)\)")


def _is_valid_short_form(sf: str) -> bool:
    if not (2 <= len(sf) <= 10):
        return False
    if len(sf.split()) > 2:
        return False
    if not any(c.isalpha() for c in sf):
        return False
    return sf[0].isalnum()


def _find_best_long_form(short: str, candidate: str) -> str | None:
    """Right-to-left character subsumption match (the core S-H rule)."""
    s_i = len(short) - 1
    l_i = len(candidate) - 1
    while s_i >= 0:
        ch = short[s_i].lower()
        if not ch.isalnum():
            s_i -= 1
            continue
        # find ch in the long form, scanning right-to-left; the first char
        # of the short form must additionally start a word
        while (l_i >= 0 and candidate[l_i].lower() != ch) or (
            s_i == 0 and l_i > 0 and candidate[l_i - 1].isalnum()
        ):
            l_i -= 1
        if l_i < 0:
            return None
        l_i -= 1
        s_i -= 1
    # extend left to the start of the word containing the match
    l_i = candidate.rfind(" ", 0, l_i + 1) + 1
    return candidate[l_i:]


def _accept(short: str, long: str) -> bool:
    if len(short) > len(long):
        return False
    if short in long.split():  # SF may not be a full word of the LF
        return False
    n_tokens = len(long.split())
    max_tokens = min(len(short) + 5, len(short) * 2)
    return 1 <= n_tokens <= max_tokens


def find_abbreviations(text: str) -> list[tuple[str, str]]:
    """All (short, long) pairs in reading order."""
    out: list[tuple[str, str]] = []
    for sentence in re.split(r"(?<=[.!?])\s+", text):
        for m in _PAREN_RE.finditer(sentence):
            short = m.group(1).strip()
            if not _is_valid_short_form(short):
                continue
            left = sentence[: m.start()].rstrip()
            tokens = left.split()
            if not tokens:
                continue
            window = " ".join(tokens[-min(len(short) + 5, len(short) * 2):])
            long = _find_best_long_form(short, window)
            if long and _accept(short, long):
                out.append((short, long))
    return out


def digest_as_dict(text: str) -> dict[str, str]:
    """First definition wins per short form (AbbreviationFinder.py:62-68)."""
    result: dict[str, str] = {}
    for short, long in find_abbreviations(text):
        result.setdefault(short, long)
    return result
