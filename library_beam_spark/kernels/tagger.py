"""T3-T8 — dictionary entity tagger (reference: BioentityTagger.py).

A pure-Python Aho-Corasick automaton over dictionary surface forms, with
the reference's tagging semantics re-implemented:

- vocabulary entries: term → [{category, reference_db, ids, pref_name}]
  (multiple annotations per surface form merge, keyed
  ``category|reference_db`` — BioentityTagger.py:106-133);
- terms ≤2 chars are skipped; short (<5 char) terms are stop-checked
  case-sensitively, longer ones lowercased (BioentityTagger.py:62-63);
- dash-free duplicate surface forms are added ('TTF-1' → 'TTF1',
  BioentityTagger.py:77-88);
- matches must sit on word boundaries (separator char or string edge on
  both sides, BioentityTagger.py:162-163);
- nested spans are removed within each ``category|reference_db`` group
  (sort (start,-end), containment scan — BioentityTagger.py:205-223);
- ``mark_tags_in_text`` splices ``<mark-N>`` markup by char offsets
  (BioentityTagger.py:225-252);
- ``get_tags_in_range`` filters tags fully inside [start,end]
  (BioentityTagger.py:254-264).

The automaton is built ONCE on the driver and broadcast (the reference
rebuilt it per worker from remote URLs with retries — SURVEY §4); it is
pickle-friendly (plain dicts/lists) for exactly that reason.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass


@dataclass
class MatchedTag:
    match: str
    start: int
    end: int
    category: str
    reference_db: str
    reference: list[str]
    original_value: str
    label: str
    sentence: int = 0

    def to_dict(self) -> dict:
        # NOT dataclasses.asdict — that deepcopies (measured 37% of the
        # whole document-analysis kernel)
        return {
            "match": self.match,
            "start": self.start,
            "end": self.end,
            "category": self.category,
            "reference_db": self.reference_db,
            "reference": self.reference,
            "original_value": self.original_value,
            "label": self.label,
            "sentence": self.sentence,
        }


class AhoCorasick:
    """Classic Aho-Corasick: goto trie + BFS failure links; iterates
    (end_index_exclusive, payload) for every dictionary hit."""

    def __init__(self) -> None:
        # nodes: list of dicts char -> node_id
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list] = [[]]

    def add(self, word: str, payload) -> None:
        node = 0
        for ch in word:
            nxt = self.goto[node].get(ch)
            if nxt is None:
                nxt = len(self.goto)
                self.goto[node][ch] = nxt
                self.goto.append({})
                self.fail.append(0)
                self.out.append([])
            node = nxt
        self.out[node].append((len(word), payload))

    def build(self) -> None:
        q: deque[int] = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != child else 0
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def iter_matches(self, text: str):
        """Yield (start, end_exclusive, payload) for every hit."""
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for length, payload in self.out[node]:
                yield i - length + 1, i + 1, payload


def _is_boundary(text: str, idx: int) -> bool:
    """True when idx is outside the string or a separator (non-alnum)."""
    return idx < 0 or idx >= len(text) or not text[idx].isalnum()


def _expand_window(text: str, start: int, end: int, n_tokens: int) -> str:
    """Grow [start,end) to cover up to ``n_tokens`` whitespace-separated
    words around the hit — the candidate region a partial-token match is
    fuzzy-compared against its full term."""
    lo, hi = start, end
    grown = 1
    while grown < n_tokens:
        new_lo = text.rfind(" ", 0, max(lo - 1, 0))
        new_lo = 0 if new_lo < 0 else new_lo + 1 if lo > 0 else 0
        nxt = text.find(" ", hi + 1)
        new_hi = len(text) if nxt < 0 else nxt
        if (new_lo, new_hi) == (lo, hi):
            break
        lo, hi = new_lo, new_hi
        grown += 1
    return text[lo:hi].strip()


class BioEntityTagger:
    """Dictionary tagger over ~10 vocabularies.

    ``vocab`` maps surface form → list of annotations
    ``{category, reference_db, ids, pref_name}``.
    """

    def __init__(
        self,
        vocab: dict[str, list[dict]],
        stopwords: set[str] | None = None,
        ignorecase: bool = True,
        partial_match: bool = False,
    ) -> None:
        self.ignorecase = ignorecase
        self.partial_match = partial_match
        stopwords = stopwords or set()
        self.automaton = AhoCorasick()
        n_terms = 0
        for term, annotations in vocab.items():
            for surface in self._surface_forms(term):
                if len(surface) <= 2:
                    continue  # BioentityTagger.py:62: too ambiguous
                if len(surface) < 5:
                    if surface in stopwords:  # exact-case check for short terms
                        continue
                elif surface.lower() in stopwords:
                    continue
                key = surface.lower() if ignorecase else surface
                self.automaton.add(key, (surface, annotations))
                n_terms += 1
            if partial_match and " " in term:
                # optional partial-token entries for tokens >5 chars
                # (BioentityTagger.py:89-101); hits are gated by fuzzy
                # token_sort_ratio > 90 at tag time. Production disables
                # this path (main.py:515).
                for tok in term.split():
                    if len(tok) > 5 and tok.lower() not in stopwords:
                        key = tok.lower() if ignorecase else tok
                        self.automaton.add(key, (term, annotations, "partial"))
        self.n_terms = n_terms
        self.automaton.build()

    @staticmethod
    def _surface_forms(term: str) -> list[str]:
        forms = [term]
        if "-" in term:  # dash-free duplicate (BioentityTagger.py:77-88)
            forms.append(term.replace("-", ""))
        return forms

    def tag(self, text: str, sentence: int = 0) -> list[MatchedTag]:
        """All boundary-respecting dictionary matches, nested spans removed
        per category|reference_db group."""
        haystack = text.lower() if self.ignorecase else text
        raw: list[MatchedTag] = []
        for start, end, payload in self.automaton.iter_matches(haystack):
            if not (_is_boundary(text, start - 1) and _is_boundary(text, end)):
                continue
            surface, annotations = payload[0], payload[1]
            if len(payload) == 3:  # partial-token hit: fuzzy gate > 90
                from .fuzzy import token_sort_ratio

                window = _expand_window(text, start, end, len(surface.split()))
                if token_sort_ratio(window, surface) <= 90:
                    continue
            for ann in annotations:
                raw.append(
                    MatchedTag(
                        match=text[start:end],
                        start=start,
                        end=end,
                        category=ann["category"],
                        reference_db=ann["reference_db"],
                        reference=list(ann.get("ids", [])),
                        original_value=surface,
                        label=ann.get("pref_name", surface),
                        sentence=sentence,
                    )
                )
        grouped: dict[str, list[MatchedTag]] = {}
        for t in raw:
            grouped.setdefault(f"{t.category}|{t.reference_db}", []).append(t)
        out: list[MatchedTag] = []
        for group in grouped.values():
            out.extend(remove_nested_matches(group))
        out.sort(key=lambda t: (t.start, -t.end, t.category, t.reference_db))
        return out

    def group_tags(self, tags: list[MatchedTag]) -> dict[str, list[MatchedTag]]:
        """``tagged_entities_grouped``: key = category|reference_db
        (BioentityTagger.py:194-203)."""
        grouped: dict[str, list[MatchedTag]] = {}
        for t in tags:
            grouped.setdefault(f"{t.category}|{t.reference_db}", []).append(t)
        return grouped


def remove_nested_matches(tags: list[MatchedTag]) -> list[MatchedTag]:
    """Drop any span fully contained in another (T5). Sort (start, -end);
    a span is kept iff no kept span contains it. O(n·k) with early break,
    bounded per document."""
    ordered = sorted(tags, key=lambda t: (t.start, -t.end))
    kept: list[MatchedTag] = []
    for t in ordered:
        contained = False
        for k in reversed(kept):
            if k.start <= t.start and t.end <= k.end:
                contained = True  # equal spans dedupe too
                break
            if k.end <= t.start:
                break
        if not contained:
            kept.append(t)
    return kept


def mark_tags_in_text(text: str, tags: list[MatchedTag]) -> str:
    """T6: insert ``<mark-N>…</mark-N>`` spans by char offsets; N is the
    1-based rank of the tag ordered by span."""
    inserts: list[tuple[int, str]] = []
    for i, t in enumerate(sorted(tags, key=lambda t: (t.start, -t.end)), start=1):
        inserts.append((t.start, f"<mark-{i}>"))
        inserts.append((t.end, f"</mark-{i}>"))
    # splice right-to-left so earlier offsets stay valid; for equal
    # positions, close-tags must land before open-tags of later spans
    out = text
    for pos, s in sorted(inserts, key=lambda x: (x[0], x[1].startswith("<mark")), reverse=True):
        out = out[:pos] + s + out[pos:]
    return out


def get_tags_in_range(tags: list[MatchedTag], start: int, end: int) -> list[MatchedTag]:
    """T7: tags fully inside [start, end] (BioentityTagger.py:254-264)."""
    return [t for t in tags if t.start >= start and t.end <= end]


def extend_tags_to_alternative_forms(
    text: str, tags: list[MatchedTag], alternatives: dict[str, str]
) -> list[MatchedTag]:
    """T8: propagate a long form's tag onto occurrences of its short form
    (``alternatives``: short → long). A mini-automaton over the short
    forms (BioentityTagger.py:274-284)."""
    if not alternatives:
        return []
    by_label: dict[str, MatchedTag] = {}
    for t in tags:
        by_label.setdefault(t.match.lower(), t)
    auto = AhoCorasick()
    for short, long in alternatives.items():
        base = by_label.get(long.lower())
        if base is not None:
            auto.add(short.lower(), (short, base))
    auto.build()
    extra: list[MatchedTag] = []
    for start, end, (short, base) in auto.iter_matches(text.lower()):
        if not (_is_boundary(text, start - 1) and _is_boundary(text, end)):
            continue
        extra.append(
            MatchedTag(
                match=text[start:end],
                start=start,
                end=end,
                category=base.category,
                reference_db=base.reference_db,
                reference=list(base.reference),
                original_value=base.original_value,
                label=base.label,
                sentence=base.sentence,
            )
        )
    return extra
