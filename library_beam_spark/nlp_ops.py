"""NLP enrichment operators — kernels wired into Spark (SURVEY §2.8 T12/T14).

``analyze_document`` is the pure-Python document orchestrator
(DocumentAnalysisSpacy.process parity, NLP.py:489-799): normalize →
abbreviations → dictionary tags → per-sentence SVO → noun-phrase stats →
tag/concept attachment → markup → embedding text. It is fully testable
without Spark.

``nlp_enrich`` wraps it in ``mapInPandas``:
- the tagger automaton is built ONCE on the driver and broadcast
  (strictly better than the reference's per-worker HTTP rebuild,
  BioentityTagger.py:39-104 — SURVEY §4);
- per-executor lazy init via a module-level cache — the Spark idiom for
  Beam's ``start_bundle`` (main.py:459-470);
- per-document failures yield an empty enrichment struct, matching the
  reference's swallow-and-log path (NLP.py:480-483).

Scale notes: this is the pipeline's CPU-bound stage. Arrow batch size is
bounded session-wide (session.py maxRecordsPerBatch) so kernel memory
stays flat; ``ensure_min_parallelism`` protects small-file inputs; at
real scale the XML file count (~1k) already provides the parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from .kernels.abbreviations import digest_as_dict
from .kernels.chunker import digest as np_digest
from .kernels.normalize import normalize
from .kernels.sentences import split_sentences, tokenize
from .kernels.stopwords import (
    COMMON_WORDS,
    LY_NOUNS,
    SHORT_MATCH_CASE_SENSITIVE_CATEGORIES,
    STOPLIST,
)
from .kernels.svo import (
    AUX,
    HAVE,
    MODAL,
    PREPS,
    _VERB_FORM_TO_LEMMA,
    _is_participle,
    analyse_sentence,
)
from .kernels.tagger import (
    BioEntityTagger,
    MatchedTag,
    get_tags_in_range,
    mark_tags_in_text,
)
from .schemas import TEXT_MINED_ENTITIES
from .util import ensure_min_parallelism

_EMPTY_NLP = {
    "chunks": [],
    "recurring_chunks": [],
    "top_chunks": [],
    "abbreviations": [],
    "concepts": [],
    "tagged_entities": [],
    "tagged_entities_grouped": {},
    "tagged_text": "",
    "embedding_text": {"plain": "", "pos_tag": "", "ent_tag": ""},
}


@lru_cache(maxsize=65536)
def _heuristic_pos(tok: str) -> str:
    """Coarse POS for the pos_tag embedding form (NLP.py:1130-1143 used
    spaCy's tagger; this is the suffix/closed-class approximation — the
    form's consumers are embedding trainers, which only need stable
    coarse classes). Pure word→class, so memoized: corpus vocabulary is
    tiny next to token count (profiled ~5% of the enrichment kernel
    before the cache)."""
    low = tok.lower()
    if low in AUX or low in HAVE or low in MODAL or low in _VERB_FORM_TO_LEMMA:
        return "VERB"
    if low in PREPS:
        return "ADP"
    if low in STOPLIST:
        return "DET"
    if low.replace(".", "").replace(",", "").replace("-", "").isdigit():
        return "NUM"
    if _is_participle(low) or (len(low) > 4 and low.endswith("ing")):
        return "VERB"
    if len(low) > 4 and low.endswith("ly") and low not in LY_NOUNS:
        return "ADV"
    if len(low) > 5 and low.endswith(
        ("ous", "ful", "ive", "ical", "able", "ible", "less")
    ):
        return "ADJ"
    return "NOUN"


def _embedding_text(
    text: str, tags: list[MatchedTag], chunks: tuple | list = ()
) -> dict:
    """F17: the three embedding-text forms (NLP.py:1130-1178):

    - ``plain`` — stop/punct-filtered lowercase; multiword TAG spans and
      multiword NOUN-CHUNK occurrences merge into one underscore-joined
      token ('molecular genetics' → 'molecular_genetics'), mirroring the
      reference's span-merged spaCy doc (its to_text emits merged tokens
      with spaces→underscores; text_nlp.py:489-494 asserts
      'molecular_genetics');
    - ``pos_tag`` — token|POS; merged spans are NOUN by construction
      ('molecular_genetics|NOUN', text_nlp.py:496);
    - ``ent_tag`` — a tag span becomes refid|CATEGORY|LABEL
      ('ensg00000120907|GENE|ADRA1D' shape, text_nlp.py:498); merged
      chunks and plain tokens pass through as in ``plain``.
    """
    # merge spans: tags are authoritative; then multiword chunk
    # occurrences (word-bounded, case-insensitive), non-overlapping.
    # Plain str.find, NOT per-chunk regexes: chunk strings vary per
    # document, so each regex would recompile (the re cache misses) —
    # measured 3× slower across the enrichment stage.
    spans: list[tuple[int, int, str | None]] = []
    for t in sorted(tags, key=lambda t: (t.start, -t.end)):
        if all(t.end <= s or t.start >= e for s, e, _ in spans):
            ref = t.reference[0] if t.reference else t.label
            spans.append(
                (t.start, t.end,
                 f"{ref.split('/')[-1].lower()}|{t.category}|"
                 f"{t.label.replace(' ', '_').upper()}")
            )
    low_text = text.lower()
    n_text = len(text)
    for c in chunks:
        if " " not in c:
            continue
        c_low = c.lower()
        pos = 0
        while True:
            s = low_text.find(c_low, pos)
            if s < 0:
                break
            e = s + len(c_low)
            if (s > 0 and text[s - 1].isalnum()) or (
                e < n_text and text[e].isalnum()
            ):
                # not word-bounded — a valid occurrence may still START
                # inside this rejected span, so advance by one, not to e
                pos = s + 1
                continue
            pos = e
            if all(e <= s2 or s >= e2 for s2, e2, _ in spans):
                spans.append((s, e, None))
    spans.sort(key=lambda x: x[0])

    plain: list[str] = []
    pos: list[str] = []
    ent: list[str] = []

    def _flush(segment: str) -> None:
        for w in tokenize(segment):
            lw = w.lower()
            if lw in STOPLIST or not any(ch.isalnum() for ch in lw):
                continue
            tok = lw.replace(" ", "_")
            plain.append(tok)
            pos.append(f"{tok}|{_heuristic_pos(w)}")
            ent.append(tok)

    cursor = 0
    for s, e, payload in spans:
        _flush(text[cursor:s])
        merged = "_".join(text[s:e].lower().split())
        plain.append(merged)
        pos.append(f"{merged}|NOUN")
        ent.append(payload if payload is not None else merged)
        cursor = e
    _flush(text[cursor:])
    return {"plain": " ".join(plain), "pos_tag": " ".join(pos),
            "ent_tag": " ".join(ent)}


def _case_matches_label(span: str, label: str) -> bool:
    """The reference's exact-case test incl. dash variants
    (NLP.py:630-636): the document span must equal the dictionary label
    as-is, with dashes removed, or with dashes as spaces."""
    return (
        span == label
        or span.replace("-", "") == label
        or span.replace("-", " ") == label
    )


def _filter_case_sensitive(tags: list[MatchedTag]) -> list[MatchedTag]:
    """Precision filter (NLP.py:622-641): for case-sensitive categories,
    a match that is very short (<4 chars) or short (<7) AND a common
    English word ('WAS', 'impact', 'large' — real gene-symbol collisions)
    survives only when the document spells it exactly as the dictionary
    label (dash variants allowed). The common-words corpus is
    kernels/corpora.COMMON_WORDS_FULL + the curated trap set. When the
    vocabulary carries no pref_name the tagger sets label=surface, which
    makes the lowercase surface the canonical spelling — the correct
    fallback. NB: the reference declares its category list with a
    missing comma — ``['TARGET', 'DRUG' 'CHEMICAL', ...]`` silently fuses
    'DRUGCHEMICAL' (NLP.py:132); the engine implements the evident intent.
    """
    out = []
    for t in tags:
        if t.category in SHORT_MATCH_CASE_SENSITIVE_CATEGORIES and (
            len(t.match) < 4
            or (len(t.match) < 7 and t.match.lower() in COMMON_WORDS)
        ):
            if not _case_matches_label(t.match, t.label):
                continue
        out.append(t)
    return out


def analyze_document(text: str, tagger: BioEntityTagger | None = None) -> dict:
    """Full document analysis → the ``text_mined_entities`` dict."""
    if not text or not text.strip():
        return {"nlp": dict(_EMPTY_NLP), "noun_phrases": {
            "chunks": [], "recurring_chunks": [], "top_chunks": [], "abbreviations": []}}

    norm = normalize(text)
    abbreviations = digest_as_dict(norm)

    # short forms whose long form is present get the long form's tags; if
    # the long form is absent, replace short with long pre-tagging
    # (NLP.py:529-533): we tag the normalized text as-is and extend after.
    tags: list[MatchedTag] = []
    if tagger is not None:
        sentences = split_sentences(norm)
        tags = tagger.tag(norm)
        # sentence index per tag
        for t in tags:
            for si, (_, s_start, s_end) in enumerate(sentences):
                if t.start >= s_start and t.end <= s_end:
                    t.sentence = si
                    break
        tags = _filter_case_sensitive(tags)
        from .kernels.tagger import extend_tags_to_alternative_forms

        extra = extend_tags_to_alternative_forms(norm, tags, abbreviations)
        seen = {(t.start, t.end, t.category, t.reference_db) for t in tags}
        for t in extra:
            if (t.start, t.end, t.category, t.reference_db) not in seen:
                tags.append(t)
        tags.sort(key=lambda t: (t.start, -t.end, t.category))
    else:
        sentences = split_sentences(norm)

    # TARGET&DISEASE sentence synthesis (NLP.py:643-650)
    synthetic: list[MatchedTag] = []
    for si, (s_text, s_start, s_end) in enumerate(sentences):
        in_sent = [t for t in tags if t.start >= s_start and t.end <= s_end]
        cats = {t.category for t in in_sent}
        if "GENE" in cats and "DISEASE" in cats:
            synthetic.append(
                MatchedTag(
                    match=s_text.strip(),
                    start=s_start,
                    end=s_end,
                    category="TARGET&DISEASE",
                    reference_db="OPENTARGETS",
                    reference=[],
                    original_value="",
                    label="TARGET&DISEASE",
                    sentence=si,
                )
            )
    all_tags = tags + synthetic

    # per-sentence SVO with subject/object tag attachment by char range
    # (sentence-relative offsets, NLP.py:652-686)
    concepts: list[dict] = []
    for si, (s_text, s_start, s_end) in enumerate(sentences):
        sent_tags = [t for t in tags if t.start >= s_start and t.end <= s_end]
        for c in analyse_sentence(s_text.strip(), si):
            def _attach(rng: dict) -> list[dict]:
                doc_lo = s_start + rng["start"]
                doc_hi = s_start + rng["end"]
                picked = get_tags_in_range(sent_tags, doc_lo, doc_hi)
                out = []
                for t in picked:
                    d = t.to_dict()
                    d["start"] = t.start - s_start
                    d["end"] = t.end - s_start
                    out.append(d)
                return out

            c["subject_tags"] = _attach(c["subject_range"])
            c["object_tags"] = _attach(c["object_range"])
            c["relations"] = {"directed": [], "undirected": []}
            concepts.append(c)

    nps = np_digest(norm)
    nlp = {
        "chunks": nps["chunks"],
        "recurring_chunks": nps["recurring_chunks"],
        "top_chunks": nps["top_chunks"],
        "abbreviations": nps["abbreviations"],
        "concepts": concepts,
        "tagged_entities": [t.to_dict() for t in all_tags],
        "tagged_entities_grouped": {
            k: [t.to_dict() for t in v]
            for k, v in (tagger.group_tags(all_tags) if tagger else {}).items()
        },
        "tagged_text": mark_tags_in_text(norm, tags),
        "embedding_text": _embedding_text(norm, tags, nps["chunks"]),
    }
    return {"nlp": nlp, "noun_phrases": nps}


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------

_TAGGER_CACHE: dict[int, BioEntityTagger | None] = {}


def _get_tagger(vocab_bc) -> BioEntityTagger | None:
    """Executor-local lazy singleton (start_bundle idiom)."""
    if vocab_bc is None:
        return None
    key = id(vocab_bc)
    if key not in _TAGGER_CACHE:
        vocab = vocab_bc.value
        _TAGGER_CACHE[key] = BioEntityTagger(vocab) if vocab else None
    return _TAGGER_CACHE[key]


def nlp_enrich(
    df: DataFrame,
    text_col: str = "text_to_analyze",
    vocab: dict[str, list[dict]] | None = None,
    output_col: str = "text_mined_entities",
) -> DataFrame:
    """Append the ``text_mined_entities`` struct column (T14 NLPAnalysis).

    The vocabulary dict is broadcast once; the Aho-Corasick automaton is
    built per executor from it (cheap, local, no network).
    """
    spark = df.sparkSession
    vocab_bc = spark.sparkContext.broadcast(vocab) if vocab else None
    in_schema = df.schema
    out_schema = StructType(
        in_schema.fields + [StructField(output_col, TEXT_MINED_ENTITIES, True)]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = _get_tagger(vocab_bc)
        for pdf in batches:
            results = []
            for text in pdf[text_col]:
                try:
                    results.append(analyze_document(text, tagger))
                except Exception:
                    # per-document failure → empty enrichment
                    # (reference swallows and logs, NLP.py:480-483)
                    results.append(
                        {"nlp": dict(_EMPTY_NLP),
                         "noun_phrases": {"chunks": [], "recurring_chunks": [],
                                          "top_chunks": [], "abbreviations": []}}
                    )
            out = pdf[cols].copy()
            out[output_col] = results
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def get_text_to_analyze(title_col="title", abstract_col="abstract"):
    """P4 (main.py:429-437): title + ' ' + abstract | title | ''."""
    t, a = F.col(title_col), F.col(abstract_col)
    return (
        F.when(t.isNotNull() & a.isNotNull(), F.concat_ws(" ", t, a))
        .when(t.isNotNull(), t)
        .otherwise(F.lit(""))
    )
