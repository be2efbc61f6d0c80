"""Vocabulary loading (reference: vocabulary.py:1-33 + BioentityTagger
consumption at BioentityTagger.py:54-76).

The reference fetches ~10 JSON dictionaries (one per category/source;
format ``{surface_term: {"ids": [...], "pref_name": ...}}``) from remote
URLs on EVERY worker. The engine loads them ONCE on the driver from
local paths and broadcasts the compiled automaton (SURVEY §4).

File naming convention carries the annotation key, exactly like the
reference's URL map: ``<CATEGORY>__<REFERENCE_DB>.json`` (e.g.
``GENE__OPENTARGETS.json``); a explicit mapping overrides it.
"""

from __future__ import annotations

import json
import os
from glob import glob


def load_vocabulary_file(path: str, category: str, reference_db: str) -> dict[str, list[dict]]:
    """One dictionary file → tagger vocab fragment."""
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    out: dict[str, list[dict]] = {}
    for term, meta in raw.items():
        ids = meta.get("ids", [])
        out.setdefault(term, []).append(
            {
                "category": category,
                "reference_db": reference_db,
                "ids": list(ids),
                "pref_name": meta.get("pref_name", term),
            }
        )
    return out


def load_vocabulary_dir(vocab_dir: str) -> dict[str, list[dict]]:
    """Load every ``<CATEGORY>__<REFERENCE_DB>.json`` in a directory and
    merge multi-category annotations per surface form
    (BioentityTagger.py:106-133 merge semantics)."""
    vocab: dict[str, list[dict]] = {}
    for path in sorted(glob(os.path.join(vocab_dir, "*.json"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        if "__" in stem:
            category, reference_db = stem.split("__", 1)
        else:
            category, reference_db = stem.upper(), "OPENTARGETS"
        for term, anns in load_vocabulary_file(path, category, reference_db).items():
            vocab.setdefault(term, []).extend(anns)
    return vocab
