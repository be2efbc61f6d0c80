"""Content-defined chunking dedup (operators/cdc.py): python-reference
replay of the boundary rule, the shift-resistance property CDC exists
for (an insertion far from a chunk only changes the chunks it
touches), short-document and edge contracts, and cross-doc dedup
accounting."""

import hashlib
import re

from library_beam_spark.operators.cdc import (
    cdc_chunks,
    cdc_duplicate_chunks,
)


def _hash24(s, salt):
    return int(
        hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:6], 16
    )


def _py_cdc(text, k=3, mask_bits=5):
    """Independent reference chunker."""
    w = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    n = len(w)
    if n == 0:
        return []
    cuts = [
        i
        for i in range(2, n - k + 2)
        if _hash24(" ".join(w[i - 1:i - 1 + k]), "cdc") % (1 << mask_bits)
        == 0
    ]
    starts = [1] + cuts
    ends = [c - 1 for c in cuts] + [n]
    out = []
    for idx, (s, e) in enumerate(zip(starts, ends)):
        span = " ".join(w[s - 1:e])
        out.append(
            (idx, s, e - s + 1, hashlib.md5(span.encode()).hexdigest())
        )
    return out


def _spark_chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks(df, **kw).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_pos, r.n_tokens, r.chunk_md5)
        )
    return {k: sorted(v) for k, v in got.items()}


def test_matches_python_reference(spark):
    texts = [
        " ".join(f"w{(7 * j) % 293}" for j in range(300)),
        " ".join(f"t{(13 * j) % 151}" for j in range(150)),
        "short doc only",
        "",
    ]
    got = _spark_chunks(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _py_cdc(t), i


def test_shift_resistance(spark):
    """Insert a run near the front: chunk ids AFTER the first cut past
    the insertion point are identical — the CDC property fixed-width
    chunking lacks."""
    base = " ".join(f"w{(7 * j) % 397}" for j in range(400))
    shifted = "zzz aaa qqq " + base
    a = _py_cdc(base)
    b = _py_cdc(shifted)
    ids_a = {h for (_, _, _, h) in a}
    ids_b = {h for (_, _, _, h) in b}
    common = ids_a & ids_b
    assert len(a) >= 5  # non-vacuous: the mask must actually cut
    # everything from the second chunk of `base` onward must survive
    assert len(common) >= len(a) - 1
    got = _spark_chunks(spark, [base, shifted])
    assert {h for (_, _, _, h) in got[0]} == ids_a
    assert {h for (_, _, _, h) in got[1]} == ids_b


def test_short_doc_single_chunk(spark):
    got = _spark_chunks(spark, ["alpha beta", "one", ""])
    assert len(got[0]) == 1 and got[0][0][1:3] == (1, 2)
    assert len(got[1]) == 1 and got[1][0][1:3] == (1, 1)
    assert 2 not in got  # empty doc: no rows


def test_duplicate_chunks_accounting(spark):
    shared = " ".join(f"s{(11 * j) % 199}" for j in range(200))
    texts = [
        shared + " unique one tail here",
        "different head material now " + shared,
        "totally unrelated words " * 30,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    dup = cdc_duplicate_chunks(df).collect()
    assert dup, "the shared run must yield cross-doc duplicate chunks"
    for r in dup:
        assert r.n_docs >= 2
        assert r.n_occurrences >= r.n_docs
        assert r.dup_tokens == (r.n_occurrences - 1) * r.n_tokens
        assert r.n_tokens >= 4
    # duplicated ids must be interior chunks of the shared run
    a = {h for (_, _, _, h) in _py_cdc(texts[0])}
    b = {h for (_, _, _, h) in _py_cdc(texts[1])}
    assert {r.chunk_md5 for r in dup} <= (a & b)
