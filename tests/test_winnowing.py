"""Winnowing fingerprints (operators/winnowing.py)."""

import pytest

from library_beam_spark.operators.winnowing import (
    fingerprint_overlap_pairs,
    winnow_fingerprints,
)

K, W = 4, 4
GUARANTEE = W + K - 1  # shared word-run length that must share a fingerprint


def _fps(spark, docs):
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    out = winnow_fingerprints(df, k=K, w=W)
    res = {}
    for r in out.collect():
        res.setdefault(r.doc_id, set()).add(r.fingerprint)
    return res


def test_shared_run_guarantees_shared_fingerprint(spark):
    shared = "the quick brown fox jumps over seven lazy dogs"  # 9 words ≥ 7
    docs = [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"completely different preamble words here {shared} and a distinct tail"),
    ]
    fps = _fps(spark, docs)
    assert fps[1] & fps[2]


def test_disjoint_texts_share_nothing(spark):
    docs = [
        (1, "one two three four five six seven eight"),
        (2, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    fps = _fps(spark, docs)
    assert not fps[1] & fps[2]


def test_prefix_shift_keeps_shared_region_fingerprints(spark):
    """Winnowing is position-independent: shifting a document by an
    arbitrary prefix keeps the shared region's fingerprints."""
    body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    fps = _fps(spark, [(1, body), (2, "unrelated leading filler words " + body)])
    assert fps[1] & fps[2]


def test_short_doc_single_fingerprint_and_empty_doc_no_rows(spark):
    fps = _fps(spark, [(1, "just four tokens here"), (2, "too few"), (3, "")])
    assert len(fps[1]) == 1     # one k-gram → one global-min fingerprint
    assert 2 not in fps and 3 not in fps


def test_density_bounds(spark):
    words = " ".join(f"w{i * 37 % 101}x{i}" for i in range(200))
    fps = _fps(spark, [(1, words)])
    n_windows = 200 - K + 1 - W + 1
    # selected set is nonempty, no bigger than the window count, and the
    # winnowing density (~2/(w+1)) keeps it well under all grams
    assert 0 < len(fps[1]) <= n_windows
    assert len(fps[1]) >= n_windows // (2 * W)


def test_overlap_pairs(spark):
    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit sed"
    df = spark.createDataFrame(
        [
            (1, f"{shared} unique one tail words here"),
            (2, f"other head content {shared}"),
            (3, "entirely unrelated document about something else entirely today"),
        ],
        "doc_id INT, text STRING",
    )
    pairs = fingerprint_overlap_pairs(df, min_common=1).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].n_common >= 1


def test_no_shuffle_before_explode(spark):
    """Fingerprint extraction itself must not shuffle (the only Exchange
    allowed is the parallelism guard's round-robin, which local[4] on a
    tiny createDataFrame input does not trigger... it can — so assert no
    *hash* exchange instead)."""
    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id INT, text STRING")
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
