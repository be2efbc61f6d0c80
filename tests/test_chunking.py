"""Overlapping context-window chunking (operators/chunking.py)."""

import pytest
from pyspark.sql import functions as F

from library_beam_spark.operators.chunking import overlapping_chunks


@pytest.fixture(scope="module")
def docs(spark):
    words = " ".join(f"w{i}" for i in range(10))
    return spark.createDataFrame(
        [(1, words), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string",
    )


def test_chunk_boundaries(spark, docs):
    out = overlapping_chunks(docs, size=4, stride=3).collect()
    got = {(r.doc_id, r.chunk_idx): (r.n_words, r.chunk_text) for r in out}
    # doc 1: starts 0,3,6,9 over 10 words -> lengths 4,4,4,1
    assert got[(1, 0)] == (4, "w0 w1 w2 w3")
    assert got[(1, 1)] == (4, "w3 w4 w5 w6")
    assert got[(1, 2)] == (4, "w6 w7 w8 w9")
    assert got[(1, 3)] == (1, "w9")
    # doc 2: one word -> one chunk; docs 3/4: empty/null -> no rows
    assert got[(2, 0)] == (1, "solo")
    assert {r.doc_id for r in out} == {1, 2}


def test_chunks_cover_document(spark, docs):
    # Concatenating each chunk's first `stride` words (in chunk order)
    # reconstructs the original token stream exactly — order included —
    # which is the no-gap/no-permutation guarantee of stride <= size.
    out = overlapping_chunks(docs, size=4, stride=3).collect()
    chunks = sorted(
        (r.chunk_idx, r.chunk_text.split(" ")) for r in out if r.doc_id == 1
    )
    rebuilt = [w for _, ws in chunks for w in ws[:3]]
    assert rebuilt == [f"w{i}" for i in range(10)]


def test_full_overlap_stride_equals_size(spark, docs):
    out = overlapping_chunks(docs, size=5, stride=5).where(F.col("doc_id") == 1)
    rows = sorted((r.chunk_idx, r.n_words) for r in out.collect())
    assert rows == [(0, 5), (1, 5)]  # exact tiling, no overlap


def test_bad_stride_rejected(spark, docs):
    with pytest.raises(ValueError):
        overlapping_chunks(docs, size=4, stride=5)
    with pytest.raises(ValueError):
        overlapping_chunks(docs, size=4, stride=0)


def test_no_shuffle_plan(spark, docs):
    plan = overlapping_chunks(docs, size=8, stride=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunking_matches_python_reference_sweep(spark):
    """Exhaustive (size, stride, length) sweep against the obvious
    Python reference: every start in range(0, n, stride), chunk =
    words[start:start+size]."""
    docs = [(n, " ".join(f"t{j}" for j in range(n))) for n in range(0, 10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for size in (1, 2, 3, 5):
        for stride in range(1, size + 1):
            out = overlapping_chunks(df, size=size, stride=stride).collect()
            got = {
                (r.doc_id, r.chunk_idx): r.chunk_text.split(" ") for r in out
            }
            want = {}
            for n, _ in docs:
                words = [f"t{j}" for j in range(n)]
                for start in range(0, n, stride):
                    want[(n, start // stride)] = words[start : start + size]
            assert got == want, (size, stride)
