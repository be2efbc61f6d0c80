"""Directional containment pairs (operators/dedup.py
prefix_filter_containment_pairs)."""

import random

from library_beam_spark.operators.dedup import (
    prefix_filter_containment_pairs,
)


def _shingles(text, n=5):
    import re

    w = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _brute(docs, t, n=5):
    out = set()
    sh = {i: _shingles(x, n) for i, x in docs}
    for ia, a in sh.items():
        for ib, b in sh.items():
            if ia == ib or not a:
                continue
            c = len(a & b) / len(a)
            # engine thresholds on the ppm-rounded value
            if int(c * 1e6 + 0.5) / 1e6 >= t:
                out.add((ia, ib))
    return out


def test_quote_detection_asymmetric(spark):
    # doc 1 is a verbatim quarter of doc 2: containment(1->2)=1.0,
    # jaccard tiny, and 2->1 far below threshold
    words = [f"w{i}" for i in range(200)]
    short = " ".join(words[:50])
    long = " ".join(words)
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in prefix_filter_containment_pairs(df, threshold=0.6).collect()
    }
    assert rows == {(1, 2): 1.0}


def test_lossless_vs_bruteforce(spark):
    rng = random.Random(42)
    vocab = [f"t{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 40))))
        for i in range(30)
    ]
    # plant a subset pair and an identical pair
    docs.append((100, docs[0][1].rsplit(" ", 6)[0]))
    docs.append((101, docs[5][1]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_containment_pairs(df, threshold=0.6).collect()
    }
    assert got == _brute(docs, 0.6)


def test_exact_rational_threshold_boundary(spark):
    # t = 0.07 over |A| = 100 shingles: the double product
    # 100 * 0.07 = 7.000000000000001, so CEIL on the float demands
    # n_common >= 8 and silently drops the pair whose exact containment
    # EQUALS the threshold (7/100). The exact-rational form
    # n_common*den >= n_a*num (7*100 >= 100*7) admits it.
    assert 100 * 0.07 > 7  # the float artifact this test exists for
    words = [f"w{i}" for i in range(104)]  # 100 distinct 5-gram shingles
    a = " ".join(words)
    # B = A's first 11 words (7 shared shingles) + distinct filler;
    # seam/filler shingles are not in A
    b = " ".join(words[:11] + [f"f{i}" for i in range(20)])
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in prefix_filter_containment_pairs(df, threshold=0.07).collect()
    }
    assert got[(1, 2)] == 7  # containment(A->B) = 7/100 = t exactly
    assert (2, 1) in got  # 7/27 >= 0.07 as well


def test_both_directions_when_identical(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_containment_pairs(df, threshold=0.6).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_float_computed_threshold_stays_exact(spark):
    """r14 ADVICE: Fraction(str(2/3)) alone would carry den = 10^16 and
    overflow bigint products at realistic shingle counts;
    limit_denominator(10000) recovers the EXACT rational 2/3 (the
    closest den<=10000 fraction to the float). Boundary pair at
    containment exactly 2/3 must be reported under threshold=2/3."""
    docs = [
        (1, "a b c d e f g"),        # 3 shingles
        (2, "a b c d e f x"),        # shares exactly 2 -> 2/3 each way
        (3, "p q r s t u v w"),      # unrelated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_containment_pairs(
            df, threshold=2 / 3
        ).collect()
    }
    assert got == {(1, 2), (2, 1)}
