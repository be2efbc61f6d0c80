"""Randomized property tests for the round-14 operators — each checked
against an independent pure-Python reference on many seeded random
inputs (broader input coverage than the example-based suites)."""

import math
import random

from library_beam_spark.operators.wordpiece import (
    CHAR_VOCAB,
    CONT_PIECES,
    MAX_PIECE,
    ROOT_PIECES,
    wordpiece_word_stats,
)
from library_beam_spark.streaming.skyline import (
    skyline_deletes_result,
    skyline_stream_batches_with_deletes,
)


def _brute_skyline(rows):
    out = []
    for i, (rid, x, y) in enumerate(rows):
        dominated = False
        for j, (_, ex, ey) in enumerate(rows):
            if i != j and ex <= x and ey >= y and (ex < x or ey > y):
                dominated = True
                break
        if not dominated:
            out.append((rid, x, y))
    return sorted(out)


def test_skyline_with_deletes_random_interleavings(spark, tmp_path):
    """12 random instances: arbitrary insert/delete interleavings
    (deletes always after their insert, ids never re-inserted, front
    and non-front deletions both occur) — the fold must equal brute
    force over the live set after EVERY batch, not just the last."""
    rng = random.Random(4102)
    for trial in range(12):
        n = rng.choice([3, 8, 30, 120])
        lo, hi = rng.choice([(0, 6), (0, 50), (-20, 20)])
        pts = {
            i: (rng.randrange(lo, hi + 1), rng.randrange(lo, hi + 1))
            for i in range(n)
        }
        n_batches = rng.choice([2, 3, 5])
        ids = list(pts)
        rng.shuffle(ids)
        per = max(1, n // n_batches)
        inserted: list = []
        dead: set = set()
        idx = str(tmp_path / f"i{trial}")
        step = skyline_stream_batches_with_deletes(
            idx, "x", "y", "id",
            compact_every=rng.choice([None, 2]),
        )
        for b in range(n_batches):
            new_ids = ids[b * per:(b + 1) * per] if b < n_batches - 1 \
                else ids[(b) * per:]
            rows = [(i, *pts[i], False) for i in new_ids]
            # delete a random subset of PREVIOUSLY-inserted live ids
            candidates = [i for i in inserted if i not in dead]
            for i in rng.sample(
                candidates, min(len(candidates), rng.randrange(0, 4))
            ):
                dead.add(i)
                rows.append((i, 0, 0, True))
            inserted.extend(new_ids)
            step(
                spark.createDataFrame(
                    rows, "id long, x long, y long, is_deleted boolean"
                ),
                b,
            )
            live = [
                (i, *pts[i]) for i in inserted if i not in dead
            ]
            got = sorted(
                (r.id, r.x, r.y)
                for r in skyline_deletes_result(spark, idx).collect()
            )
            assert got == _brute_skyline(live), (trial, b)


def _py_unk_stats(word):
    """Reference UNK-contract scan."""
    pieces = []
    pos = 0
    while pos < len(word):
        vocab = ROOT_PIECES if pos == 0 else CONT_PIECES
        for width in range(min(MAX_PIECE, len(word) - pos), 1, -1):
            if word[pos:pos + width] in vocab:
                pieces.append(word[pos:pos + width])
                pos += width
                break
        else:
            if word[pos] in CHAR_VOCAB:
                pieces.append(word[pos])
                pos += 1
            else:
                return (1, 0, True)
    return (len(pieces), max(len(p) for p in pieces), False)


def test_wordpiece_unk_random_words(spark):
    """400 random words over letters+digits+piece fragments, lengths
    1..16 — the column chain must equal the reference scan, including
    words where a digit appears mid-piece or at the boundary."""
    rng = random.Random(88)
    frags = ROOT_PIECES + CONT_PIECES + list("abcxyz0159")
    words = set()
    while len(words) < 400:
        w = "".join(
            rng.choice(frags) for _ in range(rng.randrange(1, 6))
        )[:16]
        if w:
            words.add(w)
    words = sorted(words)
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: (r.n_pieces, r.max_piece_len, bool(r.is_unk))
        for r in wordpiece_word_stats(df, unk=True).collect()
    }
    for w in words:
        assert got[w] == _py_unk_stats(w), w


def test_learn_wordpiece_random_corpora(spark):
    """6 random corpora (skewed word frequencies, variable alphabet) —
    the distributed trainer must reproduce the reference merge
    sequence exactly, scores included."""
    from tests.test_wordpiece import _py_learn_wordpiece

    from library_beam_spark.operators.wordpiece import learn_wordpiece

    rng = random.Random(7141)
    for trial in range(6):
        alpha = rng.choice(["abc", "abcde", "qxz"])
        vocab = [
            "".join(rng.choice(alpha) for _ in range(rng.randrange(2, 7)))
            for _ in range(rng.randrange(4, 12))
        ]
        corpus = [
            " ".join(rng.choices(vocab, k=rng.randrange(2, 8)))
            for _ in range(rng.randrange(5, 30))
        ]
        df = spark.createDataFrame([(t,) for t in corpus], "text string")
        k = rng.choice([3, 6])
        got = learn_wordpiece(df, num_merges=k, min_count=2)
        wc: dict = {}
        for t in corpus:
            for w in t.split():
                wc[w] = wc.get(w, 0) + 1
        ref = _py_learn_wordpiece(wc, k, 2)
        assert [m[:4] for m in got] == [m[:4] for m in ref], trial
        for g, r in zip(got, ref):
            assert math.isclose(g[4], r[4], rel_tol=0, abs_tol=1e-12)


def test_mpeg_synth_linearity_property():
    """The synthesis chain after requantization is LINEAR in the
    subband samples: synth(stream A) + synth(stream B) with disjoint
    active subbands equals synth of the combined frame — an
    independent structural check of the V/U/W chain that needs no
    reference decoder."""
    import numpy as np

    from library_beam_spark.operators.mpeg_audio import (
        decode_mpa_synth_bytes,
        pack_mpa,
    )

    rng = random.Random(5)
    for _ in range(5):
        k1 = rng.randrange(0, 16)
        k2 = k1 + 16  # disjoint by construction
        nb1, nb2 = rng.randrange(2, 8), rng.randrange(2, 8)
        sf1, sf2 = rng.randrange(0, 8), rng.randrange(0, 8)
        c1 = [rng.randrange(0, 1 << nb1) for _ in range(12)]
        c2 = [rng.randrange(0, 1 << nb2) for _ in range(12)]
        a = decode_mpa_synth_bytes(
            pack_mpa([{k1: (sf1, nb1, c1)}])
        )["samples"]
        b = decode_mpa_synth_bytes(
            pack_mpa([{k2: (sf2, nb2, c2)}])
        )["samples"]
        both = decode_mpa_synth_bytes(
            pack_mpa([{k1: (sf1, nb1, c1), k2: (sf2, nb2, c2)}])
        )["samples"]
        # the requantizer maps code 0 to a NONZERO fraction, so
        # "subband absent" and "subband with code 0" differ — the
        # linear identity must compare against the sum of the two
        # single-subband streams, each of which contributes its own
        # absent-subband zeros
        np.testing.assert_allclose(a + b, both, rtol=0, atol=1e-12)
