"""Randomized property tests for the round-13 operators — each checked
against an independent pure-Python reference on many seeded random
inputs (broader input coverage than the example-based suites)."""

import hashlib
import random
import re
from collections import Counter

from pyspark.sql import functions as F

from library_beam_spark.operators.skyline import (
    skyline_2d,
    skyline_dominance,
)
from library_beam_spark.streaming.lossy import lossy_merge


def _brute_skyline(rows, n_min=1, n_max=1):
    out = []
    for i, r in enumerate(rows):
        dominated = False
        for j, e in enumerate(rows):
            if i == j:
                continue
            at_least = all(
                e[k] <= r[k] for k in range(n_min)
            ) and all(
                e[k] >= r[k] for k in range(n_min, n_min + n_max)
            )
            strict = any(e[k] < r[k] for k in range(n_min)) or any(
                e[k] > r[k] for k in range(n_min, n_min + n_max)
            )
            if at_least and strict:
                dominated = True
                break
        if not dominated:
            out.append(r)
    return sorted(out)


def test_skyline_2d_random_sweep(spark):
    """20 random instances spanning dense-tie grids, sparse values,
    negatives, and tiny inputs — the range-partition form must equal
    brute force on every one."""
    rng = random.Random(1707)
    for trial in range(20):
        n = rng.choice([1, 2, 5, 40, 150])
        lo, hi = rng.choice([(0, 5), (0, 40), (-30, 30), (0, 1000)])
        rows = [
            (rng.randrange(lo, hi + 1), rng.randrange(lo, hi + 1))
            for _ in range(n)
        ]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)],
            "id long, x long, y long",
        )
        got = sorted(
            (r.x, r.y) for r in skyline_2d(df, "x", "y").collect()
        )
        assert got == _brute_skyline(rows), (trial, rows)


def test_skyline_dominance_matches_2d_on_shared_instances(spark):
    """The two operator forms implement the SAME relation: on 2-D
    inputs inside the dominance guard they must agree exactly."""
    rng = random.Random(4242)
    for _ in range(6):
        rows = [
            (rng.randrange(12), rng.randrange(12)) for _ in range(80)
        ]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)],
            "id long, x long, y long",
        )
        a = sorted((r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        b = sorted(
            (r.x, r.y)
            for r in skyline_dominance(
                df, minimize=["x"], maximize=["y"]
            ).collect()
        )
        assert a == b


def _py_lossy_fold(batches):
    state = {}
    for b, batch in enumerate(batches, start=1):
        for it, c in Counter(batch).items():
            if it in state:
                f, d = state[it]
                state[it] = (f + c, d)
            else:
                state[it] = (c, b - 1)
        state = {it: (f, d) for it, (f, d) in state.items() if f + d > b}
    return state


def test_lossy_merge_random_streams(spark):
    """lossy_merge folded over random batch splits equals the pure
    reference, and the Manku–Motwani invariants hold on every trial:
    f ≤ true ≤ f + delta; absent ⇒ true ≤ b."""
    rng = random.Random(99)
    for trial in range(8):
        vocab = [f"t{i}" for i in range(rng.choice([5, 25, 80]))]
        n_batches = rng.randrange(1, 6)
        batches = [
            rng.choices(vocab, k=rng.randrange(1, 120))
            for _ in range(n_batches)
        ]
        state = None
        for b, batch in enumerate(batches, start=1):
            counts = (
                spark.createDataFrame(
                    [(x,) for x in batch], "item string"
                )
                .groupBy("item")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            state = lossy_merge(state, counts, b).localCheckpoint()
        got = {r.item: (r.f, r.delta) for r in state.collect()}
        ref = _py_lossy_fold(batches)
        assert got == ref, trial
        true = Counter(x for b in batches for x in b)
        for it, (f, d) in got.items():
            assert f <= true[it] <= f + d
        for it, t in true.items():
            if it not in got:
                assert t <= n_batches


def test_cdc_random_token_streams(spark):
    """Random token sequences (with repeats and tiny docs) through the
    array-expression chunker equal the independent python chunker."""
    from library_beam_spark.operators.cdc import cdc_chunks

    def hash24(s, salt):
        return int(
            hashlib.md5(f"{salt}|{s}".encode()).hexdigest()[:6], 16
        )

    def py_cdc(words, k=3, mask_bits=5):
        n = len(words)
        if n == 0:
            return []
        cuts = [
            i
            for i in range(2, n - k + 2)
            if hash24(" ".join(words[i - 1:i - 1 + k]), "cdc")
            % (1 << mask_bits)
            == 0
        ]
        starts = [1] + cuts
        ends = [c - 1 for c in cuts] + [n]
        return [
            (
                idx,
                s,
                e - s + 1,
                hashlib.md5(" ".join(words[s - 1:e]).encode()).hexdigest(),
            )
            for idx, (s, e) in enumerate(zip(starts, ends))
        ]

    rng = random.Random(314)
    texts = []
    for _ in range(12):
        n = rng.choice([0, 1, 2, 3, 8, 60, 250])
        vocab_n = max(2, rng.choice([3, 20, 200]))
        texts.append(
            " ".join(
                f"v{rng.randrange(vocab_n)}" for _ in range(n)
            )
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_pos, r.n_tokens, r.chunk_md5)
        )
    for i, t in enumerate(texts):
        words = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        assert sorted(got.get(i, [])) == py_cdc(words), i


def test_wordpiece_random_words(spark):
    """Random letter strings (forcing vocab hits by biased alphabet)
    through the unrolled scan equal the python greedy reference."""
    from library_beam_spark.operators.wordpiece import (
        CONT_PIECES,
        MAX_PIECE,
        ROOT_PIECES,
        wordpiece_word_stats,
    )

    def py_greedy(word):
        pieces, pos = [], 0
        while pos < len(word):
            vocab = ROOT_PIECES if pos == 0 else CONT_PIECES
            for width in range(min(MAX_PIECE, len(word) - pos), 1, -1):
                if word[pos:pos + width] in vocab:
                    pieces.append(word[pos:pos + width])
                    pos += width
                    break
            else:
                pieces.append(word[pos])
                pos += 1
        return pieces

    rng = random.Random(2718)
    alphabet = "aeinorst"  # biased toward vocab letters
    words = list(
        {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randrange(1, 17))
            )
            for _ in range(60)
        }
    )
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: (r.n_pieces, r.max_piece_len)
        for r in wordpiece_word_stats(df).collect()
    }
    for w in words:
        p = py_greedy(w)
        assert got[w] == (len(p), max(len(x) for x in p)), (w, p)
