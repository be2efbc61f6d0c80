"""Unigram-LM Viterbi segmentation (operators/unigram.py)."""

import random

from library_beam_spark.operators.unigram import (
    CHAR_COST,
    MAX_PIECE,
    UNREACHABLE,
    VOCAB,
    viterbi_word_costs,
)


def _brute_cost(word: str) -> int:
    n = len(word)
    dp = [0] + [UNREACHABLE] * n
    for i in range(1, n + 1):
        best = dp[i - 1] + CHAR_COST
        for j in range(2, MAX_PIECE + 1):
            if j > i:
                continue
            piece = word[i - j : i]
            if piece in VOCAB:
                best = min(best, dp[i - j] + VOCAB[piece])
        dp[i] = best
    return dp[n]


def _costs(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: r["min_cost"]
        for r in viterbi_word_costs(df).collect()
    }


def test_hand_worked(spark):
    got = _costs(spark, ["x", "the", "at", "qqq", "tion"])
    assert got["x"] == CHAR_COST
    assert got["the"] == 180  # beats t+h+e (300) and th+e (250)
    assert got["at"] == 150
    assert got["qqq"] == 300  # no pieces apply: 3 chars
    assert got["tion"] == 200  # beats ti+on (300) and t+ion (280)


def test_matches_bruteforce_random(spark):
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    words = list(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 16)))
            for _ in range(200)
        }
    ) + ["information", "sparkstream", "mentioned", "formation"]
    got = _costs(spark, words)
    assert got == {w: _brute_cost(w) for w in words}


def test_long_words_excluded(spark):
    got = _costs(spark, ["a" * 17, "ok"])
    assert set(got) == {"ok"}
