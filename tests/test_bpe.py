"""BPE induction/encoding vs a driver-side reference implementation
(SURVEY §5 strategy: independent small-scale replica as ground truth).

The reference replica below is the classic Sennrich get_stats /
merge_vocab pair (every adjacent occurrence counts; merges apply
greedily left-to-right, merged tokens immediately eligible as a new
left symbol), with the engine's deterministic tie-break
(count DESC, left ASC, right ASC).
"""

import re

import pytest


def _ref_tokenize(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _ref_word_counts(texts):
    counts = {}
    for t in texts:
        for w in _ref_tokenize(t):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_merge_word(syms, left, right, merged):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = merged
        else:
            out.append(s)
    return out


def _ref_learn(texts, k, min_count=2):
    wc = _ref_word_counts(texts)
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(k):
        pairs = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merged = left + right
        merges.append((left, right, merged, cnt))
        vocab = {
            w: _ref_merge_word(s, left, right, merged)
            for w, s in vocab.items()
        }
    return merges, vocab, wc


CORPUS = [
    "the banana and the bandana are on the veranda",
    "a banana a day keeps the bandana away",
    "banana bandana banana bandana savanna",
    "low lower lowest newer newest wide wider widest",
    "run runner running rerun runs",
    "aaaa aaaa baaab",  # symbol runs: greedy-fold semantics matter here
]


def _as_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learn_bpe_matches_reference(spark):
    from library_beam_spark.operators.bpe import learn_bpe

    want_merges, want_vocab, _ = _ref_learn(CORPUS, k=12, min_count=2)
    got_merges, encoded = learn_bpe(
        _as_docs(spark, CORPUS), num_merges=12, min_count=2
    )
    assert got_merges == want_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in encoded.collect()}
    assert got_vocab == want_vocab


def test_learn_bpe_run_merging_is_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a): greedy fold gives [aa, aa] — the string
    replace(' a a ',' aa ') shortcut would give [aa, a, a]."""
    from library_beam_spark.operators.bpe import learn_bpe

    docs = _as_docs(spark, ["aaaa aaaa aaaa"])
    merges, encoded = learn_bpe(docs, num_merges=1, min_count=2)
    assert merges[0][:3] == ("a", "a", "aa")
    syms = {r["word"]: list(r["syms"]) for r in encoded.collect()}
    assert syms["aaaa"] == ["aa", "aa"]


def test_learn_bpe_early_stop_on_min_count(spark):
    from library_beam_spark.operators.bpe import learn_bpe

    # every word unique, every pair count 1 → no merge reaches min_count=2
    docs = _as_docs(spark, ["abc def ghi"])
    merges, _ = learn_bpe(docs, num_merges=5, min_count=2)
    assert merges == []


def test_apply_merges_unseen_word_parity(spark):
    """The chained-fold path (streaming/unseen text) segments a word the
    reference replica never saw identically to replaying the merge list."""
    from pyspark.sql import functions as F

    from library_beam_spark.operators.bpe import apply_merges, learn_bpe

    merges, _ = learn_bpe(_as_docs(spark, CORPUS), num_merges=12, min_count=2)
    assert merges  # sanity: the corpus must actually produce merges
    unseen = "bananarama"
    want = list(unseen)
    for left, right, merged, _cnt in merges:
        want = _ref_merge_word(want, left, right, merged)
    got = (
        spark.createDataFrame([(unseen,)], "w string")
        .select(apply_merges(F.col("w"), merges).alias("syms"))
        .first()["syms"]
    )
    assert list(got) == want


def test_encode_corpus_counts_and_backoff(spark):
    """encode_corpus token totals == reference vocab totals, and an
    unseen word falls back to character symbols."""
    from library_beam_spark.operators.bpe import encode_corpus, learn_bpe

    _, encoded = learn_bpe(_as_docs(spark, CORPUS), num_merges=12, min_count=2)
    _, want_vocab, wc = _ref_learn(CORPUS, k=12, min_count=2)

    out = encode_corpus(_as_docs(spark, CORPUS), encoded)
    got = {
        (r["token"],): 0 for r in out.select("token").distinct().collect()
    }
    counts = {}
    for r in out.groupBy("token").count().collect():
        counts[r["token"]] = r["count"]
    want_counts = {}
    for w, syms in want_vocab.items():
        for s in syms:
            want_counts[s] = want_counts.get(s, 0) + wc[w]
    assert counts == want_counts
    assert got  # non-empty

    # unseen word: character backoff via the left join
    extra = _as_docs(spark, ["zq zq xyzzy"])
    toks = sorted(
        r["token"] for r in encode_corpus(extra, encoded).collect()
    )
    # 'zq' and 'xyzzy' never occur in CORPUS → pure characters
    assert toks == sorted(["z", "q"] * 2 + list("xyzzy"))


def test_bpe_registry_queries_shapes(spark):
    from library_beam_spark import registry

    m = registry.queries()["bpe_merges"](spark, "/root/testdata/sf0.001")
    rows = m.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in rows)
    t = registry.queries()["bpe_encode_topk"](spark, "/root/testdata/sf0.001")
    top = t.collect()
    assert len(top) == 25
    freqs = [r["freq"] for r in top]
    assert freqs == sorted(freqs, reverse=True)


def test_bpe_encode_oracle_survives_early_stop(spark):
    """When merges dry up before k iterations, the unrolled-SQL oracle
    must keep the word table (LEFT JOIN ON TRUE), matching learn_bpe's
    loop break — a cross join would empty every later CTE."""
    import duckdb
    import pandas as pd

    from library_beam_spark import registry
    from library_beam_spark.operators.bpe import encode_corpus, learn_bpe

    texts = ["abc def ghi", "abc xyz"]  # only 'abc' repeats → ~2 merges
    docs = _as_docs(spark, texts)
    merges, encoded = learn_bpe(
        docs, num_merges=registry._BPE_MERGES,
        min_count=registry._BPE_MIN_COUNT,
    )
    assert 0 < len(merges) < registry._BPE_MERGES  # genuinely early-stopped
    got = {
        (r["token"],): r["freq"]
        for r in encode_corpus(docs, encoded)
        .groupBy("token").count().withColumnRenamed("count", "freq")
        .collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    sql = registry._bpe_encode_oracle(topn=1000)
    want = {(t,): f for t, f in con.execute(sql).fetchall()}
    assert got == want
