"""PII scrub (functions/pii.py) and Gopher quality rules
(functions/quality.py)."""

from pyspark.sql import functions as F

from library_beam_spark.functions import pii as P
from library_beam_spark.functions.quality import (
    REQUIRED_STOPWORDS,
    gopher_features,
    gopher_filter,
)


def _one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "t STRING")
    return df.select(col_fn(F.col("t")).alias("o")).first().o


def test_pii_counts(spark):
    text = ("mail a.b-c_d@sub.example.org or x@y.io, call +1-555-0199 "
            "or 44 123 4567, host 192.168.0.1 and 10.0.0.255")
    assert _one(spark, text, P.count_emails) == 2
    assert _one(spark, text, P.count_ips) == 2
    assert _one(spark, text, P.count_phones) == 2


def test_redaction_replaces_with_placeholders(spark):
    text = "from bob@corp.com at 10.1.2.3 dial +1-555-0000 now"
    red = _one(spark, text, P.redact_pii)
    assert red == "from <EMAIL> at <IP> dial <PHONE> now"


def test_redaction_order_email_keeps_ip_intact(spark):
    # the email contains dots/digits; redacting emails first must not
    # leave a partial match that the IP/phone patterns then mangle
    red = _one(spark, "ping 1.2.3.4 from j.doe99@a1.example.com", P.redact_pii)
    assert red == "ping <IP> from <EMAIL>"


def test_clean_text_untouched(spark):
    text = "no personal data here, just words and the number 42."
    assert _one(spark, text, P.redact_pii) == text
    assert _one(spark, text, P.count_emails) == 0


def _gopher(spark, text):
    return _one(spark, text, gopher_features)


def test_gopher_passes_normal_text(spark):
    text = ("the quick brown fox jumps over that lazy dog and it will have "
            "to be seen with many more of these plain words ") * 3
    g = _gopher(spark, text)
    assert g.passes and g.word_count >= 50 and g.n_stopwords >= 2


def test_gopher_word_count_bounds(spark):
    g = _gopher(spark, "too short to be of use with the and that")
    assert not g.passes and g.word_count < 50


def test_gopher_mean_word_length(spark):
    text = " ".join(["pneumonoultramicroscopics"] * 60) + " the of"
    g = _gopher(spark, text)
    assert not g.passes and g.mean_word_len > 10


def test_gopher_symbol_ratio(spark):
    base = ("the and of that have with be to word extra " * 6).strip()
    g = _gopher(spark, base + " " + "# " * 20)
    assert g.symbol_ratio > 0.1 and not g.passes


def test_gopher_stopword_rule(spark):
    text = " ".join(f"token{i}" for i in range(80))
    g = _gopher(spark, text)
    assert g.n_stopwords == 0 and not g.passes
    assert len(REQUIRED_STOPWORDS) == 8


def test_gopher_filter_keeps_only_passing(spark):
    good = ("the cat and the dog have been with all of that good text "
            "which is to say many plain words again and again here ") * 3
    df = spark.createDataFrame(
        [(1, good), (2, "tiny"), (3, " ".join(["x"] * 100))],
        "doc_id INT, text STRING",
    )
    assert [r.doc_id for r in gopher_filter(df).collect()] == [1]


def test_repetition_stats_flags_repeated_bigram(spark):
    from library_beam_spark.functions.quality import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now " * 30 + "unique closing words"),
            (2, "a perfectly normal sentence with distinct words only here"),
            (3, "solo"),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].repetitive and rows[1].top_bigram in ("buy now", "now buy")
    assert rows[1].top_bigram_frac > 0.2
    assert not rows[2].repetitive and rows[2].dup_word_frac == 0.0
    # single-word doc: no bigrams, sentinel values, not repetitive
    assert rows[3].top_bigram == "" and rows[3].top_bigram_n == 0
    assert not rows[3].repetitive


def test_repetition_dup_word_fraction(spark):
    from library_beam_spark.functions.quality import repetition_stats

    # 10 words, 5 distinct -> dup fraction 0.5 (> 0.30 threshold)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta echo alpha beta gamma delta echo")],
        "doc_id INT, text STRING",
    )
    r = repetition_stats(df).first()
    assert r.dup_word_frac == 0.5 and r.repetitive


def test_curation_funnel_monotone_attrition(spark):
    """Each stage can only shrink the corpus, and counts are coherent."""
    from library_beam_spark.registry import queries

    rows = {r["stage"]: r for r in
            queries()["curation_funnel"](spark, "/root/testdata/sf0.001").collect()}
    assert list(rows) == ["raw", "quality", "dedup", "capped"]
    docs = [rows[s]["n_docs"] for s in ("raw", "quality", "dedup", "capped")]
    toks = [rows[s]["n_tokens"] for s in ("raw", "quality", "dedup", "capped")]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[0] > 0 and docs[-1] > 0
