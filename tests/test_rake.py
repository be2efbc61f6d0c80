"""RAKE keyword extraction (operators/rake.py) — hand-worked goldens."""

from library_beam_spark.operators.rake import SCALE, rake_keywords


def test_rake_hand_worked(spark):
    # tokens: deep learning of deep networks and fast learning
    # stops: {of, and} -> phrases:
    #   seg A: "deep learning"  seg B: "deep networks"  seg C: "fast learning"
    # per-doc stats over phrase slots:
    #   deep:     freq 2, deg 2+2=4      -> wscore 2.0
    #   learning: freq 2, deg 2+2=4      -> wscore 2.0
    #   networks: freq 1, deg 2          -> wscore 2.0
    #   fast:     freq 1, deg 2          -> wscore 2.0
    # every phrase scores 4.0 -> ties broken alphabetically
    df = spark.createDataFrame(
        [(1, "deep learning of deep networks and fast learning")],
        "doc_id long, text string",
    )
    rows = {
        r["phrase"]: r
        for r in rake_keywords(df, k=10).collect()
    }
    assert set(rows) == {"deep learning", "deep networks", "fast learning"}
    for r in rows.values():
        assert r["score_scaled"] == 4 * SCALE
        assert r["plen"] == 2
        assert r["n_occ"] == 1


def test_rake_singleton_and_repeat(spark):
    # "alpha of alpha of alpha beta": phrases [alpha] [alpha] [alpha beta]
    #   alpha: freq 3, deg 1+1+2 = 4 -> wscore 4/3 (scaled DIV)
    #   beta:  freq 1, deg 2         -> wscore 2
    # phrase "alpha": score 4*S//3 (x2 occurrences, one row)
    # phrase "alpha beta": 4*S//3 + 2*S
    df = spark.createDataFrame(
        [(7, "alpha of alpha of alpha beta")], "doc_id long, text string"
    )
    rows = {r["phrase"]: r for r in rake_keywords(df, k=10).collect()}
    w_alpha = 4 * SCALE // 3
    assert rows["alpha"]["score_scaled"] == w_alpha
    assert rows["alpha"]["n_occ"] == 2
    assert rows["alpha beta"]["score_scaled"] == w_alpha + 2 * SCALE
    assert rows["alpha beta"]["n_occ"] == 1


def test_rake_topk_ordering(spark):
    # longer run scores higher (deg grows with phrase length)
    df = spark.createDataFrame(
        [(2, "quick brown fox and lazy dog on red big shiny hat")],
        "doc_id long, text string",
    )
    out = rake_keywords(df, k=1).collect()
    assert len(out) == 1
    # the 4-word phrase dominates: each member scores 4.0
    assert out[0]["phrase"] == "red big shiny hat"
    assert out[0]["score_scaled"] == 16 * SCALE


def test_rake_all_stopwords_empty(spark):
    df = spark.createDataFrame(
        [(3, "the of and to"), (4, "")], "doc_id long, text string"
    )
    assert rake_keywords(df).count() == 0
