"""Dedup properties (SURVEY §5 strategy 4): idempotence, count law,
winner membership; plus partitioned-write round trip and the count gate."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _dedup(df):
    from library_beam_spark.operators.dedup import latest_version

    return latest_version(
        df,
        key_cols=["l_orderkey"],
        version_cols=["l_shipdate", "l_linenumber", "l_extendedprice"],
    )


def test_latest_version_idempotent(spark):
    from library_beam_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem")
    once = _dedup(li)
    twice = _dedup(once)
    a = sorted(map(tuple, once.select("l_orderkey", "l_linenumber").collect()))
    b = sorted(map(tuple, twice.select("l_orderkey", "l_linenumber").collect()))
    assert a == b


def test_latest_version_count_and_membership(spark):
    from library_beam_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem")
    out = _dedup(li)
    assert out.count() == li.select("l_orderkey").distinct().count()
    # every output row is an input row (no synthesis)
    assert out.exceptAll(li.select(*out.columns)).count() == 0


def test_exact_dedup_idempotent(spark):
    from library_beam_spark.operators.dedup import exact_dedup
    from library_beam_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    once = exact_dedup(docs).drop("fingerprint")
    twice = exact_dedup(once).drop("fingerprint")
    assert once.count() == twice.count()


def test_partitioned_write_roundtrip(spark, tmp_path):
    from library_beam_spark.io import write_parquet
    from library_beam_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_parquet(ev, path, partition_by=["day"])
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # partition filter prunes at the scan (PartitionFilters, not data filter)
    from library_beam_spark.plans import formatted_plan

    one_day = back.filter(F.col("day") == ev.select(F.min("day")).first()[0])
    assert "PartitionFilters: [isnotnull(day" in formatted_plan(one_day)
    assert one_day.count() > 0


def test_assert_expected_count(spark):
    from library_beam_spark.tables import table
    from library_beam_spark.util import assert_expected_count

    r = table(spark, "/root/testdata/sf0.001", "region")
    assert assert_expected_count(r, 5) == 5
    assert assert_expected_count(r, 4, tolerance=0.5) == 5
    with pytest.raises(AssertionError):
        assert_expected_count(r, 100)


def test_exact_dedup_string_ids(spark):
    """Winner selection works on non-numeric ids (pub_id-style strings):
    smallest id wins, deterministically."""
    from library_beam_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [
            ("pmid:9", "Same   Text here"),
            ("pmid:10", "same text HERE"),
            ("pmid:2", "a different document"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"] for r in exact_dedup(df).collect()}
    # 'pmid:10' < 'pmid:9' lexicographically → it wins the dup group
    assert out == {"pmid:10", "pmid:2"}


def test_simhash_pairs_blocks_adapt_to_max_hamming(spark):
    """Pigeonhole recall: blocks is raised to max_hamming+1 automatically,
    so a pair at hamming distance 4-5 is still found with default blocks=4."""
    from library_beam_spark.operators.dedup import simhash_pairs

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    # a light perturbation keeps the fingerprints within a few bits
    near = base.replace("kappa", "kappax")
    far = "completely unrelated content about something else entirely " * 3
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id int, text string"
    )
    got = simhash_pairs(df, max_hamming=5, blocks=4)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in got.collect()}
    assert (1, 2) in pairs
    assert all(h <= 5 for h in pairs.values())


def test_ngram_jaccard_hot_shingle_cutoff(spark):
    """A boilerplate shingle shared by every doc must not quadratically
    explode the candidate join: with max_df, boilerplate is excluded from
    the Jaccard space, so boilerplate-only overlap yields NO pairs (the
    exact path would emit k²/2 of them at a low threshold), while true
    near-dups are still found through their rare shingles."""
    from library_beam_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "subscribe to our newsletter for updates"
    rows = [(i, f"{boiler} unique content piece number {i} about topic {i*7}")
            for i in range(40)]
    # plant one true near-dup pair: long shared rare tail
    tail = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight")
    rows += [(100, f"alpha {tail}"), (101, f"beta {tail}")]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    # exact path at a permissive threshold: boilerplate-only overlap makes
    # ~40*39/2 candidate pairs (the quadratic head the cutoff removes)
    exact = ngram_jaccard_pairs(df, n=5, threshold=0.01, max_df=None)
    assert exact.count() > 700

    cut = ngram_jaccard_pairs(df, n=5, threshold=0.01, max_df=5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in cut.collect()}
    assert (100, 101) in pairs
    # no pair exists purely through the hot shingle
    assert all(a == 100 and b == 101 for a, b in pairs)

    # at the production threshold both forms agree on this corpus
    a = {(r["doc_a"], r["doc_b"]) for r in
         ngram_jaccard_pairs(df, n=5, threshold=0.5, max_df=5).collect()}
    b = {(r["doc_a"], r["doc_b"]) for r in
         ngram_jaccard_pairs(df, n=5, threshold=0.5, max_df=None).collect()}
    assert a == b == {(100, 101)}


# ---------- connected components / duplicate clustering ----------


def _uf_components(edges):
    """Ground-truth union-find, driver-side, for small graphs."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_connected_components_chain_and_island(spark):
    from library_beam_spark.operators.clustering import connected_components

    # chain 1-2-3 (1 and 3 never share an edge) + island 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], ["src", "dst"]
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_connected_components_matches_union_find(spark):
    import random

    from library_beam_spark.operators.clustering import connected_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    expect = _uf_components(edges)
    got = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(edges, ["src", "dst"])
        ).collect()
    }
    assert got == expect


def test_resolve_duplicates_keeps_one_per_cluster(spark):
    from library_beam_spark.operators.clustering import resolve_duplicates

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (20, 21)], ["doc_a", "doc_b"]
    )
    rows = resolve_duplicates(pairs).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert set(by_cluster) == {5, 20}
    for cid, members in by_cluster.items():
        keepers = [r.doc_id for r in members if r.keep]
        assert keepers == [cid]


def test_connected_components_deep_path_converges(spark):
    """Diameter ≫ 25 path graph: pointer jumping must converge in
    O(log d) rounds — the r2 VERDICT deep-graph case, no fallback knob."""
    from library_beam_spark.operators.clustering import connected_components

    n = 300  # path 0-1-2-...-299, diameter 299
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
    )
    got = {
        r.node: r.component
        for r in connected_components(edges, max_rounds=15).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_cycle_and_cross_edges(spark):
    from library_beam_spark.operators.clustering import connected_components

    # 60-cycle plus chords, and a separate triangle
    edges = [(i, (i + 1) % 60) for i in range(60)] + [(5, 40), (70, 71), (71, 72), (72, 70)]
    expect = _uf_components(edges)
    got = {
        r.node: r.component
        for r in connected_components(
            spark.createDataFrame(edges, ["src", "dst"]), max_rounds=12
        ).collect()
    }
    assert got == expect


def test_line_dedup_first_occurrence_wins(spark):
    from library_beam_spark.operators.dedup import line_dedup

    lines = spark.createDataFrame(
        [(1, 0, "alpha beta"), (1, 1, "unique one"),
         (2, 0, "alpha beta"), (2, 1, "alpha beta"), (2, 2, "other")],
        ["doc_id", "line_no", "line"],
    )
    got = {(r.doc_id, r.line_no): r.keep for r in line_dedup(lines).collect()}
    assert got == {(1, 0): True, (1, 1): True,
                   (2, 0): False, (2, 1): False, (2, 2): True}


def test_word_window_lines_segmentation(spark):
    from library_beam_spark.operators.dedup import word_window_lines

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, ""), (3, "x y")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r.doc_id, r.line_no, r.line)
        for r in word_window_lines(df, width=4).collect()
    )
    assert rows == [
        (1, 0, "a b c d"), (1, 1, "e f g h"), (1, 2, "i j"),
        (3, 0, "x y"),
    ]


@given(st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.sampled_from(["x", "y", "z"])),
    min_size=1, max_size=25,
))
@settings(max_examples=20, deadline=None)
def test_line_dedup_matches_bruteforce(spark, rows):
    """Random (doc, line_no, line) tables: keep == first-occurrence rule
    computed brute-force."""
    from library_beam_spark.operators.dedup import line_dedup

    uniq = sorted(set(rows))
    df = spark.createDataFrame(uniq, ["doc_id", "line_no", "line"])
    # key on the FULL triple: the strategy can emit two rows sharing
    # (doc_id, line_no) with different line text, and a (doc_id, line_no)
    # dict key would then resolve by collect order (flaky)
    got = {
        (r.doc_id, r.line_no, r.line): r.keep
        for r in line_dedup(df).collect()
    }
    firsts = {}
    for d, n, l in sorted(uniq):
        firsts.setdefault(l, (d, n))
    want = {(d, n, l): firsts[l] == (d, n) for d, n, l in uniq}
    assert got == want


def test_incremental_near_dups_planted(spark):
    """A planted near-copy in the incoming batch matches its corpus
    original; novel incoming docs match nothing; corpus docs are never
    paired with each other (no self-join of the standing side)."""
    from library_beam_spark.operators.dedup import incremental_near_dups

    base = ("the quick brown fox jumps over the lazy dog while the "
            "committee reviews seventeen carefully numbered proposals "
            "about renewable energy storage in coastal regions")
    near = base.replace("lazy dog", "sleepy dog")  # high-overlap variant
    novel = ("completely unrelated text concerning medieval pottery "
             "fragments excavated beneath a monastery courtyard with "
             "unusual glaze chemistry and disputed provenance records")
    existing = spark.createDataFrame(
        [(1, base), (2, novel.replace("pottery", "ceramics"))],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(100, near), (101, "entirely fresh sentence about orbital "
                            "mechanics and gravitational resonance in "
                            "planetary ring systems never seen before "
                            "in the standing corpus at all")],
        "doc_id long, text string",
    )
    out = incremental_near_dups(existing, incoming, threshold=0.5).collect()
    assert {(r.doc_id, r.match_id) for r in out} == {(100, 1)}
    assert all(0.5 <= r.jaccard <= 1.0 for r in out)
    # empty incoming batch → empty result, not an error
    empty = incoming.limit(0)
    assert incremental_near_dups(existing, empty).count() == 0


def test_prefix_filter_equals_exact_jaccard_with_boilerplate(spark):
    """Prefix filtering returns EXACTLY the all-pairs Jaccard result —
    including when a boilerplate shingle is shared by every doc (the
    case where the df-cutoff form would change the answer). The hot
    shingle sorts last in the global order, so it never drives
    candidates, yet it still counts in the Jaccard space."""
    from library_beam_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    boiler = "all rights reserved contact the publisher for details"
    bodies = [
        "the quick brown fox jumps over the lazy dog near the river",
        "the quick brown fox jumps over the sleepy dog near the river",
        "completely different medieval pottery fragments were excavated "
        "beneath the monastery courtyard last autumn by local students",
        "unrelated orbital mechanics of planetary ring systems remain "
        "poorly understood despite decades of careful observation",
    ]
    rows = [(i, f"{b} {boiler}") for i, b in enumerate(bodies)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(d, threshold=0.5).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(d, threshold=0.5, max_df=None).collect()
    }
    assert got == want
    assert got, "the planted near-pair must be found"
    assert {(a, b) for a, b, _ in got} == {(0, 1)}


def test_dedup_operators_leak_no_cached_plans(spark):
    """Cache hygiene (the library-operator rule stated in ivf/triangles):
    an operator may materialize intermediates, but must not leave entries
    in the SQL CacheManager for the caller to unpersist. pin() (eager
    localCheckpoint) is GC-released; a bare persist() would sit in the
    CacheManager forever — exactly what a long registry session (and
    verify_oracle.py) cannot afford. Runs every formerly-leaking dedup
    operator to an action and asserts the CacheManager ends empty."""
    from library_beam_spark.operators.dedup import (
        incremental_near_dups,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )
    from library_beam_spark.tables import table

    spark.catalog.clearCache()
    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.where(F.col("doc_id") % 2 == 1)
    ngram_jaccard_pairs(docs, max_df=50).count()      # grouped form
    ngram_jaccard_pairs(docs, max_df=None).count()    # exact self-join form
    minhash_lsh_pairs(docs).count()
    prefix_filter_jaccard_pairs(docs).count()
    incremental_near_dups(half, other).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "a dedup operator left a persisted plan in the CacheManager"
    )


def test_substring_dedup_first_occurrence_wins(spark):
    from library_beam_spark.operators.dedup import substring_dedup

    boiler = "all rights reserved contact the publisher for further details today"
    rows = [
        (1, f"unique opening about medieval pottery fragments {boiler} and a unique closing thought"),
        (2, f"different start entirely here {boiler} with another distinct ending altogether friends"),
        (3, "totally novel document about orbital mechanics with no shared phrases at all whatsoever"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in substring_dedup(d, min_len=8).collect()}
    assert out[1].n_removed == 0  # first occurrence keeps the boilerplate
    assert out[2].n_removed == 10  # the 10 boilerplate tokens vanish
    assert "publisher" not in out[2].clean_text
    assert out[2].clean_text.startswith("different start entirely here with")
    assert out[3].n_removed == 0


def test_substring_dedup_within_doc_and_full_removal(spark):
    from library_beam_spark.operators.dedup import substring_dedup

    phrase = "one two three four five six seven eight"
    rows = [
        (1, f"{phrase} middle words here {phrase}"),  # internal repeat
        (2, phrase),  # exactly the duplicated 8-gram, later occurrence
        (3, "short doc"),  # under min_len: untouched
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in substring_dedup(d, min_len=8).collect()}
    # doc 1: first occurrence survives, internal second copy removed
    assert out[1].n_removed == 8
    assert out[1].clean_text == f"{phrase} middle words here"
    # doc 2: whole doc is a later duplicate → emptied but still a row
    assert out[2].n_kept == 0 and out[2].clean_text == ""
    assert out[2].n_removed == 8
    # doc 3: shorter than any window → untouched
    assert out[3].n_removed == 0 and out[3].clean_text == "short doc"
    # accounting: kept + removed = input token count, every doc present
    assert set(out) == {1, 2, 3}
    for doc_id, text in rows:
        r = out[doc_id]
        assert r.n_kept + r.n_removed == len(text.split())
        assert r.n_kept == len(r.clean_text.split())


@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=14).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=12, deadline=None)
def test_substring_dedup_matches_bruteforce(spark, texts):
    """Differential test on tiny alphabets (forced collisions): the
    operator must equal a direct python replica of the rule — count
    every L-gram, rank occurrences by (doc, start), remove token ranges
    of every non-first occurrence, reassemble."""
    from library_beam_spark.operators.dedup import substring_dedup

    L = 3
    rows = [(i, t) for i, t in enumerate(texts)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in substring_dedup(d, min_len=L).collect()
    }

    toks = {i: t.split() for i, t in rows}
    occs = {}
    for i, ws in toks.items():
        for s in range(len(ws) - L + 1):
            occs.setdefault(" ".join(ws[s : s + L]), []).append((i, s))
    covered = {i: set() for i in toks}
    for g, locs in occs.items():
        if len(locs) < 2:
            continue
        for doc, start in sorted(locs)[1:]:
            covered[doc].update(range(start, start + L))
    for i, ws in toks.items():
        kept = [w for p, w in enumerate(ws) if p not in covered[i]]
        want = (" ".join(kept), len(kept), len(ws) - len(kept))
        assert got[i] == want, (i, got[i], want)


def _lpa_reference(edges, iters):
    """Brute-force replay of the synchronous LPA rule: plurality of
    neighbor labels, ties to the smallest label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    labels = {n: n for n in adj}
    for _ in range(iters):
        labels = {
            n: min(
                (c for c in Counter(labels[m] for m in adj[n]).items()),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    return labels


@pytest.mark.parametrize("iters", [1, 2, 4])
def test_label_propagation_matches_reference_barbell(spark, iters):
    """Two triangles joined by a bridge: the distributed rounds must
    match the brute-force synchronous replay at every depth, and the
    converged labelling splits the barbell into its two communities."""
    from library_beam_spark.operators.clustering import label_propagation

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.community
        for r in label_propagation(df, iters=iters).collect()
    }
    assert got == _lpa_reference(edges, iters)
    if iters >= 4:
        # converged: each triangle is uniform, and the two communities
        # stay distinct (the bridge carries label 3 into triangle B —
        # plurality inside B then locks onto it, away from A's 1)
        assert {got[1], got[2], got[3]} == {1}
        assert {got[10], got[11], got[12]} == {3}


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=20,
    ).filter(lambda es: any(u != v for u, v in es))
)
@settings(max_examples=8, deadline=None)
def test_label_propagation_matches_reference_random(spark, edges):
    """Hypothesis differential: arbitrary small graphs (self-loops
    dropped), 3 synchronous rounds, exact agreement with the replay."""
    from library_beam_spark.operators.clustering import label_propagation

    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.community
        for r in label_propagation(df, iters=3).collect()
    }
    assert got == _lpa_reference(edges, 3)


def _kcore_reference(edges, k, rounds):
    """Brute-force synchronous peel: degree on the live symmetric graph,
    all sub-k nodes removed at once, exactly `rounds` rounds; returns
    {node: residual degree} over nodes with >= 1 surviving edge."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    for _ in range(rounds):
        dead = {u for u in alive if sum(1 for w in adj[u] if w in alive) < k}
        alive -= dead
    return {
        u: d
        for u in alive
        if (d := sum(1 for w in adj[u] if w in alive)) > 0
    }


@pytest.mark.parametrize("k,rounds", [(2, 1), (2, 3), (3, 5)])
def test_kcore_peel_matches_reference_barbell(spark, k, rounds):
    """Two triangles + a pendant path: the path peels off round by
    round, the triangles survive k=2 forever and die at k=3 only via
    the bridge erosion — each depth must match the synchronous replay."""
    from library_beam_spark.operators.clustering import kcore_peel

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
             (3, 10), (12, 20), (20, 21), (21, 22)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.degree for r in kcore_peel(df, k=k, rounds=rounds).collect()}
    assert got == _kcore_reference(edges, k, rounds)


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=24,
    ).filter(lambda es: any(u != v for u, v in es))
)
@settings(max_examples=8, deadline=None)
def test_kcore_peel_matches_reference_random(spark, edges):
    """Hypothesis differential: arbitrary small graphs, k=2, peeled to
    guaranteed convergence (rounds = node count) — the bounded peel's
    fixpoint IS the true 2-core."""
    from library_beam_spark.operators.clustering import kcore_peel

    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.degree for r in kcore_peel(df, k=2, rounds=13).collect()}
    assert got == _kcore_reference(edges, 2, 13)
