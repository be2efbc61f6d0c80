"""Randomized property tests for the round-12 operators — each checked
against an independent pure-Python reference implementation."""

import random
import re

from library_beam_spark.operators.clustering import bfs_fixpoint, weighted_sssp
from library_beam_spark.operators.rake import SCALE, rake_keywords


def _py_bellman_ford_rounds(edges, sources, rounds):
    """Synchronous min relaxation, exactly `rounds` rounds (the
    weighted_sssp bounded-schedule contract), over the symmetrized
    min-weight adjacency."""
    adj = {}
    for u, v, w in edges:
        adj[(u, v)] = min(adj.get((u, v), w), w)
        adj[(v, u)] = min(adj.get((v, u), w), w)
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        new = dict(dist)
        for (u, v), w in adj.items():
            if u in dist:
                c = dist[u] + w
                if c < new.get(v, float("inf")):
                    new[v] = c
        dist = new
    return dist


def _py_bfs(edges, sources):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    d = 0
    while frontier:
        d += 1
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt
    return dist


def _py_rake(text, stops, k):
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    phrases, cur = [], []
    for w in words:
        if w in stops:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(w)
    if cur:
        phrases.append(cur)
    freq, deg = {}, {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    scored = {}
    counts = {}
    for p in phrases:
        text_p = " ".join(p)
        s = sum(deg[w] * SCALE // freq[w] for w in p)
        scored[text_p] = s
        counts[text_p] = counts.get(text_p, 0) + 1
    ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {p: (s, counts[p]) for p, s in ranked}


def test_weighted_sssp_random_graphs(spark):
    rng = random.Random(13)
    for trial in range(3):
        n = 14
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randint(1, 9))
            for _ in range(25)
        ]
        edges = [(u, v, w) for u, v, w in edges if u != v]
        sources = [0, 7]
        e = spark.createDataFrame(edges, "src long, dst long, w long")
        s = spark.createDataFrame([(x,) for x in sources], "node long")
        got = {
            r["node"]: r["dist"]
            for r in weighted_sssp(e, s, rounds=4).collect()
        }
        assert got == _py_bellman_ford_rounds(edges, sources, 4)


def test_bfs_fixpoint_random_graphs(spark):
    rng = random.Random(99)
    for trial in range(3):
        n = 18
        edges = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(22)
            }
        )
        edges = [(u, v) for u, v in edges if u != v]
        sources = [1, 4]
        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in sources], "node long")
        got = {
            r["node"]: r["dist"]
            for r in bfs_fixpoint(e, s, "src", "dst").collect()
        }
        assert got == _py_bfs(edges, sources)


def test_rake_random_docs(spark):
    from library_beam_spark.operators.rake import RAKE_STOPS

    rng = random.Random(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"] + RAKE_STOPS[:6]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 40))))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in rake_keywords(df, k=3).collect():
        got.setdefault(r["doc_id"], {})[r["phrase"]] = (
            r["score_scaled"],
            r["n_occ"],
        )
    for i, text in docs:
        expect = _py_rake(text, set(RAKE_STOPS), 3)
        assert got.get(i, {}) == expect, f"doc {i}: {text!r}"
