"""Incremental-aggregate maintenance: state merge ≡ recompute on
arbitrary splits, and the non-algebraic mean derives from MERGED state
(averaging partials is the classic wrong-merge this pins against)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # split bucket
            st.sampled_from(["A", "B"]),
            st.integers(1, 50),          # qty
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_state_merge_equals_recompute(spark, rows):
    data = [(i, b, g, q) for i, (b, g, q) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, bucket int, g string, q long")

    def state(part):
        return part.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("q").alias("s"),
            F.min("q").alias("mn"), F.max("q").alias("mx"),
        )

    parts = [state(df.filter(F.col("bucket") == b)) for b in range(4)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = u.groupBy("g").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"),
        F.min("mn").alias("mn"), F.max("mx").alias("mx"),
    )
    got = {
        r.g: (r.n, r.s, r.mn, r.mx, r.s / r.n) for r in merged.collect()
    }
    ref = {}
    for _i, b, g, q in data:
        n, s, mn, mx = ref.get(g, (0, 0, 10 ** 9, -1))
        ref[g] = (n + 1, s + q, min(mn, q), max(mx, q))
    want = {g: (n, s, mn, mx, s / n) for g, (n, s, mn, mx) in ref.items()}
    assert got == want


def test_mean_of_partials_is_the_wrong_merge(spark):
    """Sanity pin for the docstring's claim: averaging per-partition
    means diverges from the derived-from-merged-state mean whenever
    partition sizes differ."""
    df = spark.createDataFrame(
        [(0, "A", 10), (0, "A", 20), (1, "A", 90)],
        "bucket int, g string, q long",
    )
    per_part_means = (
        df.groupBy("bucket", "g").agg(F.avg("q").alias("m"))
        .groupBy("g").agg(F.avg("m").alias("wrong"))
        .collect()[0].wrong
    )
    true_mean = df.groupBy("g").agg(F.avg("q")).collect()[0][1]
    assert per_part_means != true_mean  # 52.5 vs 40


@given(
    st.lists(  # orders: (key bucket for delta split, priority)
        st.tuples(st.integers(0, 1), st.sampled_from(["P1", "P2", "P3"])),
        min_size=1, max_size=12,
    ),
    st.lists(  # lineitems: (order index, delta bucket, qty)
        st.tuples(st.integers(0, 11), st.integers(0, 1), st.integers(1, 9)),
        min_size=0, max_size=30,
    ),
)
@settings(max_examples=10, deadline=None)
def test_delta_join_merge_equals_recompute(spark, orders, items):
    """Join-aware IVM: base(O_old ⋈ L_old) ∪ ΔO⋈L ∪ O_old⋈ΔL must
    equal the from-scratch join aggregate for ARBITRARY independent
    splits of both sides (the disjointness argument in
    q:incremental_join_merge's docstring, exercised on random data
    where every term shape — empty deltas, delta-delta overlap rows —
    comes up)."""
    odata = [(k, db, p) for k, (db, p) in enumerate(orders)]
    ldata = [
        (oi, db, q) for oi, db, q in items if oi < len(orders)
    ]
    o = spark.createDataFrame(odata, "ok long, od int, pr string")
    li = spark.createDataFrame(ldata, "lk long, ld int, q long")

    def state(op, lp):
        return (
            op.join(lp, op["ok"] == lp["lk"])
            .groupBy("pr")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("s"))
        )

    o_old, o_d = o.filter(F.col("od") == 0), o.filter(F.col("od") == 1)
    l_old, l_d = li.filter(F.col("ld") == 0), li.filter(F.col("ld") == 1)
    merged = (
        state(o_old, l_old)
        .unionByName(state(o_d, li))
        .unionByName(state(o_old, l_d))
        .groupBy("pr")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    got = {r.pr: (r.n, r.s) for r in merged.collect()}
    want = {r.pr: (r.n, r.s) for r in state(o, li).collect()}
    assert got == want
