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
