"""FLAT-assignment adaptive baselines — demoted from the registry in r7.

With the adaptive cell count (m ∝ N) the flat nearest-cell assignment is
N·m·dim flops — quadratic in N (measured 7.11×/4.74× at the 5× sf1→sf5
step vs 2.47×/2.21× two-level), so the registry names a user reaches for
(`semdedup_adaptive`, `ivf_ann_adaptive`) now run the two-level IMI
path. The flat derivation stays cross-engine-pinned HERE: its DuckDB
oracles (`registry._semdedup_flat_oracle` / `_ivf_flat_oracle`) replay
count → m → hash-ranked seeds → flat argmax assign → verdict/top-k, and
this test compares full result sets at sf0.001 — the same row-count +
column + order-insensitive value comparison the registry gate uses, so
demotion lost no verification coverage.
"""

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

TABLES = ["embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _emb(spark):
    from library_beam_spark.tables import table

    return table(spark, SF, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def _cents(spark):
    from library_beam_spark.operators.ivf import (
        adaptive_cell_count,
        sampled_centroids,
    )
    from library_beam_spark.registry import _SEMDEDUP_TARGET

    emb = _emb(spark)
    m = adaptive_cell_count(emb.count(), target_per_cell=_SEMDEDUP_TARGET)
    return emb, sampled_centroids(emb, m, "vec_id", "embedding", salt="cells")


def _compare(spark_df, duck_rows, cols):
    got = sorted(tuple(r[c] for c in cols) for r in spark_df.collect())
    want = sorted(tuple(r) for r in duck_rows)
    assert got == want, (len(got), len(want), got[:3], want[:3])


def test_flat_semdedup_matches_flat_oracle(spark):
    from library_beam_spark.operators.semdedup import semantic_dedup
    from library_beam_spark.registry import _SEMDEDUP_TAU, _semdedup_flat_oracle

    emb, cents = _cents(spark)
    out = semantic_dedup(emb, cents, threshold=_SEMDEDUP_TAU, two_level=False)
    _compare(out, _duck().execute(_semdedup_flat_oracle()).fetchall(),
             ["vec_id", "cell", "keep"])


def test_flat_ivf_ann_matches_flat_oracle(spark):
    from library_beam_spark.operators.ivf import ivf_topk
    from library_beam_spark.registry import _ivf_flat_oracle

    emb, cents = _cents(spark)
    out = ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), cents, k=10, nprobe=4,
        two_level=False,
    )
    _compare(out, _duck().execute(_ivf_flat_oracle()).fetchall(),
             ["query_id", "neighbor_id", "sim"])
