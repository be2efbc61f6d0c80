"""Mergeable distinct-count sketch (KMV / theta family) with a
DETERMINISTIC, oracle-replayable merge — the verified twin of
q:approx_distinct_counts' HLL++, whose register values are
engine-internal and therefore only tolerance-testable.

Design (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002; Beyer et al. SIGMOD 2007 give the unbiased
(k−1)/h_(k) form): hash every value with a fixed integer mixer, keep
the k SMALLEST DISTINCT hash values per key. The state is a plain
(key, hash) relation bounded at k rows per key; the merge is

    union  →  distinct  →  keep the k smallest

— associative, commutative, order- and partition-free, so Spark's
map-side combine (on the hash dedup) plus a rank-k window whose
filter Spark 4 pushes into a PARTIAL WindowGroupLimit (each task
locally keeps only its k smallest before the exchange) IS the merge,
exactly the q:price_quantile_sketch discipline
(operators/quantile_sketch.py module docstring). The estimator

    n̂ = m                    if m < k   (sketch is the exact set)
    n̂ = (k−1) · M DIV h_(k)  otherwise  (M = hash range = 2^42)

is pure integer arithmetic, so a SQL oracle replays hash → bottom-k →
estimate verbatim and the driver hashes the VALUES, not a tolerance.

The hash: a murmur-fmix-style finalizer computed entirely in
non-overflowing signed-64 integer ops so Spark (ANSI mode: overflow
THROWS) and DuckDB evaluate it bit-identically — NOT F.xxhash64,
which DuckDB cannot replay. Multiplication is exact (x·C) mod 2^62
via 31-bit lanes:

    x = x0 + x1·2^31,  C = c0 + c1·2^31   (x0, x1, c0, c1 < 2^31)
    (x·C) mod 2^62 = (x0·c0 + ((x0·c1 + x1·c0) mod 2^31)·2^31) mod 2^62

— every intermediate < 2^63. Two mul rounds with xor-shift folds give
measured worst-case relative error ≤ ~2σ at k = 256 on adversarially
regular inputs (σ ≈ 1/√(k−2); tests/test_kmv.py pins it). Collisions
in the 2^42 range only merge two values IDENTICALLY in both engines,
so they never break the oracle match.

Scale shape: one shuffle at the distinct (key, hash) grain with
map-side combine, then a rank shuffle bounded at k rows per key per
task by the partial WindowGroupLimit — state size k per key forever,
the 100 TB cardinality path with hash-level verification. Reference
parity: the cardinality surface of the reference's per-field summary
stats (main.py), verified where HLL++ could only be tolerance-tested
(registry.py q:approx_distinct_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

M31 = (1 << 31) - 1
M62 = (1 << 62) - 1
HASH_RANGE = 1 << 42
# murmur3 fmix64 constants folded into the 62-bit domain + an LCG seed
C1 = 0xFF51AFD7ED558CCD & M62
C2 = 0xC4CEB9FE1A85EC53 & M62
SEED = 1442695040888963407 & M62


def _mulmod62(x, c: int):
    """Column expression: exact (x · c) mod 2^62 via 31-bit lanes
    (module docstring) — no signed-64 overflow anywhere, so it is
    ANSI-safe in Spark and bit-identical in DuckDB."""
    x0 = x.bitwiseAND(F.lit(M31))
    x1 = F.shiftright(x, 31)
    c0, c1 = c & M31, c >> 31
    s = x0 * F.lit(c1) + x1 * F.lit(c0)
    return (
        x0 * F.lit(c0) + F.shiftleft(s.bitwiseAND(F.lit(M31)), 31)
    ).bitwiseAND(F.lit(M62))


def kmv_hash_col(c):
    """Column expression: the sketch hash of integer column ``c`` —
    uniform in [0, 2^42), pure integer, replayed verbatim by
    kmv_hash_sql (tests/test_kmv.py pins Spark ≡ DuckDB ≡ the Python
    reference on a value sweep)."""
    c = F.col(c) if isinstance(c, str) else c
    h = c.cast("long").bitwiseAND(F.lit(M62)).bitwiseXOR(F.lit(SEED))
    h = h.bitwiseXOR(F.shiftright(h, 31))
    h = _mulmod62(h, C1)
    h = h.bitwiseXOR(F.shiftright(h, 29))
    h = _mulmod62(h, C2)
    h = h.bitwiseXOR(F.shiftright(h, 32))
    return h.bitwiseAND(F.lit(HASH_RANGE - 1))


def kmv_hash_py(x: int) -> int:
    """Python reference of kmv_hash_col, for tests and goldens."""
    h = (x & M62) ^ SEED

    def mul(v, c):
        v0, v1 = v & M31, v >> 31
        c0, c1 = c & M31, c >> 31
        s = v0 * c1 + v1 * c0
        return (v0 * c0 + ((s & M31) << 31)) & M62

    h ^= h >> 31
    h = mul(h, C1)
    h ^= h >> 29
    h = mul(h, C2)
    h ^= h >> 32
    return h & (HASH_RANGE - 1)


def kmv_hash_sql(expr: str) -> list[tuple[str, str]]:
    """The SAME hash as chained SQL stages for a DuckDB oracle: returns
    [(col_name, select_expr)] to lay down as successive CTE projections
    (chained single-reference CTEs keep the planner's inlining linear —
    the repo's AS MATERIALIZED lesson is about multiply-referenced
    prefixes). The final stage's column is ``kmv_h``."""

    def mul(v: str, c: int) -> str:
        c0, c1 = c & M31, c >> 31
        return (
            f"((({v} & {M31}) * {c0} + "
            f"(((({v} & {M31}) * {c1} + ({v} >> 31) * {c0}) & {M31})"
            f" << 31)) & {M62})"
        )

    return [
        ("h0", f"xor(CAST({expr} AS BIGINT) & {M62}, {SEED})"),
        ("h1", "xor(h0, h0 >> 31)"),
        ("h2", mul("h1", C1)),
        ("h3", "xor(h2, h2 >> 29)"),
        ("h4", mul("h3", C2)),
        ("kmv_h", f"xor(h4, h4 >> 32) & {HASH_RANGE - 1}"),
    ]


def kmv_state(
    df: DataFrame, key_cols: list, value_col: str, k: int = 256
) -> DataFrame:
    """Build the sketch state: the k smallest DISTINCT hash values per
    key, as rows (key_cols…, kmv_h). The hash dedup aggregates with
    map-side combine; the rank-k filter rides Spark 4's partial
    WindowGroupLimit so each task ships at most k rows per key
    (plan-asserted in tests/test_kmv.py)."""
    hashes = (
        df.select(*key_cols, kmv_hash_col(value_col).alias("kmv_h"))
        .groupBy(*key_cols, "kmv_h")
        .agg(F.count(F.lit(1)).alias("_dups"))
        .drop("_dups")
    )
    w = Window.partitionBy(*key_cols).orderBy("kmv_h")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def merge_kmv_states(states: list, key_cols: list, k: int = 256) -> DataFrame:
    """Merge sketch states: union → distinct → keep the k smallest per
    key. Associative and commutative by construction, so ANY merge
    tree — partitions, micro-batches, daily rollups — yields the
    identical state (hypothesis-pinned in tests/test_kmv.py)."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    out = out.distinct()
    w = Window.partitionBy(*key_cols).orderBy("kmv_h")
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    state: DataFrame, key_cols: list, k: int = 256
) -> DataFrame:
    """Distinct-count estimates from a sketch state: per key, m = state
    size and h_k = largest kept hash; n̂ = m when m < k (exact — the
    state IS the distinct hash set) else (k−1)·M DIV h_k. Output:
    key_cols + (kmv_m, kmv_hk, est_distinct), all BIGINT."""
    return state.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("kmv_m"),
        F.max("kmv_h").alias("kmv_hk"),
    ).select(
        *key_cols,
        "kmv_m",
        "kmv_hk",
        F.when(F.col("kmv_m") < k, F.col("kmv_m"))
        .otherwise(F.expr(f"{(k - 1) * HASH_RANGE} DIV kmv_hk"))
        .alias("est_distinct"),
    )


def kmv_theta_pair_estimates(
    state: DataFrame, key_col: str, k: int = 256
) -> DataFrame:
    """Theta-sketch SET OPERATIONS over per-key KMV states (the
    Apache-DataSketches theta discipline, stated integer-exactly):
    for each unordered key pair, θ = min of the two sketches'
    thresholds (h_(k) when the sketch is full, the full hash range M
    when it holds the exact set), and the retained sample below θ is a
    uniform hash sample of EACH set with inclusion probability θ/M —
    so |A ∩ B| ≈ |S_A ∩ S_B|_{<θ} · M/θ and |A ∪ B| ≈
    (|S_A|_{<θ} + |S_B|_{<θ} − common) · M/θ, every term an integer
    the oracle replays (DIV, no float). jaccard_ppm = common·10⁶ DIV
    union_count is the sketch Jaccard in parts-per-million. Grain:
    |key pairs| × k — sketch-sized, never data-sized."""
    agg = state.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("m"), F.max("kmv_h").alias("hk")
    ).select(
        key_col,
        F.when(F.col("m") < k, F.lit(HASH_RANGE))
        .otherwise(F.col("hk"))
        .alias("theta"),
    )
    a, b = agg.alias("a"), agg.alias("b")
    ka, kb = F.col(f"a.{key_col}"), F.col(f"b.{key_col}")
    pairs = (
        a.join(b, ka < kb)
        .select(
            ka.alias("key_a"),
            kb.alias("key_b"),
            F.least("a.theta", "b.theta").alias("theta"),
        )
    )
    sa = state.select(
        F.col(key_col).alias("key_a"), F.col("kmv_h").alias("h_a")
    )
    sb = state.select(
        F.col(key_col).alias("key_b"), F.col("kmv_h").alias("h_b")
    )
    # conditional count, NOT a filter-then-count: a pair whose sketch
    # retains zero hashes below theta must still appear with cnt = 0
    # (every pair key has >= 1 state row by construction, so the inner
    # join never drops the group — only the below-theta predicate moves
    # into the aggregate)
    cnt_a = (
        pairs.join(sa, "key_a")
        .groupBy("key_a", "key_b", "theta")
        .agg(
            F.sum(
                F.when(F.col("h_a") < F.col("theta"), 1).otherwise(0)
            ).alias("cnt_a")
        )
    )
    cnt_b = (
        pairs.join(sb, "key_b")
        .groupBy("key_a", "key_b")
        .agg(
            F.sum(
                F.when(F.col("h_b") < F.col("theta"), 1).otherwise(0)
            ).alias("cnt_b")
        )
    )
    sb2 = state.select(
        F.col(key_col).alias("_kb"), F.col("kmv_h").alias("h_b")
    )
    common = (
        pairs.join(sa, "key_a")
        .join(
            sb2,
            (F.col("h_a") == F.col("h_b"))
            & (F.col("_kb") == F.col("key_b")),
        )
        .filter(F.col("h_a") < F.col("theta"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("common_cnt"))
    )
    out = (
        cnt_a.join(cnt_b, ["key_a", "key_b"])
        .join(common, ["key_a", "key_b"], "left")
        .fillna({"common_cnt": 0})
    )
    union_cnt = F.col("cnt_a") + F.col("cnt_b") - F.col("common_cnt")
    return out.select(
        "key_a", "key_b", "theta",
        F.col("common_cnt").cast("bigint").alias("common_cnt"),
        union_cnt.cast("bigint").alias("union_cnt"),
        F.expr(f"common_cnt * {HASH_RANGE} DIV theta")
        .cast("bigint")
        .alias("est_inter"),
        (union_cnt * F.lit(HASH_RANGE)).cast("bigint").alias("_un"),
    ).select(
        "key_a", "key_b", "theta", "common_cnt", "union_cnt", "est_inter",
        F.expr("_un DIV theta").cast("bigint").alias("est_union"),
        F.when(
            F.col("union_cnt") > 0,
            F.expr("common_cnt * 1000000 DIV union_cnt"),
        ).otherwise(F.lit(0)).cast("bigint").alias("jaccard_ppm"),
    )
