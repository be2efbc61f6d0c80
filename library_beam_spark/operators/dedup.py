"""Deduplication operators.

Two families:

1. **Latest-version-wins** (the reference's only distributed-semantics
   operator): group all record versions (baseline ∪ updates ∪ delete
   tombstones) by key, keep the row with the max version column, then drop
   tombstones. Reference: ``GroupByKey`` + ``GetLatestVersion`` + filter,
   /root/reference/main.py:576-587,777-781.

2. **Content dedup for training-data pipelines** (beyond the reference):
   exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash — see
   also ``operators/similarity.py`` for the embedding-space variant.

Scale notes (100 TB):
- ``latest_version`` is one hash-partition shuffle on the key. We use
  ``max_by(struct(*), ordering)`` rather than a window: Catalyst plans a
  partial aggregation map-side, so each map task emits ONE candidate row
  per key instead of shuffling every version (the reference shuffled all
  versions to the reducer). With ~30 M keys and a handful of versions per
  key this is the difference between shuffling 30 M and 100 M+ rows.
- The window (`row_number`) form is kept for parity/tests; it sorts within
  partitions, which AQE cannot skip — prefer the max_by form in pipelines.
- Tie-breaking is made total and deterministic (SURVEY §4: the reference
  tie-breaks arbitrarily on equal filenames): caller supplies an explicit
  ordered list of (column, direction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..util import ensure_min_parallelism, pin


def latest_version(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Keep one row per key: the max of ``version_cols`` (lexicographic over
    the tuple, all descending-by-max). Deterministic iff the version tuple
    is unique per key — pass a tiebreaker column (e.g. a line number or
    monotonic ingest id) as the last version col.

    Map-side partial agg → one shuffled row per (key, partition).
    """
    ordered = F.struct(*[F.col(c) for c in version_cols])
    latest = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*df.columns), ordered).alias("_latest")
    )
    out = latest.select("_latest.*")
    if tombstone_col is not None:
        out = out.filter(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return out


def latest_version_window(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Window form: ``row_number() OVER (PARTITION BY key ORDER BY ...) = 1``.
    Same semantics, full shuffle of every version — kept for parity with
    main.py:585 and as the SQL-oracle-friendly formulation."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if tombstone_col is not None:
        out = out.filter(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return out


# --------------------------------------------------------------------------
# Content dedup (LLM-training-data operators)
# --------------------------------------------------------------------------

def normalized_text(col: Column) -> Column:
    """Dedup normalization: casefold + collapse whitespace + trim.
    Mirrors the reference's AbstractNormalizer direction (NLP.py:164-223)
    minus transliteration (see functions/text.py for the full version)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact near-identity dedup: md5 over normalized text, keep the row
    with the smallest id per fingerprint (deterministic winner).

    ``min_by`` works for any orderable id type (string pub_ids included —
    a negated-column trick would break on non-numeric ids under ANSI
    mode). One shuffle on a 32-byte key with map-side partial aggregation;
    fingerprints are uniform so no skew.
    """
    fp = F.md5(normalized_text(F.col(text_col))).alias("fingerprint")
    with_fp = df.select("*", fp)
    winners = with_fp.groupBy("fingerprint").agg(
        F.min_by(F.struct(*with_fp.columns), F.col(id_col)).alias("_w")
    )
    return winners.select("_w.*")


def duplicate_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fingerprint → group size, for audit queries (groups with >1 member
    are duplicate clusters)."""
    return (
        df.select(F.md5(normalized_text(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"))
    )


def _words(col: Column) -> Column:
    """Lowercased word array, empty-token free."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda w: w != "")


def shingles(col: Column, n: int = 5) -> Column:
    """Word-level n-gram shingle array (distinct). n=5 keeps shingles rare
    enough that the candidate self-join stays near-linear at scale."""
    w = _words(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.array_distinct(F.when(F.size(w) >= n, grams).otherwise(F.array()))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_df: int | None = 100,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    Plan shape: explode(shingles) → df-cutoff → self-join on shingle →
    groupBy pair. The join key is the shingle, so only documents sharing
    ≥1 shingle ever meet — the classic candidate-generation trick.

    ``max_df`` bounds the quadratic hot-shingle blowup: one boilerplate
    shingle shared by k documents makes k²/2 join rows (AQE skew-split
    spreads that work but cannot shrink it), so shingles appearing in more
    than ``max_df`` documents are treated as boilerplate and excluded from
    both candidate generation and the Jaccard space. That caps the join
    fan-out per shingle at max_df²/2 and makes the whole op linear in the
    shingle count. Semantics: Jaccard over the non-boilerplate shingle
    space — identical to exact Jaccard whenever no shingle exceeds
    ``max_df`` (a pair differs only if it shares boilerplate that common);
    pass ``max_df=None`` for the pure exact form.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # xxhash64 the shingle before any shuffle: an 8-byte join/group key
    # instead of a ~40-byte string — 5× fewer shuffle bytes per row at
    # scale, identical counts (collision odds ~n²/2⁶⁴).
    sh = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(shingles(F.col(text_col), n)).alias("_s"),
        )
        .select("_id", F.xxhash64("_s").alias("shingle"))
    )
    if max_df is not None:
        # ONE shuffle does df-cutoff + candidate generation: group the
        # (sorted) doc ids per shingle, drop groups over max_df, and emit
        # the in-row id combinations. Replaces the r2 shape (df-count
        # shuffle → anti-join → self-join: 4 shuffles of the full shingle
        # set) with 2 (group by shingle, explode back for sizes). Per-task
        # work is bounded at max_df²/2 pairs per shingle BY CONSTRUCTION —
        # no hot-key skew possible, which is exactly why this form is
        # gated on max_df: with no cutoff one boilerplate shingle would
        # put its whole k² blowup in a single task, where the join form
        # at least spreads the k² rows across the cluster.
        grouped = (
            sh.groupBy("shingle")
            .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
            .where(F.size("_ids") <= max_df)
        )
        # consumed twice (sizes + pair emission): materialize once.
        # pin() (eager localCheckpoint), not persist(): a library operator
        # must not leak executor storage to its caller — checkpoint blocks
        # are released when the plan is GC'd, while a persist() with no
        # matching unpersist sits in the CacheManager forever.
        grouped = pin(grouped)
        sizes = (
            grouped.select(F.explode("_ids").alias("_id"))
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_sh"))
        )
        inter = (
            grouped.where(F.size("_ids") >= 2)
            .select(
                F.explode(
                    F.flatten(
                        F.transform(
                            "_ids",
                            # (element, index) lambda: pair ids[i] with
                            # every later id — sorted, so doc_a < doc_b
                            lambda x, i: F.transform(
                                F.slice("_ids", i + 2, F.size("_ids")),
                                lambda y: F.struct(
                                    x.alias("a"), y.alias("b")
                                ),
                            ),
                        )
                    )
                ).alias("_p")
            )
            .groupBy(
                F.col("_p.a").alias("doc_a"), F.col("_p.b").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        # exact form: shingle-keyed self-join — quadratic in a hot
        # shingle's doc count, but the k² rows spread across tasks (and
        # AQE skew-split), which the grouped form above cannot do.
        # pin, not persist: no leaked executor storage (see above)
        sh = pin(sh)
        sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            pround(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 5,
) -> DataFrame:
    """MinHash signature per document: for seed i, the signature element is
    ``min over shingles of md5(i || shingle)``. md5-hex lexicographic min is
    a valid random-permutation surrogate, is fully deterministic across
    engines (the DuckDB oracle computes the identical value), and needs no
    bigint juggling.

    All computed with built-in expressions — no Python in the hot path.
    Returns (id, sig: array<string> of length num_hashes).

    Plan shape: explode(shingles) → project num_hashes md5 columns →
    groupBy(doc).agg(min × num_hashes). One shuffle on doc_id with
    map-side partial mins (each map task emits one candidate signature
    per doc) — strictly better than per-row array transforms, which
    Catalyst's CollapseProject re-expands into num_hashes copies of the
    shingling subtree (measured 8× slower at sf0.1).
    """
    sh = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("_s"),
    )
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{i}|"), F.col("_s"))).alias(f"_h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "doc_id", F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


def bands_from_signatures(
    sigs: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """Band rows (doc_id, band, band_hash) from a precomputed
    (doc_id, sig) signature table — split out of
    :func:`minhash_band_index` so pipelines that need BOTH the band
    index and the signatures (the streaming confirm tier) compute the
    minhash pass once."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws("|", F.slice("sig", b * rows_per_band + 1, rows_per_band)))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 5,
) -> DataFrame:
    """The joinable LSH index: (doc_id, band, band_hash), one row per
    band. Documents colliding on any full band are near-dup candidates.
    Production shape at scale: compute ONCE for the standing corpus,
    persist/write, and equi-join arrivals against it — the index is
    n_docs × bands rows regardless of text size."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    return bands_from_signatures(sigs, num_hashes, bands)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 5,
) -> DataFrame:
    """MinHash LSH candidate pairs: split the signature into ``bands``
    bands of ``num_hashes/bands`` rows; documents colliding on any full
    band are candidates. Join key = (band_idx, band_hash) — uniform,
    broadcast-free, linear in collisions.

    Returns distinct (doc_a, doc_b) candidate pairs (doc_a < doc_b);
    compose with ``ngram_jaccard_pairs`` semantics for verification.
    """
    banded = minhash_band_index(df, id_col, text_col, num_hashes, bands, n)
    # both self-join sides read this (tiny: n_docs × bands rows);
    # materialize once (pin = eager localCheckpoint, released on GC —
    # never a persist() the caller would have to remember to unpersist)
    banded = pin(banded)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via prefix filtering (the PPJoin
    family's candidate rule) — same answer as
    ``ngram_jaccard_pairs(max_df=None)``, radically fewer candidates.

    Order every document's shingles by one global total order (document
    frequency asc, hash asc — rarest first) and index only the PREFIX
    of length ``m - ceil(t·m) + 1`` (m = the doc's shingle count). The
    prefix-filter theorem makes this LOSSLESS: J(A,B) ≥ t implies
    |A∩B| ≥ t·max(|A|,|B|), and if A and B shared nothing in their
    prefixes, all common shingles would sit in A's suffix of size
    ceil(t·|A|) − 1 < t·|A| ≤ |A∩B| — contradiction. So every
    qualifying pair collides on at least one PREFIX shingle, and the
    exact confirm (computed only over candidate docs) recovers the
    precise Jaccard.

    Why it scales where the inverted-index join doesn't: a boilerplate
    shingle shared by k docs costs the plain self-join k²/2 rows, but
    it is by construction the LAST shingle in the global order — it
    enters a doc's prefix only when the doc is almost nothing but
    boilerplate. Candidate fan-out concentrates on RARE shingles, whose
    posting lists are short. This is the exact-semantics answer to the
    hot-shingle blowup that ``max_df`` merely truncates away (and at
    threshold 0.5 the df-cutoff form changes the answer when boilerplate
    exceeds the cutoff; this one never does).

    Shuffle budget: df count (1) + per-doc prefix window (1) +
    candidate equi-join on the prefix shingle (1) + confirm join and
    size aggregates over candidate docs only. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    sh = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(shingles(F.col(text_col), n)).alias("_s"),
        )
        .select("_id", F.xxhash64("_s").alias("shingle"))
    )
    # read 5× (dfreq, ranked, two confirm scans, sizes): materialize once;
    # pin, not persist — no executor storage leaked to the caller
    sh = pin(sh)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    # one global total order: (df asc, shingle asc); per-doc rank and
    # size in one window pass over the df-joined shingle table
    w = Window.partitionBy("_id").orderBy("_df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(Window.partitionBy("_id")))
    )
    # prefix length m - ceil(t*m) + 1 (threshold 0.5 → m - ceil(m/2) + 1)
    prefix = ranked.where(
        F.col("_rk") <= F.col("_m") - F.ceil(F.col("_m") * F.lit(threshold)) + 1
    ).select("_id", "shingle", "_m")
    a, b = prefix.alias("a"), prefix.alias("b")
    # size filter (also lossless): J ≥ t forces |A∩B| ≥ t·|A∪B| ≥
    # t·max(|A|,|B|), and |A∩B| ≤ min(|A|,|B|), so min ≥ ceil(t·max) —
    # wildly mismatched sizes prune before the confirm join ever runs
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id"))
            & (
                F.least(F.col("a._m"), F.col("b._m"))
                >= F.ceil(
                    F.greatest(F.col("a._m"), F.col("b._m")) * F.lit(threshold)
                )
            ),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .distinct()
    )
    cand = pin(cand)  # feeds two semi-joins + the confirm re-join
    sa = sh.join(
        cand.select(F.col("doc_a").alias("_id")).distinct(), "_id", "semi"
    ).select(F.col("_id").alias("doc_a"), "shingle")
    sb = sh.join(
        cand.select(F.col("doc_b").alias("_id")).distinct(), "_id", "semi"
    ).select(F.col("_id").alias("doc_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cand, ["doc_a", "doc_b"])  # candidate pairs only
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        inter.join(sizes.select(F.col("_id").alias("doc_a"),
                                F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("_id").alias("doc_b"),
                           F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            pround(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def prefix_filter_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT directional containment pairs C(A→B) = |A∩B| / |A| ≥ t —
    the ASYMMETRIC near-dup relation Jaccard misses: a short document
    quoted wholesale inside a much longer one has tiny Jaccard but
    containment ≈ 1. The training-data use is quote/subset detection
    (drop the contained copy, keep the superset).

    Candidate rule (the containment prefix filter): order shingles by
    one global total order (df asc, hash asc) and index each doc A's
    prefix of length |A| − ceil(t·|A|) + 1 against the OTHER side's
    FULL shingle table. Lossless: if A's prefix misses B entirely, all
    common shingles sit in A's suffix of size ceil(t·|A|) − 1 < t·|A| —
    contradiction with |A∩B| ≥ t·|A|. Unlike the Jaccard filter the
    probe side must stay full (B is unconstrained from below only by
    |B| ≥ t·|A|), but hot shingles still cost df_prefix(s)·df_full(s),
    and boilerplate sorts LAST in the global order so its prefix
    frequency is ~0 — fan-out concentrates on rare shingles exactly as
    in ``prefix_filter_jaccard_pairs``.

    Returns (doc_a, doc_b, n_common, containment): containment of
    doc_a IN doc_b, doc_a ≠ doc_b, both directions reported when both
    qualify. Shuffle budget matches the Jaccard form plus one extra
    candidate equi-join leg.

    Threshold arithmetic is EXACT-RATIONAL: the float ``threshold`` is
    converted through its decimal literal to num/den (0.6 → 3/5) and
    every cutoff compares integers (``n_common·den ≥ n_a·num``), never
    ``CEIL(n·t)`` on a double — whose product can round up across an
    integer boundary (100·0.07 → 7.000000000000001, CEIL = 8) and
    silently drop pairs whose exact containment equals the threshold.
    """
    from fractions import Fraction

    # limit_denominator: a short decimal literal is already exact
    # (0.6 → 3/5), but a float-COMPUTED threshold such as 2/3 would
    # yield den = 10^16, and n_sh·den / _m·num products then exceed
    # bigint for realistic shingle counts (~1e5 shingles → ~6.7e20 >
    # 2^63−1), silently wrapping under non-ANSI Spark. den ≤ 10^4 is
    # exact for every threshold anyone writes (4 decimal places) and
    # keeps every product ≤ ~1e13·n — far inside bigint.
    frac = Fraction(str(threshold)).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator
    sh = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(shingles(F.col(text_col), n)).alias("_s"),
        )
        .select("_id", F.xxhash64("_s").alias("shingle"))
    )
    sh = pin(sh)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(Window.partitionBy("_id")))
    )
    # ceil(m·num/den) in pure integer algebra: (m·num + den − 1) DIV den
    ceil_t = F.expr(f"(_m * {num} + {den - 1}) DIV {den}")
    prefix = ranked.where(
        F.col("_rk") <= F.col("_m") - ceil_t + 1
    ).select("_id", "shingle", "_m")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    full = sh.join(sizes, "_id").select("_id", "shingle", "n_sh")
    a, b = prefix.alias("a"), full.alias("b")
    # size filter: |A∩B| ≤ |B| and |A∩B| ≥ t·|A| force |B| ≥ ceil(t·|A|)
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") != F.col("b._id"))
            # |B| ≥ ⌈t·|A|⌉ ⟺ |B|·den ≥ |A|·num on integers
            & (F.col("b.n_sh") * F.lit(den) >= F.col("a._m") * F.lit(num)),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .distinct()
    )
    cand = pin(cand)
    sa = sh.join(
        cand.select(F.col("doc_a").alias("_id")).distinct(), "_id", "semi"
    ).select(F.col("_id").alias("doc_a"), "shingle")
    sb = sh.join(
        cand.select(F.col("doc_b").alias("_id")).distinct(), "_id", "semi"
    ).select(F.col("_id").alias("doc_b"), "shingle")
    inter = (
        sa.join(sb, "shingle")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(cand, ["doc_a", "doc_b"])
    )
    return (
        inter.join(
            sizes.select(F.col("_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        # the admission test is the EXACT rational form n_common·den ≥
        # n_a·num (⟺ exact containment ≥ t), matching the candidate
        # prefix rule — filtering on the 6-dp ROUNDED ratio instead
        # would admit pairs whose exact containment sits within 5e-7
        # below t, which the lossless prefix filter never generates
        .withColumn("containment", pround(F.col("n_common") / F.col("n_a"), 6))
        .filter(
            F.col("n_common") * F.lit(den) >= F.col("n_a") * F.lit(num)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            "containment",
        )
    )


def incremental_near_dups(
    existing: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup matches of an INCOMING batch against an EXISTING corpus —
    the "dedup the new crawl against what you already have" primitive.
    Unlike the batch self-dedup (`minhash_lsh_pairs` + confirm), the
    standing corpus is never self-joined: its band index
    (`minhash_band_index`, n_docs × bands rows) is the only thing the
    incoming batch touches, so per-arrival cost is
    O(incoming + collisions), independent of corpus text size.

    Stages: (1) band-index both sides, equi-join on (band, band_hash) —
    incoming×existing only, no self-pairs; (2) exact n-gram Jaccard
    confirm computed ONLY over candidate documents (both shingle scans
    are semi-join-pruned to candidates before the intersection join).
    Returns (doc_id [incoming], match_id [existing], jaccard ≥
    threshold). Compose downstream with an anti-join on doc_id to admit
    only novel documents.

    Boilerplate caveat: the confirm join keys on the shingle; a shingle
    shared by many CANDIDATE docs fans out quadratically, but candidates
    are already band-filtered — apply `ngram_jaccard_pairs`-style df
    cutoffs upstream if the corpus carries heavy boilerplate.
    """
    bi = minhash_band_index(incoming, id_col, text_col, num_hashes, bands, n)
    be = minhash_band_index(existing, id_col, text_col, num_hashes, bands, n)
    cand = (
        bi.alias("i")
        .join(
            be.alias("e"),
            (F.col("i.band") == F.col("e.band"))
            & (F.col("i.band_hash") == F.col("e.band_hash")),
        )
        .select(
            F.col("i.doc_id").alias("doc_id"),
            F.col("e.doc_id").alias("match_id"),
        )
        .distinct()
    )
    # feeds two id-projections + the confirm re-join; pin, not persist —
    # no executor storage leaked to the caller
    cand = pin(cand)
    inc_ids = cand.select("doc_id").distinct()
    ex_ids = cand.select(F.col("match_id").alias(id_col)).distinct()

    def _sh(side: DataFrame, keep: DataFrame, out_id: str) -> DataFrame:
        return (
            side.join(keep.withColumnRenamed("doc_id", id_col), id_col, "semi")
            .select(
                F.col(id_col).alias(out_id),
                F.explode(shingles(F.col(text_col), n)).alias("_s"),
            )
            .select(out_id, F.xxhash64("_s").alias("shingle"))
        )

    sh_inc = _sh(incoming, inc_ids, "doc_id")
    sh_ex = _sh(existing, ex_ids, "match_id")
    inter = (
        sh_inc.join(sh_ex, "shingle")
        .groupBy("doc_id", "match_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        # keep only band-collision pairs: co-shingled non-candidates are
        # outside the LSH contract (and the oracle's)
        .join(cand, ["doc_id", "match_id"])
    )
    s_inc = sh_inc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    s_ex = sh_ex.groupBy("match_id").agg(F.count(F.lit(1)).alias("n_b"))
    return (
        inter.join(s_inc, "doc_id")
        .join(s_ex, "match_id")
        .withColumn(
            "jaccard",
            pround(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "match_id", "jaccard")
    )


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_no_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """C4-style cross-corpus line dedup (C4 §3.1 / RefinedWeb: a line
    occurring verbatim in multiple places is boilerplate; keep ONE copy).

    Input is an exploded (id, line_no, line) table — segmentation is the
    caller's (newline split, sentence split, fixed word windows).
    Returns the input plus ``keep``: true for unique lines and for the
    first occurrence (minimal (id, line_no)) of each duplicated line.

    Scale shape: lines are keyed by ``(xxhash64(line), line)`` — the
    8-byte hash leads the shuffle key for cheap comparison/partitioning,
    and the line text rides along (the row carries it anyway) so a
    64-bit hash collision can NEVER conflate two distinct lines — at
    10¹² lines tens of thousands of collisions are EXPECTED, and a
    hash-only key would silently drop unique content. One groupBy
    computes (first-occurrence, count) per line with map-side partial
    aggregation, then an equi-join marks the survivors — no global
    window, no all-pairs comparison.
    """
    keyed = lines.withColumn("_lh", F.xxhash64(F.col(line_col)))
    firsts = keyed.groupBy("_lh", line_col).agg(
        F.min(F.struct(id_col, line_no_col)).alias("_first"),
        F.count(F.lit(1)).alias("_occ"),
    )
    return (
        keyed.join(firsts, ["_lh", line_col])
        .withColumn(
            "keep",
            (F.col("_occ") == 1)
            | (F.struct(id_col, line_no_col) == F.col("_first")),
        )
        .drop("_lh", "_first", "_occ")
    )


def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 8,
) -> DataFrame:
    """EXACT substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", word-level): any run of
    ``min_len`` consecutive words that occurs more than once ANYWHERE
    in the corpus (across documents or within one) is duplicated text;
    the globally-first occurrence — min (doc, start) — survives, every
    other occurrence's tokens are removed, and each document's
    remaining tokens are reassembled in order. Sits between
    :func:`line_dedup` (needs line boundaries) and whole-document
    dedup: it catches the quoted paragraph, the boilerplate header, the
    lyrics block — duplication at arbitrary offsets.

    Where the paper builds a suffix array (inherently sequential), the
    same duplicated-span relation falls out of relational primitives:
    overlapping L-gram windows keyed by content — a span of duplicated
    text length ≥ L is exactly a maximal run of duplicated L-grams, so
    removing every non-first gram occurrence's token range removes the
    paper's spans without any suffix structure. All shuffles key on the
    gram (xxhash64 leads the key for cheap partitioning; the gram text
    rides so 64-bit collisions can never conflate distinct text — the
    line_dedup rule) and on (doc, pos); nothing is quadratic: a gram
    duplicated k times contributes k rows, not k².

    Tokenization is :func:`_words` (casefold, alnum) — removal operates
    on the normalized token stream, the standard training-pipeline
    setting. Returns one row per input document:
    (id, clean_text, n_kept, n_removed); fully-duplicated documents
    survive as empty strings (filter on n_kept to drop them).
    """
    w = _words(F.col(text_col))
    base = ensure_min_parallelism(df).select(
        F.col(id_col).alias("_id"), w.alias("_w")
    )
    base = pin(base)  # read 3×: grams, token explode, per-doc sizes
    grams = (
        base.where(F.size("_w") >= min_len)
        .select(
            "_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - min_len),
                    lambda i: F.struct(
                        i.alias("start"),
                        F.concat_ws(" ", F.slice("_w", i + 1, min_len)).alias("g"),
                    ),
                )
            ).alias("_s"),
        )
        .select("_id", F.col("_s.start").alias("start"), F.col("_s.g").alias("g"))
        .withColumn("_gh", F.xxhash64("g"))
    )
    # Per-gram (count, first occurrence) as an AGGREGATION, not a
    # window: both combine map-side (partial agg), so a boilerplate
    # gram occurring 10⁸ times shuffles one partial row per map task —
    # a window form would drag every occurrence into ONE sort task.
    # The join back spreads a hot gram's probe rows under AQE
    # skew-split, which windows cannot do.
    occ = grams.groupBy("_gh", "g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct("_id", "start")).alias("_first"),
    )
    covered = (
        grams.join(occ.where(F.col("_n") >= 2), ["_gh", "g"])
        .where(F.struct("_id", "start") != F.col("_first"))
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + min_len - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    toks = base.select("_id", F.posexplode("_w").alias("pos", "w"))
    kept = toks.join(covered, ["_id", "pos"], "anti")
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s.getField("w"),
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    sizes = base.select("_id", F.size("_w").alias("_total"))
    return (
        sizes.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("_total") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def word_window_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 4,
) -> DataFrame:
    """Segment flat text into fixed ``width``-word pseudo-lines (for
    corpora without natural line boundaries): (id, line_no, line)."""
    w = _words(F.col(text_col))
    slices = F.transform(
        F.sequence(F.lit(0), F.greatest(F.ceil(F.size(w) / width).cast("int") - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i * width + 1, width)),
    )
    return (
        ensure_min_parallelism(df)
        .where(F.size(w) > 0)
        .select(
            F.col(id_col),
            F.posexplode(slices).alias("line_no", "line"),
        )
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over words, built-ins only.

    Per word: h = xxhash64(word) (deterministic in-JVM). For each bit b,
    vote +1/-1 by bit value; sign of the summed vote per bit forms the
    fingerprint. Documents within small Hamming distance are near-dups.

    Implementation: explode words → per (doc, bit) aggregate vote sign →
    reassemble. The bit dimension is a constant 64× fan-out on the map
    side; the single shuffle is on doc_id. Returns (doc_id, simhash:
    array<int> of 0/1 of length ``bits``) — kept as a bit array (not a
    packed bigint) so Hamming distance is a cheap ``F.zip_with`` sum.
    """
    words = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.explode(_words(F.col(text_col))).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    votes = words.select(
        "doc_id",
        *[
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{b}")
            for b in range(bits)
        ],
    )
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(f"b{b}").alias(f"b{b}") for b in range(bits)]
    )
    return agg.select(
        "doc_id",
        F.array(
            *[F.when(F.col(f"b{b}") > 0, 1).otherwise(0) for b in range(bits)]
        ).alias("simhash"),
    )


def simhash_portable(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Engine-portable SimHash: per-word bit b = parity of md5 hex digit b
    (computable identically in DuckDB — the oracle-checkable form of
    :func:`simhash`, which uses the JVM-only xxhash64). ``bits`` ≤ 32
    (one md5 hex digit per bit).

    Same single-pass vote-columns shape as the production form: ``bits``
    vote columns per word row → one groupBy(doc) with map-side partial
    sums → assemble the bit array. Returns (doc_id, simhash array<int>).
    """
    if bits > 32:
        raise ValueError(f"md5-hex-parity simhash caps at 32 bits, got {bits}")
    words = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.explode(_words(F.col(text_col))).alias("w")
    )
    h = F.md5("w")
    votes = words.select(
        "doc_id",
        *[
            (2 * (F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int") % 2) - 1).alias(
                f"v{i}"
            )
            for i in range(bits)
        ],
    )
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(f"v{i}").alias(f"v{i}") for i in range(bits)]
    )
    return agg.select(
        "doc_id",
        F.array(
            *[F.when(F.col(f"v{i}") > 0, 1).otherwise(0) for i in range(bits)]
        ).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``
    (production form: xxhash64 fingerprints)."""
    fp = simhash(df, id_col, text_col, bits)
    return hamming_pairs_from_bits(fp, max_hamming, bits, blocks)


def simhash_pairs_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 32,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs over the md5-parity fingerprint — identical plan
    shape to :func:`simhash_pairs`, oracle-checkable bit-for-bit."""
    fp = simhash_portable(df, id_col, text_col, bits)
    return hamming_pairs_from_bits(fp, max_hamming, bits, blocks)


def hamming_pairs_from_bits(
    fp: DataFrame,
    max_hamming: int,
    bits: int,
    blocks: int,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` from a fingerprint
    table (doc_id, simhash array<int>).

    Candidate generation uses the pigeonhole trick: split the fingerprint
    into ``blocks`` contiguous blocks; any pair within distance
    ``blocks - 1`` agrees exactly on ≥1 block, so join on (block_idx,
    block_value) instead of cross-joining. Exact distance verified after.

    Recall holds only when ``blocks > max_hamming``, so ``blocks`` is
    raised to ``max_hamming + 1`` automatically (more blocks = shorter
    blocks = more candidates, never fewer true pairs). Block lengths
    distribute any remainder, so ``bits`` need not divide evenly.

    Scale shape: the exploded block join carries ONLY (doc_id, block,
    block_val) — the full ``bits``-element fingerprints are attached
    AFTER the candidate ``.distinct()``, by two joins against the
    (n_docs-sized) fingerprint table. A candidate row that rode the
    block join with both fingerprints aboard would shuffle ~2·bits ints
    per collision (then again through the distinct); at 10⁹ docs the
    candidate table dominates the job. Same id-first-attach-later
    pattern as ``prefix_filter_jaccard_pairs``'s confirm stage.
    """
    if blocks < max_hamming + 1:
        blocks = max_hamming + 1
    if blocks > bits:
        raise ValueError(f"need blocks <= bits, got {blocks} > {bits}")
    base, rem = divmod(bits, blocks)
    bounds, start = [], 0
    for i in range(blocks):
        length = base + (1 if i < rem else 0)
        bounds.append((start, length))
        start += length
    # fingerprints are read by the block projection AND the two confirm
    # joins: materialize once (pin, not persist — no storage leak)
    fp = pin(fp.select("doc_id", "simhash"))
    blocked = fp.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(",", F.slice("simhash", s + 1, ln))
                    for s, ln in bounds
                ]
            )
        ).alias("block", "block_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    with_fp = cand.join(
        fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")),
        "doc_a",
    ).join(
        fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")),
        "doc_b",
    )
    ham = F.aggregate(
        F.zip_with("sh_a", "sh_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        with_fp.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """SoftDeDup reweighting (He et al., ACL 2024 "SoftDedup: an
    efficient data reweighting method for speeding up language model
    pre-training"): instead of DROPPING duplicates, every document
    keeps its row but its sampling weight is down-scaled by the
    COMMONNESS of its content — weight = 1 / |exact-duplicate group|,
    so a 5-way duplicated page contributes one document's worth of
    gradient mass spread over five shards instead of 5× or 1×. Returns
    (id, fingerprint, dup_count, weight, eff_tokens): the portably
    rounded weight and the whitespace-token mass it scales.

    Scale shape: same single fingerprint shuffle as exact_dedup
    (uniform 32-byte keys, map-side partial count), then the count
    joins back at the fingerprint grain — no second pass over text
    bytes, no window over the group."""
    from ..functions.portable import pround

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    fp = F.md5(normalized_text(F.col(text_col))).alias("fingerprint")
    base = df.select(
        F.col(id_col), fp, F.size(words).cast("bigint").alias("n_tokens")
    )
    counts = base.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_count")
    )
    return base.join(counts, "fingerprint").select(
        id_col,
        "fingerprint",
        "dup_count",
        pround(F.lit(1.0) / F.col("dup_count"), digits).alias("weight"),
        pround(
            F.col("n_tokens") / F.col("dup_count"), digits
        ).alias("eff_tokens"),
    )
