"""Sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from library_beam_spark.operators.packing import (
    chunk_pack,
    distributed_cumsum,
    greedy_pack_bins,
)


def test_distributed_cumsum_matches_serial(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), ((F.col("id") * 37) % 113 + 1).alias("v")
    )
    got = {
        r.id: r.cum
        for r in distributed_cumsum(df, "id", "v", num_partitions=7).collect()
    }
    acc, want = 0, {}
    for i in range(5000):
        want[i] = acc
        acc += (i * 37) % 113 + 1
    assert got == want


def test_cumsum_partition_count_invariance(spark):
    df = spark.range(0, 1000).select(F.col("id"), F.lit(3).alias("v"))
    a = {r.id: r.cum for r in distributed_cumsum(df, "id", "v", num_partitions=2).collect()}
    b = {r.id: r.cum for r in distributed_cumsum(df, "id", "v", num_partitions=13).collect()}
    assert a == b


def test_chunk_pack_layout(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 950), (3, 10), (4, 0), (5, 2000)],
        "doc_id INT, n_tokens LONG",
    )
    rows = {r.doc_id: r for r in chunk_pack(df, "n_tokens", 1024, "doc_id").collect()}
    assert rows[1].start_offset == 0 and rows[1].start_seq == 0 and rows[1].end_seq == 0
    # doc 2: tokens 100..1049 → straddles the 1024 boundary
    assert rows[2].start_seq == 0 and rows[2].end_seq == 1
    assert rows[3].start_offset == 1050 and rows[3].offset_in_seq == 26
    # empty doc occupies no tokens: end_seq == start_seq
    assert rows[4].start_seq == rows[4].end_seq == 1
    # doc 5: 1060..3059 spans seqs 1..2
    assert rows[5].start_seq == 1 and rows[5].end_seq == 2


def test_greedy_bins_respect_budget(spark):
    df = spark.createDataFrame(
        [(i, 1, 300) for i in range(40)], "doc_id INT, ord INT, n_tokens LONG"
    ).withColumn("ord", F.col("doc_id"))
    out = greedy_pack_bins(df, "n_tokens", budget=1000, order_col="ord")
    sums = (
        out.groupBy("pack_id").agg(F.sum("n_tokens").alias("s")).collect()
    )
    assert all(r.s <= 1000 for r in sums)
    assert out.count() == 40  # every doc packed exactly once


def test_greedy_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 1, 5000), (2, 2, 100)], "doc_id INT, ord INT, n_tokens LONG"
    )
    out = greedy_pack_bins(df, "n_tokens", budget=1000, order_col="ord", n_groups=1)
    rows = {r.doc_id: r.pack_id for r in out.collect()}
    assert rows[1] != rows[2]  # the 5000-token doc can't share its bin


def test_greedy_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, i, (i * 53) % 700 + 1) for i in range(200)],
        "doc_id INT, ord INT, n_tokens LONG",
    )
    a = sorted((r.doc_id, r.pack_id) for r in
               greedy_pack_bins(df, "n_tokens", 1000, "ord").collect())
    b = sorted((r.doc_id, r.pack_id) for r in
               greedy_pack_bins(df.repartition(17), "n_tokens", 1000, "ord").collect())
    assert a == b


def test_no_global_single_partition_window(spark):
    """chunk_pack's plan must not contain a global (empty partition spec)
    window — the whole point of the two-phase scan."""
    df = spark.range(0, 100).select(F.col("id"), F.lit(5).alias("v"))
    plan = (
        chunk_pack(df, "v", 64, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window [" not in plan or "partitionBy" not in plan.lower() or True
    # concrete check: every Window operator carries a partition spec
    import re
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert m.group(1).strip().startswith("_pid"), m.group(0)


def test_assign_row_ids_contiguous_and_ordered(spark):
    """Ids are a permutation of 1..n following the order key, across
    many range partitions."""
    from pyspark.sql import functions as F

    from library_beam_spark.operators.packing import assign_row_ids

    n = 5000
    df = (
        spark.range(n)
        .withColumn("key", (F.col("id") * 37) % 10007)
        .select("id", "key")
    )
    out = assign_row_ids(df, "key", num_partitions=16).collect()
    assert sorted(r["row_id"] for r in out) == list(range(1, n + 1))
    by_key = sorted(out, key=lambda r: r["key"])
    assert [r["row_id"] for r in by_key] == list(range(1, n + 1))


def test_assign_row_ids_no_global_window(spark):
    """The data-sized window must be partitioned on _pid; the only
    SinglePartition exchange feeds the n_partitions-row offsets table
    (the range exchange itself is hidden behind the checkpoint that
    pins the sampled boundaries — see distributed_cumsum)."""
    from pyspark.sql import functions as F

    from library_beam_spark.operators.packing import assign_row_ids

    df = spark.range(100).withColumn("key", F.col("id"))
    plan = (
        assign_row_ids(df, "key", num_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(_pid" in plan
    # the unpartitioned window rides the tiny offsets aggregate only
    assert plan.count("Exchange SinglePartition") == 1


def test_epoch_shuffle_balance_and_epoch_independence(spark):
    """Shard sizes balanced to ±1 by construction; positions are a
    permutation of 1..N; a different epoch yields a genuinely different
    permutation while the same epoch replays identically."""
    from library_beam_spark.operators.packing import epoch_shuffle
    from library_beam_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    n = docs.count()
    e1 = epoch_shuffle(docs, "doc_id", epoch=1, n_shards=7)
    rows = e1.select("doc_id", "position", "shard").collect()
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    sizes = {}
    for r in rows:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    assert set(sizes) == set(range(7))
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes

    replay = {
        (r.doc_id, r.position)
        for r in epoch_shuffle(docs, "doc_id", epoch=1, n_shards=7)
        .select("doc_id", "position")
        .collect()
    }
    assert replay == {(r.doc_id, r.position) for r in rows}

    e2 = {
        r.doc_id: r.position
        for r in epoch_shuffle(docs, "doc_id", epoch=2, n_shards=7)
        .select("doc_id", "position")
        .collect()
    }
    moved = sum(1 for r in rows if e2[r.doc_id] != r.position)
    assert moved > n * 0.9  # almost everything moves between epochs
