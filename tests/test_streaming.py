"""Streaming semantics pinned against batch results (availableNow on
bounded inputs ⇒ streaming == batch)."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def citation_stream_dir(tmp_path_factory):
    """Two 'arriving' update files of parsed-citation JSON."""
    d = tmp_path_factory.mktemp("citations")
    f1 = [
        {"pub_id": "1", "filename": "pubmed24n0001.xml.gz", "is_deleted": False,
         "title": "v1 of one"},
        {"pub_id": "2", "filename": "pubmed24n0001.xml.gz", "is_deleted": False,
         "title": "v1 of two"},
    ]
    f2 = [
        {"pub_id": "1", "filename": "pubmed24n1101.xml.gz", "is_deleted": False,
         "title": "v2 of one", "pub_date": "2024-06-01", "doi": "10.1/x",
         "keywords": ["k1", "k2"],
         "journal": {"title": "J Test", "medlineAbbreviation": "JT"},
         "authors": [{"LastName": "Doe", "ForeName": "Jane", "Initials": "J",
                      "CollectiveName": None, "Suffix": None, "Identifier": None,
                      "affiliation": None, "short_name": "J Doe",
                      "full_name": "Jane Doe"}]},
        {"pub_id": "2", "filename": "pubmed24n1101.xml.gz", "is_deleted": True,
         "title": None},
        {"pub_id": "3", "filename": "pubmed24n1101.xml.gz", "is_deleted": False,
         "title": "new three"},
    ]
    for name, rows in (("b1.json", f1), ("b2.json", f2)):
        with open(os.path.join(d, name), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    return str(d)


def _run_available_now(writer, name):
    q = writer.trigger(availableNow=True).format("memory").queryName(name).start()
    q.awaitTermination(120)
    return q


def test_stateful_latest_version_upsert(spark, citation_stream_dir):
    from library_beam_spark.streaming.updates import (
        latest_version_upsert,
        stream_raw_citations,
    )

    stream = stream_raw_citations(spark, citation_stream_dir)
    upserts = latest_version_upsert(stream)
    _run_available_now(upserts.writeStream.outputMode("update"), "upserts")
    out = {r["pub_id"]: r for r in spark.table("upserts").collect()}
    # winners: 1 → v2; 2 → tombstone retraction; 3 → new
    assert out["1"]["title"] == "v2 of one"
    assert out["1"]["filename"] == "pubmed24n1101.xml.gz"
    assert out["2"]["is_deleted"] is True
    assert out["3"]["title"] == "new three"
    # the FULL record survives the state round-trip, not just a whitelist:
    # dates, nested structs, arrays of structs (streaming == batch parity)
    import datetime

    assert out["1"]["pub_date"] == datetime.date(2024, 6, 1)
    assert out["1"]["doi"] == "10.1/x"
    assert list(out["1"]["keywords"]) == ["k1", "k2"]
    assert out["1"]["journal"]["title"] == "J Test"
    assert out["1"]["authors"][0]["full_name"] == "Jane Doe"


def test_foreach_batch_merge(spark, citation_stream_dir, tmp_path):
    from library_beam_spark.streaming.updates import (
        foreach_batch_merge,
        stream_raw_citations,
    )

    table = str(tmp_path / "winners")
    stream = stream_raw_citations(spark, citation_stream_dir)
    q = foreach_batch_merge(stream, table).trigger(availableNow=True).start()
    q.awaitTermination(120)
    winners = {r["pub_id"]: r for r in spark.read.parquet(table).collect()}
    assert winners["1"]["title"] == "v2 of one"
    assert winners["2"]["is_deleted"] is True  # tombstone retained as marker
    assert winners["3"]["title"] == "new three"


def test_streaming_windows_match_batch(spark):
    """Tumbling window over a bounded stream == the batch registry query."""
    from library_beam_spark import registry
    from library_beam_spark.streaming.windows import tumbling_counts
    from library_beam_spark.tables import table as load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    # bounded stream from the same data (via an in-memory-ish parquet echo)
    tmp = "/tmp/_stream_events_echo"
    events.write.mode("overwrite").parquet(tmp)
    stream = spark.readStream.schema(events.schema).parquet(tmp)
    out = tumbling_counts(stream)
    _run_available_now(out.writeStream.outputMode("complete"), "tumbling")
    got = {
        (r["ws"], r["event_type"]): r["n"] for r in spark.table("tumbling").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in registry.queries()["tumbling_window"](spark, sf).collect()
    }
    assert got == want


def test_sliding_and_session_streams_match_batch(spark):
    from library_beam_spark import registry
    from library_beam_spark.streaming.windows import session_counts, sliding_counts
    from library_beam_spark.tables import table as load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    tmp = "/tmp/_stream_events_echo2"
    events.write.mode("overwrite").parquet(tmp)
    stream = spark.readStream.schema(events.schema).parquet(tmp)

    q1 = _run_available_now(
        sliding_counts(stream).writeStream.outputMode("complete"), "sliding_s"
    )
    got = {(r["ws"], r["event_type"]): r["n"] for r in spark.table("sliding_s").collect()}
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in registry.queries()["sliding_window"](spark, sf).collect()
    }
    assert got == want

    stream2 = spark.readStream.schema(events.schema).parquet(tmp)
    q2 = _run_available_now(
        session_counts(stream2).writeStream.outputMode("complete"), "session_s"
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.table("session_s").collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in registry.queries()["session_windows"](spark, sf).collect()
    }
    assert got == want


def test_foreach_batch_merge_incremental_buckets(spark, tmp_path):
    """The bucketed merge touches ONLY the buckets whose keys appear in a
    micro-batch: after a second merge over one key, every other bucket's
    files are byte-identical (same path, same bytes)."""
    import hashlib
    import json as _json
    import os

    from library_beam_spark.streaming.updates import (
        foreach_batch_merge,
        stream_raw_citations,
    )

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "winners")

    def write_file(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    def run_merge():
        # one shared checkpoint: the second run processes ONLY new files
        stream = stream_raw_citations(spark, str(src))
        q = foreach_batch_merge(stream, table, n_buckets=8).trigger(
            availableNow=True
        ).option("checkpointLocation", str(tmp_path / "ckpt")).start()
        q.awaitTermination(120)

    def snapshot():
        out = {}
        for root, _, files in os.walk(table):
            for f in files:
                p = os.path.join(root, f)
                out[os.path.relpath(p, table)] = hashlib.md5(
                    open(p, "rb").read()
                ).hexdigest()
        return out

    # seed 40 keys across buckets
    write_file("b1.json", [
        {"pub_id": str(i), "filename": "f0001.xml.gz", "is_deleted": False,
         "title": f"v1 of {i}"} for i in range(40)
    ])
    run_merge()
    before = snapshot()
    buckets_before = {p.split(os.sep)[0] for p in before}
    assert len(buckets_before) > 2  # keys actually spread over buckets

    # update ONE key
    write_file("b2.json", [
        {"pub_id": "7", "filename": "f0002.xml.gz", "is_deleted": False,
         "title": "v2 of 7"}
    ])
    run_merge()
    after = snapshot()

    from pyspark.sql import functions as F
    w = spark.read.parquet(table)
    assert w.filter(F.col("pub_id") == "7").collect()[0]["title"] == "v2 of 7"
    assert w.count() == 40

    # which bucket holds key '7'?
    hot = w.filter(F.col("pub_id") == "7").collect()[0]["bucket"]
    for path, digest in before.items():
        b = path.split(os.sep)[0]
        if b != f"bucket={hot}":
            assert after.get(path) == digest, f"untouched {path} changed"
    # and the hot bucket DID change
    hot_paths = [p for p in after if p.startswith(f"bucket={hot}")]
    assert hot_paths and any(before.get(p) != after[p] for p in hot_paths)
