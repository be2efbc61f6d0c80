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
