"""Multimodal plumbing: binary columns through mapInPandas kernels.
Decoders are deterministic stubs; the schemas/batch shapes are real."""

from pyspark.sql import functions as F


def _media_df(spark):
    from library_beam_spark.tables import table

    # text bytes stand in for media payloads
    return (
        table(spark, "/root/testdata/sf0.001", "documents")
        .limit(50)
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )


def test_decode_image_metadata(spark):
    from library_beam_spark.operators.multimodal import decode_image_metadata

    out = decode_image_metadata(_media_df(spark)).cache()
    assert out.count() == 50
    r = out.first()
    meta = r["image_meta"]
    assert meta["format"] in ("png", "jpeg", "webp")
    assert 64 <= meta["width"] < 512 and 64 <= meta["height"] < 512
    assert meta["n_bytes"] > 0 and len(meta["sha1"]) == 40
    # deterministic: same payload → same meta
    again = decode_image_metadata(_media_df(spark)).first()
    assert again["image_meta"] == meta


def test_decode_corrupt_payload_yields_null(spark):
    from library_beam_spark.operators.multimodal import decode_image_metadata

    df = spark.createDataFrame([(1, b""), (2, b"ok-bytes")], "id long, payload binary")
    rows = {r["id"]: r for r in decode_image_metadata(df).collect()}
    assert rows[1]["image_meta"] is None
    assert rows[2]["image_meta"] is not None


def test_sample_frames_shape(spark):
    from library_beam_spark.operators.multimodal import sample_frames

    out = sample_frames(_media_df(spark), every_ms=500, max_frames=4)
    rows = out.filter(F.col("doc_id") == out.first()["doc_id"]).collect()
    assert 1 <= len(rows) <= 4
    assert [r["ts_ms"] for r in rows] == [i * 500 for i in range(len(rows))]
    assert all(isinstance(r["data"], (bytes, bytearray)) for r in rows)


def test_dedup_by_content(spark):
    from library_beam_spark.operators.multimodal import dedup_by_content

    df = spark.createDataFrame(
        [(1, b"same"), (2, b"same"), (3, b"other")], "id long, payload binary"
    )
    kept = dedup_by_content(df)
    assert kept.count() == 2
    ids = {r["id"] for r in kept.collect()}
    assert ids == {1, 3}  # smallest id wins per digest


def test_payload_stats_arrow_matches_jvm_builtins(spark):
    """The mapInArrow path must agree bit-for-bit with the JVM's own
    sha2/length over the same binary column (mechanism verified, not
    trusted), including NULL payloads."""
    from pyspark.sql import functions as F

    from library_beam_spark.operators.multimodal import payload_stats_arrow

    rows = [
        (1, b"hello world"),
        (2, b""),
        (3, bytes(range(256)) * 41),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        r["id"]: (r["sha256"], r["n_bytes"])
        for r in payload_stats_arrow(df).collect()
    }
    want = {
        r["id"]: (r["ref_sha"], r["ref_len"])
        for r in df.select(
            "id",
            F.lower(F.sha2(F.col("payload"), 256)).alias("ref_sha"),
            F.length("payload").cast("long").alias("ref_len"),
        ).collect()
    }
    assert got == want
    assert got[4] == (None, None)
