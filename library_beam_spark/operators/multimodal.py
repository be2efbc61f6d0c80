"""Multimodal column operators (LLM-data extension; BASELINE.json north
star — the reference is text-only).

Contract: media travel as opaque ``binary`` columns with a typed
metadata struct alongside. Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` kernels so the bytes
never round-trip through the JVM row format.

This container has no image/audio libraries, so the DECODERS are
deterministic fakes (clearly marked: payload-hash-derived dimensions) —
the Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; swapping in PIL/ffmpeg later changes
only `_fake_decode_*` bodies.

Scale notes:
- bytes stay in Arrow buffers end-to-end; `maxRecordsPerBatch` bounds
  per-batch memory (a 10 MB-image batch of 2048 rows would be 20 GB —
  callers repartition/limit batch size via `target_batch_bytes`);
- decode is per-row, shuffle-free; only the optional dedup-by-content
  aggregation shuffles (32-byte digests, uniform).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..util import ensure_min_parallelism

IMAGE_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha1", StringType()),
    ]
)

FRAME = StructType(
    [
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("data", BinaryType()),
    ]
)


def _fake_decode_image(payload: bytes) -> dict:
    """STUB decoder — deterministic dimensions derived from the payload
    hash. Replace with PIL.Image.open when the imaging stack exists.
    Raises on empty payloads exactly like a real decoder would."""
    if not payload:
        raise ValueError("empty image payload")
    h = hashlib.sha1(payload).digest()
    return {
        "format": ("png", "jpeg", "webp")[h[0] % 3],
        "width": 64 + (h[1] * 256 + h[2]) % 448,
        "height": 64 + (h[3] * 256 + h[4]) % 448,
        "n_bytes": len(payload),
        "sha1": hashlib.sha1(payload).hexdigest(),
    }


def decode_image_metadata(
    df: DataFrame, payload_col: str = "payload", meta_col: str = "image_meta"
) -> DataFrame:
    """binary payload → typed metadata struct (decode kernel shape)."""
    out_schema = StructType(df.schema.fields + [StructField(meta_col, IMAGE_META)])
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf[payload_col]:
                try:
                    metas.append(_fake_decode_image(bytes(payload) if payload is not None else b""))
                except Exception:
                    metas.append(None)  # corrupt payload → null meta, row kept
            out = pdf[cols].copy()
            out[meta_col] = metas
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """video payload → exploded frame rows (1→n mapInPandas flatMap).
    STUB frame extraction: slices the payload deterministically; the
    output shape (one row per sampled frame, ts_ms spacing) is the real
    contract a real ffmpeg-backed kernel would honor."""
    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != payload_col] + list(FRAME.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # itertuples, not iterrows: no per-row Series construction (the
        # real ffmpeg kernel inherits this batch loop as-is)
        for pdf in batches:
            rows = []
            col_idx = {c: k + 1 for k, c in enumerate(pdf.columns)}
            for row in pdf.itertuples(index=True, name=None):
                raw = row[col_idx[payload_col]]
                payload = bytes(raw) if raw is not None else b""
                n = min(max_frames, max(1, len(payload) // 64))
                ids = {c: row[col_idx[c]] for c in id_cols}
                for i in range(n):
                    rows.append(
                        {
                            **ids,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "data": payload[i * 64 : (i + 1) * 64],
                        }
                    )
            yield pd.DataFrame(rows, columns=id_cols + ["frame_idx", "ts_ms", "data"])

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def dedup_by_content(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact media dedup: sha1 over bytes (JVM-side, no Python), keep the
    lexicographically-first id per digest."""
    return (
        df.withColumn("_digest", F.sha1(F.col(payload_col)))
        .groupBy("_digest")
        .agg(F.min_by(F.struct(*df.columns), F.struct(*df.columns)).alias("_r"))
        .select("_r.*", "_digest")
        .withColumnRenamed("_digest", "content_sha1")
    )


def payload_stats_arrow(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """``mapInArrow`` digest/size pass over binary payloads — the
    Arrow-NATIVE UDF surface (SURVEY §2.10), distinct from the
    mapInPandas kernels above: record batches arrive as pyarrow
    buffers and the payload bytes are hashed without ever
    materializing a pandas object column (for large binaries the
    object-dtype copy is the dominant cost of the pandas path).

    Appends ``sha256`` (lowercase hex) and ``n_bytes``. Both are
    chosen because the JVM computes them natively too — the parity
    test pins this Python-Arrow path against ``F.sha2``/``F.length``
    bit-for-bit, so the mechanism is verified, not trusted.
    """
    import pyarrow as pa
    from pyspark.sql.types import LongType

    names = df.columns
    for col in ("sha256", "n_bytes"):
        if col in names:
            raise ValueError(f"input already has output column {col!r}")
    idx = names.index(payload_col)
    out_schema = StructType(
        df.schema.fields
        + [StructField("sha256", StringType()),
           StructField("n_bytes", LongType())]
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            col = b.column(idx)
            # hash zero-copy views of the Arrow value buffer — a
            # to_pylist() would allocate a Python bytes copy per row,
            # the exact object-materialization cost this path avoids
            digests, lengths = [], []
            for v in col:
                if not v.is_valid:
                    digests.append(None)
                    lengths.append(None)
                else:
                    buf = v.as_buffer()
                    digests.append(
                        hashlib.sha256(memoryview(buf)).hexdigest()
                    )
                    lengths.append(buf.size)
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(b.num_columns)]
                + [pa.array(digests, type=pa.string()),
                   pa.array(lengths, type=pa.int64())],
                names=names + ["sha256", "n_bytes"],
            )

    return ensure_min_parallelism(df).mapInArrow(run, schema=out_schema)
