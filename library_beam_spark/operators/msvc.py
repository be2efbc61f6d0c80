"""REAL Microsoft Video 1 (CRAM, 16-bit RGB555) decode in AVI — TRUE
motion-compensated video: the codec's SKIP codes copy the PREVIOUS
frame's 4×4 block verbatim (temporal prediction proper, unlike GIF
disposal composition which only composes full painted rects), so a
decoder without inter-frame state reconstructs every skipped block
wrong. This retires the "block-motion video" slice of the video
honest slot (operators/multimodal.py real-decoder note); full motion
VECTORS (MPEG-style displaced references) remain codec-library
territory.

Bitstream (the public MSVC/CRAM layout, FOURCC 'CRAM'/'MSVC'/'WHAM',
documented by the MS Video for Windows DIB specs and independent
decoder writeups): 4×4 blocks walk left→right, block rows BOTTOM→TOP;
within a block the 16 mask bits cover pixel rows bottom→top, each
left→right, LSB first. Per block, one little-endian word (byte_a,
byte_b) dispatches:

    (byte_b & 0xFC) == 0x84      SKIP  n = ((byte_b − 0x84) << 8) +
                                 byte_a blocks (current block counts)
    byte_b <  0x80               mask word; then color word c0, c1 —
                                 c0 bit 15 CLEAR: 2-color (mask bit 1
                                 → c0, 0 → c1); c0 bit 15 SET: 8-color
                                 (6 more words; each 2×2 quadrant has
                                 its own color pair, quadrant index
                                 ((py & 2) << 1) + (px & 2))
    otherwise                    1-color block, the word IS the RGB555
                                 color (bit 15 ignored) — note colors
                                 0x0400–0x07FF are UNREPRESENTABLE as
                                 1-color blocks (they'd collide with
                                 the skip code), a real quirk of the
                                 format that encoders dodge

RGB555 channels: r = (c >> 10) & 31, g = (c >> 5) & 31, b = c & 31 —
pure integers, so the oracle (registry q:video_msvc_decode) replays
the skip/fill recurrence as an arg-max over fill times plus
bit_count() popcounts, no float anywhere. Goldens over hand-built
streams with nontrivial inter-frame deltas live in
tests/test_msvc.py.

Scale shape: per-row Arrow-batched mapInPandas — the inter-frame
state is per payload, inside one executor task; no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..util import ensure_min_parallelism


def decode_msvc_frame(data: bytes, canvas) -> None:
    """Decode ONE CRAM-16 frame IN PLACE onto ``canvas`` (numpy
    (h, w) uint16 RGB555 — the previous frame's pixels, which skip
    codes leave untouched). Raises ValueError on truncation or a
    stream that does not cover the block grid exactly."""
    h, w = canvas.shape
    if h % 4 or w % 4:
        raise ValueError("MSVC: dimensions must be multiples of 4")
    bw, bh = w // 4, h // 4
    pos = 0
    skip = 0
    for brow in range(bh):
        y0 = h - 4 * (brow + 1)  # block rows run bottom -> top
        for bcol in range(bw):
            if skip:
                skip -= 1
                continue
            if pos + 2 > len(data):
                raise ValueError("MSVC: truncated block stream")
            byte_a, byte_b = data[pos], data[pos + 1]
            pos += 2
            if (byte_b & 0xFC) == 0x84:
                skip = ((byte_b - 0x84) << 8) + byte_a
                if skip == 0:
                    raise ValueError("MSVC: zero-length skip code")
                skip -= 1  # the current block is the first skipped
                continue
            x0 = 4 * bcol
            if byte_b < 0x80:
                mask = (byte_b << 8) | byte_a
                if pos + 4 > len(data):
                    raise ValueError("MSVC: truncated color words")
                c0 = data[pos] | (data[pos + 1] << 8)
                c1 = data[pos + 2] | (data[pos + 3] << 8)
                pos += 4
                if c0 & 0x8000:  # 8-color: 2x2 quadrant color pairs
                    if pos + 12 > len(data):
                        raise ValueError("MSVC: truncated color words")
                    colors = [c0 & 0x7FFF, c1]
                    for j in range(6):
                        colors.append(
                            data[pos + 2 * j] | (data[pos + 2 * j + 1] << 8)
                        )
                    pos += 12
                    bit = 0
                    for py in range(4):  # bottom row of the block first
                        y = y0 + 3 - py
                        for px in range(4):
                            q = ((py & 2) << 1) + (px & 2)
                            sel = q + (((mask >> bit) & 1) ^ 1)
                            canvas[y, x0 + px] = colors[sel]
                            bit += 1
                else:  # 2-color
                    bit = 0
                    for py in range(4):
                        y = y0 + 3 - py
                        for px in range(4):
                            canvas[y, x0 + px] = (
                                c0 if (mask >> bit) & 1 else c1
                            )
                            bit += 1
            else:  # 1-color: the dispatch word is the color
                canvas[
                    y0 : y0 + 4, x0 : x0 + 4
                ] = ((byte_b << 8) | byte_a) & 0x7FFF
    if skip:
        raise ValueError("MSVC: skip run past the block grid")
    if pos != len(data):
        raise ValueError("MSVC: trailing bytes after the block grid")


def decode_avi_msvc_bytes(payload: bytes) -> dict:
    """REAL MS Video 1 AVI decode: the RIFF chunk walk (strf
    biCompression must be CRAM/MSVC/WHAM at 16 bpp), then each
    '00dc' frame decoded onto the RUNNING canvas — skip codes are only
    correct because the previous frame's pixels are still there.
    Returns {width, height, n_frames, frames: [(h, w) uint16 RGB555
    copies]}. Raises ValueError on other codecs or undecodable
    frames — no silent fallback."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    w = h = n_frames = None
    codec = None
    bits = None
    frames_raw: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, n_frames, codec, bits
        i = lo
        while i + 8 <= hi:
            fourcc = payload[i : i + 4]
            size, = struct.unpack_from("<I", payload, i + 4)
            body_lo, body_hi = i + 8, i + 8 + size
            if body_hi > hi:
                raise ValueError("AVI chunk overruns its parent")
            if fourcc == b"LIST":
                walk(body_lo + 4, body_hi)
            elif fourcc == b"avih":
                _, _, _, _, n_frames, _, _, _, w, h = struct.unpack_from(
                    "<10I", payload, body_lo
                )
            elif fourcc == b"strf" and size >= 20:
                bits, = struct.unpack_from("<H", payload, body_lo + 14)
                codec = payload[body_lo + 16 : body_lo + 20]
            elif fourcc in (b"00db", b"00dc"):
                frames_raw.append(payload[body_lo:body_hi])
            i = body_hi + (size & 1)

    walk(12, len(payload))
    if w is None or not frames_raw:
        raise ValueError("AVI without avih header or frames")
    if codec not in (b"CRAM", b"MSVC", b"WHAM"):
        raise ValueError(f"not an MS Video 1 stream (codec {codec!r})")
    if bits != 16:
        raise ValueError("MSVC: 16-bit RGB555 streams only")
    canvas = np.zeros((h, w), dtype=np.uint16)
    frames = []
    for raw in frames_raw:
        decode_msvc_frame(raw, canvas)
        frames.append(canvas.copy())
    return {
        "width": int(w), "height": int(h),
        "n_frames": int(n_frames), "frames": frames,
    }


def build_msvc_frame(blocks: list) -> bytes:
    """Assemble one CRAM-16 frame from per-block specs IN STREAM ORDER
    (bottom block row first): each entry is ('skip',), ('c1', rgb),
    ('c2', mask, c0, c1) or ('c8', mask, [c0..c7]); consecutive skips
    are run-length packed into one skip code (exercising multi-block
    skip counts on the decode path)."""
    out = bytearray()
    i = 0
    while i < len(blocks):
        b = blocks[i]
        if b[0] == "skip":
            n = 0
            while i < len(blocks) and blocks[i][0] == "skip":
                n += 1
                i += 1
            while n:
                run = min(n, 1023)
                out += bytes([run & 0xFF, 0x84 | (run >> 8)])
                n -= run
            continue
        if b[0] == "c1":
            word = 0x8000 | (b[1] & 0x7FFF)
            if (word >> 8) & 0xFC == 0x84:
                raise ValueError(
                    "color 0x0400-0x07FF is unrepresentable as 1-color"
                )
            out += bytes([word & 0xFF, word >> 8])
        elif b[0] == "c2":
            _, mask, c0, c1 = b
            if mask >= 0x8000 or c0 & 0x8000:
                raise ValueError("2-color: mask < 0x8000, c0 bit15 clear")
            out += bytes([mask & 0xFF, mask >> 8])
            out += bytes([c0 & 0xFF, c0 >> 8, c1 & 0xFF, c1 >> 8])
        elif b[0] == "c8":
            _, mask, colors = b
            if mask >= 0x8000:
                raise ValueError("8-color: mask < 0x8000")
            out += bytes([mask & 0xFF, mask >> 8])
            first = 0x8000 | (colors[0] & 0x7FFF)
            out += bytes([first & 0xFF, first >> 8])
            for c in colors[1:8]:
                out += bytes([c & 0xFF, c >> 8])
        else:
            raise ValueError(f"unknown block kind {b[0]!r}")
        i += 1
    return bytes(out)


def build_msvc_avi(frames: list, w: int, h: int, fps: int = 5) -> bytes:
    """Wrap encoded CRAM frames in the minimal standards-shaped AVI of
    operators/multimodal.synthesize_avi_mjpeg (avih + strl with
    fccHandler/biCompression 'CRAM', 16 bpp, dwSampleSize = 0 for
    variable-size compressed samples)."""
    import struct

    usec = 1_000_000 // fps
    n = len(frames)
    movi_items = b"".join(
        b"00dc" + struct.pack("<I", len(fr)) + fr + b"\x00" * (len(fr) & 1)
        for fr in frames
    )
    movi = (
        b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi"
        + movi_items
    )
    bufsz = max((len(fr) for fr in frames), default=0)
    strf_data = struct.pack(
        "<Iii2H", 40, w, h, 1, 16
    ) + b"CRAM" + struct.pack("<IiiII", 0, 0, 0, 0, 0)
    strf = b"strf" + struct.pack("<I", len(strf_data)) + strf_data
    strh_data = (
        b"vids" + b"CRAM"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n, bufsz, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strh = b"strh" + struct.pack("<I", len(strh_data)) + strh_data
    strl = (
        b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf))
        + b"strl" + strh + strf
    )
    avih_data = struct.pack(
        "<14I", usec, bufsz * fps, 0, 0, n, 0, 1, bufsz, w, h, 0, 0, 0, 0
    )
    avih = b"avih" + struct.pack("<I", len(avih_data)) + avih_data
    hdrl = (
        b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl))
        + b"hdrl" + avih + strl
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _law_block(seed: int, b: int, u: int) -> tuple:
    """The content law shared with the SQL oracle: block b of frame u
    (b is the STREAM index — bottom-up walk) is skipped or re-filled
    with 1-/2-/8-color content, all parameters closed-form integers.
    Frame 0 always fills (there is no previous frame to skip into)."""
    kind = (seed + b) % 3 + 2 if u == 0 else (seed + 5 * u + 7 * b) % 5
    if kind < 2:
        return ("skip",)
    if kind == 2:
        return ("c1", ((seed + 97 * b + 13 * u) % 32768) | 2048)
    mask = (3 * seed + 31 * b + 17 * u) % 32768
    if kind == 3:
        return (
            "c2", mask,
            (seed + 53 * b + 29 * u) % 32768,
            (seed + 71 * b + 41 * u) % 32768,
        )
    return (
        "c8", mask,
        [
            (seed + (59 + 8 * j) * b + (23 + j) * u + 7 * j * j) % 32768
            for j in range(8)
        ],
    )


def synthesize_avi_msvc(
    df: DataFrame,
    bw_col: str = "bw",
    bh_col: str = "bh",
    n_col: str = "n_frames",
    seed_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL MS Video 1 AVI per row from the _law_block content
    law — every frame after the first mixes SKIP runs (true temporal
    prediction: those blocks must show the LAST fill's pixels) with
    1-/2-/8-color refills, so a decoder that resets the canvas between
    frames, miscounts a skip run, or mixes up the bottom-up walk
    produces wrong band statistics and fails the hash."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            payloads = []
            for seed, bw, bh, nf in zip(
                pdf[seed_col], pdf[bw_col], pdf[bh_col], pdf[n_col]
            ):
                seed, bw, bh, nf = int(seed), int(bw), int(bh), int(nf)
                frames = [
                    build_msvc_frame(
                        [_law_block(seed, b, u) for b in range(bw * bh)]
                    )
                    for u in range(nf)
                ]
                payloads.append(build_msvc_avi(frames, 4 * bw, 4 * bh))
            out[payload_col] = payloads
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def msvc_band_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode MS Video 1 payloads and emit one row per (frame, 4-pixel
    image band) with exact integer RGB555 channel sums — band-grained
    so the BOTTOM-UP block walk is hash-visible (a top-down decoder
    lands every block in the mirrored band), while skip blocks prove
    temporal prediction (their sums must equal the last fill's).
    Undecodable payloads drop their rows; per-row, Arrow-batched,
    shuffle-free."""
    import numpy as np

    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("band_y", IntegerType()),
            StructField("n_px", IntegerType()),
            StructField("sum_r", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_b", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            col_idx = {c: k + 1 for k, c in enumerate(pdf.columns)}
            for row in pdf.itertuples(index=True, name=None):
                raw = row[col_idx[payload_col]]
                try:
                    d = decode_avi_msvc_bytes(
                        bytes(raw) if raw is not None else b""
                    )
                except Exception:
                    continue
                for f, px in enumerate(d["frames"]):
                    v = px.astype(np.int64)
                    r = (v >> 10) & 31
                    g = (v >> 5) & 31
                    bl = v & 31
                    for band in range(px.shape[0] // 4):
                        sl = slice(4 * band, 4 * band + 4)
                        rows.append(
                            {
                                **{c: row[col_idx[c]] for c in id_cols},
                                "frame_idx": f,
                                "band_y": band,
                                "n_px": int(4 * px.shape[1]),
                                "sum_r": int(r[sl].sum()),
                                "sum_g": int(g[sl].sum()),
                                "sum_b": int(bl[sl].sum()),
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=id_cols
                + ["frame_idx", "band_y", "n_px", "sum_r", "sum_g", "sum_b"],
            )

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)
