"""REAL library-free media decoders (operators/multimodal.py r7):
golden-payload decode for PPM/BMP/PNG/GIF/JPEG-header/WAV, the
nearest-neighbor PPM resize, and the Spark plumbing. No PIL/ffmpeg —
these formats are raw structs or stdlib-zlib streams."""

import struct
import zlib

import numpy as np
from pyspark.sql import functions as F

from library_beam_spark.operators.multimodal import (
    decode_image_bytes,
    decode_wav_bytes,
)


def _ppm(w, h, rgb):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def _bmp24(w, h, rgb):
    stride = (w * 3 + 3) & ~3
    row = (bytes(rgb[::-1]) * w) + b"\0" * (stride - w * 3)
    pixels = row * h
    off = 54
    header = (
        b"BM" + struct.pack("<IHHI", off + len(pixels), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                      2835, 2835, 0, 0)
    )
    return header + pixels


def _png(w, h, rgb):
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _wav(rate, samples):
    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_ppm_bmp_png_decode_agree():
    """The same 5×3 solid-color image through three encodings decodes to
    identical dimensions and channel means."""
    for enc in (_ppm, _bmp24, _png):
        m = decode_image_bytes(enc(5, 3, (200, 100, 50)))
        assert (m["width"], m["height"], m["channels"]) == (5, 3, 3), m
        assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (200, 100, 50), m


def test_png_up_filter_and_gradient_means():
    """Non-trivial PNG: per-row filter types exercise the unfilter path;
    means are exact integer floor of the gradient sum."""
    w, h = 4, 4
    rows = []
    for y in range(h):
        rows.append(bytes([(x * 17 + y * 31) % 256 for x in range(w * 3)]))
    raw = b"".join(b"\x00" + r for r in rows)

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    m = decode_image_bytes(payload)
    px = np.array(
        [[(x * 17 + y * 31) % 256 for x in range(w * 3)] for y in range(h)],
        dtype=np.int64,
    ).reshape(h, w, 3).reshape(-1, 3)
    want = px.sum(axis=0) // (w * h)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == tuple(int(v) for v in want)


def test_gif_and_jpeg_header_dims():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    m = decode_image_bytes(gif)
    assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 240, 360) + b"\x03" + b"\0" * 9
    )
    m = decode_image_bytes(jpeg)
    assert (m["format"], m["width"], m["height"], m["channels"]) == (
        "jpeg", 360, 240, 3,
    )


def test_ppm_dims_ending_in_255_resize_correctly():
    """Header 'P6\\n2 255\\n255\\n': a literal b'255\\n' search anchors on
    the HEIGHT token (offset 9) instead of the maxval line (offset 13)
    and reads header bytes as pixels — the offset must come from the
    3-token header scan."""
    from library_beam_spark.operators.multimodal import _ppm_header

    payload = _ppm(2, 255, (7, 8, 9))
    w, h, maxv, off = _ppm_header(payload)
    assert (w, h, maxv) == (2, 255, 255)
    assert payload[off:off + 3] == bytes((7, 8, 9))
    m = decode_image_bytes(payload)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (7, 8, 9)


def test_ppm_resize_255_dims_spark(spark):
    from library_beam_spark.operators.multimodal import resize_nearest_ppm

    df = spark.createDataFrame(
        [(1, bytearray(_ppm(2, 255, (7, 8, 9))))],
        "doc_id long, payload binary",
    )
    out = resize_nearest_ppm(df, out_w=2, out_h=5).collect()[0].resized
    m = decode_image_bytes(bytes(out))
    assert (m["width"], m["height"]) == (2, 5)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (7, 8, 9)


def test_jpeg_fill_bytes_and_restart_markers():
    """0xFF fill padding before markers and standalone RST/TEM markers
    (no length field) must not break the SOF walk."""
    sof = (
        b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 111, 222) + b"\x03" + b"\0" * 9
    )
    # fill bytes before APP0, a TEM and an RST4 before SOF0
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill run collapsing onto the next marker
        + b"\xe0" + struct.pack(">H", 16) + b"JFIF\0" + b"\0" * 9
        + b"\xff\x01"  # TEM, standalone
        + b"\xff\xd4"  # RST4, standalone
        + sof
    )
    m = decode_image_bytes(jpeg)
    assert (m["format"], m["width"], m["height"], m["channels"]) == (
        "jpeg", 222, 111, 3,
    )


def test_dsir_gumbel_uniform_open_interval():
    """u = (h + 0.5)/HASH_SPACE never reaches 0 or 1, so the double log
    -ln(-ln(u)) is finite for EVERY hash value — h = HASH_SPACE - 1
    under the old (h+1) mapping made u = 1.0 and ln(0)."""
    import math

    from library_beam_spark.operators.sampling import HASH_SPACE

    for h in (0, 1, HASH_SPACE - 1):
        u = (h + 0.5) / HASH_SPACE
        assert 0.0 < u < 1.0
        assert math.isfinite(-math.log(-math.log(u)))


def test_wav_pcm16_exact_stats():
    payload = _wav(8000, [0, 1000, -2000, 3000])
    m = decode_wav_bytes(payload)
    assert m["sample_rate"] == 8000 and m["n_samples"] == 4
    assert m["duration_ms"] == 0  # 4 samples @ 8 kHz → 0 ms floor
    assert m["peak_abs"] == 3000
    assert m["sum_sq"] == str(1000**2 + 2000**2 + 3000**2)
    long = _wav(8000, [100] * 8000)
    assert decode_wav_bytes(long)["duration_ms"] == 1000


def test_resize_nearest_ppm_spark(spark):
    from library_beam_spark.operators.multimodal import (
        decode_image_metadata_real,
        resize_nearest_ppm,
    )

    rows = [(1, bytearray(_ppm(8, 6, (10, 20, 30)))),
            (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = resize_nearest_ppm(df, out_w=4, out_h=3)
    got = {r.doc_id: r.resized for r in out.collect()}
    assert got[2] is None
    m = decode_image_bytes(bytes(got[1]))
    assert (m["width"], m["height"]) == (4, 3)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (10, 20, 30)

    meta = decode_image_metadata_real(df).collect()
    by_id = {r.doc_id: r.image_meta for r in meta}
    assert by_id[1]["format"] == "ppm" and by_id[1]["width"] == 8
    assert by_id[2] is None  # corrupt payload → null meta, row kept
