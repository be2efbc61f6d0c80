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


def _avi(seed, n, width=3, height=3, fps=5):
    """Golden AVI built independently of the operator code (same wire
    layout, assembled here by hand)."""
    stride = (width * 3 + 3) & ~3
    B = stride * height
    usec = 1_000_000 // fps
    data = np.array(
        [(seed + 37 * k) % 256 for k in range(n * B)], dtype=np.uint8
    ).reshape(n, B)
    movi_items = b"".join(
        b"00db" + struct.pack("<I", B) + data[f].tobytes() for f in range(n)
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi" + movi_items
    strf_d = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, B, 0, 0, 0, 0)
    strf = b"strf" + struct.pack("<I", len(strf_d)) + strf_d
    strh_d = (
        b"vids" + b"DIB "
        # dwQuality=-1 (driver default), dwSampleSize=B (fixed-size DIB)
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n, B, -1, B)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strh = b"strh" + struct.pack("<I", len(strh_d)) + strh_d
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    avih_d = struct.pack("<14I", usec, B * fps, 0, 0, n, 0, 1, B, width, height, 0, 0, 0, 0)
    avih = b"avih" + struct.pack("<I", len(avih_d)) + avih_d
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body, data


def test_avi_decode_pad_strip_flip_and_channel_order():
    """decode_avi_bytes must strip the 4-byte row pad (stride 12 for
    w=3), flip the bottom-up DIB rows, and reverse BGR→RGB — each
    checked against the hand-assembled golden payload."""
    from library_beam_spark.operators.multimodal import decode_avi_bytes

    payload, raw = _avi(seed=11, n=2)
    m = decode_avi_bytes(payload)
    assert (m["width"], m["height"], m["n_frames"]) == (3, 3, 2)
    assert m["usec_per_frame"] == 200_000
    for f in range(2):
        dib = raw[f].reshape(3, 12)[:, :9].reshape(3, 3, 3)
        want = dib[::-1, :, ::-1]  # bottom-up flip + BGR→RGB
        assert (m["frames"][f] == want).all()


def test_avi_sampling_grid_and_corrupt_rows(spark):
    """every_ms coarser than the frame clock samples a strict subset
    with true timestamps; non-AVI payloads drop their rows."""
    from library_beam_spark.operators.multimodal import sample_frames_avi

    payload, _ = _avi(seed=3, n=5)  # 200 ms/frame
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    )
    out = sample_frames_avi(df, every_ms=400, max_frames=8).collect()
    assert {r.doc_id for r in out} == {1}
    got = sorted((r.frame_idx, r.ts_ms) for r in out)
    assert got == [(0, 0), (2, 400), (4, 800)]


def test_avi_frame_stats_match_law(spark):
    """frame_byte_stats over the extracted frames equals the closed-form
    oracle arithmetic (px_sum excludes pad bytes; row0_sum is the last
    stored DIB row)."""
    from library_beam_spark.operators.multimodal import (
        frame_byte_stats,
        sample_frames_avi,
        synthesize_avi,
    )

    seed, n = 19, 3
    d = spark.createDataFrame([(seed, n)], "doc_id long, n_frames int")
    frames = sample_frames_avi(
        synthesize_avi(d, width=3, height=3, fps=5).drop("n_frames"),
        every_ms=200, max_frames=8,
    )
    got = {
        r.frame_idx: (r.px_sum, r.row0_sum)
        for r in frame_byte_stats(frames).collect()
    }
    for f in range(n):
        px = sum((seed + 37 * (f * 36 + j)) % 256 for j in range(36) if j % 12 < 9)
        r0 = sum((seed + 37 * (f * 36 + j)) % 256 for j in range(24, 33))
        assert got[f] == (px, r0)


def test_png_sub_filter_vectorized_unfilter():
    """Filter-type-1 (Sub) rows decode via the per-lane uint8 cumsum;
    checked against a scalar reference reconstruction, including
    mod-256 wraparound."""
    w, h = 5, 3
    rng = [(x * 91 + y * 53 + 200) % 256 for y in range(h) for x in range(w * 3)]
    raw_rows = [bytes(rng[y * w * 3:(y + 1) * w * 3]) for y in range(h)]
    raw = b"".join(b"\x01" + r for r in raw_rows)  # all Sub-filtered

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
    # scalar reference: dec[x] = raw[x] + dec[x-3] mod 256, per row
    total = np.zeros(3, dtype=np.int64)
    for r in raw_rows:
        dec = [0] * (w * 3)
        for x in range(w * 3):
            a = dec[x - 3] if x >= 3 else 0
            dec[x] = (r[x] + a) % 256
        total += np.asarray(dec).reshape(w, 3).sum(axis=0)
    want = total // (w * h)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == tuple(int(v) for v in want)


def _lzw_encode_real(indices, m):
    """Genuinely-compressing GIF LZW encoder for roundtrip tests: greedy
    longest-match dictionary, code widths tracked by SIMULATING the
    decoder's table-growth rule — so the roundtrip exercises dictionary
    growth and the KwKwK case in _gif_lzw_decode (the spec-grounded
    check is the literal-code generator + the closed-form oracle; this
    one targets the compression paths that generator avoids)."""
    clear = 1 << m
    eoi = clear + 1
    S = clear + 2
    dic = {(i,): i for i in range(clear)}
    nxt = S
    codes = [clear]
    buf = ()
    for k in indices:
        cand = buf + (k,)
        if cand in dic:
            buf = cand
            continue
        codes.append(dic[buf])
        dic[cand] = nxt
        nxt += 1
        buf = (k,)
    if buf:
        codes.append(dic[buf])
    codes.append(eoi)
    # pack LSB-first, simulating the decoder's width growth
    width = m + 1
    table = S
    fresh = True
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
        if c == clear:
            width, table, fresh = m + 1, S, True
        elif c != eoi:
            if fresh:
                fresh = False
            else:
                table += 1
            if table == (1 << width) and width < 12:
                width += 1
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_roundtrip_dictionary_growth_and_kwkwk():
    from library_beam_spark.operators.multimodal import _gif_lzw_decode

    cases = [
        [1] * 60,                          # forces KwKwK immediately
        [0, 1, 0, 1, 0, 1, 0, 1] * 12,     # repeated bigrams
        [(k * 7 + 3) % 16 for k in range(400)],   # growth past a width bump
        [(k * k) % 4 for k in range(300)],
    ]
    for idx in cases:
        m = 4 if max(idx) > 3 else 2
        enc = _lzw_encode_real(idx, m)
        assert _gif_lzw_decode(enc, m, len(idx)) == idx


def test_gif_literal_generator_roundtrip_and_spark_means(spark):
    from library_beam_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode_literal,
        decode_image_metadata_real,
        synthesize_gif,
    )

    idx = [(5 + k) % 16 for k in range(37)]
    assert _gif_lzw_decode(_gif_lzw_encode_literal(idx, 4), 4, 37) == idx

    d = spark.createDataFrame([(9, 4, 3)], "doc_id long, width int, height int")
    out = decode_image_metadata_real(synthesize_gif(d).drop("width", "height"))
    m = out.collect()[0].image_meta
    want = tuple(
        sum((c * ((9 + k) % 16) + o) % 256 for k in range(12)) // 12
        for c, o in ((7, 1), (11, 3), (13, 5))
    )
    assert (m["format"], m["width"], m["height"]) == ("gif", 4, 3)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == want


def test_gif_interlaced_rows_permuted():
    """Interlaced GIF decodes for real now: the LZW stream's rows are
    the four GIF89a appendix-E passes, so row r of the STREAM lands at
    image row order[r] — pinned by giving every stream row a distinct
    solid palette index and checking where each lands. A decoder that
    ignores the interlace flag would leave the rows in stream order."""
    import numpy as np

    from library_beam_spark.operators.multimodal import (
        _gif_lzw_encode_literal,
        _gif_pixels,
    )

    w, h = 3, 10
    # stream row r is solid index r (10 rows, 16-color palette)
    indices = [r for r in range(h) for _ in range(w)]
    lzw = _gif_lzw_encode_literal(indices, 4)
    pal = bytes(
        b for i in range(16)
        for b in ((7 * i + 1) % 256, (11 * i + 3) % 256, (13 * i + 5) % 256)
    )
    gif = (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x83, 0, 0) + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)
        + bytes([4])
        + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b"
    )
    px = _gif_pixels(gif)
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    for r, img_row in enumerate(order):
        i = r  # stream row r was solid palette index r
        want = ((7 * i + 1) % 256, (11 * i + 3) % 256, (13 * i + 5) % 256)
        assert (px[img_row] == np.array(want)).all(), (r, img_row)


def test_transcode_to_ppm_cross_format_pixel_identity(spark):
    """The same image through PPM/BMP/PNG/GIF-free encodings transcodes
    to byte-identical canonical PPM; JPEG (no library-free pixel path)
    and corrupt payloads refuse with a null, never fabricated pixels."""
    from library_beam_spark.operators.multimodal import transcode_to_ppm

    rgb = (200, 100, 50)
    jpeg = (
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 3, 5) + b"\x03" + b"\0" * 9
    )
    rows = [
        (1, bytearray(_ppm(5, 3, rgb))),
        (2, bytearray(_bmp24(5, 3, rgb))),
        (3, bytearray(_png(5, 3, rgb))),
        (4, bytearray(jpeg)),
        (5, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.ppm for r in transcode_to_ppm(df).collect()}
    want = _ppm(5, 3, rgb)
    assert bytes(got[1]) == want
    assert bytes(got[2]) == want
    assert bytes(got[3]) == want
    assert got[4] is None and got[5] is None


def test_transcode_gray_and_rgba_png_canonicalize(spark):
    """Gray PNG expands to 3 equal channels; RGBA drops alpha —
    pixel-exact against hand-built references."""
    from library_beam_spark.operators.multimodal import decode_pixels_rgb

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    w, h = 3, 2
    gray_raw = b"".join(
        b"\x00" + bytes((y * w + x) * 9 % 256 for x in range(w))
        for y in range(h)
    )
    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(gray_raw)) + chunk(b"IEND", b"")
    )
    px = decode_pixels_rgb(gray)
    for y in range(h):
        for x in range(w):
            v = (y * w + x) * 9 % 256
            assert tuple(px[y, x]) == (v, v, v)

    rgba_raw = b"".join(
        b"\x00" + bytes(
            b for x in range(w) for b in (x * 10, x * 11, x * 12, 255)
        )
        for _ in range(h)
    )
    rgba = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(rgba_raw)) + chunk(b"IEND", b"")
    )
    px = decode_pixels_rgb(rgba)
    assert px.shape == (h, w, 3)
    for x in range(w):
        assert tuple(px[0, x]) == (x * 10, x * 11, x * 12)


def test_transcode_composes_with_resize(spark):
    """The full chain BMP → canonical PPM → nearest resize runs
    pixel-true: a solid color survives both hops."""
    from library_beam_spark.operators.multimodal import (
        resize_nearest_ppm,
        transcode_to_ppm,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_bmp24(8, 6, (10, 20, 30))))],
        "doc_id long, payload binary",
    )
    ppm = transcode_to_ppm(df).select("doc_id", F.col("ppm").alias("payload"))
    out = resize_nearest_ppm(ppm, out_w=4, out_h=3).collect()[0].resized
    m = decode_image_bytes(bytes(out))
    assert (m["width"], m["height"]) == (4, 3)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == (10, 20, 30)


def test_frame_wav_features_boundaries_and_values(spark):
    """Framing rule pinned: [f·hop, f·hop+frame) windows, partial tail
    dropped, too-short and corrupt payloads drop their rows; per-frame
    stats equal the direct numpy computation."""
    from library_beam_spark.operators.multimodal import frame_wav_features

    samples = [((7 + 37 * k) % 401) - 200 for k in range(25)]
    rows = [
        (1, bytearray(_wav(8000, samples))),
        (2, bytearray(_wav(8000, samples[:9]))),  # < frame → no rows
        (3, bytearray(b"noise")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = frame_wav_features(df, frame=10, hop=5).collect()
    assert {r.doc_id for r in out} == {1}
    # n=25, frame=10, hop=5 → frames at 0,5,10,15 → (25-10)//5+1 = 4
    got = {r.frame_idx: (r.start_ms, r.peak_abs, int(r.sum_sq)) for r in out}
    assert sorted(got) == [0, 1, 2, 3]
    for f in range(4):
        win = samples[f * 5 : f * 5 + 10]
        assert got[f] == (
            (f * 5 * 1000) // 8000,
            max(abs(v) for v in win),
            sum(v * v for v in win),
        )


def test_frame_wav_features_refuses_stereo(spark):
    """Multichannel framing needs a mixdown policy — stereo payloads
    drop rather than silently frame interleaved samples."""
    import struct as _s

    from library_beam_spark.operators.multimodal import frame_wav_features

    data = np.asarray([1, 2] * 50, dtype="<i2").tobytes()  # 2ch interleaved
    stereo = (
        b"RIFF" + _s.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + _s.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame(
        [(1, bytearray(stereo))], "doc_id long, payload binary"
    )
    assert frame_wav_features(df, frame=10, hop=5).count() == 0


def test_avi_period_repeats_frames_exactly(spark):
    """synthesize_avi(period=p) makes frame f byte-identical to frame
    f mod p (and ONLY those — distinct residues stay distinct), while
    period=None keeps every frame distinct; the dedup query's duplicate
    supply rests on this."""
    from library_beam_spark.operators.multimodal import (
        decode_avi_bytes,
        synthesize_avi,
    )

    d = spark.createDataFrame([(7, 6)], "doc_id long, n_frames int")
    looped = synthesize_avi(d, period=2).collect()[0].payload
    frames = decode_avi_bytes(bytes(looped))["frames"]
    assert len(frames) == 6
    for f in range(6):
        assert (frames[f] == frames[f % 2]).all()
    assert not (frames[0] == frames[1]).all()

    flat = synthesize_avi(d).collect()[0].payload
    distinct = decode_avi_bytes(bytes(flat))["frames"]
    payloads = {fr.tobytes() for fr in distinct}
    assert len(payloads) == 6


# --- baseline JPEG: the general decoder paths the DC-only generator -----
# avoids (AC run/length, ZRL, variable-length canonical Huffman, restart
# markers, orientation), each against independently-computed expectations


class _JBits:
    """Test-side MSB-first bit writer with T.81 byte stuffing."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def flush(self):
        while len(self.bits) % 8:
            self.bits.append(1)
        out = bytearray()
        for j in range(0, len(self.bits), 8):
            b = int("".join(map(str, self.bits[j : j + 8])), 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        self.bits = []
        return bytes(out)


def _jpeg_shell(scan_bytes, q0=16, dht_extra=b"", dri=None):
    """Gray 8x8 single-block JPEG around hand-built entropy data; the
    DC table is the uniform-length-4 one, the AC table is supplied."""
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([q0] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc4" + struct.pack(">H", 31) + bytes(
        [0x00, 0, 0, 0, 12] + [0] * 12 + list(range(12))
    )
    out += dht_extra
    if dri is not None:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"
    out += scan_bytes + b"\xff\xd9"
    return bytes(out)


def _idct_reference(coeffs, q0=16):
    """Independent T.81 A.3.3 replay: s(y,x) = 1/4 ΣΣ c(u)c(v) F(u,v)
    cos((2y+1)uπ/16) cos((2x+1)vπ/16), F in natural order with u the
    VERTICAL frequency — pins the decoder's orientation."""
    import math

    import numpy as np

    s = np.zeros((8, 8))
    c = lambda k: (1 / math.sqrt(2)) if k == 0 else 1.0
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    acc += (
                        c(u) * c(v) * coeffs.get((u, v), 0) * q0
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            s[y, x] = acc / 4 + 128
    return np.clip(np.round(s), 0, 255).astype("uint8")


def _ac3_dht():
    """AC table with 3 symbols at length 2 — canonical codes EOB=00,
    (run 0, size 1)=01, ZRL=10."""
    import struct

    return b"\xff\xc4" + struct.pack(">H", 2 + 17 + 3) + bytes(
        [0x10, 0, 3] + [0] * 14 + [0x00, 0x01, 0xF0]
    )


def test_jpeg_ac_coefficient_and_orientation():
    """One AC coefficient at vertical frequency u=1 (zigzag index 2):
    the decoded block must vary along image ROWS exactly as the
    independent IDCT replay says — a transposed IDCT fails here."""
    from library_beam_spark.operators.multimodal import _jpeg_pixels

    w = _JBits()
    w.put(0, 4)       # DC category 0
    w.put(0b01, 2)    # AC (0,1)
    w.put(1, 1)       # +1 at zigzag k=1 → natural (0,1)?  k=1 is (0,1)
    w.put(0b01, 2)    # AC (0,1) again → k=2 → natural (1,0): u=1
    w.put(1, 1)
    w.put(0b00, 2)    # EOB
    px = _jpeg_pixels(_jpeg_shell(w.flush(), dht_extra=_ac3_dht()))
    want = _idct_reference({(0, 1): 1, (1, 0): 1})
    assert (px == want).all()
    assert (want[0] != want[-1]).any()  # genuinely row-varying


def test_jpeg_zrl_places_high_zigzag_coefficient():
    """ZRL (16 zeros) then (0,1): coefficient lands at zigzag index 17
    = natural (u,v)=(2,3); decode matches the independent replay."""
    from library_beam_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_pixels,
    )

    w = _JBits()
    w.put(0, 4)
    w.put(0b10, 2)    # ZRL
    w.put(0b01, 2)    # (0,1)
    w.put(1, 1)
    w.put(0b00, 2)
    px = _jpeg_pixels(_jpeg_shell(w.flush(), dht_extra=_ac3_dht()))
    nat = _JPEG_ZIGZAG[17]
    want = _idct_reference({(nat // 8, nat % 8): 1})
    assert (px == want).all()


def test_jpeg_variable_length_huffman_canonical_codes():
    """A DC table with MIXED code lengths (cat2 at 1 bit, cat0/cat3 at
    3 bits): canonical T.81 assignment gives 0 / 100 / 101 — decode a
    stream written with exactly those codes."""
    import struct

    from library_beam_spark.operators.multimodal import _jpeg_pixels

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([16] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    # DC: L1=1 (sym 2), L3=2 (syms 0, 3)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 3) + bytes(
        [0x00, 1, 0, 2] + [0] * 13 + [2, 0, 3]
    )
    # AC: EOB only
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + bytes(
        [0x10, 1] + [0] * 15 + [0x00]
    )
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"
    w = _JBits()
    w.put(0b0, 1)     # block 0: cat 2 (code 0)
    w.put(3, 2)       # diff +3 → dc 3 → pixels 2*3+128
    w.put(0, 1)       # AC EOB (code '0' at length 1)
    w.put(0b101, 3)   # block 1: cat 3 (code 101)
    w.put(0, 3)       # diff -7 (low half) → dc 3-7 = -4
    w.put(0, 1)       # EOB
    out += w.flush() + b"\xff\xd9"
    px = _jpeg_pixels(bytes(out))
    assert (px[:, :8] == 2 * 3 + 128).all()
    assert (px[:, 8:] == 2 * (-4) + 128).all()


def test_jpeg_restart_markers_reset_dc_predictor():
    """DRI=1: every MCU boundary byte-aligns through an RSTn marker and
    the DC predictor resets — block 2's diff is from 0, not block 1."""
    import struct

    from library_beam_spark.operators.multimodal import _jpeg_pixels

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([16] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc4" + struct.pack(">H", 31) + bytes(
        [0x00, 0, 0, 0, 12] + [0] * 12 + list(range(12))
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + bytes(
        [0x10, 1] + [0] * 15 + [0x00]
    )
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack(">BB", 1, 0x00) + b"\x00\x3f\x00"
    w = _JBits()
    w.put(3, 4)  # cat 3
    w.put(5, 3)  # diff +5 → dc 5
    w.put(0, 1)  # EOB
    out += w.flush()
    out += b"\xff\xd0"  # RST0
    w.put(3, 4)
    w.put(5, 3)  # diff +5 from RESET predictor → dc 5 again
    w.put(0, 1)
    out += w.flush() + b"\xff\xd9"
    px = _jpeg_pixels(bytes(out))
    assert (px == 2 * 5 + 128).all()


def test_jpeg_unsupported_fall_back_to_header_dims(spark):
    """Progressive (SOF2) and subsampled payloads refuse pixel decode
    but decode_image_bytes still reports REAL header dims with null
    means — the honest-slot contract."""
    import struct

    import pytest

    from library_beam_spark.operators.multimodal import (
        _jpeg_pixels,
        decode_image_bytes,
    )

    prog = bytearray(b"\xff\xd8")
    prog += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 24, 40, 1)
    prog += struct.pack(">BBB", 1, 0x11, 0)
    prog += b"\xff\xd9"
    with pytest.raises(ValueError):
        _jpeg_pixels(bytes(prog))
    meta = decode_image_bytes(bytes(prog))
    assert (meta["width"], meta["height"]) == (40, 24)
    assert meta["mean_r"] is None

    sub = bytearray(b"\xff\xd8")
    sub += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 16, 16, 1)
    sub += struct.pack(">BBB", 1, 0x22, 0)  # 2x2 sampling
    sub += b"\xff\xd9"
    with pytest.raises(ValueError):
        _jpeg_pixels(bytes(sub))
    meta = decode_image_bytes(bytes(sub))
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["mean_r"] is None


def test_jpeg_color_dc_only_ycbcr():
    """3-component 4:4:4 DC-only: the JFIF YCbCr→RGB formula on the
    constant blocks, checked against hand arithmetic."""
    from library_beam_spark.operators.multimodal import (
        _jpeg_dc_payload,
        _jpeg_pixels,
    )

    px = _jpeg_pixels(_jpeg_dc_payload([10, -4, 6], 1, 1, ncomp=3))
    y, cb, cr = 148.0, 120.0, 140.0
    assert px[0, 0].tolist() == [
        round(y + 1.402 * (cr - 128)),
        round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        round(y + 1.772 * (cb - 128)),
    ]


def test_jpeg_generator_roundtrip_spark(spark):
    """synthesize_jpeg_dc → decode_image_metadata_real on Spark rows:
    dims and mean match the closed-form law."""
    from library_beam_spark.operators.multimodal import (
        decode_image_metadata_real,
        synthesize_jpeg_dc,
    )

    d = spark.createDataFrame(
        [(5, 2, 1), (12, 3, 2)], "doc_id long, bw int, bh int"
    )
    got = {
        r.doc_id: r.image_meta
        for r in decode_image_metadata_real(
            synthesize_jpeg_dc(d).drop("bw", "bh")
        ).collect()
    }
    for seed, bw, bh in [(5, 2, 1), (12, 3, 2)]:
        vals = [
            2 * ((seed + 17 * b) % 96) + 32 for b in range(bw * bh)
        ]
        m = got[seed]
        assert (m.width, m.height, m.channels) == (8 * bw, 8 * bh, 1)
        assert m.mean_r == sum(vals) // len(vals)


def test_transcode_jpeg_to_ppm(spark):
    """JPEG joins the canonicalization family for free through
    decode_pixels_rgb: a DC-only gray JPEG transcodes to a P6 whose
    pixels are the closed-form law expanded to three channels."""
    from library_beam_spark.operators.multimodal import (
        _jpeg_dc_payload,
        _ppm_pixels,
        transcode_to_ppm,
    )

    dcs = [-10, 25]
    df = spark.createDataFrame(
        [(1, bytearray(_jpeg_dc_payload(dcs, 2, 1)))],
        "doc_id long, payload binary",
    )
    out = transcode_to_ppm(df).collect()[0]
    px = _ppm_pixels(bytes(out.ppm))
    assert px.shape == (8, 16, 3)
    for b, dc in enumerate(dcs):
        assert (px[:, b * 8 : (b + 1) * 8, :] == 2 * dc + 128).all()


class TestSpectralPeak:
    def test_bin_aligned_tone_argmax(self, spark):
        """The DFT argmax must land exactly on the generator's bin for
        every (n, b) shape the registry query emits — a transform with
        off-by-one bin indexing or a dropped Nyquist term fails."""
        from library_beam_spark.operators.multimodal import (
            spectral_peak_wav,
            synthesize_wav_tone,
        )

        rows = [(i, 64 + (i % 5) * 32, 3 + i % 13) for i in range(10)]
        df = spark.createDataFrame(
            rows, "doc_id long, n_samples int, tone_bin int"
        )
        out = (
            spectral_peak_wav(
                synthesize_wav_tone(df).drop("n_samples", "tone_bin")
            )
            .select("doc_id", "spectrum.*")
            .collect()
        )
        assert len(out) == 10
        for r in out:
            assert r.dominant_bin == 3 + r.doc_id % 13
            n = 64 + (r.doc_id % 5) * 32
            assert r.n_samples == n
            assert r.dominant_freq_hz == (r.dominant_bin * 8000.0) / n

    def test_corrupt_payload_null_struct(self, spark):
        from library_beam_spark.operators.multimodal import spectral_peak_wav

        df = spark.createDataFrame(
            [(1, bytearray(b"not a wav")), (2, None)],
            "doc_id long, payload binary",
        )
        out = spectral_peak_wav(df).collect()
        assert all(r.spectrum is None for r in out)


class TestJpeg420:
    def test_420_quadrants_match_closed_form(self):
        """Full generate→decode round trip for interleaved 4:2:0 MCUs:
        every 8×8 quadrant's RGB must equal the seed law's closed form
        (wrong MCU walk, plane offsets, table dispatch, or chroma
        upsample grid all break this)."""
        import numpy as np

        from library_beam_spark.operators.multimodal import (
            _jpeg_420_payload,
            _jpeg_pixels,
        )

        for seed, mcux, mcuy in [(0, 1, 1), (7, 2, 1), (31, 2, 2)]:
            n = mcux * mcuy
            y_dcs = [((seed + 17 * j) % 80) - 40 for j in range(4 * n)]
            cb = [((seed + 7 * m) % 11) - 5 for m in range(n)]
            cr = [((seed + 5 * m) % 9) - 4 for m in range(n)]
            px = _jpeg_pixels(_jpeg_420_payload(y_dcs, cb, cr, mcux, mcuy))
            assert px.shape == (mcuy * 16, mcux * 16, 3)
            for qy in range(mcuy * 2):
                for qx in range(mcux * 2):
                    m = (qy // 2) * mcux + (qx // 2)
                    sub = (qy % 2) * 2 + (qx % 2)
                    y = 2 * y_dcs[4 * m + sub] + 128.0
                    cbv, crv = 2.0 * cb[m], 2.0 * cr[m]
                    exp = [
                        np.floor(y + 1.402 * crv + 0.5),
                        np.floor(y - 0.344136 * cbv - 0.714136 * crv + 0.5),
                        np.floor(y + 1.772 * cbv + 0.5),
                    ]
                    tile = px[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
                    assert (tile.reshape(-1, 3) == exp).all(), (seed, qy, qx)

    def test_420_transcodes_to_ppm(self, spark):
        """decode_pixels_rgb no longer refuses subsampled baseline —
        the canonicalization path picks it up for free."""
        from library_beam_spark.operators.multimodal import (
            _jpeg_420_payload,
            decode_pixels_rgb,
        )

        p = _jpeg_420_payload([0, 1, 2, 3], [1], [2], 1, 1)
        px = decode_pixels_rgb(p)
        assert px.shape == (16, 16, 3)

    def test_progressive_without_scans_raises(self):
        from library_beam_spark.operators.multimodal import _jpeg_pixels

        # SOI + SOF2 header but no SOS: nothing to reconstruct
        prog = (
            b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        )
        try:
            _jpeg_pixels(prog)
            raise AssertionError("scanless progressive must raise")
        except ValueError:
            pass


class TestImageTiles:
    def test_partial_edge_tiles_ppm(self, spark):
        """A 10×12 BMP tiles into 2×2 blocks of mixed sizes; channel
        sums are exact integers and edge tiles report their true n_px."""
        from library_beam_spark.operators.multimodal import (
            decode_image_tiles,
            synthesize_bmp,
        )

        df = spark.createDataFrame(
            [(1, 12, 10)], "doc_id long, width int, height int"
        )
        out = (
            decode_image_tiles(
                synthesize_bmp(df).drop("width", "height"), tile=8
            )
            .orderBy("tile_y", "tile_x")
            .collect()
        )
        assert [(r.tile_x, r.tile_y, r.n_px) for r in out] == [
            (0, 0, 64),
            (1, 0, 32),
            (0, 1, 16),
            (1, 1, 8),
        ]
        assert all(
            0 <= r.sum_r <= 255 * r.n_px
            and 0 <= r.sum_g <= 255 * r.n_px
            and 0 <= r.sum_b <= 255 * r.n_px
            for r in out
        )

    def test_corrupt_rows_dropped(self, spark):
        from library_beam_spark.operators.multimodal import decode_image_tiles

        df = spark.createDataFrame(
            [(1, bytearray(b"garbage")), (2, None)],
            "doc_id long, payload binary",
        )
        assert decode_image_tiles(df).count() == 0


def _jpeg_prog_shell(dc_scan, ac_scans, q0=16, ahal=0x00):
    """Gray 8×8 single-block PROGRESSIVE shell: SOF2 + uniform DC table
    + the 3-symbol AC table + one DC scan and arbitrary AC band scans
    (list of (ss, se, entropy_bytes))."""
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([q0] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc4" + struct.pack(">H", 31) + bytes(
        [0x00, 0, 0, 0, 12] + [0] * 12 + list(range(12))
    )
    out += _ac3_dht()
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack(">BB", 1, 0x00) + bytes([0, 0, ahal])
    out += dc_scan
    for ss, se, data in ac_scans:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += struct.pack(">BB", 1, 0x00) + bytes([ss, se, ahal])
        out += data
    out += b"\xff\xd9"
    return bytes(out)


class TestJpegProgressive:
    def test_roundtrip_matches_dc_law(self):
        """Three-scan spectral-selection reassembly (DC + two EOBn-run
        AC bands) must reproduce the baseline DC law per block."""
        from library_beam_spark.operators.multimodal import (
            _jpeg_pixels,
            _jpeg_progressive_payload,
        )

        for seed, bw, bh in [(0, 1, 1), (19, 3, 2), (57, 3, 1)]:
            dcs = [((seed + 17 * b) % 96) - 48 for b in range(bw * bh)]
            px = _jpeg_pixels(_jpeg_progressive_payload(dcs, bw, bh))
            assert px.shape == (bh * 8, bw * 8)
            for b, dc in enumerate(dcs):
                by, bx = divmod(b, bw)
                tile = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (tile == 2 * ((seed + 17 * b) % 96) + 32).all()

    def test_ac_value_scan_matches_independent_idct(self):
        """A progressive AC band scan carrying a real coefficient (not
        just EOB runs): decoded block equals the T.81 A.3.3 replay."""
        from library_beam_spark.operators.multimodal import _jpeg_pixels

        w = _JBits()
        w.put(0, 4)  # DC scan: category 0 (dc = 0)
        dc = w.flush()
        w.put(0b01, 2)  # (run 0, size 1) at k=1 → natural (0,1)
        w.put(1, 1)  # +1
        w.put(0b00, 2)  # EOB
        ac = w.flush()
        px = _jpeg_pixels(_jpeg_prog_shell(dc, [(1, 63, ac)]))
        want = _idct_reference({(0, 1): 1})
        assert (px == want).all()

    def test_eob_run_spans_blocks(self):
        """EOBn with r>0 must skip (1<<r)+bits(r) blocks — a 2×1 image
        whose AC scan is ONE EOB1 run with 0 extension bits."""
        import struct

        from library_beam_spark.operators.multimodal import (
            _jpeg_pixels,
            _jpeg_progressive_payload,
        )

        px = _jpeg_pixels(_jpeg_progressive_payload([0, 16], 2, 1))
        assert px.shape == (8, 16)
        assert (px[:, :8] == 128).all() and (px[:, 8:] == 160).all()

    def test_successive_approximation_golden(self):
        """Hand-built 4-scan SA stream (single 8×8 block, the 3-symbol
        AC table) pins the DECODER independently of the generator:
        DC first Al=1 (diff 3 → partial DC 6), AC first Al=1 (+1 at
        zigzag 1 → partial coef 2), DC refinement (bit 1 → DC 7), AC
        refinement (new-nonzero +1 at zigzag 2 positioned by a
        zero-HISTORY run that must SKIP the nonzero zigzag 1, whose
        correction bit 1 lifts it 2→3, then an EOB covering the band
        tail). Final: F(0,0)=7, F(0,1)=3, F(1,0)=1 vs the independent
        A.3.3 IDCT replay."""
        import struct

        from library_beam_spark.operators.multimodal import _jpeg_pixels

        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([16] * 64)
        out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += struct.pack(">BBB", 1, 0x11, 0)
        out += b"\xff\xc4" + struct.pack(">H", 31) + bytes(
            [0x00, 0, 0, 0, 12] + [0] * 12 + list(range(12))
        )
        out += _ac3_dht()

        def sos(ss, se, ahal, data):
            return (
                b"\xff\xda" + struct.pack(">HB", 8, 1)
                + struct.pack(">BB", 1, 0x00) + bytes([ss, se, ahal]) + data
            )

        w = _JBits()
        w.put(2, 4)  # DC category 2
        w.put(3, 2)  # diff = +3 → DC>>1 = 3
        out += sos(0, 0, 0x01, w.flush())
        w.put(0b01, 2)  # (run 0, size 1) at k=1
        w.put(1, 1)     # +1 → stored << 1 = 2
        w.put(0b00, 2)  # EOB
        out += sos(1, 63, 0x01, w.flush())
        w.put(1, 1)     # DC refinement bit → DC = 6 | 1 = 7
        out += sos(0, 0, 0x10, w.flush())
        w.put(0b01, 2)  # new-nonzero, zero-history run 0
        w.put(1, 1)     # sign +
        w.put(1, 1)     # correction bit for zigzag 1 (2 → 3)
        w.put(0b00, 2)  # EOB0: refine band tail (no nonzero left)
        out += sos(1, 63, 0x10, w.flush())
        out += b"\xff\xd9"
        px = _jpeg_pixels(bytes(out))
        want = _idct_reference({(0, 0): 7, (0, 1): 3, (1, 0): 1})
        assert (px == want).all()

    def test_sa_roundtrip_matches_closed_form(self):
        """Generator ↔ decoder round trip across shapes and seeds: the
        reconstructed pixels follow the documented closed form, with
        |a|=1 coefficients created ONLY by the refinement scan and
        |a|≥2 coefficients taking correction bits."""
        from library_beam_spark.operators.multimodal import (
            _jpeg_pixels,
            _jpeg_progressive_sa_payload,
        )

        for seed in (0, 19, 57, 1000):
            for bw, bh in ((1, 1), (3, 2), (4, 1)):
                nb = bw * bh
                dcs = [((seed + 17 * b) % 96) - 48 for b in range(nb)]
                acs = [
                    {1: ((seed + 13 * b) % 7) - 3,
                     5: ((seed + 11 * b) % 5) - 2}
                    for b in range(nb)
                ]
                px = _jpeg_pixels(
                    _jpeg_progressive_sa_payload(dcs, acs, bw, bh)
                )
                assert px.shape == (bh * 8, bw * 8)
                for b in range(nb):
                    by, bx = divmod(b, bw)
                    tile = px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                    a1, a5 = acs[b][1], acs[b][5]
                    xs = np.arange(8)
                    want = np.round(
                        128 + 2 * dcs[b] + 2 * np.sqrt(2) * (
                            a1 * np.cos((2 * xs + 1) * np.pi / 16)
                            + a5 * np.cos((2 * xs + 1) * np.pi / 8)
                        )
                    )
                    assert (tile == want[None, :]).all(), (seed, bw, bh, b)

    def test_arithmetic_coding_still_raises(self):
        """Arithmetic-coded JPEG (SOF10) stays the honest
        codec-library slot — the Huffman modes are all closed now."""
        import struct

        from library_beam_spark.operators.multimodal import _jpeg_pixels

        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([16] * 64)
        out += b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += struct.pack(">BBB", 1, 0x11, 0)
        try:
            _jpeg_pixels(bytes(out) + b"\xff\xd9")
            raise AssertionError("arithmetic coding must raise")
        except ValueError as e:
            assert "non-baseline" in str(e)


def test_png_average_and_paeth_lane_vectorized_unfilter():
    """Filter types 3 (Average) and 4 (Paeth) through the per-pixel
    lane-vectorized carry: decode must match a byte-at-a-time scalar
    reference of the RFC 2083 recurrences, including the x=0 edges and
    mod-256 wraparound."""
    w, h = 6, 4
    vals = [
        (x * 73 + y * 37 + 190) % 256 for y in range(h) for x in range(w * 3)
    ]
    raw_rows = [bytes(vals[y * w * 3 : (y + 1) * w * 3]) for y in range(h)]
    fts = [3, 4, 4, 3]
    raw = b"".join(
        bytes([ft]) + r for ft, r in zip(fts, raw_rows)
    )

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    m = decode_image_bytes(payload)
    # scalar reference
    stride = w * 3
    prev = [0] * stride
    total = np.zeros(3, dtype=np.int64)
    for ft, r in zip(fts, raw_rows):
        dec = [0] * stride
        for x in range(stride):
            a = dec[x - 3] if x >= 3 else 0
            b = prev[x]
            if ft == 3:
                dec[x] = (r[x] + (a + b) // 2) % 256
            else:
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                )
                dec[x] = (r[x] + pred) % 256
        prev = dec
        total += np.asarray(dec).reshape(w, 3).sum(axis=0)
    want = total // (w * h)
    assert (m["mean_r"], m["mean_g"], m["mean_b"]) == tuple(
        int(v) for v in want
    )


def test_jpeg_422_and_411_quadrants_match_closed_form():
    """The decoder's sampling-factor claim beyond 4:2:0: 4:2:2 (2,1)
    and 4:1:1 (4,1) interleaved MCUs decode to the seed law's closed
    form per 8×8 luma block, with chroma replicated only HORIZONTALLY
    by the right factor."""
    from library_beam_spark.operators.multimodal import (
        _jpeg_pixels,
        _jpeg_subsampled_payload,
    )

    for hy, vy, mcux, mcuy in [(2, 1, 2, 2), (4, 1, 1, 2)]:
        nsub = hy * vy
        n = mcux * mcuy
        seed = 11
        y_dcs = [((seed + 17 * j) % 80) - 40 for j in range(nsub * n)]
        cb = [((seed + 7 * m) % 11) - 5 for m in range(n)]
        cr = [((seed + 5 * m) % 9) - 4 for m in range(n)]
        px = _jpeg_pixels(
            _jpeg_subsampled_payload(y_dcs, cb, cr, mcux, mcuy, hy, vy)
        )
        assert px.shape == (mcuy * vy * 8, mcux * hy * 8, 3)
        for qy in range(mcuy * vy):
            for qx in range(mcux * hy):
                m = (qy // vy) * mcux + (qx // hy)
                sub = (qy % vy) * hy + (qx % hy)
                y = 2 * y_dcs[nsub * m + sub] + 128.0
                cbv, crv = 2.0 * cb[m], 2.0 * cr[m]
                exp = [
                    np.floor(y + 1.402 * crv + 0.5),
                    np.floor(y - 0.344136 * cbv - 0.714136 * crv + 0.5),
                    np.floor(y + 1.772 * cbv + 0.5),
                ]
                tile = px[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
                assert (tile.reshape(-1, 3) == exp).all(), (hy, vy, qy, qx)


class TestMjpegAvi:
    """Motion-JPEG AVI: the compressed-video container/codec composition
    (library_beam_spark/operators/multimodal.py synthesize_avi_mjpeg /
    decode_avi_mjpeg_bytes)."""

    def _build(self, seed, n, bw=2, bh=2, fps=5, q0=16):
        from library_beam_spark.operators.multimodal import _jpeg_dc_payload

        w, h = bw * 8, bh * 8
        usec = 1_000_000 // fps
        frames = []
        for f in range(n):
            dcs = [((seed + 17 * b + 31 * f) % 96) - 48
                   for b in range(bw * bh)]
            frames.append(_jpeg_dc_payload(dcs, bw, bh, q0=q0))
        movi_items = b"".join(
            b"00dc" + struct.pack("<I", len(fr)) + fr + b"\x00" * (len(fr) & 1)
            for fr in frames
        )
        movi = (b"LIST" + struct.pack("<I", 4 + len(movi_items)) + b"movi"
                + movi_items)
        bufsz = max(len(fr) for fr in frames)
        strf_data = struct.pack("<Iii2H", 40, w, h, 1, 24) + b"MJPG" \
            + struct.pack("<IiiII", 0, 0, 0, 0, 0)
        strf = b"strf" + struct.pack("<I", len(strf_data)) + strf_data
        strh_data = (b"vids" + b"MJPG"
                     # dwQuality=-1, dwSampleSize=0 (variable-size samples)
                     + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n,
                                   bufsz, -1, 0)
                     + struct.pack("<4H", 0, 0, w, h))
        strh = b"strh" + struct.pack("<I", len(strh_data)) + strh_data
        strl = (b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf))
                + b"strl" + strh + strf)
        avih_data = struct.pack("<14I", usec, bufsz * fps, 0, 0, n, 0, 1,
                                bufsz, w, h, 0, 0, 0, 0)
        avih = b"avih" + struct.pack("<I", len(avih_data)) + avih_data
        hdrl = (b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl))
                + b"hdrl" + avih + strl)
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_decode_matches_dc_law(self):
        from library_beam_spark.operators.multimodal import (
            decode_avi_mjpeg_bytes,
        )

        for seed in (0, 7, 123, 9999):
            n = 2 + seed % 4
            d = decode_avi_mjpeg_bytes(self._build(seed, n))
            assert (d["width"], d["height"], d["n_frames"]) == (16, 16, n)
            assert len(d["frames"]) == n
            for f, px in enumerate(d["frames"]):
                assert px.shape == (16, 16)
                for by in range(2):
                    for bx in range(2):
                        b = by * 2 + bx
                        exp = 2 * ((seed + 17 * b + 31 * f) % 96) + 32
                        blk = px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                        assert (blk == exp).all(), (seed, f, b)

    def test_generator_spark_matches_builder(self, spark):
        from library_beam_spark.operators.multimodal import (
            synthesize_avi_mjpeg,
        )

        df = spark.createDataFrame(
            [(7, 3), (123, 5)], "doc_id long, n_frames int"
        )
        rows = {
            r.doc_id: bytes(r.payload)
            for r in synthesize_avi_mjpeg(df).collect()
        }
        assert rows[7] == self._build(7, 3)
        assert rows[123] == self._build(123, 5)

    def test_rejects_uncompressed_codec(self):
        from library_beam_spark.operators.multimodal import (
            decode_avi_mjpeg_bytes, synthesize_avi,  # noqa: F401
        )
        import pytest

        # a DIB AVI (codec 0) must be refused, not half-decoded
        payload = self._build(7, 3)
        # corrupt the strf codec fourcc in place
        i = payload.find(b"strf")
        bad = payload[: i + 8 + 16] + b"\x00\x00\x00\x00" \
            + payload[i + 8 + 20:]
        with pytest.raises(ValueError, match="MJPG"):
            decode_avi_mjpeg_bytes(bad)

    def test_frame_stats_drops_corrupt_rows(self, spark):
        from library_beam_spark.operators.multimodal import (
            mjpeg_frame_stats,
        )

        good = self._build(7, 2)
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"not an avi"))],
            "doc_id long, payload binary",
        )
        out = mjpeg_frame_stats(df).collect()
        assert sorted(r.doc_id for r in out) == [1, 1]
        want = {
            f: sum(64 * (2 * ((7 + 17 * b + 31 * f) % 96) + 32)
                   for b in range(4))
            for f in range(2)
        }
        assert {r.frame_idx: r.px_sum for r in out} == want

    def test_media_content_stats_routes_mjpeg(self, spark):
        """The mixed-corpus dispatch must fall back to the MJPG decoder
        for RIFF/'AVI ' payloads the uncompressed decoder refuses —
        an MJPG AVI row may not be silently dropped (ADVICE r9)."""
        from library_beam_spark.operators.multimodal import (
            media_content_stats,
        )

        good = self._build(7, 2)
        df = spark.createDataFrame(
            [(1, bytearray(good))], "doc_id long, payload binary"
        )
        out = media_content_stats(df).collect()
        assert len(out) == 1 and out[0].format == "avi"
        assert out[0].n_units == 2
        want = sum(
            64 * (2 * ((7 + 17 * b + 31 * f) % 96) + 32)
            for f in range(2) for b in range(4)
        )
        assert out[0].content_sum == want


class TestJpegProgressiveSubsampled:
    """Subsampled progressive (SOF2 + sampling grids): the combination
    that used to be the honest slot. The decisive property: progressive
    reassembly must reproduce the BASELINE subsampled decode bit-for-bit
    on identical coefficients."""

    def test_matches_baseline_subsampled_decode(self):
        from library_beam_spark.operators.multimodal import (
            _jpeg_pixels,
            _jpeg_progressive_subsampled_payload,
            _jpeg_subsampled_payload,
        )

        for seed in (0, 11, 999):
            for hy, vy, mcux, mcuy in [(2, 2, 2, 2), (2, 1, 2, 2),
                                       (4, 1, 1, 2)]:
                nsub, n = hy * vy, mcux * mcuy
                y = [((seed + 17 * j) % 80) - 40 for j in range(nsub * n)]
                cb = [((seed + 7 * m) % 11) - 5 for m in range(n)]
                cr = [((seed + 5 * m) % 9) - 4 for m in range(n)]
                base = _jpeg_pixels(
                    _jpeg_subsampled_payload(y, cb, cr, mcux, mcuy, hy, vy)
                )
                prog = _jpeg_pixels(
                    _jpeg_progressive_subsampled_payload(
                        y, cb, cr, mcux, mcuy, hy, vy
                    )
                )
                assert base.shape == prog.shape
                assert (base == prog).all(), (seed, hy, vy, mcux, mcuy)

    def test_non_mcu_aligned_dims(self):
        """An 8×8 image at 4:2:0 has a 1-MCU padded grid (Y 2×2 blocks)
        but an ACTUAL Y grid of 1×1 — the interleaved DC scan still
        carries 4 luma units (3 dummy), while the Y AC band scan walks
        ONLY the actual block (T.81 A.2.2). A decoder that reuses the
        padded walk for AC scans desynchronizes here."""
        import struct

        from library_beam_spark.operators.multimodal import (
            _jpeg_pixels,
            _jpeg_progressive_subsampled_payload,
        )

        y = [10, 20, 30, 40]
        cb, cr = [3], [-2]
        p = bytearray(
            _jpeg_progressive_subsampled_payload(y, cb, cr, 1, 1, 2, 2)
        )
        i = p.index(b"\xff\xc2")
        # patch SOF dims 16x16 -> 8x8 (height at i+5, width at i+7)
        struct.pack_into(">HH", p, i + 5, 8, 8)
        # Y AC scan: EOB2 run (4 blocks, bits '10' + 2 extension '00')
        # is wrong for a 1-block actual grid — rebuild it as EOB0.
        # Locate the three AC SOS markers after the DC scan.
        scans = []
        j = 0
        while True:
            j = p.find(b"\xff\xda", j + 1)
            if j < 0:
                break
            scans.append(j)
        # scans[1] is the Y AC scan; its entropy byte(s) follow the
        # 8-byte header. EOB0 = code '000' padded with 1s = 0x1F.
        hdr_end = scans[1] + 2 + 8
        p[hdr_end:scans[2]] = bytes([0b00011111])
        px = _jpeg_pixels(bytes(p))
        assert px.shape == (8, 8, 3)
        import numpy as np

        yv = 2.0 * y[0] + 128.0
        cbv, crv = 2.0 * cb[0], 2.0 * cr[0]
        want = [
            np.floor(yv + 1.402 * crv + 0.5),
            np.floor(yv - 0.344136 * cbv - 0.714136 * crv + 0.5),
            np.floor(yv + 1.772 * cbv + 0.5),
        ]
        assert (px.reshape(-1, 3) == want).all()


def test_png_adam7_roundtrip_with_pass_local_filters():
    """Adam7: each pass is its own independently-filtered scanline
    stream — Up filters inside a pass reference the PASS's previous
    scanline, not the image's. Built with alternating None/Up/Sub
    filters per pass row; a decoder sharing prev-row state across
    passes (or deinterlacing before unfiltering) breaks."""
    import struct
    import zlib

    import numpy as np

    from library_beam_spark.operators.multimodal import (
        _ADAM7,
        _png_pixels,
    )

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    rng = np.random.RandomState(3)
    for (h, w, nch) in [(13, 9, 3), (10, 10, 1), (6, 11, 4)]:
        px = rng.randint(0, 256, (h, w, nch), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if pw == 0 or ph == 0:
                continue
            prev = np.zeros(pw * nch, dtype=np.int64)
            for r in range(ph):
                cur = sub[r].reshape(-1).astype(np.int64)
                ft = r % 3
                if ft == 0:
                    enc = cur
                elif ft == 2:
                    enc = (cur - prev) % 256
                else:  # Sub
                    shifted = np.concatenate(
                        [np.zeros(nch, dtype=np.int64), cur[:-nch]]
                    )
                    enc = (cur - shifted) % 256
                raw.append(ft)
                raw += enc.astype(np.uint8).tobytes()
                prev = cur
        ct = {1: 0, 3: 2, 4: 6}[nch]
        hdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 1)
        png = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", hdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        got, got_nch = _png_pixels(png)
        assert got_nch == nch and (got == px).all(), (h, w, nch)


class TestGifAnimation:
    """Animated GIF inter-frame composition: disposal methods 1/2/3,
    transparency holes, restore-to-previous snapshots — golden-pinned
    with a TEST-SIDE builder (own LZW literal packer) independent of
    the shipping generator."""

    @staticmethod
    def _lzw_literal(indices, mcs=4):
        # independent literal-code LZW packer (spec: CLEAR before the
        # dictionary could grow past the code width, LSB-first packing)
        clear, eoi, width = 1 << mcs, (1 << mcs) + 1, mcs + 1
        codes, run = [clear], 0
        for k in indices:
            if run == (1 << mcs) - 2:
                codes.append(clear)
                run = 0
            codes.append(int(k))
            run += 1
        codes.append(eoi)
        acc = nbits = 0
        out = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def _build(self, w, h, frames):
        """frames: list of (left, top, fw, fh, indices, disposal,
        transparent_or_None)."""
        import struct

        pal = bytes(
            v for i in range(16)
            for v in ((7 * i + 1) % 256, (11 * i + 3) % 256, (13 * i + 5) % 256)
        )
        out = bytearray(
            b"GIF89a" + struct.pack("<HHBBB", w, h, 0x83, 0, 0) + pal
        )
        for left, top, fw, fh, idx, disp, t_idx in frames:
            packed = (disp << 2) | (1 if t_idx is not None else 0)
            out += b"\x21\xf9\x04" + bytes(
                [packed, 10, 0, t_idx if t_idx is not None else 0]
            ) + b"\x00"
            data = self._lzw_literal(idx)
            out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
            out += bytes([4])
            for p in range(0, len(data), 255):
                chunk = data[p : p + 255]
                out += bytes([len(chunk)]) + chunk
            out += b"\x00\x3b"[:1]
        out += b"\x3b"
        return bytes(out)

    def test_disposal_semantics_hand_built(self):
        """4 frames on a 6x6 canvas: keep(1), restore-to-bg(2),
        restore-to-previous(3) — each later frame's pixels prove the
        prior frame's disposal was applied."""
        import numpy as np

        from library_beam_spark.operators.multimodal import (
            decode_gif_animation_bytes,
        )

        frames = [
            (0, 0, 6, 6, [1] * 36, 1, None),        # full paint of 1
            (0, 0, 2, 2, [2] * 4, 2, None),         # then rect -> bg(0)
            (2, 2, 2, 2, [3] * 4, 3, None),         # then restore prev
            (4, 4, 2, 2, [4, 15, 4, 4], 1, 15),     # transparent hole
        ]
        d = decode_gif_animation_bytes(self._build(6, 6, frames))
        assert d["disposals"] == [1, 2, 3, 1]
        pal = np.array(
            [[(7 * i + 1) % 256, (11 * i + 3) % 256, (13 * i + 5) % 256]
             for i in range(16)]
        )
        f = d["frames"]
        # frame 0: all 1s
        assert (f[0] == pal[1]).all()
        # frame 1: 2s in the 2x2 rect, 1s elsewhere
        assert (f[1][:2, :2] == pal[2]).all() and (f[1][2:, :] == pal[1]).all()
        # frame 2: disposal-2 of frame 1 turned its rect to bg=0
        assert (f[2][:2, :2] == pal[0]).all()
        assert (f[2][2:4, 2:4] == pal[3]).all()
        # frame 3: disposal-3 of frame 2 restored the canvas BEFORE the
        # 3s were painted (rect back to 1s), bg rect still 0
        assert (f[3][2:4, 2:4] == pal[1]).all()
        assert (f[3][:2, :2] == pal[0]).all()
        # transparency: index 15 at (4,5) leaves the underlying 1
        assert (f[3][4, 4] == pal[4]).all()
        assert (f[3][4, 5] == pal[1]).all()
        assert (f[3][5, 4] == pal[4]).all() and (f[3][5, 5] == pal[4]).all()

    def test_generator_spark_matches_builder(self, spark):
        from library_beam_spark.operators.multimodal import (
            _gif_anim_rect,
            synthesize_gif_animation,
        )

        df = spark.createDataFrame(
            [(37, 8 + 37 % 5, 8 + 37 % 3, 3 + 37 % 2)],
            "doc_id long, width int, height int, n_frames int",
        )
        got = bytes(synthesize_gif_animation(df).collect()[0].payload)
        w, h, n = 8 + 37 % 5, 8 + 37 % 3, 3 + 37 % 2
        frames = [(0, 0, w, h, [(37 + k) % 16 for k in range(w * h)], 1, None)]
        for fi in range(1, n):
            left, top = _gif_anim_rect(fi, w, h)
            frames.append(
                (left, top, 4, 4,
                 [(37 + 97 * fi + k) % 16 for k in range(16)],
                 (fi % 3) + 1, 15)
            )
        assert got == self._build(w, h, frames)

    def test_frame_stats_drops_corrupt_rows(self, spark):
        from library_beam_spark.operators.multimodal import (
            gif_animation_frame_stats,
        )

        good = self._build(6, 6, [(0, 0, 6, 6, [5] * 36, 1, None)])
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"GIF89a garbage"))],
            "doc_id long, payload binary",
        )
        out = gif_animation_frame_stats(df).collect()
        assert [(r.doc_id, r.frame_idx, r.n_px) for r in out] == [(1, 0, 36)]
        assert out[0].sum_r == 36 * ((7 * 5 + 1) % 256)

    def test_malformed_streams_raise_valueerror(self):
        """r10 ADVICE #2: the documented contract is ValueError on
        anything unparseable — truncated block walks and palette
        overruns must not escape as struct.error / IndexError."""
        import pytest

        from library_beam_spark.operators.multimodal import (
            decode_gif_animation_bytes,
        )

        good = self._build(6, 6, [(0, 0, 6, 6, [5] * 36, 1, None)])
        # truncation at every prefix length parses or raises ValueError
        for cut in range(6, len(good) - 1):
            with pytest.raises(ValueError):
                decode_gif_animation_bytes(good[:cut])
        # palette index beyond the (16-entry) table: background index
        # 0xFF survives outside a partial frame's rect, so pal[canvas]
        # would overrun the table — must surface as ValueError
        partial = bytearray(
            self._build(6, 6, [(0, 0, 2, 2, [5] * 4, 1, None)])
        )
        partial[11] = 0xFF
        with pytest.raises(ValueError):
            decode_gif_animation_bytes(bytes(partial))
