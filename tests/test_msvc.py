"""MS Video 1 / CRAM-16 (operators/msvc.py): hand-built streams with
nontrivial inter-frame deltas (independent of the shipping generator),
the bottom-up walk and in-block bit placement, quadrant mapping of
8-color blocks, skip-run packing, the ValueError contract, and the
Spark band-stats path against a Python fold of the content law."""

import numpy as np
import pytest

from library_beam_spark.operators.msvc import (
    build_msvc_avi,
    build_msvc_frame,
    decode_avi_msvc_bytes,
    decode_msvc_frame,
    msvc_band_stats,
    synthesize_avi_msvc,
)


def _decode_frames(frames, w, h):
    return decode_avi_msvc_bytes(build_msvc_avi(frames, w, h))["frames"]


def test_one_color_block_placement_bottom_up():
    """2×2 blocks on an 8×8 canvas, four distinct 1-color blocks in
    stream order: stream block 0 must land at the BOTTOM-LEFT of the
    image, block 3 at the top-right."""
    f0 = build_msvc_frame(
        [("c1", 3000), ("c1", 4000), ("c1", 5000), ("c1", 6000)]
    )
    px = _decode_frames([f0], 8, 8)[0]
    assert (px[4:8, 0:4] == 3000).all()  # stream block 0 -> bottom-left
    assert (px[4:8, 4:8] == 4000).all()
    assert (px[0:4, 0:4] == 5000).all()
    assert (px[0:4, 4:8] == 6000).all()


def test_two_color_mask_bit_order():
    """Mask LSB = the block's BOTTOM-LEFT pixel; rows bottom→top,
    left→right; bit 1 selects c0, bit 0 selects c1."""
    mask = 0x0001 | 0x8000 >> 3  # bits 0 and 12
    f0 = build_msvc_frame([("c2", mask, 100, 200)])
    px = _decode_frames([f0], 4, 4)[0]
    assert px[3, 0] == 100          # bit 0: py=0 (bottom row), px=0
    assert px[0, 0] == 100          # bit 12: py=3 (top row), px=0
    assert px[3, 1] == 200 and px[0, 3] == 200
    assert (px == 100).sum() == 2 and (px == 200).sum() == 14


def test_eight_color_quadrant_mapping():
    """Mask 0 → every pixel takes its quadrant's SECOND color; the
    quadrant index is ((py & 2) << 1) + (px & 2) with py bottom-up, so
    colors[1] paints the bottom-left 2×2, colors[7] the top-right."""
    colors = [110, 111, 220, 221, 330, 331, 440, 441]
    f0 = build_msvc_frame([("c8", 0, colors)])
    px = _decode_frames([f0], 4, 4)[0]
    assert (px[2:4, 0:2] == 111).all()  # q0: bottom-left
    assert (px[2:4, 2:4] == 221).all()  # q2: bottom-right
    assert (px[0:2, 0:2] == 331).all()  # q4: top-left
    assert (px[0:2, 2:4] == 441).all()  # q6: top-right
    # mask bit 0 flips only the bottom-left pixel to colors[0]
    f1 = build_msvc_frame([("c8", 1, colors)])
    px1 = _decode_frames([f1], 4, 4)[0]
    assert px1[3, 0] == 110 and (px1 != px).sum() == 1


def test_skip_is_temporal_prediction():
    """The decisive inter-frame property: a skipped block must show
    the PREVIOUS frame's pixels — a decoder that zeroes the canvas
    between frames (or starts each frame fresh) fails here."""
    f0 = build_msvc_frame(
        [("c1", 3000), ("c2", 0x00FF, 700, 800), ("c1", 5000), ("c1", 6000)]
    )
    # frame 1: skip, skip (one packed run), repaint, skip
    f1 = build_msvc_frame(
        [("skip",), ("skip",), ("c1", 9000), ("skip",)]
    )
    assert f1[1] & 0xFC == 0x84 and f1[0] == 2  # packed 2-block run
    a, b = _decode_frames([f0, f1], 8, 8)
    assert (b[4:8, 0:4] == a[4:8, 0:4]).all()      # skipped: unchanged
    assert (b[4:8, 4:8] == a[4:8, 4:8]).all()
    assert (b[0:4, 4:8] == a[0:4, 4:8]).all()
    assert (b[0:4, 0:4] == 9000).all()             # repainted
    assert (a[0:4, 0:4] == 5000).all()


def test_skip_run_spans_block_rows():
    """A single skip code whose count crosses a block-row boundary."""
    f0 = build_msvc_frame([("c1", 2048 + i) for i in range(6)])
    f1 = build_msvc_frame(
        [("c1", 7000)] + [("skip",)] * 4 + [("c1", 8000)]
    )
    a, b = _decode_frames([f0, f1], 12, 8)
    assert (b[4:8, 0:4] == 7000).all()
    assert (b[0:4, 8:12] == 8000).all()
    mid = (b[4:8, 4:12] == a[4:8, 4:12]).all()
    top = (b[0:4, 0:8] == a[0:4, 0:8]).all()
    assert mid and top


def test_valueerror_contract():
    f0 = build_msvc_frame([("c1", 3000), ("c1", 4000)])
    canvas = np.zeros((4, 8), dtype=np.uint16)
    # truncation mid-stream
    with pytest.raises(ValueError, match="truncated"):
        decode_msvc_frame(f0[:-1], canvas)
    # trailing bytes after the grid
    with pytest.raises(ValueError, match="trailing"):
        decode_msvc_frame(f0 + b"\x00\x00", canvas)
    # skip run past the grid end
    over = build_msvc_frame([("skip",)] * 2)[:2]
    bad = bytes([3, 0x84])  # skip 3 blocks on a 2-block grid
    with pytest.raises(ValueError, match="skip run"):
        decode_msvc_frame(bad, canvas)
    assert over  # silence lint
    # the 0x0400-0x07FF 1-color collision is refused at build time
    with pytest.raises(ValueError, match="unrepresentable"):
        build_msvc_frame([("c1", 0x0500)])
    # non-CRAM codec refused (patch BOTH strh fccHandler and strf
    # biCompression — the decoder validates the strf one)
    avi = build_msvc_avi([f0], 8, 4).replace(b"CRAM", b"MJPG")
    with pytest.raises(ValueError, match="MS Video 1"):
        decode_avi_msvc_bytes(avi)


def test_generator_matches_python_fold(spark):
    """Spark synthesize → decode → band stats must equal a direct
    Python replay of the content law's skip/fill recurrence."""
    from library_beam_spark.operators.msvc import _law_block

    seeds = [0, 71, 213]
    df = spark.createDataFrame(
        [(s, 2 + s % 2, 1 + s % 2, 3 + s % 2) for s in seeds],
        "doc_id long, bw int, bh int, n_frames int",
    )
    got = {
        (r.doc_id, r.frame_idx, r.band_y): (r.n_px, r.sum_r, r.sum_g, r.sum_b)
        for r in msvc_band_stats(
            synthesize_avi_msvc(df).drop("bw", "bh", "n_frames")
        ).collect()
    }
    expect = {}
    for s in seeds:
        bw, bh, nf = 2 + s % 2, 1 + s % 2, 3 + s % 2
        canvas = np.zeros((4 * bh, 4 * bw), dtype=np.uint16)
        for u in range(nf):
            decode_msvc_frame(
                build_msvc_frame(
                    [_law_block(s, b, u) for b in range(bw * bh)]
                ),
                canvas,
            )
            v = canvas.astype(np.int64)
            for band in range(bh):
                sl = slice(4 * band, 4 * band + 4)
                expect[(s, u, band)] = (
                    4 * 4 * bw,
                    int(((v[sl] >> 10) & 31).sum()),
                    int(((v[sl] >> 5) & 31).sum()),
                    int((v[sl] & 31).sum()),
                )
    assert got == expect


def test_random_frame_sequences_roundtrip():
    """Randomized widening: arbitrary mixes of skip runs and
    1-/2-/8-color blocks across multi-frame sequences must decode to
    an independent per-pixel replay (numpy reference maintained in the
    test, not the shipping decoder's internals)."""
    import random

    rng = random.Random(23)
    for _ in range(15):
        bw, bh, nf = rng.randint(1, 4), rng.randint(1, 3), rng.randint(2, 4)
        ref = np.zeros((4 * bh, 4 * bw), dtype=np.int64)
        frames = []
        for u in range(nf):
            blocks = []
            for b in range(bw * bh):
                kind = rng.randint(0, 3) if u else rng.randint(1, 3)
                brow, bcol = divmod(b, bw)
                y0, x0 = 4 * (bh - 1 - brow), 4 * bcol
                if kind == 0:
                    blocks.append(("skip",))
                    continue
                if kind == 1:
                    c = rng.randint(0, 32767) | 2048
                    blocks.append(("c1", c))
                    ref[y0 : y0 + 4, x0 : x0 + 4] = c
                elif kind == 2:
                    mask = rng.randint(0, 32767)
                    c0, c1 = rng.randint(0, 32767), rng.randint(0, 32767)
                    blocks.append(("c2", mask, c0, c1))
                    for py in range(4):
                        for px in range(4):
                            bit = (mask >> (py * 4 + px)) & 1
                            ref[y0 + 3 - py, x0 + px] = c0 if bit else c1
                else:
                    mask = rng.randint(0, 32767)
                    cols = [rng.randint(0, 32767) for _ in range(8)]
                    blocks.append(("c8", mask, cols))
                    for py in range(4):
                        for px in range(4):
                            q = ((py & 2) << 1) + (px & 2)
                            bit = (mask >> (py * 4 + px)) & 1
                            ref[y0 + 3 - py, x0 + px] = cols[q + (bit ^ 1)]
            frames.append(build_msvc_frame(blocks))
        got = decode_avi_msvc_bytes(
            build_msvc_avi(frames, 4 * bw, 4 * bh)
        )["frames"][-1]
        assert (got.astype(np.int64) == ref).all()
