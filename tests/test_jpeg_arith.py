"""Arithmetic-coded JPEG (operators/jpeg_arith.py): hand-worked
Annex D goldens, Table D.3 structural pins, exhaustive + randomized
coder roundtrips, the DECISIVE Huffman≡arithmetic cross-codec
identity, and rejection of the remaining honest slots."""

import itertools
import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from library_beam_spark.operators.jpeg_arith import (
    _ARITH_TAB,
    _QMDecoder,
    _QMEncoder,
    decode_jpeg_arith_bytes,
    encode_jpeg_arith,
)


def _unstuff(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        out.append(data[i])
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0x00:
            i += 2
        else:
            i += 1
    return bytes(out)


def _roundtrip(seq, n_ctx=1):
    enc = _QMEncoder()
    sts = [[0, 0] for _ in range(n_ctx)]
    for ctx, b in seq:
        enc.encode(sts[ctx], b)
    dec = _QMDecoder(_unstuff(enc.finish()))
    sts2 = [[0, 0] for _ in range(n_ctx)]
    return [dec.decode(sts2[ctx]) for ctx, _ in seq] == [b for _, b in seq]


def test_table_d3_structure():
    """Table D.3 pins: 113 adaptive states + the fixed bin; Qe of the
    start state and the fixed bin are X'5A1D'; all transitions stay in
    range; MPS exchange exactly on the documented switch states."""
    assert len(_ARITH_TAB) == 114
    assert _ARITH_TAB[0][0] == 0x5A1D and _ARITH_TAB[113][0] == 0x5A1D
    assert _ARITH_TAB[113][1] == 113 and _ARITH_TAB[113][2] == 113
    for qe, nmps, nlps, sw in _ARITH_TAB:
        assert 0 < qe < 0x8000 and 0 <= nmps < 114 and 0 <= nlps < 114
        assert sw in (0, 1)
    switches = [i for i, e in enumerate(_ARITH_TAB) if e[3]]
    assert switches == [0, 14, 36, 64, 80, 88, 95, 105, 110, 112]


def test_hand_worked_annex_d_goldens():
    """First decisions from the initial state (index 0, Qe=X'5A1D',
    MPS=0), worked through the D.1 flowcharts BY HAND:

    Encoding one MPS(0): A = X'10000'−X'5A1D' = X'A5E3' ≥ X'8000' →
    no renorm, C stays 0; termination zeros everything → EMPTY stream
    (trailing zeros discarded), and the decoder, fed zeros, returns
    the MPS.

    Encoding one LPS(1): A ≥ Qe → C += A (X'A5E3'), A = Qe; switch
    flips MPS; one renorm → C = X'14BC6', CT = 10. Termination:
    T = (A−1+C) ∧ X'FFFF0000' = X'10000' < C → C = X'18000';
    C <<= 10 = X'6000000' → single byte X'C0'."""
    enc = _QMEncoder()
    st0 = [0, 0]
    enc.encode(st0, 0)
    assert st0 == [0, 0]  # no renorm -> no estimation update
    assert enc.finish() == b""
    dec = _QMDecoder(b"")
    assert dec.decode([0, 0]) == 0

    enc = _QMEncoder()
    st0 = [0, 0]
    enc.encode(st0, 1)
    assert st0 == [1, 1]  # NLPS=1, switch flips MPS
    assert enc.finish() == b"\xc0"
    dec = _QMDecoder(b"\xc0")
    st1 = [0, 0]
    assert dec.decode(st1) == 1
    assert st1 == [1, 1]


def test_exhaustive_short_roundtrips():
    for n in range(1, 13):
        for bits in itertools.product((0, 1), repeat=n):
            assert _roundtrip([(0, b) for b in bits]), bits


@given(st.integers(0, 10**9))
@settings(max_examples=40, deadline=None)
def test_randomized_multicontext_roundtrip(seed):
    rng = random.Random(seed)
    n_ctx = rng.randint(1, 8)
    seq = [
        (
            rng.randrange(n_ctx),
            1 if rng.random() < 0.1 + 0.8 * rng.random() else 0,
        )
        for _ in range(rng.randint(1, 500))
    ]
    assert _roundtrip(seq, n_ctx)


def test_decisive_huffman_equals_arithmetic():
    """THE cross-codec identity: the same quantized-DC law emitted as
    a Huffman SOF0 stream and as an arithmetic SOF9 stream must decode
    to bit-identical pixel arrays — two entirely independent entropy
    layers over the same coefficients."""
    from library_beam_spark.operators.multimodal import (
        _jpeg_dc_payload,
        _jpeg_pixels,
    )

    for seed in (0, 7, 41, 123, 9999, 54321):
        bw, bh = 2 + seed % 3, 1 + seed % 2
        dcs = [((seed + 17 * b) % 96) - 48 for b in range(bw * bh)]
        hpx = _jpeg_pixels(_jpeg_dc_payload(dcs, bw, bh))
        blocks = []
        for dc in dcs:
            c = [0] * 64
            c[0] = dc
            blocks.append(c)
        apx = decode_jpeg_arith_bytes(encode_jpeg_arith(blocks, bw, bh))
        assert hpx.shape == apx.shape and (hpx == apx).all(), seed


@given(st.integers(0, 10**9))
@settings(max_examples=25, deadline=None)
def test_dc_ac_blocks_roundtrip_vs_reference_idct(seed):
    """Randomized DC+AC blocks (exercising zero runs, every magnitude
    category, conditional exchange, carries, stuffing) decode to the
    independent dequant+IDCT reference."""
    rng = random.Random(seed)
    bw, bh = rng.randint(1, 3), rng.randint(1, 3)
    blocks = []
    for _ in range(bw * bh):
        c = [0] * 64
        c[0] = rng.randint(-400, 400)
        for _ in range(rng.randint(0, 20)):
            c[rng.randint(1, 63)] = rng.choice(
                [rng.randint(-300, 300), rng.randint(-3, 3)]
            )
        blocks.append(c)
    px = decode_jpeg_arith_bytes(encode_jpeg_arith(blocks, bw, bh, q0=1))
    xs = np.arange(8)
    us = np.arange(8)
    cmat = (
        np.cos((2 * xs[None, :] + 1) * us[:, None] * np.pi / 16)
        * np.where(us[:, None] == 0, 1 / np.sqrt(2), 1.0)
        / 2.0
    )
    ref = np.zeros((bh * 8, bw * 8))
    for b, coefs in enumerate(blocks):
        by, bx = divmod(b, bw)
        fq = np.array(coefs).reshape(8, 8).astype(float)
        ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            cmat.T @ fq @ cmat + 128.0
        )
    assert (px == np.clip(np.round(ref), 0, 255).astype(np.uint8)).all()


def test_restart_intervals_roundtrip_and_sequence_check():
    """DRI streams: every restart interval is a self-contained
    arithmetic segment (fresh coder/statistics/predictor, F.1.4.1.1);
    decoded pixels must equal the no-restart stream's, and an
    out-of-sequence RSTm must be refused."""
    rng = random.Random(7)
    for bw, bh, ri in ((4, 2, 2), (3, 3, 1), (5, 1, 3)):
        blocks = []
        for _ in range(bw * bh):
            c = [0] * 64
            c[0] = rng.randint(-90, 90)
            for _ in range(rng.randint(0, 6)):
                c[rng.randint(1, 63)] = rng.randint(-20, 20)
            blocks.append(c)
        plain = decode_jpeg_arith_bytes(encode_jpeg_arith(blocks, bw, bh))
        with_rst = encode_jpeg_arith(blocks, bw, bh, restart_interval=ri)
        assert b"\xff\xd0" in with_rst
        assert (decode_jpeg_arith_bytes(with_rst) == plain).all()
    # out-of-sequence restart marker refused
    stream = bytearray(encode_jpeg_arith(blocks, bw, bh, restart_interval=3))
    k = stream.index(b"\xff\xd0")
    stream[k + 1] = 0xD3
    with pytest.raises(ValueError, match="sequence"):
        decode_jpeg_arith_bytes(bytes(stream))
    # restart marker without DRI refused
    plain_stream = encode_jpeg_arith(blocks, bw, bh)
    sos = plain_stream.index(b"\xff\xda")
    eoi = plain_stream.index(b"\xff\xd9", sos)
    injected = plain_stream[:eoi] + b"\xff\xd0" + plain_stream[eoi:]
    with pytest.raises(ValueError, match="without DRI"):
        decode_jpeg_arith_bytes(injected)


def test_rejects_remaining_honest_slots():
    from library_beam_spark.operators.multimodal import _jpeg_dc_payload

    blocks = [[0] * 64]
    # Huffman frame refused by the arithmetic decoder
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg_arith_bytes(_jpeg_dc_payload([5], 1, 1))
    good = encode_jpeg_arith(blocks, 1, 1)
    # sampling factors beyond T.81's 1/2/4 refused (subsampled 2/4
    # grids now decode for real)
    bad = bytearray(good)
    c9 = bad.index(b"\xff\xc9")
    assert bad[c9 + 11] == 0x11  # the component's H/V sampling byte
    bad[c9 + 11] = 0x33
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_arith_bytes(bytes(bad))
    # progressive arithmetic (SOF10) refused — the remaining slot
    badp = bytearray(good)
    badp[badp.index(b"\xff\xc9") + 1] = 0xCA
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg_arith_bytes(bytes(badp))


def test_spark_generator_and_block_stats(spark):
    from library_beam_spark.operators.jpeg_arith import (
        jpeg_arith_block_stats,
        synthesize_jpeg_arith,
    )

    df = spark.createDataFrame(
        [(41, 2 + 41 % 3, 1 + 41 % 2), (82, 2 + 82 % 3, 1 + 82 % 2)],
        "doc_id long, bw int, bh int",
    )
    out = jpeg_arith_block_stats(
        synthesize_jpeg_arith(df).drop("bw", "bh")
    ).collect()
    got = {(r.doc_id, r.block_idx): r.px_sum for r in out}
    want = {}
    for seed in (41, 82):
        bw, bh = 2 + seed % 3, 1 + seed % 2
        for b in range(bw * bh):
            want[(seed, b)] = 64 * (2 * ((seed + 17 * b) % 96) + 32)
    assert got == want


def test_decisive_color_huffman_equals_arithmetic():
    """Multi-component decisive test: identical YCbCr coefficients —
    NONZERO chroma included — through the Huffman 3-component
    generator and the arithmetic SOF9 encoder decode to bit-identical
    RGB arrays (per-component predictors, shared chroma tables, and
    the three-way MCU interleave all on the line)."""
    from library_beam_spark.operators.multimodal import (
        _jpeg_dc_payload,
        _jpeg_pixels,
    )

    for seed in (3, 41, 555, 9001):
        bw, bh = 1 + seed % 3, 1 + seed % 2
        dcs = []
        for m in range(bw * bh):
            dcs += [
                ((seed + 17 * m) % 96) - 48,
                ((seed + 5 * m) % 33) - 16,
                ((seed + 11 * m) % 25) - 12,
            ]
        hpx = _jpeg_pixels(_jpeg_dc_payload(dcs, bw, bh, ncomp=3))
        blocks = [[dc] + [0] * 63 for dc in dcs]
        apx = decode_jpeg_arith_bytes(
            encode_jpeg_arith(blocks, bw, bh, ncomp=3)
        )
        assert hpx.shape == apx.shape == (bh * 8, bw * 8, 3)
        assert (hpx == apx).all(), seed


@given(st.integers(0, 10**9))
@settings(max_examples=10, deadline=None)
def test_color_restart_ac_roundtrip(seed):
    """Randomized 3-component DC+AC blocks with restart intervals:
    restart streams must decode identically to plain streams."""
    rng = random.Random(seed)
    bw, bh = rng.randint(1, 3), rng.randint(1, 3)
    blocks = []
    for _ in range(bw * bh * 3):
        c = [0] * 64
        c[0] = rng.randint(-200, 200)
        for _ in range(rng.randint(0, 8)):
            c[rng.randint(1, 63)] = rng.randint(-50, 50)
        blocks.append(c)
    plain = decode_jpeg_arith_bytes(
        encode_jpeg_arith(blocks, bw, bh, ncomp=3, q0=2)
    )
    wr = decode_jpeg_arith_bytes(
        encode_jpeg_arith(blocks, bw, bh, ncomp=3, q0=2, restart_interval=2)
    )
    assert (plain == wr).all()


def test_decisive_subsampled_huffman_equals_arithmetic():
    """Subsampled decisive test: identical DC sets — NONZERO chroma —
    through the Huffman subsampled generator and the arithmetic
    interleaved encoder decode to bit-identical RGB for 4:2:0, 4:2:2,
    and 4:1:1 (the A.2.3 walk, per-component predictors, and the
    box-upsample path all on the line)."""
    from library_beam_spark.operators.jpeg_arith import (
        encode_jpeg_arith_subsampled,
    )
    from library_beam_spark.operators.multimodal import (
        _jpeg_pixels,
        _jpeg_subsampled_payload,
    )

    rng = random.Random(11)
    for hy, vy in ((2, 2), (2, 1), (4, 1)):
        for mcux, mcuy in ((2, 2), (3, 1)):
            nsub = hy * vy
            y = [rng.randint(-48, 47) for _ in range(nsub * mcux * mcuy)]
            cb = [rng.randint(-16, 16) for _ in range(mcux * mcuy)]
            cr = [rng.randint(-12, 12) for _ in range(mcux * mcuy)]
            hpx = _jpeg_pixels(
                _jpeg_subsampled_payload(y, cb, cr, mcux, mcuy, hy=hy, vy=vy)
            )
            apx = decode_jpeg_arith_bytes(
                encode_jpeg_arith_subsampled(
                    [[d] + [0] * 63 for d in y],
                    [[d] + [0] * 63 for d in cb],
                    [[d] + [0] * 63 for d in cr],
                    mcux, mcuy, hy=hy, vy=vy,
                )
            )
            assert hpx.shape == apx.shape and (hpx == apx).all(), (hy, vy)


@given(st.integers(0, 10**9))
@settings(max_examples=8, deadline=None)
def test_subsampled_restart_ac_roundtrip(seed):
    from library_beam_spark.operators.jpeg_arith import (
        encode_jpeg_arith_subsampled,
    )

    rng = random.Random(seed)
    mcux, mcuy = rng.randint(1, 3), rng.randint(1, 3)

    def blk():
        c = [0] * 64
        c[0] = rng.randint(-100, 100)
        for _ in range(rng.randint(0, 5)):
            c[rng.randint(1, 63)] = rng.randint(-30, 30)
        return c

    y = [blk() for _ in range(4 * mcux * mcuy)]
    cb = [blk() for _ in range(mcux * mcuy)]
    cr = [blk() for _ in range(mcux * mcuy)]
    plain = decode_jpeg_arith_bytes(
        encode_jpeg_arith_subsampled(y, cb, cr, mcux, mcuy)
    )
    wr = decode_jpeg_arith_bytes(
        encode_jpeg_arith_subsampled(y, cb, cr, mcux, mcuy,
                                     restart_interval=2)
    )
    assert (plain == wr).all()


def test_standalone_and_truncated_markers_valueerror():
    """r10 ADVICE #3: standalone markers (TEM 0x01, stray RSTm before
    the scan) carry no length field and truncated segments must both
    surface as the documented ValueError, never IndexError."""
    blocks = [[0] * 64]
    good = encode_jpeg_arith(blocks, 1, 1)
    # TEM injected into the marker walk ahead of SOF9
    c9 = good.index(b"\xff\xc9")
    tem = good[:c9] + b"\xff\x01" + good[c9:]
    with pytest.raises(ValueError, match="standalone"):
        decode_jpeg_arith_bytes(tem)
    # stray RST0 outside a scan
    rst = good[:c9] + b"\xff\xd0" + good[c9:]
    with pytest.raises(ValueError, match="standalone"):
        decode_jpeg_arith_bytes(rst)
    # every truncation of the header walk raises ValueError
    sos = good.index(b"\xff\xda")
    for cut in range(2, sos + 2):
        with pytest.raises(ValueError):
            decode_jpeg_arith_bytes(good[:cut])
