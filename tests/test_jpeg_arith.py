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
    # progressive arithmetic now DECODES (see TestProgressiveArith);
    # a sequential stream relabeled SOF10 carries an illegal
    # progressive scan header (Ss=0, Se=63) and must be refused
    badp = bytearray(good)
    badp[badp.index(b"\xff\xc9") + 1] = 0xCA
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_arith_bytes(bytes(badp))
    # lossless/differential arithmetic stays refused
    badl = bytearray(good)
    badl[badl.index(b"\xff\xc9") + 1] = 0xCB
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg_arith_bytes(bytes(badl))


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


class TestProgressiveArith:
    """Progressive arithmetic (SOF10, Annex G on the QM-coder):
    the decisive triple identity, point-transform staging, truncated-
    stream coarse reconstruction, and a scan-level golden built in the
    test by driving the QM primitives by hand — independent of the
    shipping encoder's loops."""

    @staticmethod
    def _sa_blocks(seed, bw, bh):
        from library_beam_spark.operators.multimodal import _JPEG_ZIGZAG

        blocks = []
        for b in range(bw * bh):
            c = [0] * 64
            c[0] = ((seed + 17 * b) % 96) - 48
            c[_JPEG_ZIGZAG[1]] = ((seed + 13 * b) % 7) - 3
            c[_JPEG_ZIGZAG[5]] = ((seed + 11 * b) % 5) - 2
            blocks.append(c)
        return blocks

    def test_decisive_triple_identity(self):
        """The SAME coefficients — straddling the Al=1 point transform
        so every scan type decodes nontrivially — through the Huffman
        SA encoder, the sequential arithmetic encoder, and the
        progressive arithmetic encoder must produce BIT-IDENTICAL
        pixel arrays (three independent entropy layers over one
        signal; any model/conditioning slip in the progressive path
        breaks the identity)."""
        from library_beam_spark.operators.jpeg_arith import (
            encode_jpeg_arith_progressive,
        )
        from library_beam_spark.operators.multimodal import (
            _jpeg_pixels,
            _jpeg_progressive_sa_payload,
        )

        for seed, bw, bh in [(3, 2, 2), (41, 3, 1), (77, 4, 3)]:
            blocks = self._sa_blocks(seed, bw, bh)
            dcs = [c[0] for c in blocks]
            acs = [
                {1: ((seed + 13 * b) % 7) - 3, 5: ((seed + 11 * b) % 5) - 2}
                for b in range(bw * bh)
            ]
            huff = _jpeg_pixels(
                _jpeg_progressive_sa_payload(dcs, acs, bw, bh, q0=16)
            )
            seq = decode_jpeg_arith_bytes(
                encode_jpeg_arith([list(c) for c in blocks], bw, bh)
            )
            prog = decode_jpeg_arith_bytes(
                encode_jpeg_arith_progressive(
                    [list(c) for c in blocks], bw, bh
                )
            )
            assert (huff == seq).all()
            assert (seq == prog).all()

    def test_truncated_stream_is_coarse_reconstruction(self):
        """Progressive CONTRACT: a file containing only the Al=1 scans
        must decode to exactly the image of the point-transformed
        coefficients ((c >> 1) << 1) — the whole reason progressive
        ordering exists. Sequential arithmetic on those coarse
        coefficients is the independent expectation."""
        from library_beam_spark.operators.jpeg_arith import (
            PROGRESSIVE_SCANS,
            encode_jpeg_arith_progressive,
        )

        blocks = self._sa_blocks(19, 3, 2)
        coarse_only = encode_jpeg_arith_progressive(
            [list(c) for c in blocks], 3, 2, scans=PROGRESSIVE_SCANS[:3]
        )
        # DC point transform is an ARITHMETIC shift (G.1.2.1: two's
        # complement), AC is sign-magnitude (G.1.2.2: |v| >> Al)
        coarse_blocks = [
            [(blk[0] >> 1) << 1]
            + [
                (-((-c >> 1) << 1) if c < 0 else (c >> 1) << 1)
                for c in blk[1:]
            ]
            for blk in blocks
        ]
        expect = decode_jpeg_arith_bytes(
            encode_jpeg_arith(coarse_blocks, 3, 2)
        )
        assert (decode_jpeg_arith_bytes(coarse_only) == expect).all()

    def test_refinement_stages_change_pixels(self):
        """|a| = 1 coefficients are invisible at Al=1 and materialize
        only in the refinement pass — so dropping the refinement scans
        must CHANGE the decoded pixels (guards against a decoder that
        silently skips refine scans and still passes DC-only suites)."""
        from library_beam_spark.operators.jpeg_arith import (
            PROGRESSIVE_SCANS,
            encode_jpeg_arith_progressive,
        )

        blocks = self._sa_blocks(3, 2, 2)
        assert any(
            abs(v) == 1 for blk in blocks for v in blk[1:] if v
        )
        full = decode_jpeg_arith_bytes(
            encode_jpeg_arith_progressive([list(c) for c in blocks], 2, 2)
        )
        coarse = decode_jpeg_arith_bytes(
            encode_jpeg_arith_progressive(
                [list(c) for c in blocks], 2, 2,
                scans=PROGRESSIVE_SCANS[:3],
            )
        )
        assert (full != coarse).any()

    def test_hand_driven_scan_golden(self):
        """Scan-level golden INDEPENDENT of the shipping encoder: a
        2-block image is coded by driving _QMEncoder and the model
        primitives by hand, scan decision by scan decision, straight
        from the T.81 figures (G.5/G.7/G.10 sequencing) — then the
        shipping DECODER must reproduce the exact coefficients. A
        consistent-but-wrong encoder/decoder pair cannot pass this
        together with the triple identity above."""
        import struct

        from library_beam_spark.operators.jpeg_arith import (
            _decode_jpeg_arith_progressive,
            _new_ac_stats,
            _new_dc_stats,
        )
        from library_beam_spark.operators.multimodal import _JPEG_ZIGZAG

        # block 0: DC=5, zigzag1=+3, zigzag3=-1; block 1: DC=-6, zz1=+1
        b0 = [0] * 64
        b0[0] = 5
        b0[_JPEG_ZIGZAG[1]] = 3
        b0[_JPEG_ZIGZAG[3]] = -1
        b1 = [0] * 64
        b1[0] = -6
        b1[_JPEG_ZIGZAG[1]] = 1
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] * 64)
        out += b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
        out += struct.pack(">BBB", 1, 0x11, 0)
        out += b"\xff\xcc" + struct.pack(">H", 6) + bytes([0x00, 0x10, 0x10, 5])

        def sos(ss, se, ah, al):
            return b"\xff\xda" + struct.pack(
                ">HBBBBBB", 8, 1, 1, 0, ss, se, (ah << 4) | al
            )

        from library_beam_spark.operators.jpeg_arith import _QMEncoder

        # --- scan 1: DC first, Al=1: values 5>>1=2, -6>>1=-3 ---------
        enc = _QMEncoder()
        dcs = _new_dc_stats()
        fx = [113, 0]
        # block 0: diff=+2 (ctx 0): not-zero, sign +, sz=1 -> m path
        enc.encode(dcs[0], 1)        # diff != 0
        enc.encode(dcs[1], 0)        # positive
        enc.encode(dcs[2], 1)        # sz=1 >= 1 -> magnitude >= 2? m=1
        enc.encode(dcs[20], 0)       # m stays 1 (sz=1 -> v=2)
        enc.encode(dcs[34], 1 if (0) else 0)  # 0 low bits? m=1 -> none
        # wait: m=1 has no low bits (mm>>1 == 0) — the encode above is
        # wrong; rebuild cleanly below instead.
        enc2 = _QMEncoder()
        dcs = _new_dc_stats()
        fx = [113, 0]
        # block 0: diff = 2 - 0 = 2 -> nonzero(1), sign(0), sz=1:
        #   first-magnitude ctx s0+2 -> 1, then X1 (20): sz>>1 = 0 -> 0;
        #   low bits: m=1, none. next class: m=1 >= (1<<0)>>1 and
        #   m <= (1<<1)>>1 -> class 4 + 0
        enc2.encode(dcs[0], 1)
        enc2.encode(dcs[1], 0)
        enc2.encode(dcs[2], 1)
        enc2.encode(dcs[20], 0)
        # block 1: diff = -3 - 2 = -5 -> ctx 4: nonzero(1), sign(1),
        #   sz = 4: s+3 -> 1, X1: 4>>1=2 -> 1, X2: 2>>1=1 -> 1 stop
        #   (v2>>1: 4->2 (encode 1), 2->1 (encode 1), 1 -> stop)
        #   then 0 at X3, low bits of sz=4 under m=4: mm 4->2: bit
        #   (2 & 4)=0, 2->1: (1 & 4)=0
        enc2.encode(dcs[4], 1)
        enc2.encode(dcs[5], 1)
        enc2.encode(dcs[7], 1)       # s0+2+sign = 4+2+1 = 7
        enc2.encode(dcs[20], 1)      # X1: m 1->2
        enc2.encode(dcs[21], 1)      # X2: m 2->4
        enc2.encode(dcs[22], 0)      # stop at m=4
        enc2.encode(dcs[36], 0)      # low bit (mm=2 & sz=4) -> 0
        enc2.encode(dcs[37], 0)      # low bit (mm=1 & sz=4) -> 0
        scan1 = enc2.finish()

        # --- scan 2: AC first band [1,5], Al=1 ------------------------
        # block 0 scaled band: k1: |3|>>1 = 1 -> code; k3: |-1|>>1 = 0;
        #   so ke=1: EOB-decision 0 at st 0, nonzero at st+1, sign +,
        #   sz = 0 -> first-mag ctx st+2 -> 0; EOB at 3*(2-1)=3
        enc3 = _QMEncoder()
        acs = _new_ac_stats()
        fx3 = [113, 0]
        enc3.encode(acs[0], 0)   # k=1 not EOB
        enc3.encode(acs[1], 1)   # nonzero at k=1
        enc3.encode(fx3, 0)      # sign +
        enc3.encode(acs[2], 0)   # sz=0 -> v=1
        enc3.encode(acs[3], 1)   # EOB at k=2
        # block 1: k1: |1|>>1 = 0 -> band empty -> EOB at k=1 (st 0)
        enc3.encode(acs[0], 1)
        scan2 = enc3.finish()

        # --- scan 3: AC first band [6,63], Al=1: both blocks empty ----
        enc4 = _QMEncoder()
        acs4 = _new_ac_stats()
        enc4.encode(acs4[3 * 5], 1)  # EOB at k=6 -> ctx 3*(6-1)
        enc4.encode(acs4[3 * 5], 1)
        scan3 = enc4.finish()

        # --- scan 4: DC refine, Al=0: bits 5&1=1, -6&1=0 --------------
        enc5 = _QMEncoder()
        fx5 = [113, 0]
        enc5.encode(fx5, 1)
        enc5.encode(fx5, 0)
        scan4 = enc5.finish()

        # --- scan 5: AC refine band [1,5], Al=0 -----------------------
        # block 0: visible zz1 = 2 (prev nonzero), zz3 final -1 newly
        #   nonzero at this level; ke = 3, kex = 1.
        #   k=1 (<= kex, no EOB decision): prev nonzero -> correction
        #   bit (|3| & 1) = 1 at st+2 (ctx 2)
        #   k=2: zero run: 0 at ctx 3*(2-1)+1 = 4... then k=3 within
        #   same inner loop: st advanced by 3 -> newly nonzero 1 at
        #   ctx 7+1? walk: k=2 EOB decision FIRST (k>kex): 0 at ctx 3;
        #   then inner: coef 0 -> 0 at ctx 4; k->3, st=6; |−1|>>0=1,
        #   visible 0 -> newly nonzero: 1 at ctx 7, sign 1 fixed;
        #   k=4 EOB? k=4 > ke -> after loop EOB=1 at 3*(4-1)=9
        enc6 = _QMEncoder()
        acs6 = _new_ac_stats()
        fx6 = [113, 0]
        enc6.encode(acs6[2], 1)      # correction bit for zz1 (+3: 3&1)
        enc6.encode(acs6[3], 0)      # k=2: not EOB
        enc6.encode(acs6[4], 0)      # k=2 still zero at Al=0? |0|>>0=0
        enc6.encode(acs6[7], 1)      # k=3 newly nonzero
        enc6.encode(fx6, 1)          # sign -
        enc6.encode(acs6[9], 1)      # EOB at k=4
        # block 1: visible zz1 = 0, final +1 newly nonzero; ke=1, kex=0
        enc6.encode(acs6[0], 0)      # k=1 EOB decision: not EOB
        enc6.encode(acs6[1], 1)      # newly nonzero
        enc6.encode(fx6, 0)          # sign +
        enc6.encode(acs6[0], 1)      # EOB at k=2 -> ctx 3*(2-1) = 3
        scan5 = enc6.finish()

        # --- scan 6: AC refine band [6,63], Al=0: both empty ----------
        enc7 = _QMEncoder()
        acs7 = _new_ac_stats()
        enc7.encode(acs7[3 * 5], 1)
        enc7.encode(acs7[3 * 5], 1)
        scan6 = enc7.finish()

        payload = bytes(
            out
            + sos(0, 0, 0, 1) + scan1
            + sos(1, 5, 0, 1) + scan2
            + sos(6, 63, 0, 1) + scan3
            + sos(0, 0, 1, 0) + scan4
            + sos(1, 5, 1, 0) + scan5
            + sos(6, 63, 1, 0) + scan6
            + b"\xff\xd9"
        )
        got = _decode_jpeg_arith_progressive(payload)
        expect = decode_jpeg_arith_bytes(
            encode_jpeg_arith([list(b0), list(b1)], 2, 1)
        )
        assert (got == expect).all()


@given(st.integers(0, 10**9))
@settings(max_examples=20, deadline=None)
def test_progressive_equals_sequential_randomized(seed):
    """Hypothesis-driven widening of the 30-trial progressive ≡
    sequential identity: random DC+AC blocks through the 6-scan
    progressive script and the sequential encoder must decode to
    bit-identical pixels (exercises EOBx placement, newly-nonzero vs
    correction paths, zero-history runs, and band-empty EOBs)."""
    from library_beam_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = random.Random(seed)
    bw, bh = rng.randint(1, 4), rng.randint(1, 3)
    blocks = []
    for _ in range(bw * bh):
        c = [0] * 64
        c[0] = rng.randint(-120, 120)
        for _ in range(rng.randint(0, 10)):
            c[rng.randint(1, 63)] = rng.choice(
                [rng.randint(-40, 40), rng.choice([-1, 1])]
            )
        blocks.append(c)
    seq = decode_jpeg_arith_bytes(
        encode_jpeg_arith([list(b) for b in blocks], bw, bh)
    )
    prog = decode_jpeg_arith_bytes(
        encode_jpeg_arith_progressive([list(b) for b in blocks], bw, bh)
    )
    assert (seq == prog).all()
