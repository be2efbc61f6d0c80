"""MDCT transform codec (operators/mdct.py, q:multimodal_mdct_decode):
TDAC perfect reconstruction, quantization-bounded codec loop, byte
identity against an independent struct-level builder, strict ValueError
contracts, the seed-law closed form, and the rounding-margin audit that
licenses the fixed-point oracle at both gate SFs."""

import struct

import numpy as np
import pytest

from library_beam_spark.operators.mdct import (
    MAGIC,
    decode_mtc_bytes,
    encode_pcm,
    imdct,
    mdct,
    pack_mtc,
    sine_window,
)

N = 64


def _seed_frames(seed: int, n_frames: int):
    """The synthesize_mtc seed law, restated."""
    frames = []
    for t in range(n_frames):
        q = np.zeros(N, dtype=np.int16)
        q[(7 * seed + 3 * t) % N] = 100 + (seed + 11 * t) % 900
        frames.append(((seed + t) % 3, q))
    return frames


def _closed_form(seed: int, n_frames: int) -> np.ndarray:
    """Every decoded sample as the two-term windowed cosine sum the SQL
    oracle replays."""
    w = sine_window(N)

    def y(t, i):
        k = (7 * seed + 3 * t) % N
        a = (100 + (seed + 11 * t) % 900) * (1 << ((seed + t) % 3))
        return (2.0 / N) * a * np.cos(np.pi / N * (i + 0.5 + N / 2) * (k + 0.5))

    return np.array(
        [
            w[N + i] * y(t, N + i) + w[i] * y(t + 1, i)
            for t in range(n_frames - 1)
            for i in range(N)
        ]
    )


def test_tdac_perfect_reconstruction():
    """The Princen-Bradley identity, end to end: window -> MDCT ->
    IMDCT -> window -> overlap-add reconstructs ARBITRARY input exactly
    (to float rounding) on the fully-overlapped interior — the property
    that makes 50%-overlap MDCT a critically-sampled invertible
    transform despite each frame alone being aliased."""
    rng = np.random.default_rng(7)
    x = rng.uniform(-30000, 30000, size=7 * N)
    w = sine_window(N)
    padded = np.zeros(9 * N)
    padded[N : N + len(x)] = x
    rec = np.zeros_like(padded)
    for t in range(8):
        seg = padded[t * N : t * N + 2 * N] * w
        rec[t * N : t * N + 2 * N] += imdct(mdct(seg, N), N) * w
    interior = slice(N, 8 * N)
    assert np.max(np.abs(rec[interior] - padded[interior])) < 1e-8
    # each half-frame alone IS aliased — dropping one frame's
    # contribution must break reconstruction (OLA is load-bearing)
    rec2 = rec.copy()
    rec2[3 * N : 5 * N] -= imdct(
        mdct(padded[3 * N : 5 * N] * w, N), N
    ) * w
    assert np.max(np.abs(rec2[interior] - padded[interior])) > 1.0


def test_codec_loop_error_bounded_by_quantization():
    """Full PCM encode -> decode loop: the only loss is mantissa
    rounding, so per-sample error is bounded by the scalefactor step
    and the SNR is transform-codec-grade (not a parser that happens to
    emit plausible numbers)."""
    rng = np.random.default_rng(11)
    x = rng.integers(-3000, 3000, size=5 * N).astype(np.float64)
    dec = decode_mtc_bytes(encode_pcm(x, N))["samples"]
    m = min(len(dec), len(x))
    err = x[:m] - dec[:m]
    snr = 10 * np.log10(np.sum(x[:m] ** 2) / np.sum(err**2))
    assert snr > 60.0
    assert np.max(np.abs(err)) < 1.0  # sf=0 regime: error < 1 LSB-ish


def test_byte_identity_vs_independent_builder():
    """The shipping pack_mtc vs a struct-only builder written from the
    format spec in the module docstring — byte-for-byte identical, so
    a consistent-but-wrong encoder/decoder pair cannot pass (the
    multimodal test-side-builder discipline)."""
    seed, n_frames = 123, 4
    shipped = pack_mtc(_seed_frames(seed, n_frames), N)

    out = bytearray(b"MTC1")
    out.append(6)  # log2(64)
    out += struct.pack("<H", n_frames)
    for t in range(n_frames):
        out.append((seed + t) % 3)
        mants = [0] * N
        mants[(7 * seed + 3 * t) % N] = 100 + (seed + 11 * t) % 900
        out += struct.pack(f"<{N}h", *mants)
    assert shipped == bytes(out)
    got = decode_mtc_bytes(bytes(out))["samples"]
    assert np.max(np.abs(got - _closed_form(seed, n_frames))) == 0.0


def test_decode_matches_closed_form_sweep():
    """Seed-law decode == the oracle's two-term closed form EXACTLY
    (zero mantissas contribute exact 0.0 to the IMDCT dot product) over
    a seed sweep covering every (k, sf, amplitude) residue class."""
    for seed in range(0, 660, 53):
        f = 3 + seed % 3
        dec = decode_mtc_bytes(pack_mtc(_seed_frames(seed, f), N))
        assert dec["n_frames"] == f and dec["n"] == N
        assert np.array_equal(dec["samples"], _closed_form(seed, f))


def test_value_error_contracts():
    good = pack_mtc(_seed_frames(5, 3), N)
    with pytest.raises(ValueError, match="payload"):
        decode_mtc_bytes(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_mtc_bytes(good[:5])
    with pytest.raises(ValueError, match="header promise"):
        decode_mtc_bytes(good[:-3])
    with pytest.raises(ValueError, match="header promise"):
        decode_mtc_bytes(good + b"\x00")
    with pytest.raises(ValueError, match="unsupported"):
        decode_mtc_bytes(MAGIC + bytes([1]) + good[5:])
    with pytest.raises(ValueError, match=">= 2 frames"):
        decode_mtc_bytes(MAGIC + bytes([6]) + struct.pack("<H", 1) + good[7:])
    with pytest.raises(ValueError, match="power of two"):
        pack_mtc(_seed_frames(5, 3), 63)
    with pytest.raises(ValueError, match="entries"):
        pack_mtc([(0, np.zeros(N - 1, dtype=np.int16))], N)
    with pytest.raises(ValueError, match="scalefactor"):
        pack_mtc([(256, np.zeros(N, dtype=np.int16))], N)


def test_rice_roundtrip_and_cross_codec_identity():
    """The entropy layer is LOSSLESS: for arbitrary mantissa frames the
    Rice-coded MTC2 stream decodes to samples IDENTICAL to the
    fixed-width MTC1 stream — the cross-codec identity that makes a
    consistent-but-wrong Rice coder unpassable (same discipline as
    progressive == sequential == Huffman in the JPEG family)."""
    from library_beam_spark.operators.mdct import (
        decode_mtc2_bytes,
        pack_mtc2,
    )

    rng = np.random.default_rng(17)
    for trial in range(10):
        frames = [
            (
                int(rng.integers(0, 4)),
                rng.integers(-30000, 30000, size=N).astype(np.int16),
            )
            for _ in range(2 + trial % 4)
        ]
        d1 = decode_mtc_bytes(pack_mtc(frames, N))["samples"]
        d2 = decode_mtc2_bytes(pack_mtc2(frames, N))["samples"]
        assert np.array_equal(d1, d2)


def test_rice_golden_bits_and_independent_builder():
    """Bit-level golden for the Rice layer, built by hand from the spec
    (quotient as q 1-bits + 0, then k low bits, MSB-first, byte-aligned
    per frame) — pins the bit order, the zigzag map, and the argmin-k
    parameter choice independently of the shipping _BitWriter."""
    from library_beam_spark.operators.mdct import (
        _rice_frame_bits,
        decode_mtc2_bytes,
        pack_mtc2,
    )

    mants = np.zeros(4, dtype=np.int16)
    mants[0], mants[1], mants[2], mants[3] = 3, -1, 0, -5
    # zigzag: 6, 1, 0, 9. k=1 minimizes bits (verify the search agrees)
    k = min(range(16), key=lambda kk: _rice_frame_bits(mants, kk))
    assert k == 1
    # hand-packed bits at k=1: 6->q3 '1110'+'0'; 1->q0 '0'+'1'; 0->'0'+'0';
    # 9->q4 '11110'+'1' => 11100 01 00 111101 + pad 0 => bytes E2 7A
    hand = bytes([0b11100010, 0b01111010])
    got = pack_mtc2([(2, mants)], 4)
    assert got == b"MTC2" + bytes([2]) + struct.pack("<H", 1) + bytes(
        [2, 1]
    ) + hand
    # and a 2-frame stream of it decodes (dequant uses sf=2)
    two = pack_mtc2([(2, mants), (2, mants)], 4)
    dec = decode_mtc2_bytes(two)
    assert dec["n_frames"] == 2 and len(dec["samples"]) == 4


def test_mtc2_value_error_contracts():
    from library_beam_spark.operators.mdct import (
        decode_mtc2_bytes,
        mtc2_seed_frames,
        pack_mtc2,
    )

    good = pack_mtc2(mtc2_seed_frames(7, 3), N)
    with pytest.raises(ValueError, match="MTC2 payload"):
        decode_mtc2_bytes(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_mtc2_bytes(good[:-4])
    with pytest.raises(ValueError, match="trailing"):
        decode_mtc2_bytes(good + b"\x00")
    with pytest.raises(ValueError, match=">= 2 frames"):
        decode_mtc2_bytes(
            b"MTC2" + bytes([6]) + struct.pack("<H", 1) + good[7:]
        )


def test_mtc2_seed_law_closed_form_and_margin():
    """q:multimodal_mdct_rice's seed law: decode == the 8+8-term
    windowed cosine sum the oracle replays, and every gate-range value
    sits >= 1e-6 from a rounding boundary (vs ~1e-12 engine/oracle
    float divergence)."""
    from library_beam_spark.operators.mdct import (
        decode_mtc2_bytes,
        mtc2_seed_frames,
        pack_mtc2,
    )

    w = sine_window(N)

    def closed(seed, n_frames):
        def y(t, i):
            tot = 0.0
            for j in range(8):
                k = (7 * seed + 3 * t + 9 * j) % N
                a = (((seed + 13 * t + 29 * j) % 401) - 200) * (
                    1 << ((seed + t) % 3)
                )
                tot += a * np.cos(np.pi / N * (i + 0.5 + N / 2) * (k + 0.5))
            return (2.0 / N) * tot
        return np.array(
            [
                w[N + i] * y(t, N + i) + w[i] * y(t + 1, i)
                for t in range(n_frames - 1)
                for i in range(N)
            ]
        )

    worst = 1.0
    for seed in range(0, 5000, 59):
        f = 3 + seed % 3
        dec = decode_mtc2_bytes(pack_mtc2(mtc2_seed_frames(seed, f), N))
        exp = closed(seed, f)
        assert np.max(np.abs(dec["samples"] - exp)) < 1e-9
        s = exp * 1000.0 + 0.5
        worst = min(worst, float(np.min(np.abs(s - np.round(s)))))
    assert worst > 1e-6, f"rounding margin too thin: {worst}"


def test_fixed_point_rounding_margin_at_gate_sfs():
    """The license for the FLOOR(s*1000 + 0.5) BIGINT contract: across
    EVERY value the gate queries produce at sf0.01 (doc_ids 0..499) and
    sf0.1 (0..4999), the scaled samples sit >= 1e-6 away from a
    rounding boundary, while the engine-vs-oracle float divergence
    (cos/sin ulp + product reassociation) is ~1e-10 — four orders of
    margin, the q:multimodal_audio_spectrum argument."""
    worst = 1.0
    for seed in range(0, 5000, 53):
        s = _closed_form(seed, 3 + seed % 3) * 1000.0 + 0.5
        frac = np.abs(s - np.round(s))
        worst = min(worst, float(np.min(frac)))
    assert worst > 1e-6, f"rounding margin too thin: {worst}"
