"""REAL FLAC decode — compressed audio without a codec library.

FLAC's Huffman-free design (RFC 9639 / the original xiph spec) makes a
genuine decoder tractable the same way baseline JPEG was: a bit reader,
CRC-8/CRC-16 integrity checks, UTF-8-coded frame numbers, subframe
types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), stereo
decorrelation (left-, right-, and mid-side), and Rice-coded residuals
with partitioned parameters. LPC needs no library at DECODE time —
the quantized coefficients travel in the stream; only choosing them
at encode time does — so FLAC decode is COMPLETE here and the audio
honest slot is psychoacoustic codecs (MP3/Vorbis/AAC/Opus) only.

The GENERATOR (synthesize_flac) emits spec-compliant single-frame mono
16-bit streams whose fixed-order-2 residual law is seed-derived, so a
SQL oracle replays every decoded sample in closed form:
s_k = s0 + k·(s1−s0) + (k+1)·Σe − Σ(j·e) — the double prefix sum of
the second-order reconstruction. Wrong warmup handling, a Rice unfold
off by one, or a CRC mis-span breaks the value hash.

Scale shape: everything here is per-row Arrow-batched mapInPandas —
decode fan-out stays inside the executor, the only exchange is
whatever aggregation the caller puts on top (cf. the MJPEG-AVI and
JPEG tile operators, reference NLP.py's per-record analyzer shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..util import ensure_min_parallelism

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8 poly x^8+x^2+x^1+x^0 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly x^16+x^15+x^2+x^0 (0x8005), init 0 — the frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader over bytes with a running position."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        if self.bitpos + n > len(self.data) * 8:
            # ValueError, not IndexError: decode_flac_bytes documents
            # "raises ValueError on anything it cannot genuinely parse",
            # and truncated payloads land here.
            raise ValueError("FLAC: bit reader past end of payload")
        v = 0
        for _ in range(n):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def bytepos(self) -> int:
        return self.bitpos >> 3


def _read_utf8_number(r: _Bits) -> int:
    """The frame header's UTF-8-style coded number (frame or sample
    index) — same prefix scheme as UTF-8 but up to 7 bytes."""
    first = r.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x80
    while first & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = first & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_unfold(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _decode_residual(r: _Bits, n: int, order: int) -> list:
    """Partitioned Rice residual (RFC 9639 §9.2.7): 2-bit method (4- or
    5-bit parameters), 4-bit partition order, per-partition parameter
    with the all-ones escape meaning raw ``bps'``-bit residuals."""
    method = r.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if n % nparts:
        raise ValueError("FLAC: block size not divisible by partitions")
    if order > (n >> po):
        # Otherwise the first partition's count goes negative and
        # silently SHORTENS the residual list until the CRC trips.
        raise ValueError("FLAC: predictor order exceeds first partition")
    out: list = []
    for p in range(nparts):
        cnt = (n >> po) - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(
                r.read_signed(raw) if raw else 0 for _ in range(cnt)
            )
        else:
            for _ in range(cnt):
                q = r.unary()
                rem = r.read(param) if param else 0
                out.append(_rice_unfold((q << param) | rem))
    return out


def _decode_subframe(r: _Bits, n: int, bps: int) -> list:
    if r.read(1) != 0:
        raise ValueError("FLAC: subframe padding bit set")
    sftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if sftype == 0:  # CONSTANT
        samples = [r.read_signed(eff)] * n
    elif sftype == 1:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(n)]
    elif 8 <= sftype <= 12:  # FIXED order 0-4
        order = sftype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, n, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for e in resid:
            pred = sum(
                c * samples[-i - 1] for i, c in enumerate(coefs)
            )
            samples.append(pred + e)
    elif sftype >= 32:  # LPC order 1-32
        # Decoding LPC needs no codec library — the quantized
        # coefficients are IN the stream (only choosing them at encode
        # time does): order warmup samples, 4-bit precision-1, 5-bit
        # signed shift, order signed coefficients, then the same
        # partitioned-Rice residual; prediction is the coefficient dot
        # product arithmetic-shifted right (RFC 9639 §9.2.6 — the
        # shift is a FLOOR division, exactness the oracle replays).
        order = sftype - 31
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC: invalid LPC precision code")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift is reserved")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, n, order)
        samples = list(warm)
        for e in resid:
            acc = sum(
                c * samples[-i - 1] for i, c in enumerate(coefs)
            )
            samples.append((acc >> shift) + e)
    else:
        raise ValueError(f"FLAC: reserved subframe type {sftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_bytes(payload: bytes) -> dict:
    """Parse a FLAC stream: 'fLaC' magic, STREAMINFO (+ any other
    metadata blocks, skipped), then every frame — header CRC-8 and
    whole-frame CRC-16 VERIFIED, independent channels AND the three
    stereo-decorrelation assignments (left/right/mid-side), subframes
    per :func:`_decode_subframe`. Returns {sample_rate, channels, bps,
    total_samples, samples: [list per channel]}. Raises ValueError on
    anything it cannot genuinely parse."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    i = 4
    info = None
    while True:
        if i + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = payload[i]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(payload[i + 1 : i + 4], "big")
        if i + 4 + blen > len(payload):
            raise ValueError("FLAC: metadata block overruns payload")
        if btype == 0:  # STREAMINFO
            b = _Bits(payload, i + 4)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)
            b.read(24)
            rate = b.read(20)
            nch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = (rate, nch, bps, total)
        i += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC without STREAMINFO")
    rate, nch, bps, total = info
    chans: list = [[] for _ in range(nch)]
    while i < len(payload):
        frame_start = i
        r = _Bits(payload, i)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        if r.read(1) != 0:
            raise ValueError("FLAC: reserved bit set in frame header")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1) != 0:
            raise ValueError("FLAC: reserved frame-header bit set")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 1:
            n = 192
        elif bs_code <= 5:
            n = 576 << (bs_code - 2)
        elif bs_code == 6:
            n = r.read(8) + 1
        elif bs_code == 7:
            n = r.read(16) + 1
        else:
            n = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        crc8 = r.read(8)
        if _crc8(payload[frame_start : r.bytepos() - 1]) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code > 10:
            raise ValueError("FLAC: reserved channel assignment")
        fr_nch = ch_code + 1 if ch_code < 8 else 2
        if fr_nch != nch:
            raise ValueError("FLAC: frame channels disagree with STREAMINFO")
        fbps = {
            0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32,
        }.get(ss_code)
        if fbps is None:
            raise ValueError("FLAC: reserved sample size code")
        if ch_code < 8:  # independent channels
            for c in range(nch):
                chans[c].extend(_decode_subframe(r, n, fbps))
        else:
            # Stereo decorrelation (RFC 9639 §9.1.3): the SIDE channel
            # carries one extra bit; reconstruction is pure integer
            # arithmetic — no codec library involved.
            extra0 = 1 if ch_code == 9 else 0   # right/side: side first
            extra1 = 1 if ch_code in (8, 10) else 0
            c0 = _decode_subframe(r, n, fbps + extra0)
            c1 = _decode_subframe(r, n, fbps + extra1)
            if ch_code == 8:  # left/side
                left, right = c0, [a - b for a, b in zip(c0, c1)]
            elif ch_code == 9:  # side/right — side is channel 0
                right = c1
                left = [a + b for a, b in zip(c1, c0)]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
            chans[0].extend(left)
            chans[1].extend(right)
        r.align()
        crc16 = int.from_bytes(payload[r.bytepos() : r.bytepos() + 2], "big")
        if _crc16(payload[frame_start : r.bytepos()]) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        i = r.bytepos() + 2
    if total and len(chans[0]) != total:
        raise ValueError("FLAC: decoded samples disagree with STREAMINFO")
    return {
        "sample_rate": rate,
        "channels": nch,
        "bps": bps,
        "total_samples": len(chans[0]),
        "samples": chans,
    }


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list = []

    def write(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        return bytes(
            int("".join(map(str, self.bits[j : j + 8])), 2)
            for j in range(0, len(self.bits), 8)
        )


def _flac_payload(samples: list, rate: int = 8000, rice_p: int = 2) -> bytes:
    """Assemble a spec-compliant single-frame mono 16-bit FLAC stream:
    STREAMINFO + one fixed-blocksize frame holding a FIXED order-2
    subframe (warmup s0, s1 + Rice(p) residuals, partition order 0),
    header CRC-8 and frame CRC-16 computed for real."""
    n = len(samples)
    assert n >= 2
    si = _BitsW()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bps - 1 = 16-bit
    si.write(n, 36)
    info = si.tobytes() + b"\x00" * 16  # md5 unset (all zero is legal)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info
    # frame header: sync + fixed strategy, blocksize code 7 (16 bits at
    # end), sample rate from STREAMINFO, mono, 16-bit, frame number 0
    w = _BitsW()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)   # blocksize: 16-bit at end of header
    w.write(0, 4)   # sample rate: STREAMINFO
    w.write(0, 4)   # mono
    w.write(0b100, 3)  # 16-bit
    w.write(0, 1)
    w.write(0, 8)   # UTF-8 frame number 0
    w.write(n - 1, 16)
    hdr = w.tobytes()
    hdr += bytes([_crc8(hdr)])
    b = _BitsW()
    b.write(0, 1)
    b.write(8 + 2, 6)  # FIXED order 2
    b.write(0, 1)      # no wasted bits
    b.write_signed(samples[0], 16)
    b.write_signed(samples[1], 16)
    b.write(0, 2)   # residual method 0 (4-bit rice params)
    b.write(0, 4)   # partition order 0
    b.write(rice_p, 4)
    for k in range(2, n):
        e = samples[k] - (2 * samples[k - 1] - samples[k - 2])
        folded = (e << 1) if e >= 0 else (-(e << 1) - 1)
        q, rem = folded >> rice_p, folded & ((1 << rice_p) - 1)
        b.write(0, q)
        b.write(1, 1)
        b.write(rem, rice_p)
    b.align()
    frame = hdr + b.tobytes()
    frame += _crc16(frame).to_bytes(2, "big")
    return bytes(out + frame)


def synthesize_flac(
    df: DataFrame,
    n_col: str = "n_samples",
    seed_col: str = "doc_id",
    rate: int = 8000,
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL FLAC stream per row with the seed law
    s0 = (seed mod 50) − 25, s1 = s0 + (seed mod 7) − 3, and residuals
    e_k = ((seed + 7k) mod 5) − 2 under the fixed order-2 predictor —
    bounded so every sample stays inside 16 bits at n ≤ 128 and a SQL
    oracle replays the double prefix sum in closed form."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def one(seed: int, n: int) -> bytes:
        s0 = (seed % 50) - 25
        s1 = s0 + (seed % 7) - 3
        samples = [s0, s1]
        for k in range(2, n):
            e = ((seed + 7 * k) % 5) - 2
            samples.append(2 * samples[-1] - samples[-2] + e)
        return _flac_payload(samples, rate=rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[payload_col] = [
                one(int(s), int(n))
                for s, n in zip(pdf[seed_col], pdf[n_col])
            ]
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def flac_sample_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode FLAC payloads and emit exact integer sample statistics
    (mono): n_samples, sum, sum of squares, min, max — the clip-level
    features an audio-curation pipeline gates on, as integers a SQL
    oracle replays without float drift. Undecodable payloads drop
    their rows; per-row, Arrow-batched, shuffle-free."""
    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [
            StructField("n_samples", IntegerType()),
            StructField("sum_samples", LongType()),
            StructField("sum_sq", LongType()),
            StructField("min_s", IntegerType()),
            StructField("max_s", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            col_idx = {c: k + 1 for k, c in enumerate(pdf.columns)}
            for row in pdf.itertuples(index=True, name=None):
                raw = row[col_idx[payload_col]]
                try:
                    dec = decode_flac_bytes(
                        bytes(raw) if raw is not None else b""
                    )
                    if dec["channels"] != 1:
                        continue
                except Exception:
                    continue
                s = dec["samples"][0]
                rows.append(
                    {
                        **{c: row[col_idx[c]] for c in id_cols},
                        "n_samples": len(s),
                        "sum_samples": sum(s),
                        "sum_sq": sum(x * x for x in s),
                        "min_s": min(s),
                        "max_s": max(s),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=id_cols
                + ["n_samples", "sum_samples", "sum_sq", "min_s", "max_s"],
            )

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def _flac_payload_lpc(
    samples: list,
    coefs: list,
    shift: int,
    prec: int = 5,
    rate: int = 8000,
    rice_p: int = 3,
) -> bytes:
    """Assemble a single-frame mono 16-bit FLAC stream whose subframe
    is LPC with the GIVEN quantized coefficients: warmup = the first
    ``order`` samples, residual e_k = s_k − ((Σ c_i·s_{k−i}) >> shift)
    Rice-coded at ``rice_p``, partition order 0 — the encoder side of
    RFC 9639 §9.2.6 with the coefficient choice pinned by the caller
    (what a codec library would search for; the bitstream itself is
    mechanical)."""
    order = len(coefs)
    n = len(samples)
    assert n > order
    si = _BitsW()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    info = si.tobytes() + b"\x00" * 16
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info
    w = _BitsW()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)
    w.write(0, 4)
    w.write(0, 4)
    w.write(0b100, 3)
    w.write(0, 1)
    w.write(0, 8)
    w.write(n - 1, 16)
    hdr = w.tobytes()
    hdr += bytes([_crc8(hdr)])
    b = _BitsW()
    b.write(0, 1)
    b.write(31 + order, 6)  # LPC subframe, given order
    b.write(0, 1)
    for v in samples[:order]:
        b.write_signed(v, 16)
    b.write(prec - 1, 4)
    b.write_signed(shift, 5)
    for c in coefs:
        b.write_signed(c, prec)
    b.write(0, 2)
    b.write(0, 4)
    b.write(rice_p, 4)
    for k in range(order, n):
        acc = sum(c * samples[k - i - 1] for i, c in enumerate(coefs))
        e = samples[k] - (acc >> shift)
        folded = (e << 1) if e >= 0 else (-(e << 1) - 1)
        q, rem = folded >> rice_p, folded & ((1 << rice_p) - 1)
        b.write(0, q)
        b.write(1, 1)
        if rice_p:
            b.write(rem, rice_p)
    b.align()
    frame = hdr + b.tobytes()
    frame += _crc16(frame).to_bytes(2, "big")
    return bytes(out + frame)


def synthesize_flac_lpc(
    df: DataFrame,
    n_col: str = "n_samples",
    seed_col: str = "doc_id",
    rate: int = 8000,
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL LPC-subframe FLAC stream per row: quantized
    coefficients [3, -1] at shift 1 (prediction (3·s₁ − s₂) >> 1 —
    characteristic roots 1 and ½, so the seed-driven residual walk
    stays 16-bit-bounded), warmup s0 = (seed mod 60) − 30,
    s1 = s0 + (seed mod 9) − 4, residuals e_k = ((seed + 5k) mod 7) − 3.
    The arithmetic SHIFT is a floor division, which the SQL oracle
    replays iteratively (recursive CTE) — no closed form exists once
    the floor nonlinearity enters the recurrence, which is exactly
    what makes this a decoder-honesty check."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def one(seed: int, n: int) -> bytes:
        s0 = (seed % 60) - 30
        s1 = s0 + (seed % 9) - 4
        samples = [s0, s1]
        for k in range(2, n):
            e = ((seed + 5 * k) % 7) - 3
            acc = 3 * samples[-1] - samples[-2]
            samples.append((acc >> 1) + e)
        return _flac_payload_lpc(samples, [3, -1], 1, rate=rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[payload_col] = [
                one(int(s), int(n))
                for s, n in zip(pdf[seed_col], pdf[n_col])
            ]
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)
