"""REAL arithmetic-coded JPEG — the last image honest slot retired.

T.81 extended sequential DCT with arithmetic entropy coding (SOF9):
the QM-coder of Annex D (probability state machine of Table D.3,
interval registers A/C, renormalization with carry propagation and
X'FF'-stuffing byte output, the D.1.8 clean-termination rule) driving
the DC/AC statistical models of §F.1.4 (five-way DC conditioning on
the previous DIFF with the default (L=0, U=1) bounds, per-index AC
EOB/zero-run contexts with the Kx=5 low/high magnitude split, the
fixed ½-probability state for AC signs). Everything here is stated by
the T.81 flowcharts (Figures D.1–D.10, F.4–F.9 encode / F.19–F.24
decode); the probability table is Table D.3 verbatim (114th entry =
the non-adapting fixed bin).

Honesty discipline: the decoder is pinned by (1) the DECISIVE
cross-codec test — the same DC law emitted as a Huffman SOF0 stream
(multimodal._jpeg_dc_payload) and as an arithmetic SOF9 stream must
decode to IDENTICAL pixel arrays (tests/test_jpeg_arith.py), (2)
encoder→decoder coefficient roundtrips over randomized DC+AC blocks
(hypothesis), exercising conditional exchange, carry bytes, stuffing,
and every magnitude-category path, and (3) a hand-simulated QM-coder
golden: the first decisions from the initial state are worked through
the Annex D flowcharts by hand in the test and the emitted bytes
compared. Restart intervals are SUPPORTED (F.1.4.1.1: each interval
is a self-contained arithmetic segment — fresh coder, statistics, DC
predictor; RSTm sequence validated). Multi-component YCbCr scans decode for real —
including SUBSAMPLED interleaved MCUs (4:2:0 / 4:2:2 / 4:1:1, the
A.2.3 walk with per-component predictors, luma tables 0 / shared
chroma tables 1) — each pinned by decisive nonzero-chroma parity
against the Huffman subsampled generator. PROGRESSIVE arithmetic
(SOF10, Annex G on the QM-coder: spectral selection × successive
approximation — encode_jpeg_arith_progressive /
_decode_jpeg_arith_progressive) decodes for real too, grayscale,
pinned by the decisive triple identity progressive-arithmetic ≡
sequential-arithmetic ≡ Huffman-SA pixels on coefficients that
straddle the point transform. What remains honest for codec
libraries: progressive arithmetic over multi-component/subsampled
frames and restart intervals inside progressive scans.

Scale shape: per-row Arrow-batched mapInPandas like every decoder in
operators/multimodal.py — no shuffle, fan-out inside the executor.
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
from .multimodal import _JPEG_ZIGZAG

# T.81 Table D.3 (Qe value, Next_Index_MPS, Next_Index_LPS, Switch_MPS);
# entry 113 is the fixed ~0.5 bin used for AC sign decisions (F.1.4.3.1)
_ARITH_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class _QMEncoder:
    """Annex D encoder: A/C interval registers, CT bit counter, the
    D.1.6 byte-out with carry propagation over stacked X'FF' bytes
    (converted to X'00' on carry), X'00'-stuffing after emitted X'FF',
    and deferred trailing-zero suppression; D.1.8 termination picks
    the in-interval value with the most trailing zeros."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1  # -1: nothing pending yet (start of stream)
        self.sc = 0       # stacked X'FF' bytes awaiting carry resolution
        self.zc = 0       # deferred X'00' bytes (dropped if trailing)
        self.out = bytearray()

    def _flush_zeros(self):
        if self.zc:
            self.out += b"\x00" * self.zc
            self.zc = 0

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry: bump the pending byte, convert stacked FFs to 00s
            if self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
            # spacer bits guarantee t & 0xFF != 0xFF here (D.1.6 note)
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # stack: a later carry may still bump it
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zeros()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def encode(self, st: list, bit: int) -> None:
        idx, mps = st
        qe, nmps, nlps, switch = _ARITH_TAB[idx]
        self.a -= qe
        if bit != mps:
            if self.a >= qe:
                # no conditional exchange: LPS takes the upper interval
                self.c += self.a
                self.a = qe
            st[0] = nlps
            if switch:
                st[1] = mps ^ 1
        else:
            if self.a >= 0x8000:
                return  # no renormalization -> no estimation update
            if self.a < qe:
                # conditional exchange: MPS takes the (larger) upper part
                self.c += self.a
                self.a = qe
            st[0] = nmps
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def finish(self) -> bytes:
        # D.1.8: clean termination, most trailing zero bits
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zeros()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zeros()
                self.out += b"\xff\x00" * self.sc
                self.sc = 0
        if self.c & 0x7FFF800:
            self._flush_zeros()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        # trailing deferred zeros are legitimately discarded (D.1.8 —
        # the decoder supplies zeros past the end of the segment)
        return bytes(self.out)


class _QMDecoder:
    """Annex D decoder over UNSTUFFED entropy bytes: c_high tracks the
    code value relative to the current interval base (always < A);
    renormalization shifts in stream bits MSB-first, zeros past the
    end (D.2.6 — hitting the trailing marker is legal)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0
        self.a = 0x10000
        self.c_high = 0
        for _ in range(16):
            self.c_high = (self.c_high << 1) | self._next_bit()

    def _next_bit(self) -> int:
        if self.bitcnt == 0:
            self.bitbuf = (
                self.data[self.pos] if self.pos < len(self.data) else 0
            )
            self.pos += 1
            self.bitcnt = 8
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def decode(self, st: list) -> int:
        idx, mps = st
        qe, nmps, nlps, switch = _ARITH_TAB[idx]
        a = self.a - qe
        if self.c_high < a:
            # lower sub-interval (the MPS one unless exchanged)
            if a >= 0x8000:
                self.a = a
                return mps  # no renorm -> no estimation update
            if a < qe:  # conditional exchange: lower part is the LPS
                bit = mps ^ 1
                st[0] = nlps
                if switch:
                    st[1] = mps ^ 1
            else:
                bit = mps
                st[0] = nmps
            self.a = a
        else:
            # upper sub-interval (width qe)
            self.c_high -= a
            if a < qe:  # conditional exchange: upper part is the MPS
                bit = mps
                st[0] = nmps
            else:
                bit = mps ^ 1
                st[0] = nlps
                if switch:
                    st[1] = mps ^ 1
            self.a = qe
        while self.a < 0x8000:
            self.a <<= 1
            self.c_high = (self.c_high << 1) | self._next_bit()
        return bit


def _new_dc_stats():
    return [[0, 0] for _ in range(64)]


def _new_ac_stats():
    return [[0, 0] for _ in range(256)]


def _encode_dc(enc, dc_stats, fixed_ctx, diff, ctx_state, lo, up):
    """F.1.4.1 / Figures F.4–F.9 (contexts per Table F.4: the five
    conditioning classes at 0/4/8/12/16, X1..X15 at 20, magnitude bits
    at X+14). Returns the next conditioning class."""
    s0 = ctx_state
    if diff == 0:
        enc.encode(dc_stats[s0], 0)
        return 0
    enc.encode(dc_stats[s0], 1)
    if diff > 0:
        enc.encode(dc_stats[s0 + 1], 0)
        sz = diff - 1
        st = s0 + 2
        sign = 0
    else:
        enc.encode(dc_stats[s0 + 1], 1)
        sz = -diff - 1
        st = s0 + 3
        sign = 1
    m = 0
    if sz:
        enc.encode(dc_stats[st], 1)
        m = 1
        st = 20  # X1
        v2 = sz
        while v2 >> 1:
            v2 >>= 1
            enc.encode(dc_stats[st], 1)
            m <<= 1
            st += 1
    enc.encode(dc_stats[st], 0)
    if m < ((1 << lo) >> 1):
        nxt = 0
    elif m > ((1 << up) >> 1):
        nxt = 12 + sign * 4
    else:
        nxt = 4 + sign * 4
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(dc_stats[st], 1 if (mm & sz) else 0)
    return nxt


def _decode_dc(dec, dc_stats, ctx_state, lo, up):
    """Inverse of :func:`_encode_dc`; returns (diff, next class)."""
    s0 = ctx_state
    if dec.decode(dc_stats[s0]) == 0:
        return 0, 0
    sign = dec.decode(dc_stats[s0 + 1])
    st = s0 + 2 + sign
    m = 0
    if dec.decode(dc_stats[st]):
        m = 1
        st = 20
        while dec.decode(dc_stats[st]):
            m <<= 1
            st += 1
            if m == 0x8000:
                raise ValueError("JPEG arith: DC magnitude overflow")
    if m < ((1 << lo) >> 1):
        nxt = 0
    elif m > ((1 << up) >> 1):
        nxt = 12 + sign * 4
    else:
        nxt = 4 + sign * 4
    v = m
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        if dec.decode(dc_stats[st]):
            v |= mm
    v += 1
    return (-v if sign else v), nxt


def _encode_ac(enc, ac_stats, fixed_ctx, coefs, kx):
    """F.1.4.2 / Figure F.5: per-index EOB and zero/nonzero contexts at
    3(k−1), sign through the fixed bin, magnitude categories ≥ 4 in
    the shared low/high areas at 189/217 split on Kx."""
    _encode_ac_first(enc, ac_stats, fixed_ctx, coefs, kx, 1, 63, 0)


def _encode_ac_first(enc, ac_stats, fixed_ctx, coefs, kx, ss, se, al):
    """The §G.1.3.1 generalization of the sequential AC model: band
    [ss, se], magnitudes point-transformed by ``al`` (|v| >> al with
    the sign kept — Figure G.5 is Figure F.5 on the scaled values).
    ss=1, se=63, al=0 IS the sequential model."""
    ke = se
    while ke >= ss and (abs(coefs[_JPEG_ZIGZAG[ke]]) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ac_stats[st], 0)  # not EOB
        while (abs(coefs[_JPEG_ZIGZAG[k]]) >> al) == 0:
            enc.encode(ac_stats[st + 1], 0)
            st += 3
            k += 1
        enc.encode(ac_stats[st + 1], 1)
        v = coefs[_JPEG_ZIGZAG[k]]
        if v > 0:
            enc.encode(fixed_ctx, 0)
        else:
            v = -v
            enc.encode(fixed_ctx, 1)
        v >>= al
        sz = v - 1
        st += 2
        m = 0
        if sz:
            enc.encode(ac_stats[st], 1)
            m = 1
            if sz >> 1:
                enc.encode(ac_stats[st], 1)
                m = 2
                st = 189 if k <= kx else 217
                v2 = sz >> 1
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(ac_stats[st], 1)
                    m <<= 1
                    st += 1
        enc.encode(ac_stats[st], 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(ac_stats[st], 1 if (mm & sz) else 0)
        k += 1
    if ke < se:
        enc.encode(ac_stats[3 * (k - 1)], 1)  # EOB


def _decode_ac(dec, ac_stats, fixed_ctx, coefs, kx):
    """Inverse of :func:`_encode_ac`, filling ``coefs`` in natural
    order (Figures F.20–F.24)."""
    _decode_ac_first(dec, ac_stats, fixed_ctx, coefs, kx, 1, 63, 0)


def _decode_ac_first(dec, ac_stats, fixed_ctx, coefs, kx, ss, se, al):
    """Inverse of :func:`_encode_ac_first`: decoded magnitudes are
    scaled back up by ``al`` (Figure G.7's low half — first scans)."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac_stats[st]):
            return  # EOB
        while dec.decode(ac_stats[st + 1]) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("JPEG arith: AC run past band end")
        sign = dec.decode(fixed_ctx)
        st += 2
        m = 0
        if dec.decode(ac_stats[st]):
            m = 1
            if dec.decode(ac_stats[st]):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(ac_stats[st]):
                    m <<= 1
                    st += 1
                    if m == 0x8000:
                        raise ValueError(
                            "JPEG arith: AC magnitude overflow"
                        )
        v = m
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            if dec.decode(ac_stats[st]):
                v |= mm
        v += 1
        coefs[_JPEG_ZIGZAG[k]] = (-v if sign else v) << al
        k += 1


def _encode_ac_refine(enc, ac_stats, fixed_ctx, coefs, visible, ss, se, al):
    """§G.1.3.3 (Figure G.10): AC successive-approximation refinement.
    ``visible`` is the decoder-visible accumulated block state after
    the PREVIOUS scans — maintaining it explicitly makes the
    EOBx/newly-nonzero decisions mirror the decoder by construction
    for any legal scan script (instead of re-deriving them from shift
    identities that only hold for standard scripts). Per band index:
    previously-nonzero coefficients send one correction bit (context
    3(k−1)+2), newly-nonzero send the zero/nonzero decision (+1) and
    the sign through the FIXED bin, zero-history runs send 0s; the EOB
    decision (context 3(k−1)) is coded only at k beyond the previous
    stage's end-of-block EOBx."""
    ke = se
    while ke >= ss and (abs(coefs[_JPEG_ZIGZAG[ke]]) >> al) == 0:
        ke -= 1
    kex = se
    while kex > 0 and visible[_JPEG_ZIGZAG[kex]] == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ac_stats[st], 0)  # not EOB
        while True:
            nat = _JPEG_ZIGZAG[k]
            c = coefs[nat]
            if (abs(c) >> al) != 0:
                if visible[nat] != 0:  # previously nonzero: one bit
                    enc.encode(ac_stats[st + 2], (abs(c) >> al) & 1)
                else:  # newly nonzero at this precision
                    enc.encode(ac_stats[st + 1], 1)
                    enc.encode(fixed_ctx, 0 if c > 0 else 1)
                break
            enc.encode(ac_stats[st + 1], 0)
            st += 3
            k += 1
        k += 1
    if ke < se:
        enc.encode(ac_stats[3 * (k - 1)], 1)  # EOB


def _decode_ac_refine(dec, ac_stats, fixed_ctx, coefs, ss, se, al):
    """Inverse of :func:`_encode_ac_refine` (Figure G.7's subsequent-
    scan half): corrections add ±2^al toward larger magnitude on
    previously nonzero coefficients; newly nonzero ones land at
    ±2^al with the sign from the fixed bin."""
    p1 = 1 << al
    m1 = -(1 << al)
    kex = se
    while kex > 0 and coefs[_JPEG_ZIGZAG[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(ac_stats[st]):
            return  # EOB
        while True:
            nat = _JPEG_ZIGZAG[k]
            if coefs[nat] != 0:
                if dec.decode(ac_stats[st + 2]):
                    coefs[nat] += m1 if coefs[nat] < 0 else p1
                break
            if dec.decode(ac_stats[st + 1]):
                coefs[nat] = m1 if dec.decode(fixed_ctx) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError(
                    "JPEG arith: AC refine run past band end"
                )
        k += 1


def encode_jpeg_arith(
    blocks: list, bw: int, bh: int, q0: int = 16,
    lo: int = 0, up: int = 1, kx: int = 5,
    restart_interval: int = 0, ncomp: int = 1,
) -> bytes:
    """Assemble an SOF9 (extended sequential, arithmetic) JPEG:
    SOI / DQT(q0 flat) / SOF9 / DAC / [DRI] / SOS, entropy data from
    the QM-coder over the F.1.4 models. ``blocks`` is a list of
    length-64 NATURAL-order coefficient arrays (quantized) — raster
    block order for grayscale; for ``ncomp=3`` (1×1-sampled YCbCr,
    MCU = one block per component) the list interleaves components
    per MCU, component 0 codes through DC/AC conditioning tables 0
    and components 1-2 SHARE tables 1 (the luma/chroma convention),
    each component keeping its OWN DC predictor and conditioning
    class (F.1.4.1: the statistics bins are per table, the
    prior-DIFF state per component). ``restart_interval`` > 0 emits
    DRI and, every that many MCUs, terminates the coder cleanly
    (D.1.8), writes RSTm (modulo-8 sequence), and RESETS the coder,
    every statistics area, and every component's DC predictor and
    conditioning class (F.1.4.1.1 — a restart interval is a fully
    self-contained arithmetic segment)."""
    import struct

    if ncomp not in (1, 3):
        raise ValueError("ncomp must be 1 or 3")
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes([q0] * 64)
    out += b"\xff\xc9" + struct.pack(
        ">HBHHB", 2 + 6 + 3 * ncomp, 8, bh * 8, bw * 8, ncomp
    )
    for c in range(ncomp):
        out += struct.pack(">BBB", c + 1, 0x11, 0)
    ntab = 1 if ncomp == 1 else 2
    dac = []
    for t in range(ntab):
        dac += [0x00 | t, (up << 4) | lo, 0x10 | t, kx]
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + bytes(dac)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 2 * ncomp + 3, ncomp)
    for c in range(ncomp):
        t = 0 if c == 0 else 1
        out += struct.pack(">BB", c + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"
    ctab = [0 if c == 0 else 1 for c in range(ncomp)]

    def fresh():
        return (
            _QMEncoder(),
            [_new_dc_stats() for _ in range(ntab)],
            [_new_ac_stats() for _ in range(ntab)],
            [113, 0],
            [0] * ncomp,
            [0] * ncomp,
        )

    enc, dc_stats, ac_stats, fixed_ctx, last_dc, dc_ctx = fresh()
    rst = 0
    n_mcu = bw * bh
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            out += enc.finish()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            enc, dc_stats, ac_stats, fixed_ctx, last_dc, dc_ctx = fresh()
        for c in range(ncomp):
            coefs = blocks[m * ncomp + c]
            t = ctab[c]
            diff = coefs[0] - last_dc[c]
            last_dc[c] = coefs[0]
            dc_ctx[c] = _encode_dc(
                enc, dc_stats[t], fixed_ctx, diff, dc_ctx[c], lo, up
            )
            _encode_ac(enc, ac_stats[t], fixed_ctx, coefs, kx)
    out += enc.finish() + b"\xff\xd9"
    return bytes(out)


#: DC first at Al=1, AC first in two spectral bands at Al=1, then the
#: successive-approximation refinements band by band down to Al=0 —
#: exercises BOTH progressive dimensions (G.1.1.1.1 spectral selection,
#: G.1.1.1.2 successive approximation) on the arithmetic models.
PROGRESSIVE_SCANS = (
    (0, 0, 0, 1),
    (1, 5, 0, 1),
    (6, 63, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
)


def encode_jpeg_arith_progressive(
    blocks: list, bw: int, bh: int, q0: int = 16,
    lo: int = 0, up: int = 1, kx: int = 5,
    scans=PROGRESSIVE_SCANS,
) -> bytes:
    """Assemble a PROGRESSIVE arithmetic JPEG (SOF10, T.81 Annex G on
    the Annex D QM-coder): SOI / DQT / SOF10 / DAC, then one SOS +
    entropy segment per (Ss, Se, Ah, Al) scan. Grayscale. Every scan
    is a self-contained arithmetic segment — fresh coder, fresh
    statistics areas, fresh DC predictor/conditioning (F.1.4.1.1
    applied per scan, mirroring the decoder). DC first scans code the
    point-transformed diffs through the sequential DC model
    (G.1.3.1); DC refinements send ONE fixed-bin bit per block
    (G.1.3.2); AC first scans run the sequential AC model band-limited
    on scaled magnitudes; AC refinements follow Figure G.10 with the
    encoder mirroring the decoder's EOBx off an explicitly-maintained
    visible-state block (see _encode_ac_refine). ``blocks`` is a list
    of length-64 NATURAL-order quantized coefficient arrays in raster
    block order."""
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes([q0] * 64)
    out += b"\xff\xca" + struct.pack(
        ">HBHHB", 2 + 6 + 3, 8, bh * 8, bw * 8, 1
    )
    out += struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xcc" + struct.pack(">H", 2 + 4) + bytes(
        [0x00, (up << 4) | lo, 0x10, kx]
    )
    n_blocks = bw * bh
    visible = [[0] * 64 for _ in range(n_blocks)]
    for ss, se, ah, al in scans:
        out += b"\xff\xda" + struct.pack(
            ">HBBBBBB", 2 + 1 + 2 + 3, 1, 1, 0x00, ss, se, (ah << 4) | al
        )
        enc = _QMEncoder()
        fixed_ctx = [113, 0]
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se = 0")
            if ah == 0:
                dc_stats = _new_dc_stats()
                last = 0
                ctx = 0
                for blk in blocks:
                    v = blk[0] >> al
                    ctx = _encode_dc(
                        enc, dc_stats, fixed_ctx, v - last, ctx, lo, up
                    )
                    last = v
            else:
                for blk in blocks:
                    enc.encode(fixed_ctx, (blk[0] >> al) & 1)
            for blk, vis in zip(blocks, visible):
                vis[0] = (blk[0] >> al) << al
        else:
            ac_stats = _new_ac_stats()
            if ah == 0:
                for blk in blocks:
                    _encode_ac_first(
                        enc, ac_stats, fixed_ctx, blk, kx, ss, se, al
                    )
            else:
                for blk, vis in zip(blocks, visible):
                    _encode_ac_refine(
                        enc, ac_stats, fixed_ctx, blk, vis, ss, se, al
                    )
            for blk, vis in zip(blocks, visible):
                for k in range(ss, se + 1):
                    nat = _JPEG_ZIGZAG[k]
                    c = blk[nat]
                    mag = (abs(c) >> al) << al
                    vis[nat] = -mag if c < 0 else mag
        out += enc.finish()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_subsampled(
    y_blocks: list, cb_blocks: list, cr_blocks: list,
    mcux: int, mcuy: int, hy: int = 2, vy: int = 2, q0: int = 16,
    lo: int = 0, up: int = 1, kx: int = 5, restart_interval: int = 0,
) -> bytes:
    """SOF9 arithmetic JPEG with luma sampling (hy, vy) against 1×1
    chroma — 2,2 = 4:2:0, 2,1 = 4:2:2, 4,1 = 4:1:1 — the interleaved
    MCU sibling of :func:`encode_jpeg_arith` (A.2.3 walk: each MCU
    carries hy·vy Y blocks in raster order then one Cb and one Cr;
    ``y_blocks`` indexed hy·vy·mcu + sub in that order, chroma per
    MCU). Luma codes through DC/AC conditioning tables 0, chroma
    shares tables 1; the per-COMPONENT DC predictor runs straight
    through a component's blocks within an MCU. Restart intervals
    reset everything per segment (F.1.4.1.1)."""
    import struct

    nsub = hy * vy
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes([q0] * 64)
    out += b"\xff\xc9" + struct.pack(
        ">HBHHB", 2 + 6 + 9, 8, mcuy * vy * 8, mcux * hy * 8, 3
    )
    out += struct.pack(">BBB", 1, (hy << 4) | vy, 0)
    out += struct.pack(">BBB", 2, 0x11, 0)
    out += struct.pack(">BBB", 3, 0x11, 0)
    dac = []
    for t in range(2):
        dac += [0x00 | t, (up << 4) | lo, 0x10 | t, kx]
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + bytes(dac)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 2 + 1 + 6 + 3, 3)
    out += struct.pack(">BB", 1, 0x00)
    out += struct.pack(">BB", 2, 0x11)
    out += struct.pack(">BB", 3, 0x11)
    out += b"\x00\x3f\x00"

    def fresh():
        return (
            _QMEncoder(),
            [_new_dc_stats() for _ in range(2)],
            [_new_ac_stats() for _ in range(2)],
            [113, 0],
            [0, 0, 0],
            [0, 0, 0],
        )

    enc, dc_stats, ac_stats, fixed_ctx, last_dc, dc_ctx = fresh()
    rst = 0

    def put(ci, t, coefs):
        nonlocal enc
        diff = coefs[0] - last_dc[ci]
        last_dc[ci] = coefs[0]
        dc_ctx[ci] = _encode_dc(
            enc, dc_stats[t], fixed_ctx, diff, dc_ctx[ci], lo, up
        )
        _encode_ac(enc, ac_stats[t], fixed_ctx, coefs, kx)

    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            out += enc.finish()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            enc, dc_stats, ac_stats, fixed_ctx, last_dc, dc_ctx = fresh()
        for sub in range(nsub):
            put(0, 0, y_blocks[nsub * m + sub])
        put(1, 1, cb_blocks[m])
        put(2, 1, cr_blocks[m])
    out += enc.finish() + b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arith_bytes(payload: bytes):
    """Decode an SOF9 arithmetic JPEG — grayscale, 1×1 YCbCr, or
    subsampled interleaved YCbCr: marker walk (DQT / SOF9 / optional
    DAC / DRI / SOS), unstuff the entropy data (X'FF'X'00' → X'FF';
    X'FF'+RSTm splits restart segments, sequence validated;
    X'FF'+other marker terminates), QM-decode every MCU through the
    F.1.4 models — statistics bins PER CONDITIONING TABLE (a scan's
    Td/Ta select them), DC predictor and conditioning class PER
    COMPONENT, the A.2.3 interleaved walk for subsampled MCUs,
    everything fresh per restart interval — then box-upsample,
    dequantize + IDCT + (for color) the exact YCbCr→RGB float
    expression of multimodal._jpeg_pixels. Returns (h, w) uint8 gray
    or (h, w, 3) uint8 RGB. Raises ValueError on Huffman frames,
    standalone/truncated marker segments, and (until the progressive
    path below lands) progressive arithmetic."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt = None
    w = h = None
    comps = None  # [(cid)] — 1×1 sampling enforced, shared quant table 0
    dc_cond: dict = {}  # table id -> (L, U); defaults F.1.4.4.1.4
    ac_cond: dict = {}  # table id -> Kx;   default F.1.4.4.2.1
    scan_tabs = None  # per scan component: (Td, Ta)
    dri = 0
    i = 2
    data = None
    while i + 1 < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker walk desynchronized")
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # TEM / stray RSTm outside a scan / repeated SOI: standalone
            # markers carry no length field — rejecting them explicitly
            # beats misreading the following bytes as one
            raise ValueError(
                f"JPEG arith: standalone marker 0x{marker:02x} in walk"
            )
        if i + 4 > len(payload):
            raise ValueError("JPEG arith: truncated marker segment")
        seg = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg < 2 or i + 2 + seg > len(payload):
            raise ValueError("JPEG arith: truncated marker segment")
        body = payload[i + 4 : i + 2 + seg]
        if marker == 0xDB:
            pq, tq = body[0] >> 4, body[0] & 0x0F
            if pq != 0 or tq != 0:
                raise ValueError("JPEG arith: unsupported DQT")
            tbl = np.zeros(64, dtype=np.int64)
            tbl[_JPEG_ZIGZAG] = np.frombuffer(
                body[1:65], dtype=np.uint8
            ).astype(np.int64)
            qt = tbl.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            raise ValueError("JPEG arith decoder got a Huffman frame")
        elif marker == 0xC9:  # SOF9: extended sequential, arithmetic
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                raise ValueError("JPEG arith: 1 or 3 components only")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2, 4) or cv not in (1, 2, 4):
                    raise ValueError(
                        "JPEG arith: sampling factors beyond 4 unsupported"
                    )
                if tq != 0:
                    raise ValueError("JPEG arith: quant table != 0")
                comps.append((cid, ch, cv))
        elif marker == 0xCA:  # SOF10: progressive, arithmetic
            return _decode_jpeg_arith_progressive(payload)
        elif marker in (0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("lossless/differential arithmetic unsupported")
        elif marker == 0xCC:  # DAC conditioning, per table id
            j = 0
            while j < len(body):
                tc, tb = body[j] >> 4, body[j] & 0x0F
                if tc == 0:
                    dc_cond[tb] = (body[j + 1] & 0x0F, body[j + 1] >> 4)
                else:
                    ac_cond[tb] = body[j + 1]
                j += 2
        elif marker == 0xDD:
            dri = int.from_bytes(body, "big")
        elif marker == 0xDA:
            if w is None or qt is None or comps is None:
                raise ValueError("JPEG arith: SOS before SOF9/DQT")
            ns = body[0]
            if ns != len(comps):
                raise ValueError("JPEG arith: partial scans unsupported")
            scan_tabs = []
            by_id = {cid: k for k, (cid, _h, _v) in enumerate(comps)}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                if cs not in by_id:
                    raise ValueError("JPEG arith: unknown scan component")
                scan_tabs.append((by_id[cs], tt >> 4, tt & 0x0F))
            j = i + 2 + seg
            segments = [bytearray()]
            rst_expect = 0
            while j < len(payload):
                b = payload[j]
                if b == 0xFF and j + 1 < len(payload):
                    nxt = payload[j + 1]
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTm: next restart segment
                        if nxt - 0xD0 != rst_expect:
                            raise ValueError(
                                "JPEG arith: restart marker out of sequence"
                            )
                        rst_expect = (rst_expect + 1) % 8
                        segments.append(bytearray())
                        j += 2
                        continue
                    break  # trailing marker: decoder pads with zeros
                else:
                    segments[-1].append(b)
                    j += 1
            data = [bytes(s) for s in segments]
            i = j
            continue
        i += 2 + seg
    if data is None:
        raise ValueError("JPEG arith: no scan data")
    if not dri and len(data) > 1:
        raise ValueError("JPEG arith: restart marker without DRI")
    if scan_tabs is None:
        raise ValueError("JPEG arith: no scan header")
    nc = len(comps)
    hmax = max(ch for _, ch, _v in comps)
    vmax = max(cv for _, _h, cv in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    seg_idx = 0

    def fresh():
        return (
            _QMDecoder(data[seg_idx]),
            {t: _new_dc_stats() for _, t, _a in scan_tabs},
            {a: _new_ac_stats() for _, _t, a in scan_tabs},
            [113, 0],
            [0] * nc,
            [0] * nc,
        )

    dec, dc_stats, ac_stats, fixed_ctx, last_dc, dc_ctx = fresh()
    xs = np.arange(8)
    us = np.arange(8)
    cmat = (
        np.cos((2 * xs[None, :] + 1) * us[:, None] * np.pi / 16)
        * np.where(us[:, None] == 0, 1.0 / np.sqrt(2.0), 1.0)
        / 2.0
    )
    planes = [
        np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        for _, ch, cv in comps
    ]
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            # F.1.4.1.1: every restart interval is a self-contained
            # arithmetic segment — fresh coder, statistics, predictors
            seg_idx += 1
            if seg_idx >= len(data):
                raise ValueError("JPEG arith: missing restart segment")
            dec, dc_stats, ac_stats, fixed_ctx, last_dc, dc_ctx = fresh()
        my, mx = divmod(m, mcux)
        for ci, td, ta in scan_tabs:
            _cid, ch, cv = comps[ci]
            lo, up = dc_cond.get(td, (0, 1))
            kx = ac_cond.get(ta, 5)
            # A.2.3 interleaved order: the component's cv×ch blocks of
            # this MCU in raster order, DC predictor per COMPONENT
            # running straight through them
            for vb in range(cv):
                for hb in range(ch):
                    coefs = [0] * 64
                    diff, dc_ctx[ci] = _decode_dc(
                        dec, dc_stats[td], dc_ctx[ci], lo, up
                    )
                    last_dc[ci] += diff
                    coefs[0] = last_dc[ci]
                    _decode_ac(dec, ac_stats[ta], fixed_ctx, coefs, kx)
                    fq = (
                        np.asarray(coefs, dtype=np.int64).reshape(8, 8)
                        * qt
                    ).astype(np.float64)
                    by = my * cv + vb
                    bx = mx * ch + hb
                    planes[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = cmat.T @ fq @ cmat + 128.0
    crop = []
    for (_cid, ch, cv), p in zip(comps, planes):
        if ch != hmax or cv != vmax:
            if hmax % ch or vmax % cv:
                raise ValueError(
                    "non-integer JPEG upsampling ratio unsupported"
                )
            p = np.repeat(
                np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1
            )
        crop.append(p[:h, :w])
    if nc == 1:
        return np.clip(np.round(crop[0]), 0, 255).astype(np.uint8)
    y, cb, cr = crop
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _decode_jpeg_arith_progressive(payload: bytes):
    """Decode an SOF10 progressive arithmetic JPEG (grayscale): walk
    the markers, then run every scan's self-contained QM segment over
    the accumulated coefficient store — DC first through the G.1.3.1
    scaled-diff model, DC refinements as one fixed-bin bit OR-ed into
    bit Al (two's-complement, so negative predictors refine
    correctly), AC first via the band-limited sequential model, AC
    refinements via Figure G.7 — and only then dequantize + IDCT with
    the exact pixel math of the sequential path. Raises ValueError on
    multi-component frames, restart intervals (DRI), or malformed
    scan headers — the documented remaining scope."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt = None
    w = h = None
    lo, up, kx = 0, 1, 5
    blocks = None
    bw = bh = 0
    i = 2
    seen_scan = False
    while i + 1 < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker walk desynchronized")
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            raise ValueError(
                f"JPEG arith: standalone marker 0x{marker:02x} in walk"
            )
        if i + 4 > len(payload):
            raise ValueError("JPEG arith: truncated marker segment")
        seg = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg < 2 or i + 2 + seg > len(payload):
            raise ValueError("JPEG arith: truncated marker segment")
        body = payload[i + 4 : i + 2 + seg]
        if marker == 0xDB:
            pq, tq = body[0] >> 4, body[0] & 0x0F
            if pq != 0 or tq != 0:
                raise ValueError("JPEG arith: unsupported DQT")
            tbl = np.zeros(64, dtype=np.int64)
            tbl[_JPEG_ZIGZAG] = np.frombuffer(
                body[1:65], dtype=np.uint8
            ).astype(np.int64)
            qt = tbl.reshape(8, 8)
        elif marker == 0xCA:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if body[5] != 1:
                raise ValueError(
                    "JPEG arith progressive: grayscale only"
                )
            if body[7] != 0x11 or body[8] != 0:
                raise ValueError(
                    "JPEG arith progressive: 1x1 sampling, quant 0 only"
                )
            bw, bh = (w + 7) // 8, (h + 7) // 8
            blocks = [[0] * 64 for _ in range(bw * bh)]
        elif marker == 0xCC:
            j = 0
            while j + 1 < len(body):
                tc, tb = body[j] >> 4, body[j] & 0x0F
                if tb != 0:
                    raise ValueError(
                        "JPEG arith progressive: conditioning table 0 only"
                    )
                if tc == 0:
                    lo, up = body[j + 1] & 0x0F, body[j + 1] >> 4
                else:
                    kx = body[j + 1]
                j += 2
        elif marker == 0xDD:
            raise ValueError(
                "JPEG arith progressive: restart intervals unsupported"
            )
        elif marker == 0xDA:
            if blocks is None or qt is None:
                raise ValueError("JPEG arith: SOS before SOF10/DQT")
            if body[0] != 1:
                raise ValueError(
                    "JPEG arith progressive: one component per scan"
                )
            ss, se, ahal = body[3], body[4], body[5]
            ah, al = ahal >> 4, ahal & 0x0F
            j = i + 2 + seg
            data = bytearray()
            while j < len(payload):
                b = payload[j]
                if b == 0xFF and j + 1 < len(payload):
                    nxt = payload[j + 1]
                    if nxt == 0x00:
                        data.append(0xFF)
                        j += 2
                        continue
                    break  # next marker ends the scan's segment
                data.append(b)
                j += 1
            dec = _QMDecoder(bytes(data))
            fixed_ctx = [113, 0]
            if ss == 0:
                if se != 0:
                    raise ValueError(
                        "JPEG arith: DC scan must have Se = 0"
                    )
                if ah == 0:
                    dc_stats = _new_dc_stats()
                    last = 0
                    ctx = 0
                    for blk in blocks:
                        diff, ctx = _decode_dc(dec, dc_stats, ctx, lo, up)
                        last += diff
                        blk[0] = last << al
                else:
                    p1 = 1 << al
                    for blk in blocks:
                        if dec.decode(fixed_ctx):
                            blk[0] |= p1
            else:
                if se < ss or se > 63:
                    raise ValueError("JPEG arith: bad spectral band")
                ac_stats = _new_ac_stats()
                if ah == 0:
                    for blk in blocks:
                        _decode_ac_first(
                            dec, ac_stats, fixed_ctx, blk, kx, ss, se, al
                        )
                else:
                    for blk in blocks:
                        _decode_ac_refine(
                            dec, ac_stats, fixed_ctx, blk, ss, se, al
                        )
            seen_scan = True
            i = j
            continue
        i += 2 + seg
    if not seen_scan:
        raise ValueError("JPEG arith: no scan data")
    xs = np.arange(8)
    us = np.arange(8)
    cmat = (
        np.cos((2 * xs[None, :] + 1) * us[:, None] * np.pi / 16)
        * np.where(us[:, None] == 0, 1.0 / np.sqrt(2.0), 1.0)
        / 2.0
    )
    plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    for m, blk in enumerate(blocks):
        by, bx = divmod(m, bw)
        fq = (np.asarray(blk, dtype=np.int64).reshape(8, 8) * qt).astype(
            np.float64
        )
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            cmat.T @ fq @ cmat + 128.0
        )
    return np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)


def synthesize_jpeg_arith(
    df: DataFrame,
    bw_col: str = "bw",
    bh_col: str = "bh",
    seed_col: str = "doc_id",
    q0: int = 16,
    payload_col: str = "payload",
    restart_interval: int = 0,
    ncomp: int = 1,
) -> DataFrame:
    """Emit a REAL arithmetic-coded (SOF9) JPEG per row with the SAME
    quantized-DC law as the Huffman generator
    (multimodal.synthesize_jpeg_dc): luma block b carries
    ((seed + 17·b) mod 96) − 48, so decoded pixels are the constant
    2·((seed + 17·b) mod 96) + 32 at q0=16 — the cross-codec identity
    the decisive test and the SQL oracle both lean on. ``ncomp=3``
    emits interleaved YCbCr with chroma DC 0 (⇒ Cb=Cr=128 ⇒ R=G=B=Y
    EXACTLY — the oracle stays integer while the per-component
    conditioning state and table-1 contexts genuinely run; nonzero
    chroma is covered by the Huffman-parity unit tests)."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            payloads = []
            for seed, bw, bh in zip(pdf[seed_col], pdf[bw_col], pdf[bh_col]):
                blocks = []
                for b in range(int(bw) * int(bh)):
                    coefs = [0] * 64
                    coefs[0] = ((int(seed) + 17 * b) % 96) - 48
                    blocks.append(coefs)
                    for _ in range(ncomp - 1):
                        blocks.append([0] * 64)  # chroma DC 0 -> 128
                payloads.append(
                    encode_jpeg_arith(
                        blocks, int(bw), int(bh), q0=q0,
                        restart_interval=restart_interval, ncomp=ncomp,
                    )
                )
            out[payload_col] = payloads
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def jpeg_arith_block_stats(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Decode arithmetic JPEGs and emit one row per 8×8 block with its
    exact integer pixel sum — per-row, Arrow-batched, shuffle-free;
    undecodable payloads drop their rows."""
    import numpy as np

    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [
            StructField("block_idx", IntegerType()),
            StructField("px_sum", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            col_idx = {c: k + 1 for k, c in enumerate(pdf.columns)}
            for row in pdf.itertuples(index=True, name=None):
                raw = row[col_idx[payload_col]]
                try:
                    px = decode_jpeg_arith_bytes(
                        bytes(raw) if raw is not None else b""
                    )
                except Exception:
                    continue
                hh, ww = px.shape[:2]
                for by in range(hh // 8):
                    for bx in range(ww // 8):
                        blk = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                        rows.append(
                            {
                                **{c: row[col_idx[c]] for c in id_cols},
                                "block_idx": by * (ww // 8) + bx,
                                "px_sum": int(blk.astype(np.int64).sum()),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=id_cols + ["block_idx", "px_sum"]
            )

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def synthesize_jpeg_arith_420(
    df: DataFrame,
    mx_col: str = "mcux",
    my_col: str = "mcuy",
    seed_col: str = "doc_id",
    q0: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL 4:2:0 arithmetic-coded (SOF9) JPEG per row: luma
    block k of the A.2.3 interleaved WALK (4 per MCU, raster within)
    carries quantized DC ((seed + 17·k) mod 96) − 48, chroma DC 0
    (⇒ R=G=B=Y exactly), so a SQL oracle re-derives every image-raster
    block sum by inverting the walk order — a decoder that confuses
    the MCU walk with the raster grid lands values in the wrong
    blocks and fails the hash."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            payloads = []
            for seed, mx, my in zip(pdf[seed_col], pdf[mx_col], pdf[my_col]):
                n = int(mx) * int(my)
                y = []
                for k in range(4 * n):
                    c = [0] * 64
                    c[0] = ((int(seed) + 17 * k) % 96) - 48
                    y.append(c)
                zero = [[0] * 64 for _ in range(n)]
                payloads.append(
                    encode_jpeg_arith_subsampled(
                        y, zero, [list(b) for b in zero],
                        int(mx), int(my), q0=q0,
                    )
                )
            out[payload_col] = payloads
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def synthesize_jpeg_arith_progressive(
    df: DataFrame,
    bw_col: str = "bw",
    bh_col: str = "bh",
    seed_col: str = "doc_id",
    q0: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL progressive arithmetic (SOF10) JPEG per row with
    the SAME coefficient law as the Huffman SA generator
    (multimodal.synthesize_jpeg_sa): block b carries quantized DC
    ((seed + 17·b) mod 96) − 48, a1 = ((seed + 13·b) mod 7) − 3 at
    zigzag 1 and a5 = ((seed + 11·b) mod 5) − 2 at zigzag 5 —
    magnitudes straddling the Al=1 point transform so first scans,
    newly-nonzero refinements, AND correction bits all run — encoded
    through the PROGRESSIVE_SCANS script (spectral selection ×
    successive approximation on the QM-coder). Decoded pixels equal
    the Huffman SA law exactly (the decisive cross-codec identity in
    tests/test_jpeg_arith.py), so the SQL oracle is closed-form."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            payloads = []
            for seed, bw, bh in zip(pdf[seed_col], pdf[bw_col], pdf[bh_col]):
                blocks = []
                for b in range(int(bw) * int(bh)):
                    coefs = [0] * 64
                    coefs[0] = ((int(seed) + 17 * b) % 96) - 48
                    coefs[_JPEG_ZIGZAG[1]] = ((int(seed) + 13 * b) % 7) - 3
                    coefs[_JPEG_ZIGZAG[5]] = ((int(seed) + 11 * b) % 5) - 2
                    blocks.append(coefs)
                payloads.append(
                    encode_jpeg_arith_progressive(
                        blocks, int(bw), int(bh), q0=q0
                    )
                )
            out[payload_col] = payloads
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)
