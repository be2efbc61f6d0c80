"""MDCT transform-audio codec — the psychoacoustic/transform honest
slot's decode path (r11 VERDICT directive #8; reference parity: the
media-derivative surface main.py's enrichment implies, re-expressed on
the modified-discrete-cosine-transform family every perceptual codec —
MP3 Layer III, AAC, Vorbis, Opus — is built on).

The codec ("MTC1") is the minimal honest core of that family:

- **Analysis**: frames of 2N samples, hop N (50 % overlap), sine window
  ``w[n] = sin(π/(2N)(n+½))`` (Princen–Bradley: w²[n] + w²[n+N] = 1),
  MDCT ``X[k] = Σ_{n<2N} x[n]·w[n]·cos(π/N·(n+½+N/2)(k+½))`` —
  critically sampled: 2N windowed samples → N coefficients, with the
  time-domain alias cancelled by overlap-add of adjacent frames (TDAC).
- **Quantization**: per-frame scalefactor sf, mantissa
  ``q = round(X / 2^sf)`` clamped to int16 — the block-floating-point
  scheme Layer II/AAC scalefactor bands use, minus the psychoacoustic
  bit-allocation model (constant allocation here; the MODEL is a tuning
  choice, the TRANSFORM/dequant/OLA pipeline is the decode semantics).
- **Bitstream**: ``b"MTC1" u8:log2N u16:n_frames`` then per frame
  ``u8:sf  N × i16-LE mantissas``. Fixed-width — no entropy coder —
  so the byte layout is auditable and the ValueError contract strict.
- **Synthesis (the decode path under test)**: dequantize
  ``X = q · 2^sf`` (exact integers), IMDCT
  ``y[n] = (2/N) Σ_k X[k]·cos(π/N·(n+½+N/2)(k+½))``, window again,
  overlap-add with hop N. Output contract: only the fully-overlapped
  region — with F frames the stream decodes to (F−1)·N samples, sample
  ``t·N+n = w[N+n]·y_t[N+n] + w[n]·y_{t+1}[n]``.

Verification discipline (the q:multimodal_flac_decode pattern):
the GENERATOR (synthesize_mtc) emits streams whose coefficient law the
SQL oracle knows — one nonzero coefficient per frame, integer-dequant
amplitude — so every decoded sample is a TWO-term cosine sum DuckDB
replays numerically in doubles; outputs are FLOOR(s·1000 + 0.5) with
the rounding-margin-vs-ulp analysis asserted in tests (the
q:multimodal_audio_spectrum float discipline). The decisive tests pin
(a) perfect reconstruction: window→MDCT→IMDCT→window→OLA is identity
to ~1e-12 on arbitrary input (TDAC), (b) a full PCM encode→decode loop
whose error is bounded by the quantization step, and (c) byte-identity
against an independent struct-level test-side builder, so a
consistent-but-wrong encoder/decoder pair cannot pass.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from ..util import ensure_min_parallelism

MAGIC = b"MTC1"


def sine_window(n: int) -> np.ndarray:
    """Princen–Bradley sine window over 2N points."""
    i = np.arange(2 * n, dtype=np.float64)
    return np.sin(np.pi / (2 * n) * (i + 0.5))


def _mdct_basis(n: int) -> np.ndarray:
    """(N, 2N) cosine basis: basis[k, i] = cos(π/N (i+½+N/2)(k+½))."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(2 * n, dtype=np.float64)[None, :]
    return np.cos(np.pi / n * (i + 0.5 + n / 2.0) * (k + 0.5))


def mdct(frame: np.ndarray, n: int) -> np.ndarray:
    """Forward MDCT of one pre-windowed 2N-sample frame → N coeffs."""
    return _mdct_basis(n) @ frame


def imdct(coeffs: np.ndarray, n: int) -> np.ndarray:
    """Inverse MDCT of N coefficients → 2N time samples (pre-window)."""
    return (2.0 / n) * (coeffs @ _mdct_basis(n))


def encode_pcm(samples: np.ndarray, n: int, sf_bits: int = 4) -> bytes:
    """Analysis path: window → MDCT → per-frame block-floating-point
    quantization → pack. Frames are hop-N segments of the zero-padded
    input; F = ceil(len/N) + 1 frames cover every sample twice."""
    x = np.asarray(samples, dtype=np.float64)
    n_hops = max(1, -(-len(x) // n))
    padded = np.zeros((n_hops + 1) * n, dtype=np.float64)
    padded[n : n + len(x)] = x  # half-frame lead-in so OLA covers x[0]
    w = sine_window(n)
    frames = []
    for t in range(n_hops):
        seg = padded[t * n : t * n + 2 * n] * w
        coeffs = mdct(seg, n)
        peak = float(np.max(np.abs(coeffs)))
        sf = 0
        while peak / (1 << sf) > 32767.0 and sf < (1 << sf_bits) - 1:
            sf += 1
        q = np.round(coeffs / (1 << sf)).astype(np.int64)
        q = np.clip(q, -32768, 32767).astype(np.int16)
        frames.append((sf, q))
    return pack_mtc(frames, n)


def pack_mtc(frames: list, n: int) -> bytes:
    """Serialize (sf, int16-mantissa-array) frames to the MTC1 layout."""
    log2n = int(n).bit_length() - 1
    if 1 << log2n != n:
        raise ValueError(f"MTC frame size must be a power of two, got {n}")
    out = bytearray(MAGIC)
    out.append(log2n)
    out += struct.pack("<H", len(frames))
    for sf, q in frames:
        if not 0 <= sf <= 255:
            raise ValueError(f"scalefactor out of range: {sf}")
        q = np.asarray(q, dtype=np.int16)
        if q.shape != (n,):
            raise ValueError(f"mantissa frame must have {n} entries")
        out.append(sf)
        out += q.astype("<i2").tobytes()
    return bytes(out)


def decode_mtc_bytes(payload: bytes) -> dict:
    """REAL MTC1 decode: strict header/frame parse, integer
    dequantization, IMDCT, window, overlap-add. Returns
    {n, n_frames, samples: float64[(F-1)·N]}. Raises ValueError on bad
    magic, non-power-of-two frame size, or a truncated stream — no
    silent fallback."""
    if payload[:4] != MAGIC:
        raise ValueError("not an MTC1 payload")
    if len(payload) < 7:
        raise ValueError("MTC1 header truncated")
    log2n = payload[4]
    if not 2 <= log2n <= 12:
        raise ValueError(f"MTC1 frame size 2^{log2n} unsupported")
    n = 1 << log2n
    (n_frames,) = struct.unpack_from("<H", payload, 5)
    if n_frames < 2:
        raise ValueError("MTC1 needs >= 2 frames for one OLA output hop")
    pos = 7
    frame_bytes = 1 + 2 * n
    if len(payload) != pos + n_frames * frame_bytes:
        raise ValueError(
            f"MTC1 stream length {len(payload)} != header promise "
            f"{pos + n_frames * frame_bytes}"
        )
    w = sine_window(n)
    halves = []  # per frame: (windowed first-half, windowed second-half)
    for _ in range(n_frames):
        sf = payload[pos]
        q = np.frombuffer(
            payload, dtype="<i2", count=n, offset=pos + 1
        ).astype(np.float64)
        pos += frame_bytes
        y = imdct(q * float(1 << sf), n)
        yw = y * w
        halves.append((yw[:n], yw[n:]))
    out = np.empty((n_frames - 1) * n, dtype=np.float64)
    for t in range(n_frames - 1):
        out[t * n : (t + 1) * n] = halves[t][1] + halves[t + 1][0]
    return {"n": n, "n_frames": n_frames, "samples": out}


# --------------------------------------------------------------------------
# Oracle-facing seed law (shared by synthesize_mtc and the SQL twin):
# frame t of doc d has ONE nonzero mantissa at
#   k(d,t) = (7d + 3t) mod N,   mantissa m(d,t) = 100 + (d + 11t) mod 900,
#   scalefactor sf(d,t) = (d + t) mod 3
# so the dequantized amplitude is m · 2^sf and every decoded sample is a
# two-term windowed cosine sum with integer amplitudes — numerically
# replayable in SQL doubles with margin >> accumulated ulp error.
# --------------------------------------------------------------------------

def synthesize_mtc(
    df: DataFrame,
    f_col: str = "n_frames",
    seed_col: str = "doc_id",
    n: int = 64,
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL MTC1 stream per row under the seed law above."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def one(seed: int, n_frames: int) -> bytes:
        frames = []
        for t in range(n_frames):
            q = np.zeros(n, dtype=np.int16)
            q[(7 * seed + 3 * t) % n] = 100 + (seed + 11 * t) % 900
            frames.append(((seed + t) % 3, q))
        return pack_mtc(frames, n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[payload_col] = [
                one(int(s), int(f))
                for s, f in zip(pdf[seed_col], pdf[f_col])
            ]
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


# --------------------------------------------------------------------------
# MTC2: the same transform pipeline under a REAL entropy coder — per-frame
# Rice/Golomb-coded zigzag mantissas (the residual coder of FLAC/Shorten,
# here carrying transform coefficients). Layout:
#   b"MTC2" u8:log2N u16:n_frames, then per frame
#   u8:sf u8:rice_k, N zigzag mantissas Rice-coded MSB-first
#   (quotient = q 1-bits + terminating 0, then k low bits), frame
#   byte-aligned with 0 padding.
# The entropy layer is LOSSLESS, so decode(MTC2(X)) == decode(MTC1(X))
# sample-for-sample — the cross-codec identity tests/test_mdct.py pins
# (the progressive==sequential==Huffman discipline from the JPEG family).
# --------------------------------------------------------------------------

MAGIC2 = b"MTC2"


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._out.append(self._acc)
                self._acc = 0
                self._nbits = 0

    def align(self) -> None:
        if self._nbits:
            self._out.append(self._acc << (8 - self._nbits))
            self._acc = 0
            self._nbits = 0

    def tobytes(self) -> bytes:
        self.align()
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._bit = pos * 8

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._bit >> 3
            if byte >= len(self._data):
                raise ValueError("MTC2 bitstream truncated")
            v = (v << 1) | ((self._data[byte] >> (7 - (self._bit & 7))) & 1)
            self._bit += 1
        return v

    def unary(self) -> int:
        q = 0
        while True:
            if self.read(1) == 0:
                return q
            q += 1
            if q > 1 << 20:
                raise ValueError("MTC2 unary run overlong")

    def align(self) -> None:
        self._bit = (self._bit + 7) & ~7

    def bytepos(self) -> int:
        return self._bit >> 3


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-v << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _rice_frame_bits(mantissas, k: int) -> int:
    return sum((_zigzag(int(v)) >> k) + 1 + k for v in mantissas)


def pack_mtc2(frames: list, n: int) -> bytes:
    """Serialize (sf, int16-mantissa-array) frames with per-frame Rice
    parameter chosen argmin-bits (ties to the smaller k)."""
    log2n = int(n).bit_length() - 1
    if 1 << log2n != n:
        raise ValueError(f"MTC frame size must be a power of two, got {n}")
    out = bytearray(MAGIC2)
    out.append(log2n)
    out += struct.pack("<H", len(frames))
    for sf, q in frames:
        if not 0 <= sf <= 255:
            raise ValueError(f"scalefactor out of range: {sf}")
        q = np.asarray(q, dtype=np.int16)
        if q.shape != (n,):
            raise ValueError(f"mantissa frame must have {n} entries")
        k = min(range(16), key=lambda kk: _rice_frame_bits(q, kk))
        out.append(sf)
        out.append(k)
        w = _BitWriter()
        for v in q:
            u = _zigzag(int(v))
            q_hi = u >> k
            w.write(((1 << q_hi) - 1) << 1, q_hi + 1)  # q ones + a zero
            w.write(u & ((1 << k) - 1), k)
        out += w.tobytes()
    return bytes(out)


def decode_mtc2_bytes(payload: bytes) -> dict:
    """REAL MTC2 decode: Rice-decode each frame's mantissas, then the
    shared dequant → IMDCT → window → OLA synthesis. Same output
    contract and ValueError discipline as decode_mtc_bytes."""
    if payload[:4] != MAGIC2:
        raise ValueError("not an MTC2 payload")
    if len(payload) < 7:
        raise ValueError("MTC2 header truncated")
    log2n = payload[4]
    if not 2 <= log2n <= 12:
        raise ValueError(f"MTC2 frame size 2^{log2n} unsupported")
    n = 1 << log2n
    (n_frames,) = struct.unpack_from("<H", payload, 5)
    if n_frames < 2:
        raise ValueError("MTC2 needs >= 2 frames for one OLA output hop")
    w = sine_window(n)
    halves = []
    pos = 7
    for _ in range(n_frames):
        if pos + 2 > len(payload):
            raise ValueError("MTC2 frame header truncated")
        sf, k = payload[pos], payload[pos + 1]
        if k > 15:
            raise ValueError(f"MTC2 rice parameter {k} out of range")
        r = _BitReader(payload, pos + 2)
        q = np.empty(n, dtype=np.float64)
        for i in range(n):
            u = (r.unary() << k) | r.read(k)
            q[i] = _unzigzag(u)
        r.align()
        pos = r.bytepos()
        y = imdct(q * float(1 << sf), n)
        yw = y * w
        halves.append((yw[:n], yw[n:]))
    if pos != len(payload):
        raise ValueError(
            f"MTC2 stream has {len(payload) - pos} trailing bytes"
        )
    out = np.empty((n_frames - 1) * n, dtype=np.float64)
    for t in range(n_frames - 1):
        out[t * n : (t + 1) * n] = halves[t][1] + halves[t + 1][0]
    return {"n": n, "n_frames": n_frames, "samples": out}


def decode_mtc_auto(payload: bytes) -> dict:
    """Dispatch on the stream magic — the mixed-corpus discipline."""
    if payload[:4] == MAGIC:
        return decode_mtc_bytes(payload)
    if payload[:4] == MAGIC2:
        return decode_mtc2_bytes(payload)
    raise ValueError("neither an MTC1 nor an MTC2 payload")


def mtc2_seed_frames(seed: int, n_frames: int, n: int = 64) -> list:
    """The q:multimodal_mdct_rice seed law: 8 nonzero SIGNED mantissas
    per frame at distinct positions (stride 9 is injective mod 64 for
    j < 8), amplitudes spanning both zigzag branches and zero runs that
    give the Rice parameter search real work."""
    frames = []
    for t in range(n_frames):
        q = np.zeros(n, dtype=np.int16)
        for j in range(8):
            q[(7 * seed + 3 * t + 9 * j) % n] = (
                (seed + 13 * t + 29 * j) % 401
            ) - 200
        frames.append(((seed + t) % 3, q))
    return frames


def synthesize_mtc2(
    df: DataFrame,
    f_col: str = "n_frames",
    seed_col: str = "doc_id",
    n: int = 64,
    payload_col: str = "payload",
) -> DataFrame:
    """Emit a REAL Rice-coded MTC2 stream per row (mtc2_seed_frames)."""
    out_schema = StructType(
        df.schema.fields + [StructField(payload_col, BinaryType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out[payload_col] = [
                pack_mtc2(mtc2_seed_frames(int(s), int(f), n), n)
                for s, f in zip(pdf[seed_col], pdf[f_col])
            ]
            yield out

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)


def mtc_decoded_samples(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Decode MTC1 payloads and emit EVERY reconstructed sample as
    (doc_id, idx, val) with val = floor(sample·1000 + 0.5) — the
    margin-audited fixed-point contract (tests assert every value sits
    ≥ 1e-6 from a rounding boundary while the engine-vs-oracle float
    divergence is ~1e-10). Arrow-batched, per-row, shuffle-free."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("idx", LongType()),
            StructField("val", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                dec = decode_mtc_auto(bytes(payload))
                s = dec["samples"]
                ids.extend([int(doc_id)] * len(s))
                idxs.extend(range(len(s)))
                vals.extend(
                    int(v) for v in np.floor(s * 1000.0 + 0.5).astype(np.int64)
                )
            yield pd.DataFrame(
                {"doc_id": ids, "idx": idxs, "val": vals}
            ).astype({"doc_id": "int64", "idx": "int64", "val": "int64"})

    return ensure_min_parallelism(df).mapInPandas(run, schema=out_schema)
