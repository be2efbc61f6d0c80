"""IMA ADPCM (operators/adpcm.py): hand-worked sample goldens over
hand-built block bytes (independent of the shipping generator), the
clamp edges, the self-contained-block property, the ValueError bounds
contract, and the Spark block-stats path against the Python fold."""

import struct

import pytest

from library_beam_spark.operators.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_block_stats,
    build_ima_adpcm_wav,
    decode_ima_adpcm_wav,
    ima_step,
    synthesize_adpcm_wav,
)


def _hand_wav(blocks, data_bytes=8, rate=8000):
    """Test-side WAV builder — mirrors the container layout by hand so
    the shipping build_ima_adpcm_wav is not load-bearing for goldens."""
    block_align = 4 + data_bytes
    spb = data_bytes * 2 + 1
    body = bytearray()
    for pred0, idx0, nibbles in blocks:
        body += struct.pack("<hBB", pred0, idx0, 0)
        for j in range(0, len(nibbles), 2):
            body.append(nibbles[j] | (nibbles[j + 1] << 4))
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, rate, rate, block_align, 4, 2, spb
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + bytes(body)
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_table_pins():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))
    assert INDEX_TABLE == (-1, -1, -1, -1, 2, 4, 6, 8)


def test_hand_worked_golden():
    """Nibbles [2, 9, 15, 4] from (pred=0, idx=0), worked by hand:

    n=2:  step=7,  diff=0+3=3          -> pred 3,  idx -1 -> clamp 0
    n=9:  step=7,  diff=0+1=1, sign -  -> pred 2,  idx 0
    n=15: step=7,  diff=0+1+3+7=11, -  -> pred -9, idx +8 -> 8
    n=4:  step=16, diff=2+16=18        -> pred 9,  idx +2 -> 10
    """
    payload = _hand_wav([(0, 0, [2, 9, 15, 4])], data_bytes=2)
    d = decode_ima_adpcm_wav(payload)
    assert d["blocks"] == [[0, 3, 2, -9, 9]]
    assert d["samples_per_block"] == 5 and d["n_blocks"] == 1


def test_low_nibble_decodes_first():
    """Byte 0x92 carries nibbles (2, 9) in that order — a decoder that
    takes the high nibble first lands 9's subtraction before 2's
    addition and produces different samples."""
    payload = _hand_wav([(0, 0, [2, 9, 15, 4])], data_bytes=2)
    swapped = _hand_wav([(0, 0, [9, 2, 4, 15])], data_bytes=2)
    assert (
        decode_ima_adpcm_wav(payload)["blocks"]
        != decode_ima_adpcm_wav(swapped)["blocks"]
    )


def test_clamp_edges():
    # predictor saturation at +32767 (idx 88 -> step 32767, n=7)
    d = decode_ima_adpcm_wav(
        _hand_wav([(32700, 88, [7, 7, 0, 0])], data_bytes=2)
    )
    assert d["blocks"][0][1] == 32767 and d["blocks"][0][2] == 32767
    # predictor saturation at -32768, index floor at 0
    d = decode_ima_adpcm_wav(
        _hand_wav([(-32700, 88, [15, 15, 8, 8])], data_bytes=2)
    )
    assert d["blocks"][0][1] == -32768
    # index never leaves [0, 88]: all-down nibbles from idx 0
    d = decode_ima_adpcm_wav(
        _hand_wav([(100, 0, [0, 1, 2, 3])], data_bytes=2)
    )
    seq = [(100, 0)]
    for n in (0, 1, 2, 3):
        seq.append(ima_step(seq[-1][0], seq[-1][1], n))
    assert d["blocks"][0] == [p for p, _ in seq]


def test_blocks_are_self_contained():
    """Block 2's samples must not depend on block 1's content — the
    seekability/parallelism property the header predictor exists for."""
    b2 = (-200, 30, [1, 14, 7, 8])
    one = decode_ima_adpcm_wav(_hand_wav([(0, 0, [15] * 4), b2], data_bytes=2))
    other = decode_ima_adpcm_wav(_hand_wav([(99, 5, [0] * 4), b2], data_bytes=2))
    assert one["blocks"][1] == other["blocks"][1]


def test_valueerror_contract():
    good = build_ima_adpcm_wav([(0, 0, list(range(16)))])
    # every truncation raises ValueError (never struct/IndexError)
    for cut in range(4, len(good) - 1):
        with pytest.raises(ValueError):
            decode_ima_adpcm_wav(good[:cut])
    # step index out of range
    bad = bytearray(good)
    off = good.index(b"data") + 8 + 2
    bad[off] = 89
    with pytest.raises(ValueError, match="step index"):
        decode_ima_adpcm_wav(bytes(bad))
    # PCM stream refused by the ADPCM decoder
    pcm = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="IMA ADPCM"):
        decode_ima_adpcm_wav(
            b"RIFF" + struct.pack("<I", 4 + len(pcm)) + b"WAVE" + pcm
        )
    # samplesPerBlock inconsistent with blockAlign
    bad2 = bytearray(good)
    spb_off = good.index(b"fmt ") + 8 + 18
    bad2[spb_off : spb_off + 2] = struct.pack("<H", 99)
    with pytest.raises(ValueError, match="samplesPerBlock"):
        decode_ima_adpcm_wav(bytes(bad2))


def test_generator_matches_python_fold(spark):
    """The Spark synthesize → decode → block-stats path must equal the
    straight Python fold of the content law."""
    df = spark.createDataFrame(
        [(s, 2 + s % 3) for s in (0, 67, 134, 938)],
        "doc_id long, n_blocks int",
    )
    got = {
        (r.doc_id, r.block_idx): (
            r.n_samples, r.sum_samples, r.min_s, r.max_s, r.last_s
        )
        for r in adpcm_block_stats(
            synthesize_adpcm_wav(df).drop("n_blocks")
        ).collect()
    }
    expect = {}
    for s in (0, 67, 134, 938):
        for b in range(2 + s % 3):
            pred = ((s + 37 * b) % 1024) - 512
            idx = (s + 11 * b) % 89
            samples = [pred]
            for i in range(16):
                pred, idx = ima_step(pred, idx, (s + 7 * b + 3 * i + i * i) % 16)
                samples.append(pred)
            expect[(s, b)] = (
                17, sum(samples), min(samples), max(samples), samples[-1]
            )
    assert got == expect


def test_random_nibble_streams_roundtrip():
    """Randomized widening of the hand-worked golden: arbitrary nibble
    streams through the container builder must decode to the exact
    Python fold — exercises every step-table region and both clamp
    edges."""
    import random

    rng = random.Random(11)
    for _ in range(40):
        nblocks = rng.randint(1, 3)
        blocks = []
        for _ in range(nblocks):
            blocks.append(
                (
                    rng.randint(-32768, 32767),
                    rng.randint(0, 88),
                    [rng.randint(0, 15) for _ in range(16)],
                )
            )
        d = decode_ima_adpcm_wav(build_ima_adpcm_wav(blocks))
        for (p0, i0, nibs), got in zip(blocks, d["blocks"]):
            pred, idx = p0, i0
            expect = [p0]
            for n in nibs:
                pred, idx = ima_step(pred, idx, n)
                expect.append(pred)
            assert got == expect
