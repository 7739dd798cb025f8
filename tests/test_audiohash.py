"""Acoustic-fingerprint audio dedup: PCM16 WAV decode, quantized
energy-contour hash stability, planted near-dup pairs, malformed-byte
robustness, stereo mixdown."""

import struct

import numpy as np
import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.audiohash import (
    WINDOWS,
    audio_phash_pairs,
    decode_pcm16,
    energy_contour_hash,
    energy_hash_audio,
)


def _wav_bytes(samples: np.ndarray, channels: int = 1, rate: int = 8000,
               junk_chunk: bool = False) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = b"fmt " + fmt
    if junk_chunk:  # LIST/INFO chunks legally precede data
        body += b"LIST" + struct.pack("<I", 4) + b"INFO"
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _contour(bits, noise: int = 0) -> np.ndarray:
    """128-sample clip whose 64 2-sample windows carry the given energy
    bits (900-level vs 100-level) + uniform sample noise."""
    vals = np.repeat(np.where(np.asarray(bits) == 1, 900, 100), 2) + noise
    return vals.astype(np.int64)


BITS = [(i * 7 + 3) % 5 % 2 for i in range(WINDOWS)]


def test_decode_roundtrip_and_chunk_walk():
    s = _contour(BITS)
    got = decode_pcm16(_wav_bytes(s))
    assert np.array_equal(got, s)
    # junk chunks before data are walked, not tripped over
    assert np.array_equal(decode_pcm16(_wav_bytes(s, junk_chunk=True)), s)


def test_decode_stereo_floor_mean():
    left = np.array([100, 300, -101], dtype=np.int64)
    right = np.array([200, 301, -100], dtype=np.int64)
    inter = np.empty(6, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    got = decode_pcm16(_wav_bytes(inter, channels=2))
    # floor division mean, including toward -inf for negative sums
    assert got.tolist() == [150, 300, -101]


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVX",  # wrong form type
        b"OggS\x00\x02",  # foreign container
        _wav_bytes(np.arange(8), channels=1)[:20],  # truncated mid-fmt
        # non-PCM format tag (e.g. float WAV) stays the env boundary
        b"RIFF$\x00\x00\x00WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data\x00\x00\x00\x00",
    ],
)
def test_decode_rejects_malformed(bad):
    assert decode_pcm16(bad) is None


#: flipping a window bit is VISIBLE in the rise-contour iff it kills a
#: rise into it or out of it; BITS has (b3, b4, b5) = (0, 1, 1), so
#: flipping window 4 provably changes bit 3 (the 3→4 rise disappears)
FLIP_W = 4
FLIPPED = BITS[:FLIP_W] + [1 - BITS[FLIP_W]] + BITS[FLIP_W + 1:]


def test_energy_hash_noise_invariant_and_flip_sensitive():
    assert (BITS[3], BITS[4]) == (0, 1)  # the premise above
    base = energy_contour_hash(_contour(BITS))
    assert base == energy_contour_hash(_contour(BITS, noise=15))
    flipped = energy_contour_hash(_contour(FLIPPED))
    assert flipped != base
    # the flip touches at most the two adjacent comparisons
    assert bin(base ^ flipped).count("1") <= 2
    # too-short clips degrade to the zero hash, never raise
    assert energy_contour_hash(np.arange(WINDOWS - 1)) == 0


def test_audio_phash_pairs_planted_groups(spark):
    other = [1 - b for b in BITS]
    rows = [
        (0, bytearray(_wav_bytes(_contour(BITS)))),
        (1, bytearray(_wav_bytes(_contour(BITS, noise=15)))),
        (2, bytearray(_wav_bytes(_contour(FLIPPED)))),
        (3, bytearray(_wav_bytes(_contour(other)))),
        (4, bytearray(b"not audio at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in audio_phash_pairs(df, max_hamming=3).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert got[(0, 1)] == 0 and got[(0, 2)] == got[(1, 2)] > 0
    hashes = {r["doc_id"]: r["ahash"] for r in energy_hash_audio(df).collect()}
    assert hashes[4] is None and hashes[0] is not None


def test_audio_pair_plan_is_banded_not_cartesian(spark):
    df = spark.createDataFrame(
        [(i, bytearray(_wav_bytes(_contour(BITS)))) for i in range(4)],
        "doc_id long, payload binary",
    )
    plan = audio_phash_pairs(df)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
