"""RIFF/WAV chunk-walking parser: independent byte-level fixtures (built
by hand here, NOT by the engine's fabricator — parser and builder must not
share code paths)."""

import struct

import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.audiometa import (
    decode_samples,
    parse_wav_meta,
    wav_duration_ms,
)


def _wav(channels=2, rate=44100, bits=16, data=b"\x00" * 1000, pre_chunks=b""):
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += pre_chunks
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_parses_canonical_wav():
    assert parse_wav_meta(_wav()) == (2, 44100, 16, 1000)


def test_walks_past_odd_sized_chunks():
    # 5-byte LIST payload: word alignment pads to 6 — a parser that forgets
    # the pad byte desyncs and misses the data chunk
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    assert parse_wav_meta(_wav(channels=1, rate=8000, pre_chunks=odd)) == (
        1, 8000, 16, 1000,
    )


def test_rejects_non_wav():
    assert parse_wav_meta(b"") is None
    assert parse_wav_meta(b"RIFFxxxxAVI ") is None
    assert parse_wav_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None
    # fmt present but no data chunk
    truncated = _wav()[: 12 + 8 + 16]
    assert parse_wav_meta(truncated) is None


def test_duration_math():
    # 44100 Hz stereo 16-bit = 176400 B/s; 88200 bytes = 500 ms
    assert wav_duration_ms(2, 44100, 16, 88200) == 500
    assert wav_duration_ms(1, 8000, 16, 16000) == 1000


def test_sample_decode_boundary():
    """PCM16 decodes for real now (audiohash.decode_pcm16 — r7); the
    NotImplementedError boundary has narrowed to compressed/non-PCM16
    formats only."""
    got = decode_samples(_wav())  # PCM16 stereo: 1000 B = 250 silent frames
    assert got.tolist() == [0] * 250
    ieee_float = _wav()[:20] + struct.pack("<H", 3) + _wav()[22:]
    with pytest.raises(NotImplementedError):
        decode_samples(ieee_float)


def test_sub_byte_bit_depth_degrades_to_null_meta():
    """bits_per_sample in 0..7 floors bytes-per-sample to zero; the parser
    must return None (null metadata row) rather than let wav_duration_ms
    divide by zero inside a mapInPandas worker (round-2 advisor finding)."""
    for bits in (0, 1, 7):
        assert parse_wav_meta(_wav(bits=bits)) is None
    # 8-bit audio is legitimate and must still parse
    meta = parse_wav_meta(_wav(bits=8))
    assert meta is not None and meta[2] == 8
