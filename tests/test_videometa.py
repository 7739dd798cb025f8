"""Byte-level RIFF/AVI parser tests: handcrafted containers, interleaved
audio chunks, padding, truncation/garbage robustness, stride sampling."""

import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.videometa import (
    decode_frame,
    parse_avi_meta,
    sample_frames,
    walk_frames,
)


def _le(n: int, w: int = 4) -> bytes:
    return n.to_bytes(w, "little")


def _avih(usec=40000, total=3, width=320, height=240) -> bytes:
    pay = (
        _le(usec) + _le(0) + _le(0) + _le(0) + _le(total) + _le(0)
        + _le(1) + _le(0) + _le(width) + _le(height) + _le(0) * 4
    )
    assert len(pay) == 56
    return b"avih" + _le(56) + pay


def _list(fourcc: bytes, body: bytes) -> bytes:
    return b"LIST" + _le(4 + len(body)) + fourcc + body


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + _le(len(payload)) + payload + pad


def _avi(hdrl_body: bytes, movi_body: bytes) -> bytes:
    body = _list(b"hdrl", hdrl_body) + _list(b"movi", movi_body)
    return b"RIFF" + _le(4 + len(body)) + b"AVI " + body


def test_parse_meta_and_walk():
    movi = _chunk(b"00dc", b"AABB") + _chunk(b"01wb", b"audio!") + _chunk(b"00dc", b"CCDD")
    b = _avi(_avih(total=2), movi)
    assert parse_avi_meta(b) == (40000, 2, 320, 240)
    frames = walk_frames(b)
    assert [sz for _, sz in frames] == [4, 4]
    off, sz = frames[1]
    assert b[off : off + sz] == b"CCDD"  # audio chunk skipped, offsets exact


def test_odd_size_padding_honoured():
    movi = _chunk(b"00dc", b"XYZ") + _chunk(b"00db", b"PQRST")
    frames = walk_frames(_avi(_avih(total=2), movi))
    assert [sz for _, sz in frames] == [3, 5]  # pad byte not in size, walk survives


def test_garbage_and_truncation():
    assert parse_avi_meta(b"") is None
    assert parse_avi_meta(b"RIFF\x10\x00\x00\x00WAVE") is None
    assert walk_frames(b"not a container at all") == []
    good = _avi(_avih(), _chunk(b"00dc", b"AB"))
    assert parse_avi_meta(good[:20]) is None  # truncated before hdrl


def test_sample_frames_stride():
    frames = [(100, 10), (120, 10), (140, 10), (160, 10), (180, 10)]
    assert sample_frames(frames, 2) == [(0, 100, 10), (2, 140, 10), (4, 180, 10)]
    assert sample_frames(frames, 1) == [
        (i, off, sz) for i, (off, sz) in enumerate(frames)
    ]
    with pytest.raises(ValueError):
        sample_frames(frames, 0)


def test_decode_frame_boundary():
    """Without geometry (or for compressed chunks) decode stays the
    documented boundary; WITH the avih geometry an uncompressed DIB
    chunk decodes for real (videohash.decode_dib_frame — r7)."""
    with pytest.raises(NotImplementedError):
        decode_frame(b"", 0, 0)
    import numpy as np

    w = h = 4
    rows = bytes(range(w * 3)) * h  # 4 rows of the same BGR pattern
    with pytest.raises(NotImplementedError):  # size lies about geometry
        decode_frame(rows, 0, 2, w, h)
    got = decode_frame(rows, 0, len(rows), w, h)
    assert got.shape == (h, w, 3)
    # bottom-up BGR -> top-down RGB: first output pixel is the FIRST
    # stored pixel of the LAST stored row, channel-reversed
    assert got[0, 0].tolist() == [2, 1, 0]
