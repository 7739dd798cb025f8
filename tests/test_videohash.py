"""Perceptual video dedup: DIB frame decode, per-frame hashing with
stride sampling, frame-position-aligned near-dup pairs, match-fraction
gate, malformed-byte robustness."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.imagehash import (
    quantized_dhash,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.videohash import (
    decode_dib_frame,
    video_frame_hashes,
    video_near_dup_pairs,
)

W = H = 16


def _cells(seed: int, flip_00: bool = False) -> np.ndarray:
    cells = np.fromfunction(
        lambda r, c: ((r * 3 + c * 5 + seed) % 7) % 2, (8, 8), dtype=int
    )
    if flip_00:
        cells = cells.copy()
        cells[0, 0] ^= 1
    return np.where(cells == 1, 200, 40)


def _frame_px(seed: int, flip_00: bool = False, noise: int = 0) -> np.ndarray:
    vals = _cells(seed, flip_00)
    px = np.repeat(np.repeat(vals, 2, axis=0), 2, axis=1) + noise
    return np.stack([px] * 3, axis=2).astype(np.uint8)  # HxWx3 RGB


def _dib_bytes(px: np.ndarray) -> bytes:
    # top-down RGB -> bottom-up BGR rows (stride 48, already 4-aligned)
    return px[::-1, :, ::-1].tobytes()


def _avi_bytes(frames: list[np.ndarray]) -> bytes:
    avih = struct.pack("<14I", 40000, 0, 0, 0, len(frames), 0, 1, 0, W, H,
                       0, 0, 0, 0)
    hdrl = b"avih" + struct.pack("<I", 56) + avih
    list_hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    movi = b""
    for px in frames:
        d = _dib_bytes(px)
        movi += b"00db" + struct.pack("<I", len(d)) + d
    list_movi = b"LIST" + struct.pack("<I", 4 + len(movi)) + b"movi" + movi
    body = list_hdrl + list_movi
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def test_decode_dib_roundtrip():
    px = _frame_px(1)
    raw = _dib_bytes(px)
    got = decode_dib_frame(raw, 0, len(raw), W, H)
    assert np.array_equal(got, px)
    assert decode_dib_frame(raw, 0, 10, W, H) is None  # truncated
    assert decode_dib_frame(raw, 0, len(raw), 0, H) is None


def test_frame_hashes_stride_and_shared_kernel(spark):
    frames = [_frame_px(s) for s in range(4)]
    df = spark.createDataFrame(
        [(7, bytearray(_avi_bytes(frames))), (8, bytearray(b"not a video"))],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r["dhash"]
        for r in video_frame_hashes(df, every=2).collect()
    }
    # stride 2 over 4 frames: indexes 0 and 2 only; undecodable: no rows
    assert set(got) == {(7, 0), (7, 2)}
    # hashes come from the SHARED image kernel on the decoded pixels
    assert got[(7, 0)] == quantized_dhash(frames[0])
    assert got[(7, 2)] == quantized_dhash(frames[2])


def test_near_dup_pairs_and_match_fraction_gate(spark):
    base = [_frame_px(0), _frame_px(1), _frame_px(2), _frame_px(3)]
    noisy = [_frame_px(s, noise=2) for s in range(4)]        # hamming 0 twin
    flip0 = [_frame_px(0, flip_00=True)] + base[1:]          # frame-0 near
    # NB the cell pattern is mod-7 in the seed — pick one not congruent
    # to 2 so the replaced frame really differs
    half = [_frame_px(0), base[1], _frame_px(10), base[3]]   # frame 2 differs
    other = [_frame_px(s + 20) for s in range(4)]            # unrelated
    rows = [
        (0, bytearray(_avi_bytes(base))),
        (1, bytearray(_avi_bytes(noisy))),
        (2, bytearray(_avi_bytes(flip0))),
        (3, bytearray(_avi_bytes(half))),
        (4, bytearray(_avi_bytes(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["a_id"], r["b_id"]): r["n_matching"]
        for r in video_near_dup_pairs(df, every=2, min_match_frac=0.5).collect()
    }
    # 0/1/2 match on both sampled positions; 3 matches 0,1,2 on frame 0
    # only (1 of 2 = exactly the 0.5 gate)
    assert got[(0, 1)] == 2 and got[(0, 2)] == 2 and got[(1, 2)] == 2
    assert got[(0, 3)] == got[(1, 3)] == got[(2, 3)] == 1
    assert not any(4 in p for p in got)
    # a stricter fraction gate drops the half-matching video
    strict = {
        (r["a_id"], r["b_id"])
        for r in video_near_dup_pairs(df, every=2, min_match_frac=0.75).collect()
    }
    assert strict == {(0, 1), (0, 2), (1, 2)}


def test_video_pair_plan_is_banded_not_cartesian(spark):
    df = spark.createDataFrame(
        [(i, bytearray(_avi_bytes([_frame_px(s) for s in range(4)])))
         for i in range(3)],
        "doc_id long, payload binary",
    )
    plan = video_near_dup_pairs(df)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shifted_pairs_catch_head_trimmed_copy(spark):
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.videohash import (
        video_shifted_near_dup_pairs,
    )

    base = [_frame_px(s) for s in range(4)]
    trimmed = base[1:]  # head-trimmed copy: same frames, shifted by one
    # seeds are mod-7 in the pattern: {4,5,6} stays disjoint from base's
    # {0,1,2,3} (30..33 would collide: 30 % 7 == 2)
    other = [_frame_px(s) for s in (4, 5, 6, 4)]
    df = spark.createDataFrame(
        [
            (0, bytearray(_avi_bytes(base))),
            (1, bytearray(_avi_bytes(trimmed))),
            (2, bytearray(_avi_bytes(other))),
        ],
        "doc_id long, payload binary",
    )
    # aligned matching misses the trim (each position differs)...
    aligned = {
        (r["a_id"], r["b_id"])
        for r in video_near_dup_pairs(df, every=1, min_match_frac=0.5).collect()
    }
    assert (0, 1) not in aligned
    # ...the dominant-offset vote finds it at offset 1 with 3 frame votes
    got = {
        (r["a_id"], r["b_id"]): (r["offset"], r["n_matching"])
        for r in video_shifted_near_dup_pairs(df, every=1, min_matches=2).collect()
    }
    assert got == {(0, 1): (1, 3)}
