"""Perceptual-hash image dedup: PPM decode, quantized dHash stability,
planted near-dup pairs, malformed-byte robustness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.imagehash import (
    dhash_images,
    parse_ppm,
    phash_pairs,
    quantized_dhash,
)


def _ppm_bytes(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def _checker(flip_00: bool = False, noise: int = 0) -> np.ndarray:
    """16x16 bitmap: 8x8 cell checkerboard of 40/200 gray (2x2 px cells),
    optional (0,0) cell flip, optional uniform pixel noise."""
    cells = np.fromfunction(lambda r, c: (r + c) % 2, (8, 8), dtype=int)
    if flip_00:
        cells = cells.copy()
        cells[0, 0] ^= 1
    vals = np.where(cells == 1, 200, 40)
    px = np.repeat(np.repeat(vals, 2, axis=0), 2, axis=1) + noise
    return np.stack([px] * 3, axis=2)


def test_parse_ppm_roundtrip_and_comments():
    px = _checker()
    w, h, got = parse_ppm(_ppm_bytes(px))
    assert (w, h) == (16, 16)
    assert np.array_equal(got, px)
    # PPM comment lines between header tokens are legal
    with_comment = b"P6\n# a comment\n16 16\n255\n" + px.astype(np.uint8).tobytes()
    assert np.array_equal(parse_ppm(with_comment)[2], px)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"P5\n2 2\n255\n" + b"\x00" * 12,  # grayscale magic
        b"P6\n16 16\n255\n" + b"\x00" * 10,  # truncated body
        b"P6\n16 16\n65535\n" + b"\x00" * 768,  # 16-bit maxval unsupported
        b"P6\nx y\n255\n",
        b"\x89PNG\r\n\x1a\n",
    ],
)
def test_parse_ppm_rejects_malformed(bad):
    assert parse_ppm(bad) is None


def test_quantized_dhash_noise_invariant_and_flip_sensitive():
    base = quantized_dhash(_checker())
    assert base == quantized_dhash(_checker(noise=2))  # quantization erases
    flipped = quantized_dhash(_checker(flip_00=True))
    assert flipped != base
    assert bin(base ^ flipped).count("1") <= 3  # (0,0) touches few bits


def test_phash_pairs_planted_groups(spark):
    """Two exact variants (noise), one hamming-near variant (flip), one
    unrelated image: the pair set is exactly the planted triangle."""
    gradient = np.repeat(
        np.repeat(np.arange(8, dtype=int)[None, :] * 28, 2, axis=0), 2, axis=1
    )
    unrelated = np.stack([np.repeat(gradient, 1, axis=0)] * 3, axis=2)
    rows = [
        (0, bytearray(_ppm_bytes(_checker()))),
        (1, bytearray(_ppm_bytes(_checker(noise=2)))),
        (2, bytearray(_ppm_bytes(_checker(flip_00=True)))),
        (3, bytearray(_ppm_bytes(unrelated))),
        (4, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in phash_pairs(df, max_hamming=3).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert got[(0, 1)] == 0 and got[(0, 2)] == got[(1, 2)] > 0
    # undecodable payload surfaces as NULL hash, silently excluded
    hashes = {r["doc_id"]: r["dhash"] for r in dhash_images(df).collect()}
    assert hashes[4] is None and hashes[0] is not None


def test_phash_pair_plan_is_banded_not_cartesian(spark):
    df = spark.createDataFrame(
        [(i, bytearray(_ppm_bytes(_checker()))) for i in range(4)],
        "doc_id long, payload binary",
    )
    plan = phash_pairs(df)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
