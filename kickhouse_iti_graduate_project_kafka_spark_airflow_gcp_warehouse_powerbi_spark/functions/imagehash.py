"""Perceptual-hash image dedup over uncompressed bitmap columns.

Container posture: pixel decode of COMPRESSED codecs (JPEG/PNG/audio/
video) stays a documented environment boundary (``imagemeta.py`` /
``audiometa.py`` parse headers only — the sandbox has no imaging libs).
PPM P6, however, is raw RGB behind a 15-byte ASCII header — decodable
with pure NumPy — which makes the FULL multimodal dedup pipeline real
here: binary column → pixels → perceptual hash → Hamming band join
(the same 16-bit band machinery SimHash text dedup uses,
``operators/dedup.py::hamming_band_pairs``).

The hash is a quantized dHash (difference hash):

1. grayscale = (R + G + B) // 3 per pixel (exact integer);
2. average-pool to an 8x8 cell grid (integer block means, floor);
3. quantize cells by ``>> 4`` (16-level bins) — the quantization is what
   makes the hash stable under small pixel-level noise (a +-2 jitter can
   never flip a comparison between cells a bin apart), the property
   near-dup detection needs;
4. 63 bits in a signed long (sign bit clear, the package convention):
   bit r*7+c (r in 0..7, c in 0..6) = [q[r][c+1] > q[r][c]] — horizontal
   gradient signs; bit 56+r (r in 0..6) = [q[r+1][7] > q[r][7]] —
   vertical signs down the last column.

Every step is exact integer arithmetic, so the hash is deterministic
across engines and replayable closed-form in SQL — the catalog's
``images_dhash`` / ``images_phash_pairs`` oracles recompute it from the
fabrication parameters (plans/llm_vectors.py).

Scale posture (100 TB of images): the kernel is Arrow-batched
``mapInPandas`` (one Python crossing per batch, NumPy per image); the
pair join is banded — corpus-size bucket joins, never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 8  #: pooled cell grid (8x8)
Q_SHIFT = 4  #: cell quantization: 16-level bins


def parse_ppm(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode a binary PPM (P6, maxval 255) into (width, height,
    HxWx3 uint8 pixel array). Malformed/truncated/foreign bytes return
    None — never raise (the kernel maps them to NULL hashes)."""
    if b is None or not b.startswith(b"P6"):
        return None
    i, vals = 2, []
    n = len(b)
    while len(vals) < 3:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":  # PPM comment line
            while i < n and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            return None
        try:
            vals.append(int(b[i:j]))
        except ValueError:
            return None
        i = j
    i += 1  # the single whitespace byte that terminates the header
    w, h, maxv = vals
    if maxv != 255 or w <= 0 or h <= 0:
        return None
    need = w * h * 3
    data = b[i : i + need]
    if len(data) < need:
        return None
    return w, h, np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def quantized_dhash(pixels: np.ndarray) -> int:
    """63-bit quantized dHash of an HxWx3 uint8 array (module docstring
    has the exact bit layout). Pooling uses ``k*dim//GRID`` block
    boundaries, so any dimensions >= 8x8 hash; block means are exact
    integer floors."""
    h, w, _ = pixels.shape
    if h < GRID or w < GRID:
        return 0
    gray = pixels.astype(np.int64).sum(axis=2) // 3
    rb = [k * h // GRID for k in range(GRID + 1)]
    cb = [k * w // GRID for k in range(GRID + 1)]
    q = np.empty((GRID, GRID), dtype=np.int64)
    for r in range(GRID):
        for c in range(GRID):
            blk = gray[rb[r] : rb[r + 1], cb[c] : cb[c + 1]]
            q[r, c] = (int(blk.sum()) // blk.size) >> Q_SHIFT
    out = 0
    for r in range(GRID):
        for c in range(GRID - 1):
            if q[r, c + 1] > q[r, c]:
                out |= 1 << (r * (GRID - 1) + c)
    for r in range(GRID - 1):
        if q[r + 1, GRID - 1] > q[r, GRID - 1]:
            out |= 1 << (GRID * (GRID - 1) + r)
    return out


def dhash_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dhash) via Arrow-batched ``mapInPandas`` — NumPy decode +
    hash per image, one Python crossing per batch. Undecodable payloads
    yield NULL dhash (dropped by the pair join; surfaced to callers that
    select them)."""

    def _gen(batches):
        for pdf in batches:
            hashes = []
            for b in pdf[payload_col]:
                parsed = parse_ppm(bytes(b)) if b is not None else None
                hashes.append(quantized_dhash(parsed[2]) if parsed else None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "dhash": pd.array(hashes, dtype="Int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        _gen, schema=f"{id_col} long, dhash long"
    )


def phash_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs: quantized dHash + the dedup family's
    Hamming band join (exact recall for max_hamming <= 3). Returns
    (a_id, b_id, hamming)."""
    from ..operators.dedup import hamming_band_pairs

    hashes = dhash_images(df, payload_col, id_col).filter(
        F.col("dhash").isNotNull()
    )
    return hamming_band_pairs(hashes, id_col, "dhash", max_hamming)
