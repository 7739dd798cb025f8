"""Acoustic-fingerprint audio dedup over raw PCM WAV columns.

The audio twin of ``imagehash.py``, and the same container-boundary
move: COMPRESSED codecs (MP3/AAC/Opus) still need audio libraries the
sandbox lacks (``audiometa.py`` parses headers only), but PCM16 WAV is
raw little-endian samples behind a RIFF chunk list — decodable with
pure NumPy — so the FULL audio dedup pipeline is real here: binary
column → samples → temporal energy fingerprint → Hamming band join
(the shared 16-bit band machinery,
``operators/dedup.py::hamming_band_pairs``).

The fingerprint is a quantized temporal energy-contour hash:

1. mono mixdown = integer mean over channels (floor);
2. mean ABSOLUTE amplitude over 64 equal time windows (boundaries
   ``k*n//64``, integer floor mean) — the energy envelope;
3. quantize window energies by ``>> 5`` (32-unit bins) so sample-level
   noise below a bin never flips a comparison — the stability property
   near-dup detection needs (same reasoning as the image dHash's
   ``>> 4``);
4. 63 bits in a signed long (sign bit clear, package convention):
   bit w (w in 0..62) = [q[w+1] > q[w]] — the energy rises/falls
   contour, which is what survives re-encoding and small edits, while
   absolute level (volume) largely cancels in the comparisons.

Every step is exact integer arithmetic → deterministic across engines
and replayable closed-form in SQL; the catalog's ``audio_energy_hash``
/ ``audio_phash_pairs`` oracles recompute it from the fabrication
parameters (plans/llm_vectors.py), exactly as the image twins do.

Scale posture (100 TB of audio): Arrow-batched ``mapInPandas`` kernel
(one Python crossing per batch, vectorized NumPy per clip — no Python
loop over samples); banded pair join, never all-pairs. Cite:
reference stores media as opaque payloads and defers decode the same
way (SURVEY §2.9 multimodal posture).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOWS = 64  #: energy-envelope windows (63 comparison bits)
Q_SHIFT = 5  #: energy quantization: 32-unit bins


def decode_pcm16(b: bytes) -> np.ndarray | None:
    """Decode a PCM16 RIFF/WAV into a mono int64 sample array (integer
    floor mean over channels). Malformed, truncated, non-PCM16, or
    foreign bytes return None — never raise ("unknown bytes are data").
    Walks the chunk list like ``audiometa.parse_wav_meta`` (a WAV may
    carry LIST/INFO chunks before ``data``); trusts the fmt chunk, not
    fixed offsets."""
    if b is None or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = bits = None
    data = None
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= n:
            fmt = int.from_bytes(b[i + 8 : i + 10], "little")
            if fmt != 1:  # PCM only; compressed stays the env boundary
                return None
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
            break
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if channels in (None, 0) or bits != 16 or data is None:
        return None
    usable = len(data) - (len(data) % (2 * channels))
    if usable <= 0:
        return None
    samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.int64)
    if channels > 1:
        # floor-division mean, matching the documented integer semantics
        samples = samples.reshape(-1, channels).sum(axis=1) // channels
    return samples


def energy_contour_hash(samples: np.ndarray) -> int:
    """63-bit quantized energy-contour hash (module docstring has the
    exact layout). Windows use ``k*n//WINDOWS`` boundaries so any clip
    with >= WINDOWS samples hashes; window means are exact integer
    floors of the absolute amplitude."""
    m = samples.shape[0]
    if m < WINDOWS:
        return 0
    mag = np.abs(samples)
    bounds = [k * m // WINDOWS for k in range(WINDOWS + 1)]
    q = np.empty(WINDOWS, dtype=np.int64)
    for w in range(WINDOWS):
        blk = mag[bounds[w] : bounds[w + 1]]
        q[w] = (int(blk.sum()) // blk.size) >> Q_SHIFT
    out = 0
    for w in range(WINDOWS - 1):
        if q[w + 1] > q[w]:
            out |= 1 << w
    return out


def energy_hash_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ahash) via Arrow-batched ``mapInPandas`` — NumPy decode +
    hash per clip, one Python crossing per batch. Undecodable payloads
    yield NULL ahash (dropped by the pair join; surfaced to callers
    that select them)."""

    def _gen(batches):
        for pdf in batches:
            hashes = []
            for b in pdf[payload_col]:
                s = decode_pcm16(bytes(b)) if b is not None else None
                hashes.append(energy_contour_hash(s) if s is not None else None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "ahash": pd.array(hashes, dtype="Int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        _gen, schema=f"{id_col} long, ahash long"
    )


def audio_phash_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate audio pairs: energy-contour hash + the dedup
    family's Hamming band join (exact recall for max_hamming <= 3 by
    the 4x16-bit-band pigeonhole). Returns (a_id, b_id, hamming)."""
    from ..operators.dedup import hamming_band_pairs

    hashes = energy_hash_audio(df, payload_col, id_col).filter(
        F.col("ahash").isNotNull()
    )
    return hamming_band_pairs(hashes, id_col, "ahash", max_hamming)
