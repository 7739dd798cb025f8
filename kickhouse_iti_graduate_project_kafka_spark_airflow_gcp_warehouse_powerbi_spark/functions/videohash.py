"""Perceptual video dedup over uncompressed-frame AVI columns.

Completes the multimodal trio (``imagehash.py`` images, ``audiohash.py``
audio) with the same container-boundary move: COMPRESSED codecs
(H.264/VP9/...) still need video libraries the sandbox lacks
(``videometa.py`` walks containers only), but an AVI carrying
uncompressed DIB frames is raw bottom-up BGR rows behind the chunk list
— decodable with pure NumPy — so the FULL video dedup pipeline is real
here: binary column → container walk → stride frame sampling → per-frame
quantized dHash (the SHARED image kernel,
``imagehash.quantized_dhash``) → per-frame-position Hamming band join →
per-video match aggregation.

Video near-dup semantics, two tiers: ``video_near_dup_pairs`` requires
frame POSITIONS to match (re-encodes/copies);
``video_shifted_near_dup_pairs`` lets candidate frames pair at any
offset and keeps the pair whose dominant offset collects enough votes —
catching head-trimmed copies. Arbitrary edit patterns (multiple cuts)
would need full sequence alignment and are not claimed.

Scale posture (100 TB of video): the kernel is Arrow-batched
``mapInPandas`` (one Python crossing per batch; per video a chunk walk
plus ``every``-th-frame NumPy decodes — cost ∝ sampled frames, never
∝ container size beyond the walk); per-frame hashes are (id, int,
int64) rows; the pair join is the banded machinery keyed additionally
by frame position, so only same-position frames ever join."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .imagehash import quantized_dhash
from .videometa import parse_avi_meta, sample_frames, walk_frames


def decode_dib_frame(
    b: bytes, offset: int, size: int, width: int, height: int
) -> np.ndarray | None:
    """Decode one uncompressed DIB frame chunk (raw bottom-up BGR24 rows,
    4-byte row stride) into an HxWx3 top-down RGB uint8 array, or None if
    the chunk cannot be that shape. Pure NumPy — no codec."""
    if width <= 0 or height <= 0:
        return None
    stride = (width * 3 + 3) // 4 * 4
    need = stride * height
    if size < need or offset + need > len(b):
        return None
    raw = np.frombuffer(b[offset : offset + need], dtype=np.uint8)
    rows = raw.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    return rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB


def video_frame_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 2,
) -> DataFrame:
    """(id, frame_idx, dhash) for every ``every``-th frame of each AVI —
    Arrow-batched ``mapInPandas``; container walk + stride sampling reuse
    ``videometa``; undecodable videos/frames contribute no rows."""

    def _gen(batches):
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for vid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                meta = parse_avi_meta(raw)
                if meta is None:
                    continue
                _, _, w, h = meta
                for ix, off, sz in sample_frames(walk_frames(raw), every):
                    px = decode_dib_frame(raw, off, sz, w, h)
                    if px is None:
                        continue
                    ids.append(vid)
                    idxs.append(ix)
                    hashes.append(quantized_dhash(px))
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int64"),
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _gen, schema=f"{id_col} long, frame_idx long, dhash long"
    )


def video_near_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 2,
    max_hamming: int = 3,
    min_match_frac: float = 0.5,
) -> DataFrame:
    """Near-duplicate video pairs (module docstring semantics). Returns
    (a_id, b_id, n_matching) where n_matching counts sampled frame
    positions agreeing within ``max_hamming``; pairs must cover >=
    ``min_match_frac`` of the SMALLER video's sampled frames."""
    from ..operators.dedup import hamming_band_pairs

    h = video_frame_hashes(df, payload_col, id_col, every)
    frame_pairs = hamming_band_pairs(
        h, id_col, "dhash", max_hamming, extra_key_cols=("frame_idx",)
    )
    counts = h.groupBy(F.col(id_col).alias("_vid")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    agg = frame_pairs.groupBy("a_id", "b_id").agg(
        F.count(F.lit(1)).alias("n_matching")
    )
    return (
        agg.join(counts, agg["a_id"] == counts["_vid"])
        .select("a_id", "b_id", "n_matching", F.col("_n").alias("_na"))
        .join(counts, F.col("b_id") == counts["_vid"])
        .select("a_id", "b_id", "n_matching", "_na", F.col("_n").alias("_nb"))
        .filter(
            F.col("n_matching")
            >= F.ceil(F.least("_na", "_nb") * F.lit(min_match_frac))
        )
        .select("a_id", "b_id", "n_matching")
    )


def video_shifted_near_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 1,
    max_hamming: int = 3,
    min_matches: int = 2,
) -> DataFrame:
    """Trim-tolerant video near-dup: instead of requiring frame POSITIONS
    to agree (``video_near_dup_pairs``), candidate frames join on hash
    bands alone, each match votes for its temporal offset
    (a_idx - b_idx), and a pair survives when its BEST single offset
    collects >= ``min_matches`` frame votes — the dominant-offset
    alignment that catches a copy with frames trimmed from the head.

    Returns (a_id, b_id, offset, n_matching) for the winning offset
    (ties broken toward the smallest offset, deterministically).

    Scale shape: the band join is corpus-wide over (band, bucket) — the
    same inverted-index discipline as every other dedup leg, with the
    hot-bucket caveat (a static logo frame shared by thousands of videos
    is a hot shingle; cap bucket sizes the same way). The offset vote is
    one groupBy over the surviving candidate pairs; nothing joins on
    raw pixels."""
    from pyspark.sql import Window

    h = video_frame_hashes(df, payload_col, id_col, every)
    bands = h.select(
        F.col(id_col).alias("_id"),
        F.col("frame_idx").alias("_ix"),
        F.col("dhash").alias("_hv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_ix", "_hv", "bb.band", "bb.bucket")
    left = bands.select(
        F.col("_id").alias("a_id"), F.col("_ix").alias("a_ix"),
        F.col("_hv").alias("_ha"), "band", "bucket",
    )
    right = bands.select(
        F.col("_id").alias("b_id"), F.col("_ix").alias("b_ix"),
        F.col("_hv").alias("_hb"), "band", "bucket",
    )
    frame_matches = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", "a_ix", "b_ix",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
        )
        .distinct()  # bands agreeing on several buckets vote once
        .filter(F.col("hamming") <= max_hamming)
    )
    votes = frame_matches.groupBy(
        "a_id", "b_id", (F.col("a_ix") - F.col("b_ix")).alias("offset")
    ).agg(F.count(F.lit(1)).alias("n_matching"))
    w = Window.partitionBy("a_id", "b_id").orderBy(
        F.col("n_matching").desc(), F.col("offset").asc()
    )
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("n_matching") >= min_matches))
        .select("a_id", "b_id", "offset", "n_matching")
    )


def video_gate_hash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 2,
) -> DataFrame:
    """One (id, hash) row per video for the perceptual-hash ingest gate
    (``operators/phash_index.py``): the EARLIEST sampled frame's dHash —
    deterministic and cheap, catching re-encodes/copies at the door.
    Head-trimmed copies shift which frame is earliest, so they can slip
    this front filter; ``video_shifted_near_dup_pairs`` over the full
    per-frame hashes is the analysis-side sweep that catches them."""
    h = video_frame_hashes(df, payload_col, id_col, every)
    return h.groupBy(id_col).agg(
        F.min_by("dhash", "frame_idx").alias("hash")
    )
