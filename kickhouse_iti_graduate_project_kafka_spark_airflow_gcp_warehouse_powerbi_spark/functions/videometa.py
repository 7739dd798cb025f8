"""Video metadata + frame sampling from raw bytes — pure-Python RIFF/AVI
chunk walking (no video libraries; format per the public AVI RIFF spec).

The video leg of the multimodal triple (``imagemeta.py`` images,
``audiometa.py`` audio): stream geometry and timing come from the actual
``avih`` header inside ``LIST hdrl``; frames are the ``..dc``/``..db``
chunks inside ``LIST movi``, discovered by walking, never by fixed offset
(real AVIs interleave audio ``..wb`` chunks and pad to word boundaries).

Frame *sampling* — the every-k-th-frame selection a training pipeline runs
before feature extraction — operates on the walked frame index, so it
needs no codec: it returns (frame_index, byte_range) pairs. Pixel-level
decode needs a codec library and stays behind ``decode_frame`` — a
documented NotImplementedError in this container.
"""

from __future__ import annotations


def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "little")


def parse_avi_meta(b: bytes) -> tuple[int, int, int, int] | None:
    """(usec_per_frame, total_frames, width, height) from the ``avih``
    header, or None if the container is not a parseable AVI."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    i = 12
    while i + 8 <= len(b):
        cid, size = b[i : i + 4], _u32(b, i + 4)
        if cid == b"LIST" and b[i + 8 : i + 12] == b"hdrl":
            j = i + 12  # walk hdrl sub-chunks
            end = min(i + 8 + size, len(b))
            while j + 8 <= end:
                sid, ssz = b[j : j + 4], _u32(b, j + 4)
                if sid == b"avih" and j + 8 + 48 <= len(b):
                    return (
                        _u32(b, j + 8),       # dwMicroSecPerFrame
                        _u32(b, j + 24),      # dwTotalFrames
                        _u32(b, j + 40),      # dwWidth
                        _u32(b, j + 44),      # dwHeight
                    )
                j += 8 + ssz + (ssz % 2)
            return None
        i += 8 + size + (size % 2)
    return None


def walk_frames(b: bytes) -> list[tuple[int, int]]:
    """(offset, size) of every video frame chunk (``..dc``/``..db``) inside
    ``LIST movi``, in stream order; offsets point at the frame payload.
    Non-video chunks (e.g. audio ``..wb``) are skipped, word alignment
    honoured."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return []
    frames: list[tuple[int, int]] = []
    i = 12
    while i + 8 <= len(b):
        cid, size = b[i : i + 4], _u32(b, i + 4)
        if cid == b"LIST" and b[i + 8 : i + 12] == b"movi":
            j = i + 12
            end = min(i + 8 + size, len(b))
            while j + 8 <= end:
                fid, fsz = b[j : j + 4], _u32(b, j + 4)
                if fid[2:4] in (b"dc", b"db"):
                    frames.append((j + 8, fsz))
                j += 8 + fsz + (fsz % 2)
        i += 8 + size + (size % 2)
    return frames


def sample_frames(
    frames: list[tuple[int, int]], every: int
) -> list[tuple[int, int, int]]:
    """Every ``every``-th frame starting at index 0 (the pipeline's
    pre-decode stride sample): (frame_index, offset, size) triples."""
    if every < 1:
        raise ValueError("every must be >= 1")
    return [(ix, off, sz) for ix, (off, sz) in enumerate(frames) if ix % every == 0]


def decode_frame(b: bytes, offset: int, size: int, width: int | None = None,
                 height: int | None = None):
    """Pixel decode of COMPRESSED codecs requires a codec library
    (PyAV/opencv), none of which exist in this container. Uncompressed
    DIB frames, however, decode with pure NumPy when the caller passes
    the stream geometry from ``parse_avi_meta`` —
    ``videohash.decode_dib_frame`` is the real path (and the per-frame
    dHash / near-dup pipeline on top of it); this stub remains only for
    the compressed-codec boundary."""
    if width is not None and height is not None:
        from .videohash import decode_dib_frame

        got = decode_dib_frame(b, offset, size, width, height)
        if got is not None:
            return got
    raise NotImplementedError(
        "compressed-frame decode requires a video codec library not present "
        "in this environment (uncompressed DIB decodes via "
        "videohash.decode_dib_frame given the avih geometry)"
    )
