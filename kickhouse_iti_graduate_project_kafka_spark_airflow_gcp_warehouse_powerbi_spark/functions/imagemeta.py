"""Image metadata from raw bytes — pure-Python header parsing (no image
libraries; formats per the public PNG and JPEG/JFIF specifications).

This is the REAL decode step of the multimodal column path: width/height
come from the actual container headers (PNG IHDR chunk; JPEG SOF segment
found by marker scan), not from a fake. Pixel-level decode (resize, frame
sample, feature extract) still needs an imaging library and stays behind
``decode_pixels`` — a documented NotImplementedError in this container.

Runs inside Arrow-batched ``mapInPandas`` workers (plans/llm_vectors.py):
bytes never leave the executor, batches stay columnar.
"""

from __future__ import annotations

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: SOF markers carrying frame dimensions (C4=DHT, C8=JPG ext, CC=DAC are not)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_png_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk, or None if not a PNG. IHDR is
    required to be the first chunk: magic(8) + length(4) + 'IHDR'(4) +
    width(4 BE) + height(4 BE)."""
    if len(b) < 24 or b[:8] != PNG_MAGIC or b[12:16] != b"IHDR":
        return None
    return (
        int.from_bytes(b[16:20], "big"),
        int.from_bytes(b[20:24], "big"),
    )


def parse_jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF segment, or None if not a JPEG.
    Walks the marker stream (each non-SOI/EOI segment carries a 2-byte
    big-endian length that includes itself), skipping APPn/comment/quant
    tables until a start-of-frame marker."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None  # marker stream desynced
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before any SOF
            return None
        if marker in _JPEG_SOF:
            if i + 9 > len(b):
                return None
            height = int.from_bytes(b[i + 5 : i + 7], "big")
            width = int.from_bytes(b[i + 7 : i + 9], "big")
            return (width, height)
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def parse_image_dims(b: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) — 'png' / 'jpeg' / (None, None, None) for
    anything unrecognized. Never raises: unknown bytes are data, not
    errors, in a 100 TB crawl."""
    dims = parse_png_dims(b)
    if dims is not None:
        return ("png", dims[0], dims[1])
    dims = parse_jpeg_dims(b)
    if dims is not None:
        return ("jpeg", dims[0], dims[1])
    return (None, None, None)


def decode_pixels(b: bytes):  # pragma: no cover - documented contract
    """Pixel-level decode needs an imaging library (PIL/libvips), which this
    container does not ship. The Spark-side plumbing (binary columns,
    Arrow batching, schema) is identical for the real thing."""
    raise NotImplementedError("pixel decode requires an imaging library")
