"""Pure-Python image header parsing (functions/imagemeta.py) + the
multimodal mapInPandas round trip."""

import struct

import pytest

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.imagemeta import (
    decode_pixels,
    parse_image_dims,
    parse_jpeg_dims,
    parse_png_dims,
)


def make_png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )


def make_jpeg(w: int, h: int, extra_app_segments: int = 1) -> bytes:
    out = b"\xff\xd8"
    for _ in range(extra_app_segments):  # APPn segments the scan must skip
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return out + b"\xff\xd9"


def test_png_dims_roundtrip():
    assert parse_png_dims(make_png(640, 480)) == (640, 480)
    assert parse_png_dims(make_png(1, 1) + b"trailing body bytes") == (1, 1)


def test_png_rejects_non_png():
    assert parse_png_dims(b"\x89PNG\r\n\x1a\nshort") is None
    assert parse_png_dims(b"plain text") is None
    # right magic, wrong first chunk type
    bad = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"XXXX" + b"\x00" * 13
    assert parse_png_dims(bad) is None


def test_jpeg_dims_marker_scan():
    assert parse_jpeg_dims(make_jpeg(320, 240)) == (320, 240)
    # multiple APP segments before SOF: the scan must walk them all
    assert parse_jpeg_dims(make_jpeg(99, 7, extra_app_segments=4)) == (99, 7)
    # progressive (SOF2) carries dims the same way
    b = make_jpeg(12, 34)
    assert parse_jpeg_dims(b.replace(b"\xff\xc0", b"\xff\xc2")) == (12, 34)


def test_jpeg_rejects_garbage():
    assert parse_jpeg_dims(b"\xff\xd8\x00\x00") is None  # desynced marker
    assert parse_jpeg_dims(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
    assert parse_jpeg_dims(b"GIF89a") is None
    # DHT (C4) must NOT be read as a frame header
    b = make_jpeg(55, 66).replace(b"\xff\xc0", b"\xff\xc4", 1)
    assert parse_jpeg_dims(b) is None


def test_parse_image_dims_dispatch():
    assert parse_image_dims(make_png(2, 3)) == ("png", 2, 3)
    assert parse_image_dims(make_jpeg(4, 5)) == ("jpeg", 4, 5)
    assert parse_image_dims(b"neither") == (None, None, None)
    assert parse_image_dims(b"") == (None, None, None)


def test_decode_pixels_contract():
    with pytest.raises(NotImplementedError):
        decode_pixels(make_png(1, 1))


def test_multimodal_unknown_bytes_yield_nulls(spark):
    """Unknown payloads are data, not errors: NULL dims, byte_len kept."""
    from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.plans.llm_vectors import (
        _MM_SCHEMA,
        _decode_batches,
    )

    df = spark.createDataFrame(
        [(1, bytearray(make_png(8, 9))), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in df.mapInPandas(_decode_batches, _MM_SCHEMA).collect()}
    assert (rows[1]["fmt"], rows[1]["width"], rows[1]["height"]) == ("png", 8, 9)
    assert rows[2]["fmt"] is None and rows[2]["width"] is None
    assert rows[2]["byte_len"] == len(b"not an image")
