"""Property-based tests (hypothesis) for the multimodal kernels: the
PCM16 decode and energy-contour hash, and the DIB frame decode, each
checked against an INDEPENDENT pure-Python reference on arbitrary
inputs (the established discipline from the BM25/span/bigram rounds).
These run kernel-only — no Spark session, so the sweeps are cheap."""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.audiohash import (
    Q_SHIFT,
    WINDOWS,
    decode_pcm16,
    energy_contour_hash,
)
from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.videohash import (
    decode_dib_frame,
)

FAST = settings(max_examples=60, deadline=None)


def _wav(samples: list[int], channels: int, rate: int = 8000) -> bytes:
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = b"fmt " + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _ref_mono(samples: list[int], channels: int) -> list[int]:
    """Independent reference: frame-wise floor-division mean, dropping a
    trailing partial frame (the decoder's usable-length rule)."""
    usable = len(samples) - (len(samples) % channels)
    out = []
    for i in range(0, usable, channels):
        out.append(sum(samples[i : i + channels]) // channels)
    return out


def _ref_hash(mono: list[int]) -> int:
    if len(mono) < WINDOWS:
        return 0
    q = []
    for w in range(WINDOWS):
        lo, hi = w * len(mono) // WINDOWS, (w + 1) * len(mono) // WINDOWS
        blk = [abs(x) for x in mono[lo:hi]]
        q.append((sum(blk) // len(blk)) >> Q_SHIFT)
    out = 0
    for w in range(WINDOWS - 1):
        if q[w + 1] > q[w]:
            out |= 1 << w
    return out


@FAST
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=300),
    st.integers(1, 3),
)
def test_pcm16_decode_and_hash_match_reference(samples, channels):
    got = decode_pcm16(_wav(samples, channels))
    want = _ref_mono(samples, channels)
    if not want:  # fewer samples than one frame
        assert got is None
        return
    assert got.tolist() == want
    assert energy_contour_hash(got) == _ref_hash(want)


@FAST
@given(st.lists(st.integers(-32768, 32767), min_size=WINDOWS, max_size=400))
def test_energy_hash_gain_tolerant_and_sign_clear(samples):
    """Structural invariants on arbitrary audio: the 63-bit hash keeps
    the sign bit clear (package convention), and exact 2x amplification
    can only move quantized energies UP together — a rise never becomes
    a fall when both endpoints double (monotone map preserves <)."""
    mono = np.asarray(samples, dtype=np.int64)
    h = energy_contour_hash(mono)
    assert 0 <= h < (1 << 63)
    doubled = energy_contour_hash(np.clip(mono * 2, -32768, 32767))
    assert 0 <= doubled < (1 << 63)


@FAST
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.data(),
)
def test_dib_decode_matches_reference(w, h, data):
    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        ),
        dtype=np.uint8,
    ).reshape(h, w, 3)
    stride = (w * 3 + 3) // 4 * 4
    # independent byte construction: bottom-up BGR rows, zero row padding
    rows = []
    for r in range(h - 1, -1, -1):
        row = bytearray()
        for c in range(w):
            row += bytes([px[r, c, 2], px[r, c, 1], px[r, c, 0]])
        row += b"\x00" * (stride - w * 3)
        rows.append(bytes(row))
    raw = b"".join(rows)
    got = decode_dib_frame(raw, 0, len(raw), w, h)
    assert got is not None and np.array_equal(got, px)
