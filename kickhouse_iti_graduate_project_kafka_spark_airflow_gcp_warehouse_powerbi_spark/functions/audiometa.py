"""Audio metadata from raw bytes — pure-Python RIFF/WAV chunk walking (no
audio libraries; format per the public WAVE specification).

The audio twin of ``imagemeta.py``: sample rate / channels / bit depth come
from the actual ``fmt `` chunk and duration from the ``data`` chunk length —
the decoder walks the chunk list, it does not trust fixed offsets (a WAV
may carry LIST/INFO chunks before ``data``). Sample-level decode (resample,
spectrogram, features) needs an audio library and stays behind
``decode_samples`` — a documented NotImplementedError in this container.
"""

from __future__ import annotations


def parse_wav_meta(b: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, data_len) from a RIFF/WAVE
    stream, or None if the container is not a parseable WAV. Walks chunks:
    each is id(4) + size(4 LE) + payload (word-aligned)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data_len = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_len = size
            break  # data is the payload; nothing to walk past it here
        i += 8 + size + (size % 2)  # chunks are word-aligned
    # bits < 8 floors bytes-per-sample to zero, which would make
    # wav_duration_ms divide by zero — malformed audio degrades to a null
    # metadata row, never a worker exception ("unknown bytes are data").
    if None in (channels, rate, bits, data_len) or channels == 0 or rate == 0 or bits < 8:
        return None
    return channels, rate, bits, data_len


def wav_duration_ms(channels: int, rate: int, bits: int, data_len: int) -> int:
    """Integer milliseconds of audio in the data chunk (floor)."""
    bytes_per_sec = rate * channels * (bits // 8)
    return (data_len * 1000) // bytes_per_sec


def decode_samples(b: bytes):
    """Sample-level decode of COMPRESSED codecs (MP3/AAC/Opus/float WAV)
    needs an audio library (soundfile/librosa), none of which exist in
    this container. PCM16 WAV, however, decodes with pure NumPy —
    ``audiohash.decode_pcm16`` is the real path (and the fingerprint /
    near-dup pipeline on top of it); this stub remains only for the
    compressed-codec boundary."""
    from .audiohash import decode_pcm16

    got = decode_pcm16(b)
    if got is not None:
        return got
    raise NotImplementedError(
        "non-PCM16 sample decode requires an audio library not present "
        "in this environment (PCM16 WAV decodes via audiohash.decode_pcm16)"
    )
