"""Pure-numpy PCM WAV codec (RIFF byte layout, public spec).

Same rationale as `imagecodec.py`: the container has no audio libs, but
uncompressed 16-bit PCM WAV is a simple public byte layout, so the audio
leg of the multimodal pipeline can decode REAL files instead of stubbing.
Compressed codecs (mp3/aac/opus) would require ffmpeg and raise cleanly
in `decode_wav` via format checks.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from an int16 sample array."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,            # PCM
        1,            # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,            # block align
        16,           # bits/sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF chunks; return (int16 samples, sample_rate).

    Walks the chunk list (fmt may not be first; chunks pad to even
    length per the spec). Only uncompressed mono 16-bit PCM is
    supported — anything else raises NotImplementedError, the honest
    boundary of a lib-free container.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = None
    n_channels = bits = audio_fmt = None
    samples: np.ndarray | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            samples = np.frombuffer(body[: size - (size % 2)], dtype="<i2").copy()
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    if audio_fmt != 1 or n_channels != 1 or bits != 16:
        raise NotImplementedError(
            f"only mono 16-bit PCM supported (fmt={audio_fmt}, "
            f"ch={n_channels}, bits={bits}); compressed audio needs ffmpeg"
        )
    return samples, int(sample_rate)


def rms(samples: np.ndarray) -> float:
    """Root-mean-square amplitude normalized to [0, 1]."""
    if samples.size == 0:
        return 0.0
    x = samples.astype(np.float64) / 32768.0
    return float(np.sqrt(np.mean(x * x)))


def zero_crossing_rate(samples: np.ndarray) -> float:
    """Fraction of adjacent sample pairs that change sign."""
    if samples.size < 2:
        return 0.0
    signs = np.signbit(samples.astype(np.int32))
    return float(np.mean(signs[1:] != signs[:-1]))
