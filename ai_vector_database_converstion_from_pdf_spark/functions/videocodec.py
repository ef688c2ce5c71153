"""Minimal uncompressed video container — REAL frame plumbing, no ffmpeg.

Compressed video (H.264/VP9) needs ffmpeg, which this container doesn't
ship; the Spark-side plumbing (schema, partitioning, UDF batch shape,
frame sampling) is what the engine owns, and it must be real and tested.
So this module defines an honest dependency-free container — a
concatenation of P6 PPM frames behind a fixed-layout header — the same
way `imagecodec` handles PPM/BMP and `audiocodec` handles PCM WAV:

    b"PVDV" | u32 n_frames | u32 fps_millis | n_frames x (u32 len | PPM bytes)

(little-endian). Real codecs plug in behind the same decode seam the
image path uses (import-gated; raise cleanly when absent).

Reference: training-pipeline multimodal extension; no analog in the
reference app.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import decode_ppm, encode_ppm

MAGIC = b"PVDV"


def encode_video(frames: list[np.ndarray], fps: float = 1.0) -> bytes:
    """frames: list of HxWx3 uint8 rasters → container bytes."""
    if not frames:
        raise ValueError("empty video")
    out = [MAGIC, struct.pack("<II", len(frames), int(round(fps * 1000)))]
    for f in frames:
        blob = encode_ppm(f)
        out.append(struct.pack("<I", len(blob)))
        out.append(blob)
    return b"".join(out)


def video_info(data: bytes) -> tuple[int, float]:
    """(n_frames, fps) from the fixed header — O(1), no frame decode."""
    if data[:4] != MAGIC:
        raise ValueError("not a PVDV container")
    n, fps_millis = struct.unpack_from("<II", data, 4)
    return n, fps_millis / 1000.0


def iter_frames(data: bytes):
    """Yield (frame_idx, raster) lazily — a sampler can skip-decode by
    seeking over the length prefixes without touching pixel bytes."""
    n, _ = video_info(data)
    off = 12
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        yield i, decode_ppm(data[off : off + ln])
        off += ln


def sample_frame_bytes(data: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """[(frame_idx, ppm_bytes)] for frames 0, every_n, 2*every_n, ... —
    skipped frames are SEEKED over (length-prefix hops), never decoded,
    so sampling cost scales with frames kept, not frames stored."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    n, _ = video_info(data)
    off = 12
    out = []
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if i % every_n == 0:
            out.append((i, data[off : off + ln]))
        off += ln
    return out
