"""Pure-numpy image codecs — REAL decode for the headerless-simple
formats (binary PPM 'P6', uncompressed 24-bit BMP), no third-party libs.

This closes the "decode is stubbed" gap for the formats a container
without PIL/ffmpeg can still honestly support: the byte layouts are
public (netpbm spec; BMP BITMAPINFOHEADER), and numpy reshaping is the
whole decoder. Compressed formats (PNG/JPEG) still route to PIL when
installed and raise cleanly when not — see multimodal.decode_image.
"""

from __future__ import annotations

import struct

import numpy as np


# -- PPM (netpbm P6, maxval 255) -------------------------------------------

def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM → HxWx3 uint8. Handles whitespace/comment headers."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval — tokens separated by
    # whitespace, '#' comments run to end of line
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(data):
            raise ValueError("truncated PPM header")
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=i)
    return raster.reshape(h, w, 3).copy()


def encode_ppm(raster: np.ndarray) -> bytes:
    """HxWx3 uint8 → P6 PPM bytes."""
    if raster.ndim != 3 or raster.shape[2] != 3:
        raise ValueError("raster must be HxWx3")
    h, w = raster.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        raster.astype(np.uint8)
    ).tobytes()


# -- BMP (uncompressed 24-bit, BITMAPINFOHEADER) ---------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """BI_RGB 24-bit BMP → HxWx3 uint8 (RGB). Handles 4-byte row padding
    and bottom-up vs top-down row order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
    ).reshape(h, row_bytes)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage
        bgr = bgr[::-1]
    return bgr[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(raster: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → bottom-up 24-bit BI_RGB BMP."""
    if raster.ndim != 3 or raster.shape[2] != 3:
        raise ValueError("raster must be HxWx3")
    h, w = raster.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bgr = raster[..., ::-1].astype(np.uint8)
    body = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def nearest_resize(raster: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample via index gather."""
    ys = np.linspace(0, raster.shape[0] - 1, target_h).astype(int)
    xs = np.linspace(0, raster.shape[1] - 1, target_w).astype(int)
    return raster[np.ix_(ys, xs)]
