"""Pure-Python BMP (Windows DIB) codec for the multimodal operators —
the uncompressed sibling of ``png.py`` / ``jpeg.py`` / ``gif.py``.

BMP needs no entropy coding at all: a 54-byte header pair
(BITMAPFILEHEADER + BITMAPINFOHEADER) in front of raw, 4-byte-padded,
bottom-up BGR rows. Supported (the overwhelming majority of real
payloads): BI_RGB (uncompressed) at 24-bit BGR, 32-bit BGRA/BGRX,
and 8-bit with a BGRX palette; positive height (bottom-up, the
default) and negative height (top-down). RLE/bitfield compressions
and 1/4/16-bit depths refuse with ``NotImplementedError`` (honest
boundary — rare in the wild).

Hostile-input hardening (same contract as the other codecs): declared
dimensions bounded by ``MAX_PIXELS`` before any allocation, every
offset/row read bounds-checked against the actual payload, all
hostile paths ``ValueError`` — never struct.error, never OOM.
"""

from __future__ import annotations

import struct

import numpy as np

#: bomb guard, matching png.py's PIL-calibrated default
MAX_PIXELS = 89_478_485


def is_bmp(payload: bytes) -> bool:
    """Structural sniff, not just the 2-byte magic: ASCII 'BM' is far
    more collision-prone than the other formats' 6-12-byte magics, and
    a false positive would fail the whole kernel where the byte-stub
    used to handle it. Requires a full header, a known DIB header
    size, one plane, and a defined bit depth — near-misses keep
    falling through to the stub."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return False
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    return (
        hdr_size in (40, 52, 56, 108, 124)
        and planes == 1
        and bpp in (1, 4, 8, 16, 24, 32)
    )


def _header(payload: bytes, max_pixels: int):
    if len(payload) < 54:
        raise ValueError("BMP truncated: header shorter than 54 bytes")
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported DIB header size {hdr_size}")
    w, h, planes, bpp, compression = struct.unpack_from("<iihHI", payload, 18)
    if planes != 1:
        raise ValueError(f"BMP: planes must be 1, got {planes}")
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} unsupported (BI_RGB only)"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} unsupported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("BMP: non-positive dimensions")
    if w * h > max_pixels:
        raise ValueError(f"BMP bomb guard: {w}x{h} exceeds {max_pixels} pixels")
    return data_off, hdr_size, w, h, bpp, top_down


def bmp_meta(payload: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel) from the header only."""
    _off, _hs, w, h, bpp, _td = _header(payload, max_pixels)
    return w, h, bpp


def decode_bmp(payload: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """(h, w, 3) uint8 RGB (alpha of 32-bit payloads is dropped —
    BITMAPINFOHEADER alpha is undefined/unused by most writers)."""
    data_off, hdr_size, w, h, bpp, top_down = _header(payload, max_pixels)
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or 256
        if n_colors > 256:
            raise ValueError(f"BMP: palette of {n_colors} entries")
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError("BMP truncated mid palette")
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)
        palette = raw[:, [2, 1, 0]]  # BGRX -> RGB

    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * h
    if data_off < 54 or need > len(payload):
        raise ValueError("BMP truncated: pixel data shorter than declared")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("BMP: pixel index outside palette")
        return np.ascontiguousarray(palette[idx])
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Fixture/round-trip writer: (h, w, 3) uint8 RGB -> 24-bit BI_RGB
    bottom-up BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("arr must be (h, w, 3) uint8")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = rows.tobytes()
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    return file_hdr + info + data
