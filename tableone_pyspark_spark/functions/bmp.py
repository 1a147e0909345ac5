"""Pure-Python BMP (Windows DIB) codec for the multimodal operators —
the uncompressed sibling of ``png.py`` / ``jpeg.py`` / ``gif.py``.

BMP needs no entropy coding at all: a 54-byte header pair
(BITMAPFILEHEADER + BITMAPINFOHEADER) in front of raw, 4-byte-padded,
bottom-up BGR rows. Supported (the overwhelming majority of real
payloads): BI_RGB (uncompressed) at 24-bit BGR, 32-bit BGRA/BGRX,
and 8-bit with a BGRX palette; positive height (bottom-up, the
default) and negative height (top-down); and since r7 the BI_RLE8 /
BI_RLE4 compressions (encoded runs, absolute mode, end-of-line /
end-of-bitmap escapes, cursor deltas — undefined pixels resolve to
palette entry 0, the common writer convention). r7 also adds
1/4-bit packed palette rows (MSB-first) and 16-bit RGB555. r8 adds
BI_BITFIELDS (compression 3): three DWORD channel masks at offset 54
(nonzero, contiguous, non-overlapping — hostile masks ValueError),
channels rescaled to 8 bits by integer rounding — covers RGB565 /
ARGB8888 and every other mask layout GDI can write.

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
    if compression == 1 and bpp != 8:
        raise ValueError(f"BMP: BI_RLE8 requires 8 bpp, got {bpp}")
    if compression == 2 and bpp != 4:
        raise ValueError(f"BMP: BI_RLE4 requires 4 bpp, got {bpp}")
    if compression == 3 and bpp not in (16, 32):
        raise ValueError(f"BMP: BI_BITFIELDS requires 16/32 bpp, got {bpp}")
    if compression not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"BMP compression {compression} unsupported "
            "(BI_RGB/RLE8/RLE4/BITFIELDS only)"
        )
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} unsupported")
    top_down = h < 0
    h = abs(h)
    if top_down and compression in (1, 2):
        # the spec forbids top-down RLE bitmaps (BITFIELDS may be either)
        raise ValueError("BMP: RLE bitmaps must be bottom-up")
    if w <= 0 or h == 0:
        raise ValueError("BMP: non-positive dimensions")
    if w * h > max_pixels:
        raise ValueError(f"BMP bomb guard: {w}x{h} exceeds {max_pixels} pixels")
    return data_off, hdr_size, w, h, bpp, top_down, compression


def bmp_meta(payload: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel) from the header only."""
    _off, _hs, w, h, bpp, _td, _c = _header(payload, max_pixels)
    return w, h, bpp


def _decode_rle(
    data: bytes, w: int, h: int, four_bit: bool
) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 (bottom-up) -> (h, w) palette indices. Runs,
    absolute mode (word-aligned), end-of-line / end-of-bitmap escapes
    and cursor deltas per the Windows DIB spec; pixels never written
    by any run stay index 0 (the spec's undefined-pixel convention —
    most writers mean palette entry 0). Every cursor move is
    bounds-checked; truncation mid-run raises."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts bottom-up rows; flipped by the caller
    pos = 0
    n = len(data)
    ended = False
    while pos + 2 <= n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE: run overruns the bitmap")
            if four_bit:
                pix = [(val >> 4) if i % 2 == 0 else (val & 0xF) for i in range(cnt)]
                out[y, x : x + cnt] = pix
            else:
                out[y, x : x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            ended = True
            break
        elif val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("BMP RLE truncated mid delta")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError("BMP RLE: delta outside the bitmap")
        else:  # absolute mode: val literal pixels, word-aligned
            cnt = val
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE: absolute run overruns the bitmap")
            if four_bit:
                nbytes = (cnt + 1) // 2
                if pos + nbytes > n:
                    raise ValueError("BMP RLE truncated mid absolute run")
                chunk = data[pos : pos + nbytes]
                pix = [
                    (chunk[i // 2] >> 4) if i % 2 == 0 else (chunk[i // 2] & 0xF)
                    for i in range(cnt)
                ]
                out[y, x : x + cnt] = pix
                pos += nbytes + (nbytes & 1)  # pad to word boundary
            else:
                if pos + cnt > n:
                    raise ValueError("BMP RLE truncated mid absolute run")
                out[y, x : x + cnt] = np.frombuffer(
                    data, dtype=np.uint8, count=cnt, offset=pos
                )
                pos += cnt + (cnt & 1)
            x += cnt
    if not ended:
        raise ValueError("BMP RLE truncated: no end-of-bitmap marker")
    return out[::-1]  # bottom-up -> top-down


def decode_bmp(payload: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """(h, w, 3) uint8 RGB (alpha of 32-bit payloads is dropped —
    BITMAPINFOHEADER alpha is undefined/unused by most writers).
    BI_RLE8/BI_RLE4 payloads decompress through :func:`_decode_rle`."""
    data_off, hdr_size, w, h, bpp, top_down, compression = _header(
        payload, max_pixels
    )
    palette = None
    if bpp in (1, 4, 8):
        (n_colors,) = struct.unpack_from("<I", payload, 46)
        n_colors = n_colors or (1 << bpp)
        if n_colors > (1 << bpp):
            raise ValueError(f"BMP: palette of {n_colors} entries")
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError("BMP truncated mid palette")
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)
        palette = raw[:, [2, 1, 0]]  # BGRX -> RGB

    if compression in (1, 2):
        if data_off < 54 or data_off > len(payload):
            raise ValueError("BMP: pixel data offset outside the payload")
        idx = _decode_rle(payload[data_off:], w, h, four_bit=(bpp == 4))
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("BMP: pixel index outside palette")
        return np.ascontiguousarray(palette[idx])

    masks = None
    if compression == 3:
        # BI_BITFIELDS: three DWORD channel masks directly after the
        # 40 core header fields (the V2/V3/V4/V5 header sizes embed
        # them at the same byte offset 54). Masks must be nonzero,
        # contiguous and within the pixel width; channels scale to
        # 8 bits by integer rounding round(raw·255/max) (the exact
        # rescale; the legacy BI_RGB-555 path below keeps the other
        # documented convention, bit replication — they differ by at
        # most 1 LSB on 5-bit values).
        if len(payload) < 66:
            raise ValueError("BMP truncated: BITFIELDS masks missing")
        masks = struct.unpack_from("<III", payload, 54)
        for mk in masks:
            if mk == 0 or mk >= (1 << bpp):
                raise ValueError(f"BMP: invalid BITFIELDS mask {mk:#x}")
            shift = (mk & -mk).bit_length() - 1
            if (mk >> shift) & ((mk >> shift) + 1):
                raise ValueError(
                    f"BMP: non-contiguous BITFIELDS mask {mk:#x}"
                )
        if (masks[0] & masks[1]) or (masks[0] & masks[2]) or (masks[1] & masks[2]):
            raise ValueError("BMP: overlapping BITFIELDS masks")

    row_bytes = (w * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * h
    if data_off < 54 or need > len(payload):
        raise ValueError("BMP truncated: pixel data shorter than declared")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp in (1, 4):  # MSB-first packed palette indices
        bits = np.unpackbits(rows[:, :row_bytes], axis=1)
        if bpp == 1:
            idx = bits[:, :w]
        else:
            nib = bits.reshape(h, -1, 4)
            idx = (nib * np.array([8, 4, 2, 1], dtype=np.uint8)).sum(
                axis=2, dtype=np.uint8
            )[:, :w]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("BMP: pixel index outside palette")
        return np.ascontiguousarray(palette[idx])
    if bpp == 8:
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("BMP: pixel index outside palette")
        return np.ascontiguousarray(palette[idx])
    if masks is not None:  # BI_BITFIELDS 16/32-bit
        dt = "<u2" if bpp == 16 else "<u4"
        v = rows[:, : w * (bpp // 8)].copy().view(dt).reshape(h, w)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for ch, mk in enumerate(masks):
            shift = (mk & -mk).bit_length() - 1
            maxv = mk >> shift
            # uint64: raw*255 overflows uint32 for masks wider than 24
            # bits (a valid 28-bit mask would silently decode wrong)
            raw = (v.astype(np.uint64) >> shift) & maxv
            out[:, :, ch] = ((raw * 255 + maxv // 2) // maxv).astype(np.uint8)
        return out
    if bpp == 16:  # BI_RGB 16-bit is RGB555 little-endian (top bit pad)
        v = rows[:, : w * 2].copy().view("<u2").reshape(h, w)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for ch, shift in enumerate((10, 5, 0)):
            c = ((v >> shift) & 31).astype(np.uint8)
            out[:, :, ch] = (c << 3) | (c >> 2)  # 5 -> 8 bit expansion
        return out
    bytes_pp = bpp // 8
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])  # BGR(A) -> RGB


def encode_bmp_rle8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Fixture/round-trip writer for the RLE path: (h, w) uint8
    palette indices + (n, 3) uint8 RGB palette -> BI_RLE8 bottom-up
    BMP (encoded runs only, end-of-line per row, end-of-bitmap
    terminator)."""
    idx = np.asarray(idx, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("idx must be (h, w) uint8")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or pal.shape[0] > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if idx.size and int(idx.max()) >= pal.shape[0]:
        raise ValueError("index outside palette")
    h, w = idx.shape
    data = bytearray()
    for row in idx[::-1]:  # bottom-up
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            data += bytes([run, int(row[x])])
            x += run
        data += b"\x00\x00"  # end of line
    data[-2:] = b"\x00\x01"  # final marker is end-of-bitmap
    n_colors = pal.shape[0]
    pal_bytes = np.zeros((n_colors, 4), dtype=np.uint8)
    pal_bytes[:, :3] = pal[:, [2, 1, 0]]  # RGB -> BGRX
    info = struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, n_colors, 0
    )
    off = 54 + 4 * n_colors
    file_hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return file_hdr + info + pal_bytes.tobytes() + bytes(data)


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
