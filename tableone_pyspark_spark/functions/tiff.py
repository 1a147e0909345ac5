"""Baseline TIFF reader for the multimodal operators — the
document-scan sibling of ``bmp.py`` (no entropy coding; pixels live
in uncompressed strips addressed by the IFD).

Structure (TIFF 6.0 baseline): a 8-byte header (``II*\\0`` little- or
``MM\\0*`` big-endian + first-IFD offset), then linked IFDs of 12-byte
entries ``(tag u16, type u16, count u32, value-or-offset u32)``.
Supported: compression 1 (none), photometric 0/1 (grayscale, incl.
the 0 = white-is-zero inversion) and 2 (RGB), 8 bits per sample —
plus 1-bit and 4-bit GRAYSCALE (the fax/document-scan depths,
MSB-first row-aligned packing, FillOrder 1; since r9) —
1/3/4 samples per pixel (gray / RGB / RGBA — extra alpha dropped),
strip layout (StripOffsets/StripByteCounts/RowsPerStrip), both byte
orders, PackBits compression (32773 — the Apple RLE: flag<128
copies flag+1 literals, flag>128 repeats the next byte 257−flag
times, 128 is a no-op; strips decompress independently), LZW
compression (5 — TIFF 6.0 §13: MSB-first 9→12-bit codes with the
spec's "early change" width schedule, Clear/EOI, KwKwK; since r9),
Deflate/zlib compression (8 and the legacy 32946; bounded inflation
via max_length — the zip-bomb guard; since r9), and the
horizontal-differencing predictor (tag 317 = 2) LZW/Deflate files
almost always carry, in BOTH the strip and (since r10) the tiled
layout (TIFF 6.0 §15: complete edge-padded tiles, each compressed —
and predictor-differenced — independently). Also closed in r10:
PlanarConfiguration 2 (each component in its own plane-major run of
strips/tiles, 8-bit, predictor per plane), FillOrder 2 for its TIFF
6.0 sanctioned use (1-bit uncompressed — per-byte bit reversal), and
new-style JPEG-in-TIFF (compression 7, TIFF Technical Note 2: every
strip/tile a complete JPEG stream decoded by the in-house
``jpeg.py``, JPEGTables (347) merged via the standard
SOI+tables+stream-sans-SOI splice; photometric 1 grayscale and 6
YCbCr). Old-style JPEG (6), the floating-point predictor (3),
FillOrder 2 elsewhere, planar sub-8-bit/JPEG, and sub-8-bit RGB
refuse with typed errors (honest boundary — the supported matrix
covers the overwhelming scanner/export majority; a real libtiff
slots into the same multimodal seam).

Hostile-input contract as the other codecs: bomb guard before any
allocation, every offset/strip read bounds-checked, hostile paths
raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np

from tableone_pyspark_spark.functions.bmp import MAX_PIXELS

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def is_tiff(payload: bytes) -> bool:
    return len(payload) >= 8 and payload[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(payload: bytes, endian: str):
    (off,) = struct.unpack_from(endian + "I", payload, 4)
    if off + 2 > len(payload):
        raise ValueError("TIFF truncated: IFD offset outside the payload")
    (n,) = struct.unpack_from(endian + "H", payload, off)
    entries = {}
    base = off + 2
    if base + 12 * n > len(payload):
        raise ValueError("TIFF truncated mid IFD")
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(endian + "HHI", payload, base + 12 * i)
        if cnt == 0:
            # a present tag with no values has no defined meaning —
            # SKIP it (don't store an empty list that would IndexError
            # at the accessors): an unused count-0 tag then decodes
            # like it was absent, and a REQUIRED/accessed one falls
            # through to that tag's own typed missing-tag ValueError
            continue
        voff = base + 12 * i + 8
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size > 4:
            (voff,) = struct.unpack_from(endian + "I", payload, voff)
            if voff + size > len(payload):
                raise ValueError(f"TIFF truncated: tag {tag} value outside payload")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            entries[tag] = None  # rational/ascii — not needed here
            continue
        entries[tag] = list(
            struct.unpack_from(endian + fmt * cnt, payload, voff)
        )
    return entries


def _read_undefined(payload: bytes, endian: str, tag: int) -> bytes | None:
    """Raw bytes of a BYTE(1)/UNDEFINED(7)-typed tag (the integer IFD
    walk keeps type 7 as None); None when the tag is absent. Used for
    JPEGTables (347). A wrong-typed or truncated value raises."""
    (off,) = struct.unpack_from(endian + "I", payload, 4)
    if off + 2 > len(payload):
        raise ValueError("TIFF truncated: IFD offset outside the payload")
    (n,) = struct.unpack_from(endian + "H", payload, off)
    base = off + 2
    if base + 12 * n > len(payload):
        raise ValueError("TIFF truncated mid IFD")
    for i in range(n):
        t, typ, cnt = struct.unpack_from(endian + "HHI", payload, base + 12 * i)
        if t != tag or cnt == 0:
            continue
        if typ not in (1, 7):
            raise ValueError(f"TIFF: tag {tag} must be BYTE/UNDEFINED typed")
        voff = base + 12 * i + 8
        if cnt > 4:
            (voff,) = struct.unpack_from(endian + "I", payload, voff)
            if voff + cnt > len(payload):
                raise ValueError(f"TIFF truncated: tag {tag} value outside payload")
        return bytes(payload[voff : voff + cnt])
    return None


# FillOrder 2 (bits fill bytes low-order first): per-byte reversal
_BITREV = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)


def _is_tiled(e: dict) -> bool:
    """Tiled iff tile DIMENSIONS are declared, or tile data exists
    with no strip data at all — a striped file carrying a vestigial
    TileByteCounts tag keeps decoding as strips (lenient-metadata
    rule, self-review r10). The ONE detection rule every decode path
    shares."""
    return (322 in e or 323 in e) or (273 not in e and (324 in e or 325 in e))


def _blocks(e: dict, tiled: bool) -> tuple[list[int], list[int]]:
    """Validated (offsets, byte-counts) for the strip (273/279) or
    tile (324/325) layout — the shared fetch every decode path uses."""
    what = "tile" if tiled else "strip"
    ot, ct = (324, 325) if tiled else (273, 279)
    offs = e.get(ot)
    cnts = e.get(ct)
    if (ot in e and offs is None) or (ct in e and cnts is None):
        raise ValueError(
            f"TIFF: {what} offset/count tags have non-integer types"
        )
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError(f"TIFF: missing/mismatched {what} offsets or counts")
    return offs, cnts


def _tile_grid(
    e: dict, w: int, h: int, max_pixels: int
) -> tuple[int, int, int, int]:
    """Validated (tile_w, tile_l, across, down): dims positive
    multiples of 16 (keeps sub-8-bit tile boundaries byte-aligned),
    padded grid bounded — a hostile giant tile over a small image
    allocates the PADDED grid, not w·h, so the bomb guard bounds
    that."""
    tw = _tag1(e, 322)
    tl = _tag1(e, 323)
    if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
        raise ValueError(
            f"TIFF: tile dimensions {tw}x{tl} must be positive "
            "multiples of 16"
        )
    across = (w + tw - 1) // tw
    down = (h + tl - 1) // tl
    if across * tw * down * tl > 4 * max_pixels:
        raise ValueError("TIFF bomb guard: padded tile grid too large")
    return tw, tl, across, down


def _tag1(e: dict, tag: int, default: int | None = None) -> int:
    """First value of an integer tag; ``default`` when absent. A tag
    stored with a non-integer type (``_read_ifd`` keeps it as None)
    raises ValueError like every other hostile path."""
    vals = e.get(tag)
    if vals is None:
        if tag in e:
            raise ValueError(f"TIFF: tag {tag} has a non-integer type")
        if default is None:
            raise ValueError(f"TIFF: required tag {tag} missing")
        return default
    return vals[0]


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (32773): flag < 128 copies flag+1 literal bytes,
    flag > 128 repeats the next byte 257−flag times, 128 is a no-op.
    Decodes exactly ``expected`` bytes; short or truncated input
    raises (house hostile-path contract)."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n and len(out) < expected:
        flag = data[pos]
        pos += 1
        if flag == 128:
            continue
        if flag < 128:
            cnt = flag + 1
            if pos + cnt > n:
                raise ValueError("TIFF PackBits: literal run truncated")
            out += data[pos : pos + cnt]
            pos += cnt
        else:
            if pos >= n:
                raise ValueError("TIFF PackBits: repeat run truncated")
            out += bytes([data[pos]]) * (257 - flag)
            pos += 1
    if len(out) < expected:
        raise ValueError("TIFF PackBits: strip decodes short")
    return bytes(out[:expected])


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first variable-width codes
    9→12 bits with the TIFF "early change" (the width bumps when the
    NEXT entry to assign reaches 2^width − 1, one code earlier than
    GIF's LSB-first variant in ``gif.py``), ClearCode 256 resets the
    table, EOI 257 ends the strip. Decodes exactly ``expected`` bytes;
    short, over-long, or out-of-range-code input raises (house
    hostile-path contract; ``expected`` bounds allocation, so no bomb
    guard is needed beyond it)."""
    padded = data + b"\x00\x00"
    nbits = len(data) * 8
    bitpos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    next_code = 258
    prev: bytes | None = None
    out = bytearray()
    while len(out) < expected:
        if bitpos + width > nbits:
            raise ValueError("TIFF LZW: strip ran out of bits")
        byte_i = bitpos >> 3
        window = int.from_bytes(padded[byte_i : byte_i + 3], "big")
        code = (window >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_CLEAR:
            del table[258:]
            width, next_code, prev = 9, 258, None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError(
                    "TIFF LZW: first code after clear must be a literal"
                )
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError(f"TIFF LZW: code {code} beyond the table")
            if next_code >= 4096:
                raise ValueError("TIFF LZW: table overflow without a clear")
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1  # early change
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("TIFF LZW: strip decodes short")
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    """Fixture/round-trip TIFF-LZW writer: greedy longest-match
    dictionary coding with the same MSB-first early-change width
    schedule the decoder expects, a leading ClearCode, a table reset
    at 4094 entries (the libtiff convention — the 12-bit space is
    never run to the fence), and a trailing EOI."""
    acc = 0
    acc_bits = 0
    out = bytearray()

    state = {"width": 9, "next": 258, "dict": {bytes([i]): i for i in range(256)}}

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << state["width"]) | code
        acc_bits += state["width"]
        while acc_bits >= 8:
            out.append((acc >> (acc_bits - 8)) & 0xFF)
            acc_bits -= 8
        acc &= (1 << acc_bits) - 1

    def reset() -> None:
        state["width"] = 9
        state["next"] = 258
        state["dict"] = {bytes([i]): i for i in range(256)}

    emit(_LZW_CLEAR)
    w = b""
    for b in data:
        k = w + bytes([b])
        if k in state["dict"]:
            w = k
            continue
        emit(state["dict"][w])
        state["dict"][k] = state["next"]
        state["next"] += 1
        # mirror the decoder, which lags this table by ONE entry (it
        # adds after reading): it bumps at ITS next == 2^w − 1 (the
        # TIFF early change), so the encoder bumps at next == 2^w —
        # one later than its own count, same sync idiom as gif.py
        if state["next"] == (1 << state["width"]) and state["width"] < 12:
            state["width"] += 1
        if state["next"] == 4094:
            emit(_LZW_CLEAR)
            reset()
        w = bytes([b])
    if w:
        emit(state["dict"][w])
    emit(_LZW_EOI)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


def packbits_encode(row: bytes) -> bytes:
    """Fixture/round-trip PackBits writer: greedy repeat runs (≥ 3 or
    a pair at buffer boundaries) and literal runs, both capped at 128.
    Spec-valid output; not size-optimal for pathological mixes."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and row[i] == row[i + 1] == row[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def tiff_meta(payload: bytes) -> tuple[int, int, int]:
    """(width, height, samples_per_pixel) from the first IFD."""
    if not is_tiff(payload):
        raise ValueError("not a TIFF payload")
    endian = "<" if payload[:2] == b"II" else ">"
    e = _read_ifd(payload, endian)
    try:
        w, h = e[256][0], e[257][0]
    except (KeyError, TypeError):
        raise ValueError("TIFF: missing ImageWidth/ImageLength")
    spp = _tag1(e, 277, 1)
    return w, h, spp


def decode_tiff(payload: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB (alpha dropped)."""
    if not is_tiff(payload):
        raise ValueError("not a TIFF payload")
    endian = "<" if payload[:2] == b"II" else ">"
    e = _read_ifd(payload, endian)
    try:
        w, h = e[256][0], e[257][0]
    except (KeyError, TypeError):
        raise ValueError("TIFF: missing ImageWidth/ImageLength")
    if w <= 0 or h <= 0:
        raise ValueError("TIFF: non-positive dimensions")
    if w * h > max_pixels:
        raise ValueError(f"TIFF bomb guard: {w}x{h} exceeds {max_pixels} pixels")
    comp = _tag1(e, 259, 1)
    if comp == 6:
        raise NotImplementedError(
            "TIFF old-style JPEG (compression 6) unsupported "
            "(deprecated by TIFF Technical Note 2; new-style 7 is "
            "supported)"
        )
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported "
            "(uncompressed/LZW/JPEG/Deflate/PackBits only)"
        )
    pred = _tag1(e, 317, 1)
    if pred == 3:
        raise NotImplementedError(
            "TIFF floating-point predictor (3) unsupported"
        )
    if pred not in (1, 2):
        raise ValueError(f"TIFF: invalid predictor {pred}")
    photo = _tag1(e, 262, 1)
    if photo == 6 and comp != 7:
        raise NotImplementedError(
            "TIFF photometric 6 (YCbCr) supported only under JPEG "
            "compression (raw subsampled YCbCr strips unsupported)"
        )
    if photo not in (0, 1, 2, 6):
        raise NotImplementedError(f"TIFF photometric {photo} unsupported")
    spp = _tag1(e, 277, 1)
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF samples-per-pixel {spp} unsupported")
    if photo in (2, 6) and spp < 3:
        raise ValueError("TIFF: color photometric with < 3 samples")
    if photo in (0, 1) and spp != 1:
        # the spec defines no such file; decoding it would return
        # uninverted "RGB" for a WhiteIsZero payload (self-review r10)
        raise ValueError("TIFF: grayscale photometric with multiple samples")
    bits = e.get(258) if 258 in e else [8]
    if bits is None:
        raise ValueError("TIFF: tag 258 has a non-integer type")
    if len(set(bits)) != 1 or bits[0] not in (1, 4, 8):
        raise NotImplementedError(
            f"TIFF bit depths {bits} unsupported (uniform 1/4/8 only)"
        )
    bit = bits[0]
    fill = _tag1(e, 266, 1)
    if fill not in (1, 2):
        raise ValueError(f"TIFF: invalid FillOrder {fill}")
    if fill == 2 and not (bit == 1 and comp == 1):
        # TIFF 6.0 sanctions FillOrder 2 only for 1-bit uncompressed
        # (or CCITT) data; anywhere else an MSB-first read would decode
        # silently bit-reversed, so every other shape keeps the typed
        # refusal (self-review r9; narrowed r10)
        raise NotImplementedError(
            "TIFF FillOrder 2 supported for 1-bit uncompressed data "
            "only (its TIFF 6.0 sanctioned use)"
        )
    planar = _tag1(e, 284, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF: invalid planar configuration {planar}")
    if comp == 7:
        # new-style JPEG-in-TIFF (TIFF Technical Note 2): every
        # strip/tile is a complete JPEG stream — composed with the
        # in-house baseline decoder, so predictor/planar/sub-8-bit
        # combinations that TN2 never produces are rejected up front
        if pred == 2:
            raise ValueError("TIFF: predictor with JPEG compression")
        if bit != 8:
            raise NotImplementedError(
                "TIFF JPEG compression with sub-8-bit samples unsupported"
            )
        if planar == 2:
            raise NotImplementedError("TIFF planar JPEG unsupported")
        if photo not in (1, 6):
            raise NotImplementedError(
                "TIFF JPEG compression supports photometric 1 "
                "(grayscale) and 6 (YCbCr) only"
            )
        # photo/spp consistency already holds here: the shared checks
        # above pinned photo 1 ↔ spp 1 and photo 6 ↔ spp ≥ 3
        return _decode_jpeg_tiff(payload, e, endian, w, h, photo, max_pixels)
    if bit != 8:
        # 1-bit (fax/document scans) and 4-bit grayscale: MSB-first
        # packing within row-aligned bytes (FillOrder 1; 1-bit
        # uncompressed may declare FillOrder 2 — handled by the
        # per-byte bit reversal after the strip/tile walk)
        if spp != 1 or photo == 2:
            raise NotImplementedError(
                "TIFF sub-8-bit depths supported for grayscale only"
            )
        if pred == 2:
            raise NotImplementedError(
                "TIFF horizontal predictor with sub-8-bit samples "
                "unsupported"
            )
    if planar == 2 and spp > 1:
        # PlanarConfiguration 2: each component in its own complete
        # set of strips/tiles, plane-major (spp == 1 is
        # indistinguishable from chunky and falls through). bit == 8
        # is guaranteed here: sub-8-bit with spp > 1 already refused
        out = _decode_planar(payload, e, w, h, spp, comp, pred, max_pixels)
        return _finish_pixels(out, w, h, spp, 8, photo)
    if _is_tiled(e):
        out = _decode_tiles(
            payload, e, w, h, spp, bit, comp, pred, max_pixels
        )
        if fill == 2:
            out = _BITREV[out]
        return _finish_pixels(out, w, h, spp, bit, photo)
    offs, cnts = _blocks(e, tiled=False)
    rows_per_strip = _tag1(e, 278, h) or h
    row_bytes = (w * spp * bit + 7) // 8  # packed bytes per row
    out = _decode_strips(
        payload, offs, cnts, h, row_bytes, rows_per_strip, comp
    )
    if fill == 2:
        out = _BITREV[out]
    if pred == 2:
        # undo horizontal differencing: each row restarts, each sample
        # accumulates its left neighbor of the SAME channel, mod 256
        # (strips hold whole rows, so one image-wide pass is exact)
        out = np.cumsum(
            out.reshape(h, w, spp), axis=1, dtype=np.uint8
        ).reshape(h, row_bytes)
    return _finish_pixels(out, w, h, spp, bit, photo)


def _decompress_block(
    payload: bytes, so: int, sc: int, need: int, comp: int, what: str
) -> np.ndarray:
    """One strip/tile → exactly ``need`` bytes (uint8 array); shared
    by the strip and tile walks. ``need`` bounds every allocation, so
    no compressed block can bomb."""
    if so < 0 or sc < 0 or so + sc > len(payload):
        raise ValueError(f"TIFF truncated: {what} outside the payload")
    if comp == 32773:
        return np.frombuffer(_unpackbits(payload[so : so + sc], need), dtype=np.uint8)
    if comp == 5:
        return np.frombuffer(_lzw_decode(payload[so : so + sc], need), dtype=np.uint8)
    if comp in (8, 32946):
        import zlib

        try:
            # decompressobj + max_length bounds the inflation (the
            # zip-bomb guard the other codecs get from `expected`)
            raw = zlib.decompressobj().decompress(payload[so : so + sc], need)
        except zlib.error as exc:
            raise ValueError(f"TIFF Deflate: {exc}") from None
        if len(raw) < need:
            raise ValueError(f"TIFF Deflate: {what} decodes short")
        return np.frombuffer(raw, dtype=np.uint8)
    if sc < need:
        raise ValueError(f"TIFF: {what} shorter than its rows")
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=so)


def _decode_strips(
    payload: bytes,
    offs: list[int],
    cnts: list[int],
    h: int,
    row_bytes: int,
    rows_per_strip: int,
    comp: int,
) -> np.ndarray:
    """The strip walk: offsets/counts → packed (h, row_bytes) bytes.
    Shared by the chunky path and the per-plane planar walk."""
    out = np.empty((h, row_bytes), dtype=np.uint8)
    y = 0
    for so, sc in zip(offs, cnts):
        n_rows = min(rows_per_strip, h - y)
        need = n_rows * row_bytes
        block = _decompress_block(payload, so, sc, need, comp, "strip")
        out[y : y + n_rows] = block.reshape(n_rows, row_bytes)
        y += n_rows
    if y < h:
        raise ValueError("TIFF: strips cover fewer rows than ImageLength")
    return out


def _decode_planar(
    payload: bytes,
    e: dict,
    w: int,
    h: int,
    spp: int,
    comp: int,
    pred: int,
    max_pixels: int,
) -> np.ndarray:
    """PlanarConfiguration 2 (TIFF 6.0): every component stored in its
    own complete run of strips (or tiles), plane-major — StripOffsets/
    TileOffsets carry spp × per-plane entries. Each plane decodes as a
    single-channel image (the predictor differences within the plane,
    so the per-plane cumsum is exact), then the planes interleave into
    the packed (h, w·spp) byte matrix the shared pixel tail expects.
    8-bit only (callers refuse sub-8-bit planar)."""
    tiled = _is_tiled(e)
    offs, cnts = _blocks(e, tiled)
    planes: list[np.ndarray] = []
    if tiled:
        if len(offs) % spp:
            raise ValueError(
                f"TIFF planar: {len(offs)} tiles not divisible by "
                f"{spp} planes"
            )
        per = len(offs) // spp
        for p in range(spp):
            planes.append(
                _decode_tiles(
                    payload, e, w, h, 1, 8, comp, pred, max_pixels,
                    offs=offs[p * per : (p + 1) * per],
                    cnts=cnts[p * per : (p + 1) * per],
                )
            )
    else:
        rows_per_strip = _tag1(e, 278, h) or h
        spn = (h + rows_per_strip - 1) // rows_per_strip
        if len(offs) != spp * spn:
            raise ValueError(
                f"TIFF planar: {len(offs)} strips for {spp} planes of "
                f"{spn}"
            )
        for p in range(spp):
            pl = _decode_strips(
                payload,
                offs[p * spn : (p + 1) * spn],
                cnts[p * spn : (p + 1) * spn],
                h, w, rows_per_strip, comp,
            )
            if pred == 2:
                pl = np.cumsum(pl, axis=1, dtype=np.uint8)
            planes.append(pl)
    out = np.empty((h, w * spp), dtype=np.uint8)
    for p in range(spp):
        out[:, p::spp] = planes[p]
    return out


def _decode_jpeg_tiff(
    payload: bytes,
    e: dict,
    endian: str,
    w: int,
    h: int,
    photo: int,
    max_pixels: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7, TIFF Technical Note 2):
    every strip/tile is a COMPLETE JPEG stream decoded by the in-house
    baseline decoder (``jpeg.py``). Shared tables may live in
    JPEGTables (tag 347) as an abbreviated SOI..EOI stream — merged by
    the standard splice ``SOI + tables + strip-sans-SOI`` (a stream's
    own DQT/DHT redefinitions override, because the table parsers
    assign by id). Tile JPEGs carry the full padded tile dims; strip
    JPEGs carry exactly their strip's rows — a mismatch raises."""
    from tableone_pyspark_spark.functions.jpeg import decode_jpeg

    tables = _read_undefined(payload, endian, 347)
    prefix = b""
    if tables is not None:
        if (
            len(tables) < 4
            or tables[:2] != b"\xff\xd8"
            or tables[-2:] != b"\xff\xd9"
        ):
            raise ValueError("TIFF JPEGTables: not an SOI..EOI stream")
        prefix = tables[2:-2]
    nc = 3 if photo == 6 else 1

    def dec(so: int, sc: int, bw: int, bh: int, what: str) -> np.ndarray:
        if so < 0 or sc < 0 or so + sc > len(payload):
            raise ValueError(f"TIFF truncated: {what} outside the payload")
        block = payload[so : so + sc]
        if block[:2] != b"\xff\xd8":
            raise ValueError(f"TIFF JPEG {what}: missing SOI")
        img = decode_jpeg(b"\xff\xd8" + prefix + block[2:], max_pixels)
        if img.dtype != np.uint8:
            # a 12-bit (SOF1) stream contradicts the declared 8-bit
            # samples — assigning it would silently wrap mod 256
            # (self-review r10)
            raise ValueError(
                f"TIFF JPEG {what}: stream precision disagrees with "
                "BitsPerSample 8"
            )
        if img.shape[0] != bh or img.shape[1] != bw:
            raise ValueError(
                f"TIFF JPEG {what}: stream is {img.shape[1]}x"
                f"{img.shape[0]}, expected {bw}x{bh}"
            )
        if img.shape[2] != nc:
            raise ValueError(
                f"TIFF JPEG {what}: {img.shape[2]} components for "
                f"photometric {photo}"
            )
        return img

    out = np.empty((h, w, nc), dtype=np.uint8)
    if _is_tiled(e):
        tw, tl, across, down = _tile_grid(e, w, h, max_pixels)
        offs, cnts = _blocks(e, tiled=True)
        if len(offs) != across * down:
            raise ValueError(
                f"TIFF: {len(offs)} tiles for a {across}x{down} grid"
            )
        for ty in range(down):
            rows = min(tl, h - ty * tl)
            for tx in range(across):
                i = ty * across + tx
                img = dec(offs[i], cnts[i], tw, tl, "tile")
                cols = min(tw, w - tx * tw)
                out[ty * tl : ty * tl + rows, tx * tw : tx * tw + cols] = (
                    img[:rows, :cols]
                )
    else:
        offs, cnts = _blocks(e, tiled=False)
        rows_per_strip = _tag1(e, 278, h) or h
        y = 0
        for so, sc in zip(offs, cnts):
            n_rows = min(rows_per_strip, h - y)
            if n_rows <= 0:
                break
            out[y : y + n_rows] = dec(so, sc, w, n_rows, "strip")
            y += n_rows
        if y < h:
            raise ValueError("TIFF: strips cover fewer rows than ImageLength")
    if nc == 1:
        return np.ascontiguousarray(out[:, :, 0])
    return out


def _decode_tiles(
    payload: bytes,
    e: dict,
    w: int,
    h: int,
    spp: int,
    bit: int,
    comp: int,
    pred: int,
    max_pixels: int,
    offs: list[int] | None = None,
    cnts: list[int] | None = None,
) -> np.ndarray:
    """Tiled layout (TIFF 6.0 §15): the image is a grid of
    ceil(w/tw) × ceil(h/tl) INDEPENDENT tiles, every tile stored
    complete (edge tiles padded to full size) and compressed on its
    own — so the horizontal predictor must be undone PER TILE before
    assembly (a row spanning two tiles is two independent difference
    runs), unlike strips where one image-wide pass is exact. Tile
    dimensions are required multiples of 16, which keeps sub-8-bit
    tile boundaries byte-aligned in the packed output. Returns the
    packed (h, row_bytes) byte matrix."""
    tw, tl, across, down = _tile_grid(e, w, h, max_pixels)
    if offs is None or cnts is None:  # planar callers pass plane slices
        offs, cnts = _blocks(e, tiled=True)
    if len(offs) != across * down:
        raise ValueError(
            f"TIFF: {len(offs)} tiles for a {across}x{down} grid"
        )
    row_bytes = (w * spp * bit + 7) // 8
    tile_row_bytes = (tw * spp * bit + 7) // 8  # exact: tw % 16 == 0
    need = tl * tile_row_bytes
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    for ty in range(down):
        rows = min(tl, h - ty * tl)
        for tx in range(across):
            i = ty * across + tx
            tile = _decompress_block(
                payload, offs[i], cnts[i], need, comp, "tile"
            ).reshape(tl, tile_row_bytes)
            if pred == 2:
                tile = np.cumsum(
                    tile.reshape(tl, tw, spp), axis=1, dtype=np.uint8
                ).reshape(tl, tile_row_bytes)
            xb = tx * tile_row_bytes
            cols = min(tile_row_bytes, row_bytes - xb)
            out[ty * tl : ty * tl + rows, xb : xb + cols] = tile[
                :rows, :cols
            ]
    return out


def _finish_pixels(
    out: np.ndarray, w: int, h: int, spp: int, bit: int, photo: int
) -> np.ndarray:
    """Packed (h, row_bytes) bytes → the decoder's pixel contract:
    (h, w) gray / (h, w, 3) RGB uint8, sub-8-bit depths expanded
    (MSB-first), WhiteIsZero inverted, alpha dropped."""
    row_bytes = out.shape[1]
    if bit == 1:
        out = np.unpackbits(out, axis=1)[:, :w] * np.uint8(255)
    elif bit == 4:
        nib = np.empty((h, row_bytes * 2), dtype=np.uint8)
        nib[:, 0::2] = out >> 4
        nib[:, 1::2] = out & 15
        out = nib[:, :w] * np.uint8(17)
    if spp == 1:
        img = out
        if photo == 0:  # white-is-zero
            img = 255 - img
        return np.ascontiguousarray(img)
    px = out.reshape(h, w, spp)
    return np.ascontiguousarray(px[:, :, :3])


def _diff_rows(px: np.ndarray) -> np.ndarray:
    """Horizontal differencing (predictor 2) over (rows, w, spp) —
    shared by the strip and tiled fixture writers."""
    px = px.astype(np.int16)
    px[:, 1:, :] -= px[:, :-1, :].copy()
    return (px % 256).astype(np.uint8)


def _pack_rows(px: np.ndarray, bits: int) -> bytes:
    """(rows, w, spp) uint8 pixels → packed MSB-first row bytes at
    the given depth — shared by both fixture writers."""
    rows, w, _spp = px.shape
    if bits == 1:
        return np.packbits(px.reshape(rows, w) >= 128, axis=1).tobytes()
    if bits == 4:
        nib = (px.reshape(rows, w) >> 4).astype(np.uint8)
        if w % 2:
            nib = np.concatenate(
                [nib, np.zeros((rows, 1), dtype=np.uint8)], axis=1
            )
        return ((nib[:, 0::2] << 4) | nib[:, 1::2]).tobytes()
    return px.tobytes()


def _compress_raw(
    raw: bytes, compression: int, n_rows: int, row_bytes: int
) -> bytes:
    """One strip/tile of packed rows → compressed block (PackBits
    packs each row independently per spec) — shared by both fixture
    writers; any codec tweak lands in the strip AND tiled layouts."""
    if compression == 5:
        return lzw_encode(raw)
    if compression == 8:
        import zlib

        return zlib.compress(raw)
    if compression == 32773:
        return b"".join(
            packbits_encode(raw[r * row_bytes : (r + 1) * row_bytes])
            for r in range(n_rows)
        )
    return raw


def encode_tiff(
    arr: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    bits: int = 8,
    fill_order: int = 1,
) -> bytes:
    """Fixture/round-trip writer: (h, w) gray or (h, w, 3) RGB uint8 →
    little-endian single-strip TIFF. ``compression``: 1 (none),
    5 (LZW — one stream for the strip), 8 (Deflate/zlib), 32773
    (PackBits — each row packed independently per spec, concatenated).
    ``predictor``: 1 (none) or 2 (horizontal differencing — the layout
    real LZW/Deflate TIFFs almost always pair with those codecs).
    ``bits``: 8, or — grayscale only, predictor 1 — 4 (values must be
    multiples of 17: the nibble scale) or 1 (values 0/255): the
    document-scan depths, MSB-first row-aligned packing."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        spp, photo = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        spp, photo = 3, 2
    else:
        raise ValueError("arr must be (h, w) gray or (h, w, 3) RGB")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if bits not in (1, 4, 8):
        raise ValueError(f"unsupported bit depth {bits}")
    if bits != 8 and (spp != 1 or predictor == 2):
        raise ValueError("sub-8-bit fixtures are grayscale, predictor 1 only")
    if fill_order not in (1, 2):
        raise ValueError(f"unsupported fill order {fill_order}")
    if fill_order == 2 and not (bits == 1 and compression == 1):
        raise ValueError(
            "FillOrder-2 fixtures are 1-bit uncompressed only "
            "(the decoder's supported shape)"
        )
    px = arr.reshape(h, w, spp)
    if predictor == 2:
        px = _diff_rows(px)
    raw = _pack_rows(px, bits)
    if fill_order == 2:
        raw = _BITREV[np.frombuffer(raw, dtype=np.uint8)].tobytes()
    row_bytes = (w * spp * bits + 7) // 8
    data = _compress_raw(raw, compression, h, row_bytes)
    tags = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, 1, bits) if spp == 1 else (258, 3, 3, None),  # bits
        (259, 3, 1, compression),
        (262, 3, 1, photo),
        (273, 4, 1, None),  # strip offset, patched below
        (277, 3, 1, spp),
        (278, 3, 1, h),
        (279, 4, 1, len(data)),
    ]
    if predictor == 2:
        tags.append((317, 3, 1, 2))
    if fill_order == 2:
        tags.append((266, 3, 1, 2))
    tags.sort()  # spec: IFD entries in ascending tag order
    n = len(tags)
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n + 4
    extra = b""
    extra_off = after_ifd
    entries = b""
    for tag, typ, cnt, val in tags:
        if tag == 258 and spp == 3:
            entries += struct.pack("<HHII", tag, typ, cnt, extra_off)
            extra += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
            extra_off += 8
        elif tag == 273:
            entries += struct.pack("<HHII", tag, typ, cnt, 0)  # patched
        else:
            entries += struct.pack("<HHII", tag, typ, cnt, val)
    data_off = extra_off
    entries = entries.replace(
        struct.pack("<HHII", 273, 4, 1, 0),
        struct.pack("<HHII", 273, 4, 1, data_off),
    )
    return (
        b"II*\x00"
        + struct.pack("<I", ifd_off)
        + struct.pack("<H", n)
        + entries
        + struct.pack("<I", 0)
        + extra
        + data
    )


def encode_tiff_tiled(
    arr: np.ndarray,
    tile: tuple[int, int] = (16, 16),
    compression: int = 1,
    predictor: int = 1,
    bits: int = 8,
    planar: int = 1,
) -> bytes:
    """Fixture/round-trip writer for the TILED layout (TIFF 6.0 §15):
    (h, w) gray or (h, w, 3) RGB uint8 → little-endian tiled TIFF.
    Every tile is stored complete (edge tiles zero-padded to the full
    ``tile`` size) and compressed independently; with ``predictor=2``
    the horizontal differencing runs per tile row — exactly the
    layout the decoder must invert per tile. Tile dims must be
    multiples of 16 per spec. Same codec/depth menu as
    :func:`encode_tiff`."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        spp, photo = 1, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        spp, photo = 3, 2
    else:
        raise ValueError("arr must be (h, w) gray or (h, w, 3) RGB")
    tw, tl = tile
    if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
        raise ValueError("tile dims must be positive multiples of 16")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    if bits not in (1, 4, 8):
        raise ValueError(f"unsupported bit depth {bits}")
    if bits != 8 and (spp != 1 or predictor == 2):
        raise ValueError("sub-8-bit fixtures are grayscale, predictor 1 only")
    if planar not in (1, 2):
        raise ValueError(f"unsupported planar configuration {planar}")
    if planar == 2 and (spp != 3 or bits != 8):
        raise ValueError("planar fixtures are 8-bit RGB only")
    across = (w + tw - 1) // tw
    down = (h + tl - 1) // tl
    padded = np.zeros((down * tl, across * tw, spp), dtype=np.uint8)
    padded[:h, :w] = arr.reshape(h, w, spp)
    tile_row_bytes = (tw * (1 if planar == 2 else spp) * bits + 7) // 8
    blocks: list[bytes] = []
    # planar 2: one complete tile grid PER PLANE, plane-major order
    for p in range(spp) if planar == 2 else [None]:
        for ty in range(down):
            for tx in range(across):
                px = padded[
                    ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw
                ].astype(np.uint8)
                if p is not None:
                    px = px[:, :, p : p + 1]
                if predictor == 2:
                    px = _diff_rows(px)
                raw = _pack_rows(px, bits)
                blocks.append(
                    _compress_raw(raw, compression, tl, tile_row_bytes)
                )
    n_tiles = len(blocks)
    tags: list[tuple[int, int, int, int | None]] = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, 1, bits) if spp == 1 else (258, 3, 3, None),
        (259, 3, 1, compression),
        (262, 3, 1, photo),
        (277, 3, 1, spp),
        (322, 3, 1, tw),
        (323, 3, 1, tl),
        (324, 4, n_tiles, None),  # offsets: patched below
        (325, 4, n_tiles, None),  # byte counts
    ]
    if predictor == 2:
        tags.append((317, 3, 1, 2))
    if planar == 2:
        tags.append((284, 3, 1, 2))
    tags.sort()  # spec: IFD entries in ascending tag order
    n = len(tags)
    after_ifd = 8 + 2 + 12 * n + 4
    # extras: bits triple (RGB), then the two tile arrays (if n>1)
    extra = b""
    slots: dict[int, int] = {}
    if spp == 3:
        slots[258] = after_ifd + len(extra)
        extra += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
    if n_tiles > 1:
        slots[324] = after_ifd + len(extra)
        extra += b"\x00" * (4 * n_tiles)
        slots[325] = after_ifd + len(extra)
        extra += b"\x00" * (4 * n_tiles)
    data_off = after_ifd + len(extra)
    offsets = []
    pos = data_off
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    counts = [len(b) for b in blocks]
    if n_tiles > 1:
        extra = bytearray(extra)
        o324 = slots[324] - after_ifd
        o325 = slots[325] - after_ifd
        extra[o324 : o324 + 4 * n_tiles] = struct.pack(
            f"<{n_tiles}I", *offsets
        )
        extra[o325 : o325 + 4 * n_tiles] = struct.pack(
            f"<{n_tiles}I", *counts
        )
        extra = bytes(extra)
    entries = b""
    for tag, typ, cnt, val in tags:
        if tag == 258 and spp == 3:
            entries += struct.pack("<HHII", tag, typ, cnt, slots[258])
        elif tag == 324:
            entries += struct.pack(
                "<HHII", tag, typ, cnt,
                offsets[0] if n_tiles == 1 else slots[324],
            )
        elif tag == 325:
            entries += struct.pack(
                "<HHII", tag, typ, cnt,
                counts[0] if n_tiles == 1 else slots[325],
            )
        else:
            entries += struct.pack("<HHII", tag, typ, cnt, val)
    return (
        b"II*\x00"
        + struct.pack("<I", 8)
        + struct.pack("<H", n)
        + entries
        + struct.pack("<I", 0)
        + extra
        + b"".join(blocks)
    )


def _write_tiff(
    tags: list[tuple[int, int, "list[int] | bytes"]],
    blocks: list[bytes],
    offsets_tag: int,
) -> bytes:
    """Generic little-endian single-IFD fixture writer used by the
    planar and JPEG encoders (the two older writers keep their
    hand-rolled layouts — their byte output is pinned by round-trip
    tests). ``tags`` = (tag, type, values) with values a list of ints
    (SHORT 3 / LONG 4) or raw bytes (UNDEFINED 7); the entry whose tag
    is ``offsets_tag`` (273 strips / 324 tiles) must carry a
    placeholder list of len(blocks) — it is rewritten to the final
    block offsets. Values wider than 4 bytes spill to a word-aligned
    extras area between the IFD and the data blocks."""
    tags = sorted(tags)  # spec: IFD entries in ascending tag order
    n = len(tags)
    after_ifd = 8 + 2 + 12 * n + 4
    sz = {3: 2, 4: 4, 7: 1}
    extra_len = 0
    for _tag, typ, vals in tags:
        s = sz[typ] * len(vals)
        if s > 4:
            extra_len += s + (s & 1)
    data_off = after_ifd + extra_len
    offs: list[int] = []
    pos = data_off
    for b in blocks:
        offs.append(pos)
        pos += len(b)
    entries = b""
    extra = b""
    for tag, typ, vals in tags:
        if tag == offsets_tag:
            vals = offs
        if typ == 7:
            data = bytes(vals)
        else:
            fmt = {3: "H", 4: "I"}[typ]
            data = struct.pack("<" + fmt * len(vals), *vals)
        if len(data) <= 4:
            entries += (
                struct.pack("<HHI", tag, typ, len(vals)) + data.ljust(4, b"\x00")
            )
        else:
            entries += struct.pack(
                "<HHII", tag, typ, len(vals), after_ifd + len(extra)
            )
            extra += data + (b"\x00" if len(data) & 1 else b"")
    return (
        b"II*\x00"
        + struct.pack("<I", 8)
        + struct.pack("<H", n)
        + entries
        + struct.pack("<I", 0)
        + extra
        + b"".join(blocks)
    )


def encode_tiff_planar(
    arr: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Fixture/round-trip writer for PlanarConfiguration 2 with the
    STRIP layout: (h, w, 3) RGB uint8 → one complete run of strips per
    plane, plane-major (StripOffsets carries 3 × strips-per-plane
    entries), each strip a single-channel band compressed — and
    predictor-differenced — independently within its plane. Same codec
    menu as :func:`encode_tiff`; tiled planar fixtures come from
    :func:`encode_tiff_tiled` with ``planar=2``."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("planar fixtures are (h, w, 3) RGB only")
    if compression not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")
    h, w, _ = arr.shape
    rps = rows_per_strip or h
    if rps <= 0:
        raise ValueError("rows_per_strip must be positive")
    blocks: list[bytes] = []
    for p in range(3):
        for y in range(0, h, rps):
            px = arr[y : y + rps, :, p : p + 1]
            if predictor == 2:
                px = _diff_rows(px)
            blocks.append(
                _compress_raw(px.tobytes(), compression, px.shape[0], w)
            )
    tags: list[tuple[int, int, list[int] | bytes]] = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [8, 8, 8]),
        (259, 3, [compression]),
        (262, 3, [2]),
        (273, 4, [0] * len(blocks)),  # patched to block offsets
        (277, 3, [3]),
        (278, 3, [rps]),
        (279, 4, [len(b) for b in blocks]),
        (284, 3, [2]),
    ]
    if predictor == 2:
        tags.append((317, 3, [2]))
    return _write_tiff(tags, blocks, 273)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split one complete JPEG stream into (JPEGTables stream,
    abbreviated stream): DQT/DHT segments move into an SOI..EOI tables
    stream (the tag-347 payload), everything else — including the SOS
    header and the entropy-coded tail — stays. Fixture-side tool for
    exercising the decoder's tables merge."""
    pos = 2
    kept = b""
    tabs = b""
    n = len(stream)
    while True:
        if pos + 4 > n or stream[pos] != 0xFF:
            raise ValueError("JPEG stream: expected marker")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: the rest is the scan
            rest = stream[pos:]
            break
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tabs += seg
        else:
            kept += seg
        pos += 2 + seglen
    return b"\xff\xd8" + tabs + b"\xff\xd9", b"\xff\xd8" + kept + rest


def encode_tiff_jpeg(
    arr: np.ndarray,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    jpeg_tables: bool = False,
    subsampling: str = "444",
) -> bytes:
    """Fixture writer for new-style JPEG-in-TIFF (compression 7):
    (h, w) gray → photometric 1 or (h, w, 3) RGB → photometric 6
    (YCbCr), each strip band — or each complete padded tile, with
    ``tile`` — encoded as its own baseline JPEG stream by the in-house
    ``jpeg.py`` writers. ``jpeg_tables=True`` moves the (shared)
    DQT/DHT segments of every stream into a JPEGTables (347) tag,
    exercising the decoder's abbreviated-stream merge. Lossy like any
    JPEG: tests pin decode_tiff against the direct per-stream
    decode_jpeg assembly, not against the source pixels."""
    from tableone_pyspark_spark.functions.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_rgb,
    )

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        spp, photo = 1, 1
        enc = encode_jpeg_gray
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        spp, photo = 3, 6

        def enc(band: np.ndarray) -> bytes:
            return encode_jpeg_rgb(band, subsampling=subsampling)
    else:
        raise ValueError("arr must be (h, w) gray or (h, w, 3) RGB")
    if tile is not None and rows_per_strip is not None:
        raise ValueError("pick strips or tiles, not both")
    streams: list[bytes] = []
    tags: list[tuple[int, int, list[int] | bytes]] = [
        (256, 3, [w]),
        (257, 3, [h]),
        (258, 3, [8] * spp),
        (259, 3, [7]),
        (262, 3, [photo]),
        (277, 3, [spp]),
    ]
    if tile is not None:
        tw, tl = tile
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("tile dims must be positive multiples of 16")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        padded = np.zeros((down * tl, across * tw, spp), dtype=np.uint8)
        padded[:h, :w] = arr.reshape(h, w, spp)
        for ty in range(down):
            for tx in range(across):
                band = padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                streams.append(enc(band if spp == 3 else band[:, :, 0]))
        tags += [
            (322, 3, [tw]),
            (323, 3, [tl]),
            (324, 4, [0] * len(streams)),  # patched to block offsets
            (325, 4, None),  # placeholder; filled below
        ]
        offsets_tag = 324
    else:
        rps = rows_per_strip or h
        if rps <= 0:
            raise ValueError("rows_per_strip must be positive")
        for y in range(0, h, rps):
            band = arr[y : y + rps]
            streams.append(enc(band if spp == 3 else band.reshape(band.shape[:2])))
        tags += [
            (273, 4, [0] * len(streams)),
            (278, 3, [rps]),
            (279, 4, None),
        ]
        offsets_tag = 273
    if jpeg_tables:
        tabs, first = _split_jpeg_tables(streams[0])
        abbreviated = [first]
        for s in streams[1:]:
            t2, a2 = _split_jpeg_tables(s)
            if t2 != tabs:
                raise ValueError("streams disagree on shared tables")
            abbreviated.append(a2)
        streams = abbreviated
        tags.append((347, 7, tabs))
    counts_tag = 325 if tile is not None else 279
    tags = [
        (t, typ, [len(b) for b in streams] if vals is None and t == counts_tag else vals)
        for t, typ, vals in tags
    ]
    return _write_tiff(tags, streams, offsets_tag)
