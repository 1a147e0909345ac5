"""WebP container/header metadata — dimensions, variant and feature
flags from the RIFF structure and frame headers alone (the container
layout and both frame-header encodings are fixed public structure):

    RIFF <size:u32le> WEBP, then one of
      'VP8 '  lossy:    3-byte frame tag, start code 9D 01 2A, then
              u16le width, u16le height (14 valid bits each; the top
              2 bits carry scaling hints and are masked off)
      'VP8L'  lossless: signature byte 0x2F, then a little-endian bit
              stream with 14-bit (width−1), 14-bit (height−1), 1-bit
              alpha-is-used, 3-bit version (must be 0)
      'VP8X'  extended: 4-byte feature flags, 24-bit (canvas width−1),
              24-bit (canvas height−1); actual frames follow in later
              chunks (animation/alpha/EXIF...)

The PIXEL decoder is deliberately absent: VP8 needs the full
boolean-arithmetic DCT pipeline and VP8L's LZ77 back-references use a
120-entry 2D distance-map table this codebase refuses to reproduce
from memory without a retrievable spec source (documented r7
decision) — metadata is what the curation pipeline needs, and the
honest-refusal seam stays for the day the table is retrievable.

Every hostile path raises ValueError (house codec contract).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class WebpInfo:
    width: int
    height: int
    variant: str        # "lossy" | "lossless" | "extended"
    has_alpha: bool
    has_animation: bool


def is_webp(payload: bytes) -> bool:
    return (
        len(payload) >= 16
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def webp_meta(payload: bytes) -> WebpInfo:
    """Parse the first frame/feature chunk into :class:`WebpInfo`."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload")
    riff_size = int.from_bytes(payload[4:8], "little")
    if riff_size + 8 > len(payload):
        raise ValueError("WebP truncated: RIFF size exceeds the payload")
    fourcc = payload[12:16]
    body = payload[20:]
    chunk_size = int.from_bytes(payload[16:20], "little")
    if chunk_size > len(body):
        raise ValueError("WebP truncated: first chunk exceeds the payload")

    if fourcc == b"VP8 ":
        if chunk_size < 10:
            raise ValueError("WebP: VP8 frame header shorter than 10 bytes")
        if body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("WebP: bad VP8 key-frame start code")
        w = int.from_bytes(body[6:8], "little") & 0x3FFF
        h = int.from_bytes(body[8:10], "little") & 0x3FFF
        if w == 0 or h == 0:
            raise ValueError("WebP: zero VP8 frame dimension")
        return WebpInfo(w, h, "lossy", False, False)

    if fourcc == b"VP8L":
        if chunk_size < 5:
            raise ValueError("WebP: VP8L header shorter than 5 bytes")
        if body[0] != 0x2F:
            raise ValueError("WebP: bad VP8L signature byte")
        bits = int.from_bytes(body[1:5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        alpha = bool((bits >> 28) & 1)
        version = (bits >> 29) & 0x7
        if version != 0:
            raise ValueError(f"WebP: reserved VP8L version {version}")
        return WebpInfo(w, h, "lossless", alpha, False)

    if fourcc == b"VP8X":
        if chunk_size < 10:
            raise ValueError("WebP: VP8X chunk shorter than 10 bytes")
        flags = body[0]
        if body[1:4] != b"\x00\x00\x00":
            raise ValueError("WebP: nonzero VP8X reserved bytes")
        w = int.from_bytes(body[4:7], "little") + 1
        h = int.from_bytes(body[7:10], "little") + 1
        return WebpInfo(
            w, h, "extended",
            has_alpha=bool(flags & 0x10),
            has_animation=bool(flags & 0x02),
        )

    raise ValueError(f"WebP: unknown first chunk {fourcc!r}")
