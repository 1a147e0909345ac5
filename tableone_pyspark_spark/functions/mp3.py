"""MPEG audio (MP3) frame-header metadata parser — sample rate,
channels, frame/sample counts and duration from the sync-frame walk
alone (ISO/IEC 11172-3 / 13818-3 header layout; no subband/IMDCT
synthesis, so there is deliberately NO sample decoder here — metadata
is what a curation pipeline needs, and a full decoder would be fake
precision without a reference implementation to pin against).

Layout (every frame): 32-bit header
    11 bits  sync (all ones)
     2 bits  version        11=MPEG1  10=MPEG2  00=MPEG2.5  01=reserved
     2 bits  layer          11=I  10=II  01=III  00=reserved
     1 bit   protection     0 = 16-bit CRC follows the header
     4 bits  bitrate index  (per version×layer table below; 0=free,
                             15=bad)
     2 bits  sample rate    (per version table; 3=reserved)
     1 bit   padding        adds one slot (4 bytes layer I, 1 byte
                             layers II/III)
     1 bit   private
     2 bits  channel mode   11 = mono, else 2 channels
     2 bits  mode extension
     1 bit   copyright, 1 bit original
     2 bits  emphasis       10 = reserved

Frame size in bytes = samples_per_frame/8 · bitrate / sample_rate
(+ padding slot), truncated — layer I counts in 4-byte slots.

Containers handled: a leading ID3v2 tag (sync-safe 28-bit size) is
skipped, a trailing 128-byte ID3v1 tag is skipped, and a first frame
whose side-info region carries a Xing/Info/VBRI VBR header is counted
as a header frame, not audio (its samples are excluded from the
duration, which is what ffprobe reports).

Every hostile path raises ValueError (house codec contract): bad
sync, reserved version/layer/bitrate/rate/emphasis, free-format
bitrate (frame length undefined without scanning for the next sync —
documented unsupported), mid-stream parameter changes of version/
layer/rate (bitrate MAY change: VBR), truncated frames, and a bomb
guard on the frame count.
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_FRAMES = 1 << 20  # ~7.2 h of 25 ms MPEG1 frames — bomb guard

# bitrate tables in kbit/s, indexed [row][bitrate_index 1..14]
_BITRATES = {
    # (version_group, layer): row — version_group: 1=MPEG1, 2=MPEG2/2.5
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

# sample rates in Hz by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5)
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

_VERSION_NAME = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}


@dataclass(frozen=True)
class Mp3Info:
    sample_rate: int
    channels: int
    n_frames: int          # audio frames (Xing/Info/VBRI excluded)
    n_samples: int         # granules × samples, audio frames only
    duration_s: float      # n_samples / sample_rate
    version: str           # MPEG1 / MPEG2 / MPEG2.5
    layer: int             # 1, 2, 3
    bitrate_kbps: float    # mean over audio frames (VBR → mean)
    vbr_header: bool       # a Xing/Info/VBRI frame led the stream
    vbr_declared_frames: int | None = None  # the header's own frame
                           # count (Xing flags bit 0 / VBRI field) —
                           # None when absent; compare with n_frames
                           # to spot truncated or mis-cut files


def is_mp3(payload: bytes) -> bool:
    """Cheap sniff: a plausible frame header — optionally behind a
    well-formed ID3v2 tag — CONFIRMED by the stream continuing
    plausibly at the computed first-frame boundary (next frame sync,
    exact EOF, or an ID3v1 trailer). Raw PCM can legitimately start
    with 0xFF Ex (~1e-4 odds for random bytes) and text can start
    with the ASCII characters "ID3"; routing either payload here
    would fail its whole batch in a dispatch — confirming a real
    frame behind both prefixes drops the false-positive odds to ~1e-9
    at the cost of one header parse and no frame walk. A tag with no
    frames after it also sniffs False (``mp3_metadata`` would refuse
    it anyway). (MP3 still has no strong magic — run this AFTER the
    strong-magic formats in any dispatch.)"""
    if payload[:3] == b"ID3":
        # the ID3 prefix is three ASCII characters — text starting
        # "ID3 ..." would otherwise sniff as MP3 and fail its batch
        # in a dispatch, the exact class the sync-path check closes.
        # Skip the claimed tag and demand a plausible frame after it.
        try:
            pos = _skip_id3v2(payload)
        except ValueError:
            return False
        return _plausible_frame_at(payload, pos)
    return _plausible_frame_at(payload, 0)


def _plausible_frame_at(payload: bytes, pos: int) -> bool:
    """One parseable frame header at ``pos`` whose computed extent is
    followed by another sync, exact EOF, or an ID3v1 trailer."""
    if len(payload) - pos < 4:
        return False
    try:
        vbits, layer, kbps, rate, pad, _ch, _crc = _parse_header(
            int.from_bytes(payload[pos : pos + 4], "big")
        )
    except ValueError:
        return False
    size = _frame_bytes(vbits, layer, kbps, rate, pad)
    if size < 4 or pos + size > len(payload):
        return False  # first frame would be truncated
    if pos + size == len(payload):
        return True  # single frame filling the payload exactly
    nxt = payload[pos + size : pos + size + 4]
    if nxt[:3] == b"TAG":
        return True  # ID3v1 trailer right after the only frame
    if len(nxt) < 2:
        return False
    return nxt[0] == 0xFF and (nxt[1] & 0xE0) == 0xE0


def _skip_id3v2(payload: bytes) -> int:
    if payload[:3] != b"ID3":
        return 0
    if len(payload) < 10:
        raise ValueError("MP3: truncated ID3v2 header")
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("MP3: ID3v2 size bytes must be sync-safe")
    size = (
        (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
    )
    # flag bit 4: 10-byte footer follows the tag
    end = 10 + size + (10 if payload[5] & 0x10 else 0)
    if end > len(payload):
        raise ValueError("MP3: ID3v2 tag larger than the payload")
    return end


def _parse_header(h: int):
    """(version_bits, layer, bitrate_kbps, rate, padding, channels,
    crc) from a 32-bit header int — ValueError on any reserved code."""
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("MP3: lost frame sync")
    vbits = (h >> 19) & 3
    if vbits == 1:
        raise ValueError("MP3: reserved version code")
    lbits = (h >> 17) & 3
    if lbits == 0:
        raise ValueError("MP3: reserved layer code")
    layer = 4 - lbits  # 3->I, 2->II, 1->III
    crc = not ((h >> 16) & 1)
    bidx = (h >> 12) & 0xF
    if bidx == 0xF:
        raise ValueError("MP3: bad bitrate index 15")
    if bidx == 0:
        raise ValueError(
            "MP3: free-format bitrate unsupported (frame length is "
            "undefined without a next-sync scan)"
        )
    ridx = (h >> 10) & 3
    if ridx == 3:
        raise ValueError("MP3: reserved sample rate code")
    if (h & 3) == 2:
        raise ValueError("MP3: reserved emphasis code")
    vgroup = 1 if vbits == 3 else 2
    kbps = _BITRATES[(vgroup, layer)][bidx - 1]
    rate = _RATES[vbits][ridx]
    padding = (h >> 9) & 1
    channels = 1 if ((h >> 6) & 3) == 3 else 2
    return vbits, layer, kbps, rate, padding, channels, crc


def _samples_per_frame(vbits: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if vbits == 3 else 576  # layer III halves for MPEG2/2.5


def _frame_bytes(vbits: int, layer: int, kbps: int, rate: int, pad: int) -> int:
    if layer == 1:
        return (12 * kbps * 1000 // rate + pad) * 4
    spf = _samples_per_frame(vbits, layer)
    return spf // 8 * kbps * 1000 // rate + pad


def _side_info_bytes(vbits: int, channels: int) -> int:
    """Layer III side-info size — the Xing header sits right after."""
    if vbits == 3:
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17


def mp3_metadata(payload: bytes, max_frames: int = MAX_FRAMES) -> Mp3Info:
    """Walk every frame header and return :class:`Mp3Info`."""
    if len(payload) < 4:
        raise ValueError("MP3: payload shorter than one frame header")
    pos = _skip_id3v2(payload)
    end = len(payload)
    # ID3v1 trailer candidate: only honored when the frame walk lands
    # EXACTLY on it — compressed audio bytes may legitimately contain
    # 'TAG' 128 bytes before EOF, and pre-trimming would reject the
    # valid stream as a truncated final frame
    id3v1 = (
        end - 128
        if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG"
        else None
    )
    if pos >= end:
        raise ValueError("MP3: no frames after the ID3 tags")

    n_frames = n_samples = 0
    kbps_sum = 0
    declared = None  # the VBR header's own frame count, if present
    first = None  # (vbits, layer, rate, channels)
    vbr_header = False
    while pos < end:
        if pos == id3v1:
            break  # trailer begins exactly at a frame boundary
        if end - pos < 4:
            raise ValueError("MP3: trailing garbage shorter than a header")
        h = int.from_bytes(payload[pos : pos + 4], "big")
        vbits, layer, kbps, rate, pad, channels, crc = _parse_header(h)
        if first is None:
            first = (vbits, layer, rate, channels)
        elif (vbits, layer, rate, channels) != first:
            raise ValueError(
                "MP3: mid-stream version/layer/rate/channel change "
                f"at byte {pos}"
            )
        size = _frame_bytes(vbits, layer, kbps, rate, pad)
        if size < 4 + (2 if crc else 0):
            raise ValueError("MP3: computed frame smaller than its header")
        if pos + size > end:
            raise ValueError("MP3: truncated final frame")
        is_vbr_frame = False
        if n_frames == 0 and not vbr_header and layer == 3:
            off = pos + 4 + (2 if crc else 0) + _side_info_bytes(vbits, channels)
            tag = payload[off : off + 4]
            if tag in (b"Xing", b"Info"):
                is_vbr_frame = True
                # Xing layout: tag, then u32 flags; flags bit 0 =>
                # a u32 total-frame count follows (all big-endian)
                if (
                    off + 12 <= pos + size
                    and payload[off + 7] & 0x01
                ):
                    declared = int.from_bytes(
                        payload[off + 8 : off + 12], "big"
                    )
            elif payload[pos + 4 + 32 : pos + 4 + 36] == b"VBRI":
                is_vbr_frame = True  # VBRI sits 32 bytes after the header
                # VBRI layout: tag, ver u16, delay u16, quality u16,
                # bytes u32, frames u32 (big-endian)
                voff = pos + 4 + 32
                if voff + 18 <= pos + size:
                    declared = int.from_bytes(
                        payload[voff + 14 : voff + 18], "big"
                    )
        if is_vbr_frame:
            vbr_header = True
        else:
            n_frames += 1
            n_samples += _samples_per_frame(vbits, layer)
            kbps_sum += kbps
        pos += size
        if n_frames > max_frames:
            raise ValueError(f"MP3 bomb guard: more than {max_frames} frames")
    if n_frames == 0:
        raise ValueError("MP3: stream contains no audio frames")
    vbits, layer, rate, channels = first
    return Mp3Info(
        sample_rate=rate,
        channels=channels,
        n_frames=n_frames,
        n_samples=n_samples,
        duration_s=n_samples / rate,
        version=_VERSION_NAME[vbits],
        layer=layer,
        bitrate_kbps=kbps_sum / n_frames,
        vbr_header=vbr_header,
        vbr_declared_frames=declared,
    )


def encode_mp3_headers(
    n_frames: int,
    ridx: int = 0,
    kbps_idx: int = 9,
    id3v2_pad: int = 0,
) -> bytes:
    """Fixture/corpus MP3 stream builder: ``n_frames`` spec-valid
    MPEG1 Layer III mono CBR frames (no CRC) with zero filler bytes —
    deliberately headers-only, matching the parser side's metadata-only
    stance (fake subband data would be fake precision). Alternating
    padding bits exercise the slot arithmetic; ``id3v2_pad`` > 0
    prepends an ID3v2.4 tag of that many filler bytes to exercise the
    sync-safe skip path. The walk-relevant outputs are closed-form:
    rate = (44100, 48000, 32000)[ridx], samples = 1152 · n_frames."""
    if n_frames < 1:
        raise ValueError("need at least one frame")
    if not 0 <= ridx <= 2:
        raise ValueError("ridx must be 0..2 (44.1/48/32 kHz)")
    if not 1 <= kbps_idx <= 14:
        raise ValueError("kbps_idx must be 1..14")
    rate = _RATES[3][ridx]
    kbps = _BITRATES[(1, 3)][kbps_idx - 1]
    out = bytearray()
    if id3v2_pad:
        if id3v2_pad >= 1 << 28:
            raise ValueError("ID3v2 pad exceeds the sync-safe size field")
        out += b"ID3\x04\x00\x00" + bytes(
            [
                (id3v2_pad >> 21) & 0x7F,
                (id3v2_pad >> 14) & 0x7F,
                (id3v2_pad >> 7) & 0x7F,
                id3v2_pad & 0x7F,
            ]
        )
        out += b"\x00" * id3v2_pad
    for fi in range(n_frames):
        pad = fi & 1
        h = (
            (0x7FF << 21)
            | (3 << 19)      # MPEG1
            | (1 << 17)      # Layer III
            | (1 << 16)      # protection bit set = no CRC
            | (kbps_idx << 12)
            | (ridx << 10)
            | (pad << 9)
            | (3 << 6)       # mono
        )
        size = 1152 // 8 * kbps * 1000 // rate + pad
        out += h.to_bytes(4, "big") + b"\x00" * (size - 4)
    return bytes(out)
