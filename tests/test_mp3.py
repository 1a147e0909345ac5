"""MP3 frame-header parser (functions/mp3.py): spec-pinned frame
sizes (the public 417-byte 128kbps@44.1k figure and friends), ID3v2/
ID3v1 skipping, Xing/Info/VBRI exclusion, VBR mean bitrate, all three
version groups and layers, and the hostile-path ValueError contract."""

from __future__ import annotations

import pytest

from tableone_pyspark_spark.functions import mp3


def _header(
    version=3, layer_bits=1, crc=True, bidx=9, ridx=0, pad=0, mode=0,
    emphasis=0,
) -> bytes:
    """Independent bit-packing of a frame header (layer_bits: 1=III,
    2=II, 3=I; crc=True means NO checksum — protection bit set)."""
    h = (
        (0x7FF << 21)
        | (version << 19)
        | (layer_bits << 17)
        | ((1 if crc else 0) << 16)
        | (bidx << 12)
        | (ridx << 10)
        | (pad << 9)
        | (mode << 6)
        | (emphasis & 3)
    )
    return h.to_bytes(4, "big")


def _frame(size: int, **kw) -> bytes:
    head = _header(**kw)
    return head + bytes((size - 4) % 251 for _ in range(size - 4))


def test_cbr_mpeg1_layer3_spec_sizes():
    # 128 kbps @ 44100, layer III: floor(144*128000/44100) = 417 bytes
    body = b"".join(_frame(417, bidx=9) for _ in range(5))
    info = mp3.mp3_metadata(body)
    assert info.sample_rate == 44100
    assert info.version == "MPEG1" and info.layer == 3
    assert info.channels == 2
    assert info.n_frames == 5
    assert info.n_samples == 5 * 1152
    assert info.duration_s == pytest.approx(5760 / 44100)
    assert info.bitrate_kbps == 128.0
    assert not info.vbr_header


def test_padding_bit_adds_one_byte():
    # alternating pad: 417 / 418 bytes must both walk cleanly
    body = _frame(417, bidx=9) + _frame(418, bidx=9, pad=1) + _frame(417, bidx=9)
    info = mp3.mp3_metadata(body)
    assert info.n_frames == 3 and info.n_samples == 3 * 1152


def test_vbr_mean_bitrate():
    # 320 kbps @ 44100 -> floor(144*320000/44100) = 1044 bytes
    body = _frame(417, bidx=9) + _frame(1044, bidx=14)
    info = mp3.mp3_metadata(body)
    assert info.bitrate_kbps == pytest.approx((128 + 320) / 2)


def test_mpeg25_layer3_mono_576_samples():
    # MPEG2.5 (version bits 00) 8 kHz mono, 64 kbps: 576/8*64000/8000
    # = 576 bytes per frame, 576 samples per frame
    body = b"".join(
        _frame(576, version=0, bidx=8, ridx=2, mode=3) for _ in range(4)
    )
    info = mp3.mp3_metadata(body)
    assert info.version == "MPEG2.5" and info.sample_rate == 8000
    assert info.channels == 1
    assert info.n_samples == 4 * 576
    assert info.duration_s == pytest.approx(4 * 576 / 8000)


def test_layer1_four_byte_slots():
    # layer I 384 kbps @ 44100: (12*384000//44100)*4 = 416; +pad -> 420
    body = _frame(416, layer_bits=3, bidx=12) + _frame(
        420, layer_bits=3, bidx=12, pad=1
    )
    info = mp3.mp3_metadata(body)
    assert info.layer == 1 and info.n_samples == 2 * 384


def test_mpeg2_layer2_table():
    # MPEG2 (bits 10) layer II 64 kbps @ 16 kHz: 1152/8*64000/16000
    # = 576 bytes, 1152 samples
    body = _frame(576, version=2, layer_bits=2, bidx=8, ridx=2)
    info = mp3.mp3_metadata(body)
    assert info.version == "MPEG2" and info.layer == 2
    assert info.sample_rate == 16000 and info.n_samples == 1152


def test_id3v2_and_id3v1_skipped():
    tag_body = b"\x00" * 200
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 200 >> 7, 200 & 0x7F]) + tag_body
    id3v1 = b"TAG" + b"\x00" * 125
    body = id3v2 + _frame(417, bidx=9) * 2 + id3v1
    info = mp3.mp3_metadata(body)
    assert info.n_frames == 2


def test_xing_frame_excluded_from_duration():
    # MPEG1 stereo layer III: side info 32 bytes after the 4-byte
    # header (no CRC) -> "Xing" at offset 36
    first = bytearray(_frame(417, bidx=9))
    first[36:40] = b"Xing"
    body = bytes(first) + _frame(417, bidx=9) * 3
    info = mp3.mp3_metadata(body)
    assert info.vbr_header
    assert info.n_frames == 3 and info.n_samples == 3 * 1152


def test_crc_flag_shifts_xing_offset():
    # protection bit 0 -> 16-bit CRC between header and side info
    first = bytearray(_frame(417, bidx=9, crc=False))
    first[38:42] = b"Info"
    body = bytes(first) + _frame(417, bidx=9)
    info = mp3.mp3_metadata(body)
    assert info.vbr_header and info.n_frames == 1


def test_sniff():
    assert mp3.is_mp3(_frame(417, bidx=9))  # one frame, exact EOF
    assert mp3.is_mp3(_frame(417, bidx=9) * 2)  # next sync confirms
    # ID3v2 tag followed by a real frame sniffs; a tag followed by
    # non-frame bytes (e.g. TEXT starting "ID3 ...") does NOT — the
    # misdispatch would fail the whole batch (self-review r9)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x00"
    assert mp3.is_mp3(id3 + _frame(417, bidx=9))
    assert not mp3.is_mp3(id3 + b"rest of the tag-only payload")
    assert not mp3.is_mp3(b"ID3 tags are a metadata container ...")
    assert not mp3.is_mp3(b"RIFFxxxxWAVE")
    assert not mp3.is_mp3(b"\xff\xff")  # too short
    # reserved version bits (01) must not sniff as MP3
    assert not mp3.is_mp3(bytes([0xFF, 0xE8, 0x90, 0x00]))


def test_sniff_requires_plausible_frame_boundary():
    # ADVICE r8: raw PCM can start 0xFF Ex with a parseable header —
    # the sniff must check the stream CONTINUES plausibly at the
    # computed first-frame boundary, not just the first 4 bytes
    one = _frame(417, bidx=9)
    # valid header followed by non-sync garbage at the boundary
    assert not mp3.is_mp3(one + b"\xa2" * 100)
    # truncated first frame (header claims 417 bytes, payload shorter)
    assert not mp3.is_mp3(one[:200])
    # ID3v1 trailer right after the only frame still sniffs
    assert mp3.is_mp3(one + b"TAG" + b"\x00" * 125)
    # bad-bitrate header (index 15) never sniffs
    assert not mp3.is_mp3(bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 500)


def test_hostile_paths_raise():
    with pytest.raises(ValueError, match="shorter"):
        mp3.mp3_metadata(b"\xff\xfb")
    with pytest.raises(ValueError, match="sync"):
        mp3.mp3_metadata(b"NOTS" + b"\x00" * 100)
    with pytest.raises(ValueError, match="free-format"):
        mp3.mp3_metadata(_header(bidx=0) + b"\x00" * 100)
    with pytest.raises(ValueError, match="bitrate index 15"):
        mp3.mp3_metadata(_header(bidx=15) + b"\x00" * 100)
    with pytest.raises(ValueError, match="sample rate"):
        mp3.mp3_metadata(_header(ridx=3) + b"\x00" * 100)
    with pytest.raises(ValueError, match="emphasis"):
        mp3.mp3_metadata(_header(emphasis=2) + b"\x00" * 100)
    with pytest.raises(ValueError, match="truncated final"):
        mp3.mp3_metadata(_frame(417, bidx=9)[:-1])
    with pytest.raises(ValueError, match="mid-stream"):
        mp3.mp3_metadata(_frame(417, bidx=9) + _frame(418, bidx=9, ridx=1))
    with pytest.raises(ValueError, match="no audio frames"):
        first = bytearray(_frame(417, bidx=9))
        first[36:40] = b"Xing"
        mp3.mp3_metadata(bytes(first))
    with pytest.raises(ValueError, match="sync-safe"):
        mp3.mp3_metadata(b"ID3\x04\x00\x00\x00\x00\x00\x80")
    with pytest.raises(ValueError, match="larger than"):
        mp3.mp3_metadata(b"ID3\x04\x00\x00\x00\x00\x01\x00 short")
    with pytest.raises(ValueError, match="bomb guard"):
        mp3.mp3_metadata(_frame(417, bidx=9) * 4, max_frames=3)
    with pytest.raises(ValueError, match="trailing garbage"):
        mp3.mp3_metadata(_frame(417, bidx=9) + b"\xff\xfb")


# ---------------------------------------------------------------------------
# property: random valid frame streams parse back to their construction
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings, strategies as st

    _BITRATE_TABLES = {
        (3, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
        (3, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
        (3, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
        (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
        (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        (0, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
        (0, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        (0, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    }
    _RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}

    @st.composite
    def _stream(draw):
        version = draw(st.sampled_from([3, 2, 0]))
        layer_bits = draw(st.sampled_from([1, 2, 3]))
        layer = 4 - layer_bits
        ridx = draw(st.integers(0, 2))
        mode = draw(st.sampled_from([0, 3]))
        n = draw(st.integers(1, 12))
        frames, samples = [], 0
        rate = _RATES[version][ridx]
        spf = (384 if layer == 1 else
               1152 if layer == 2 else (1152 if version == 3 else 576))
        for _ in range(n):
            bidx = draw(st.integers(1, 14))
            pad = draw(st.integers(0, 1))
            kbps = _BITRATE_TABLES[(version, layer)][bidx - 1]
            if layer == 1:
                size = (12 * kbps * 1000 // rate + pad) * 4
            else:
                size = spf // 8 * kbps * 1000 // rate + pad
            frames.append(
                _frame(size, version=version, layer_bits=layer_bits,
                       bidx=bidx, ridx=ridx, pad=pad, mode=mode)
            )
            samples += spf
        return b"".join(frames), n, samples, rate, layer, mode

    @settings(max_examples=60, deadline=None)
    @given(_stream())
    def test_property_random_streams_parse_back(case):
        payload, n, samples, rate, layer, mode = case
        info = mp3.mp3_metadata(payload)
        assert info.n_frames == n
        assert info.n_samples == samples
        assert info.sample_rate == rate
        assert info.layer == layer
        assert info.channels == (1 if mode == 3 else 2)
        assert info.duration_s == samples / rate
except ImportError:  # hypothesis not installed
    pass


def test_tag_bytes_inside_final_frame_not_id3v1():
    # 'TAG' appearing in audio data exactly 128 bytes before EOF must
    # NOT be mistaken for an ID3v1 trailer (the frame walk does not
    # land there); a real trailer AT a frame boundary still skips
    frame = bytearray(_frame(417, bidx=9))
    assert len(frame) == 417
    frame[417 - 128 : 417 - 125] = b"TAG"  # inside the single frame
    info = mp3.mp3_metadata(bytes(frame))
    assert info.n_frames == 1 and info.n_samples == 1152
    # trailer exactly at the boundary: still recognized and skipped
    real = bytes(_frame(417, bidx=9)) + b"TAG" + b"\x00" * 125
    info2 = mp3.mp3_metadata(real)
    assert info2.n_frames == 1


def test_vbr_declared_frame_counts():
    """Xing (flags bit 0) and VBRI carry their own total-frame count —
    parsed into vbr_declared_frames so pipelines can spot truncated or
    mis-cut files by comparing against the walked count."""
    # Xing with frames flag: tag at offset 36 (MPEG1 stereo, no CRC),
    # flags = 0x00000001, count = 3 frames
    first = bytearray(_frame(417, bidx=9))
    first[36:40] = b"Xing"
    first[40:44] = (1).to_bytes(4, "big")
    first[44:48] = (3).to_bytes(4, "big")
    body = bytes(first) + _frame(417, bidx=9) * 3
    info = mp3.mp3_metadata(body)
    assert info.vbr_header and info.vbr_declared_frames == 3
    assert info.n_frames == 3  # header frame excluded, count agrees

    # Xing WITHOUT the frames flag -> None
    nf = bytearray(_frame(417, bidx=9))
    nf[36:40] = b"Xing"
    nf[40:44] = (0).to_bytes(4, "big")
    info2 = mp3.mp3_metadata(bytes(nf) + _frame(417, bidx=9))
    assert info2.vbr_header and info2.vbr_declared_frames is None

    # VBRI: tag 32 bytes after the 4-byte header; frames at +14
    vb = bytearray(_frame(417, bidx=9))
    vb[36:40] = b"VBRI"
    vb[40:42] = (1).to_bytes(2, "big")     # version
    vb[42:44] = (0).to_bytes(2, "big")     # delay
    vb[44:46] = (0).to_bytes(2, "big")     # quality
    vb[46:50] = (417 * 2).to_bytes(4, "big")  # bytes
    vb[50:54] = (2).to_bytes(4, "big")     # frames
    info3 = mp3.mp3_metadata(bytes(vb) + _frame(417, bidx=9) * 2)
    assert info3.vbr_header and info3.vbr_declared_frames == 2

    # plain CBR stream: no header, no declared count
    info4 = mp3.mp3_metadata(_frame(417, bidx=9) * 2)
    assert not info4.vbr_header and info4.vbr_declared_frames is None
