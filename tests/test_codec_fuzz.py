"""Seeded mutation fuzz over every codec decoder's hostile-input
contract: truncations, byte flips, and garbage splices of VALID
fixtures must either decode (a mutation can land in don't-care bytes)
or raise ValueError / the documented typed NotImplementedError
refusals — never any other exception class (IndexError, struct.error,
KeyError, Overflow...), never a hang. 150 seeded mutations per codec
per run; an exploratory 400-per-codec sweep found zero violations
(r11), so any new one is a regression in a decoder's bounds/validation
discipline."""

from __future__ import annotations

import random

import numpy as np
import pytest

from tableone_pyspark_spark.functions import (
    bmp,
    flac,
    gif,
    jpeg,
    mp3,
    png,
    tiff,
    wav,
)

_PIX = [[(i * 7 + j * 13) % 256 for j in range(8)] for i in range(6)]
_RGB = [
    [((i * 7) % 256, (j * 11) % 256, (i * j) % 256) for j in range(8)]
    for i in range(6)
]
_IDX = np.array(_PIX, dtype=np.uint8) % 4
_PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)
_AUDIO = np.array([0, 100, -100, 2000] * 50, dtype=np.int32)


def _fixtures():
    return {
        "png": (png.encode_png(_PIX), png.decode_png),
        "gif": (gif.encode_gif(_IDX, _PAL), gif.decode_gif),
        "bmp": (bmp.encode_bmp(_RGB), bmp.decode_bmp),
        "wav": (wav.encode_wav(_AUDIO, 8000), wav.decode_wav),
        "flac": (flac.encode_flac(_AUDIO, 8000), flac.decode_flac),
        "jpeg": (jpeg.encode_jpeg_gray(_PIX), jpeg.decode_jpeg),
        "tiff": (tiff.encode_tiff(_PIX), tiff.decode_tiff),
        "mp3": (mp3.encode_mp3_headers(6), mp3.mp3_metadata),
    }


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_mutated_inputs_raise_only_typed_errors(name):
    data, dec = _fixtures()[name]
    data = bytes(data)
    rng = random.Random(0xC0DEC)
    for _ in range(150):
        b = bytearray(data)
        kind = rng.randrange(3)
        if kind == 0 and len(b) > 1:  # truncate
            b = b[: rng.randrange(1, len(b))]
        elif kind == 1:  # flip 1-4 bytes
            for _f in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:  # splice garbage
            at = rng.randrange(len(b))
            b = (
                b[:at]
                + bytes(rng.randrange(256) for _g in range(rng.randint(1, 16)))
                + b[at:]
            )
        try:
            dec(bytes(b))
        except (ValueError, NotImplementedError):
            # ValueError = hostile-input contract; NotImplementedError
            # = the documented typed codec-boundary refusals (a flip
            # can turn a header into an unsupported-but-real shape)
            pass
