"""Binary authoring/decoding roundtrips for the multimodal path —
pure-Python (no Spark): the BMP/WAV bytes must be structurally valid
enough that the header parsers recover exactly what was authored."""

from __future__ import annotations

import struct

import pytest

from plankton_spark.multimodal import (
    decode_bmp_header,
    decode_wav_header,
    make_bmp,
    make_wav,
)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (35, 26), (17, 9)])
def test_bmp_roundtrip(w, h):
    b = make_bmp(w, h)
    assert decode_bmp_header(b) == (w, h)
    # declared file size matches actual byte length
    assert struct.unpack_from("<I", b, 2)[0] == len(b)
    # pixel rows are 4-byte aligned
    row = w * 3
    assert (len(b) - 54) == (row + (-row) % 4) * h


@pytest.mark.parametrize(
    "n,rate,ch", [(1, 8000, 1), (1099, 24000, 2), (500, 16000, 1)]
)
def test_wav_roundtrip(n, rate, ch):
    b = make_wav(n, rate, ch)
    assert decode_wav_header(b) == (ch, rate, n)
    # RIFF size field covers everything after the first 8 bytes
    assert struct.unpack_from("<I", b, 4)[0] == len(b) - 8


def test_decoders_reject_wrong_format():
    with pytest.raises(ValueError):
        decode_bmp_header(make_wav(10, 8000, 1))
    with pytest.raises(ValueError):
        decode_wav_header(make_bmp(2, 2))
