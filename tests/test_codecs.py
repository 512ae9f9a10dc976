"""Round-trip and conformance tests for the pure-stdlib media codecs
(functions/codecs.py): PNG grayscale-8 with None/Sub/Up row filters and
CRC verification, WAV mono u8 PCM with word-aligned chunk walking."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from kg_covid_19_ray.functions import codecs


def test_png_roundtrip_random():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 4), (5, 17), (64, 48), (96, 144)]:
        arr = rng.randint(0, 256, (h, w), dtype=np.uint8)
        out = codecs.decode_png_gray(codecs.encode_png_gray(arr))
        assert out.shape == (h, w)
        assert (out == arr).all()


def test_png_filters_actually_cycle():
    """Rows use filters 0/1/2 in turn, so the decoder's unfilter logic
    is genuinely exercised (a decoder ignoring filters would fail)."""
    arr = np.arange(4 * 8, dtype=np.uint8).reshape(4, 8)
    data = codecs.encode_png_gray(arr)
    # locate IDAT and inflate
    pos = 8
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        if data[pos + 4:pos + 8] == b"IDAT":
            idat += data[pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    filters = [raw[y * 9] for y in range(4)]
    assert filters == [0, 1, 2, 0]


def test_png_crc_corruption_raises():
    arr = np.zeros((2, 2), dtype=np.uint8)
    data = bytearray(codecs.encode_png_gray(arr))
    data[20] ^= 0xFF  # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png_gray(bytes(data))


def test_png_rejects_bad_signature_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png_gray(b"JFIF" + bytes(16))
    with pytest.raises(ValueError):
        codecs.encode_png_gray(np.zeros((2, 2), dtype=np.int32))
    with pytest.raises(ValueError):
        codecs.encode_png_gray(np.zeros(4, dtype=np.uint8))


def test_png_spec_conformance_fields():
    """Signature, IHDR layout, IEND terminator — byte-level checks."""
    arr = np.zeros((3, 5), dtype=np.uint8)
    data = codecs.encode_png_gray(arr)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    assert (w, h, depth, ctype) == (5, 3, 8, 0)
    assert data[-8:-4] == b"IEND"


def test_wav_roundtrip_and_layout():
    rng = np.random.RandomState(11)
    s = rng.randint(0, 256, 1000, dtype=np.uint8)
    data = codecs.encode_wav_u8(s, rate=16000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    (riff_len,) = struct.unpack("<I", data[4:8])
    assert riff_len == len(data) - 8
    out = codecs.decode_wav_u8(data)
    assert (out == s).all()


def test_wav_rejects_bad():
    with pytest.raises(ValueError):
        codecs.decode_wav_u8(b"OggS" + bytes(40))
    with pytest.raises(ValueError):
        codecs.encode_wav_u8(np.zeros((2, 2), dtype=np.uint8))


def test_wav_odd_length_word_alignment():
    """RIFF chunks are word-aligned; an odd-length data chunk must
    still parse (the walker skips the pad byte)."""
    s = np.arange(7, dtype=np.uint8)
    data = codecs.encode_wav_u8(s)
    assert len(data) % 2 == 0  # encoder emitted the pad byte
    # a trailing chunk after the padded data chunk must still parse
    trailed = data + b"LIST" + struct.pack("<I", 4) + b"INFO"
    out = codecs.decode_wav_u8(trailed)
    assert (out == s).all()
