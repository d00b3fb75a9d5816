"""Baseline TIFF codec tests (round 11): PackBits vectors, roundtrips
across both byte orders × compressions × strip splits, a
hand-assembled third-party-style stream, and refusal paths for the
unsupported TIFF universe."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkifydb_datawarehouse_spark.llm.codecs import ImageDecodeError
from sparkifydb_datawarehouse_spark.llm.codecs_tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_packbits_spec_vectors():
    # the TIFF 6.0 §9 worked example
    raw = bytes.fromhex("aa aa aa 80 00 2a aa aa aa aa 80 00 2a 22 aa aa aa aa aa aa aa aa aa aa".replace(" ", ""))
    enc = packbits_encode(raw)
    assert packbits_decode(enc, len(raw)) == raw
    # no-op byte (0x80) is skipped
    assert packbits_decode(b"\x80\x00A", 1) == b"A"
    # error paths
    with pytest.raises(ImageDecodeError, match="ended early"):
        packbits_decode(b"", 3)
    with pytest.raises(ImageDecodeError, match="overruns"):
        packbits_decode(b"\x03ABCD", 2)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=600), st.integers(0, 2**31))
def test_packbits_roundtrip_fuzz(data, seed):
    # mix in runs so both chunk kinds are exercised
    rng = np.random.default_rng(seed)
    if data and rng.integers(0, 2):
        k = int(rng.integers(0, len(data)))
        data = data[:k] + bytes([data[k % len(data)]]) * int(rng.integers(3, 300)) + data[k:]
    assert packbits_decode(packbits_encode(data), len(data)) == data


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_matrix(big_endian, compression, channels):
    w, h = 21, 13
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8)
    px[: 5 * w * channels] = 200  # runs for PackBits
    blob = encode_tiff(
        w, h, px.tobytes(), channels,
        big_endian=big_endian,
        packbits=compression == "packbits",
        lzw=compression == "lzw",
        rows_per_strip=4,
    )
    dec = decode_tiff(blob)
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, channels)
    assert dec["pixels"] == px.tobytes()


def test_multi_strip_layout_and_single_strip_agree():
    w, h = 9, 11
    px = bytes((i * 7) % 256 for i in range(w * h * 3))
    one = decode_tiff(encode_tiff(w, h, px, 3))
    many = decode_tiff(encode_tiff(w, h, px, 3, rows_per_strip=2, packbits=True))
    assert one["pixels"] == many["pixels"] == px


def test_hand_assembled_stream_decodes():
    # minimal little-endian gray 2x2, one uncompressed strip — written
    # by hand, not by the encoder
    px = b"\x10\x20\x30\x40"
    entries = [
        (256, 3, 1, struct.pack("<H", 2) + b"\x00\x00"),
        (257, 3, 1, struct.pack("<H", 2) + b"\x00\x00"),
        (258, 3, 1, struct.pack("<H", 8) + b"\x00\x00"),
        (259, 3, 1, struct.pack("<H", 1) + b"\x00\x00"),
        (262, 3, 1, struct.pack("<H", 1) + b"\x00\x00"),
        (273, 4, 1, struct.pack("<I", 8 + 2 + 8 * 12 + 4)),
        (277, 3, 1, struct.pack("<H", 1) + b"\x00\x00"),
        (279, 4, 1, struct.pack("<I", 4)),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, t, c, vf in entries:
        ifd += struct.pack("<HHI", tag, t, c) + vf
    ifd += struct.pack("<I", 0)
    blob = struct.pack("<2sHI", b"II", 42, 8) + ifd + px
    dec = decode_tiff(blob)
    assert (dec["width"], dec["height"], dec["channels"]) == (2, 2, 1)
    assert dec["pixels"] == px


def test_refusal_paths():
    px = bytes(12)
    good = encode_tiff(2, 2, px, 3)
    with pytest.raises(ImageDecodeError, match="byte-order"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ImageDecodeError, match="magic"):
        decode_tiff(good[:2] + struct.pack("<H", 43) + good[4:])
    # 16-bit samples refused (patch BitsPerSample inline value)
    bad = bytearray(good)
    at = bad.find(struct.pack("<HH", 258, 3))
    bad[at + 8 : at + 10] = struct.pack("<H", 16)
    with pytest.raises(ImageDecodeError, match="8-bit"):
        decode_tiff(bytes(bad))
    # JPEG-in-TIFF refused (LZW is supported since round 12)
    bad = bytearray(good)
    at = bad.find(struct.pack("<HH", 259, 3))
    bad[at + 8 : at + 10] = struct.pack("<H", 7)
    with pytest.raises(ImageDecodeError, match="compression 7"):
        decode_tiff(bytes(bad))


def test_decode_image_dispatches_tiff():
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    px = bytes((i % 256 for i in range(7 * 5 * 3)))
    for be in (False, True):
        img = decode_image(encode_tiff(7, 5, px, 3, big_endian=be, packbits=True))
        assert (img["width"], img["height"], img["channels"]) == (7, 5, 3)
        assert img["pixels"] == px


# ---------------------------------------------------------------------------
# round 12: TIFF LZW (spec §13 — Compression 5)
# ---------------------------------------------------------------------------

def test_lzw_hand_vector_msb_and_widths():
    # hand-derived: b"\x07"*5 → codes CLEAR(256), 7, 258, 258, EOI(257)
    # all 9-bit, MSB-first-packed → 8001e0502808
    from sparkifydb_datawarehouse_spark.llm.codecs_tiff import (
        lzw_decode,
        lzw_encode,
    )

    assert lzw_encode(b"\x07" * 5).hex() == "8001e0502808"
    assert lzw_decode(bytes.fromhex("8001e0502808"), 5) == b"\x07" * 5


def test_lzw_early_change_crosses_width_boundaries():
    # a 4-symbol alphabet grows the table past 511 (10-bit) and 1023
    # (11-bit): the EARLY change schedule must stay in sync end to end
    from sparkifydb_datawarehouse_spark.llm.codecs_tiff import (
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 4, size=60_000, dtype=np.uint8))
    enc = lzw_encode(data)
    assert lzw_decode(enc, len(data)) == data
    # fully random bytes force a mid-stream CLEAR (table ceiling)
    data = bytes(rng.integers(0, 256, size=40_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data), len(data)) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=1500), st.integers(0, 2**31))
def test_lzw_roundtrip_fuzz(data, seed):
    from sparkifydb_datawarehouse_spark.llm.codecs_tiff import (
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.default_rng(seed)
    if data and rng.integers(0, 2):
        k = int(rng.integers(0, len(data)))
        data = data[:k] + bytes([data[k % len(data)]]) * int(rng.integers(3, 400)) + data[k:]
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_lzw_error_paths():
    from sparkifydb_datawarehouse_spark.llm.codecs_tiff import (
        lzw_decode,
        lzw_encode,
    )

    good = lzw_encode(b"hello world, hello world")
    with pytest.raises(ImageDecodeError, match="truncated"):
        lzw_decode(good[:2], 24)
    with pytest.raises(ImageDecodeError, match="before its rows"):
        lzw_decode(good, 25)  # EOI arrives one byte short
    with pytest.raises(ImageDecodeError, match="out of range"):
        # first data code references an undefined table slot: write
        # CLEAR then code 300 (table has 258 entries, 300 > len)
        bits = "100000000" + format(300, "09b")
        bits += "0" * (-len(bits) % 8)
        blob = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        lzw_decode(blob, 4)


def test_lzw_tiff_end_to_end_with_strips():
    from sparkifydb_datawarehouse_spark.llm.codecs_tiff import (
        decode_tiff,
        encode_tiff,
    )

    w, h = 33, 17
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    for be in (False, True):
        blob = encode_tiff(w, h, px, 3, big_endian=be, lzw=True, rows_per_strip=5)
        dec = decode_tiff(blob)
        assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
        assert dec["pixels"] == px
