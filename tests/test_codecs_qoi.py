"""QOI codec tests (round 11). Unlike the VP8/JPEG-arith family, QOI
has no implementation-defined tables, so the decoder is
interop-complete by construction; correctness is pinned by
op-targeted roundtrips (each chunk kind forced and byte-checked),
whole-raster random roundtrip fuzz, a hand-assembled third-party-style
stream decoded against its known raster, and error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkifydb_datawarehouse_spark.llm.codecs import ImageDecodeError
from sparkifydb_datawarehouse_spark.llm.codecs_qoi import (
    _END,
    decode_qoi,
    encode_qoi,
)


def _roundtrip(w, h, px, channels=3):
    blob = encode_qoi(w, h, bytes(px), channels)
    dec = decode_qoi(blob)
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, channels)
    assert dec["pixels"] == bytes(px)
    return blob


def test_run_op_exact_and_long_runs_split():
    # 200 identical pixels -> runs of 62 must split (63/64 collide
    # with the RGB/RGBA tags)
    px = bytes([10, 20, 30]) * 200
    blob = _roundtrip(200, 1, px)
    body = blob[14 : -len(_END)]
    # first pixel is new (one op), then 199 as runs: 62+62+62+13
    runs = [b for b in body if (b >> 6) == 0b11 and b not in (0xFE, 0xFF)]
    assert sorted((b & 0x3F) + 1 for b in runs) == [13, 62, 62, 62]


def test_diff_and_luma_ops_wrap_mod256():
    # +1/+1/+1 neighbor deltas -> DIFF even across the 255->0 wrap
    n = 300
    px = bytearray()
    for i in range(n):
        px += bytes(((100 + i) % 256, (200 + i) % 256, (50 + i) % 256))
    blob = _roundtrip(n, 1, px)
    body = blob[14 : -len(_END)]
    assert any((b >> 6) == 0b01 for b in body)  # DIFF present
    # dg = +5 with dr-dg/db-dg in range -> LUMA
    px2 = bytearray()
    for i in range(n):
        px2 += bytes(((3 + 5 * i) % 256, (5 * i) % 256, (7 + 5 * i) % 256))
    blob2 = _roundtrip(n, 1, px2)
    assert any((b >> 6) == 0b10 and b < 0xC0 for b in blob2[14 : -len(_END)])


def test_index_op_for_alternating_palette():
    pal = [(10, 10, 10), (99, 200, 3), (250, 1, 128), (64, 64, 64)]
    px = bytearray()
    for i in range(256):
        px += bytes(pal[i % 4])
    blob = _roundtrip(16, 16, px)
    body = blob[14 : -len(_END)]
    assert any(b < 0x40 for b in body)  # INDEX chunks present


def test_rgba_op_and_alpha_semantics():
    # alpha change forces RGBA; constant-alpha pixels may use DIFF/RGB
    px = bytearray()
    for i in range(64):
        px += bytes((i, 2 * i % 256, 3 * i % 256, (128 + i) % 256))
    blob = _roundtrip(8, 8, px, channels=4)
    assert 0xFF in blob[14 : -len(_END)]


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(3, 4),
    st.integers(0, 2**32 - 1),
)
def test_random_raster_roundtrip_fuzz(w, h, channels, seed):
    rng = np.random.default_rng(seed)
    # mix smooth regions (diff/luma/run) with jumps (rgb/rgba/index)
    px = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8)
    if w * h > 4:
        px[: (w * h // 2) * channels] = 77  # constant prefix -> runs
    _roundtrip(w, h, px.tobytes(), channels)


def test_third_party_style_stream_decodes():
    # hand-assembled stream (no encoder involved): RGB, DIFF(+1,+1,+1),
    # RUN(2), INDEX back to the first pixel
    header = b"qoif" + struct.pack(">IIBB", 5, 1, 3, 0)
    first = (120, 7, 33)
    h = (120 * 3 + 7 * 5 + 33 * 7 + 255 * 11) % 64
    body = bytes((0xFE, *first))               # px0
    body += bytes((0b0100_0000 | (3 << 4) | (3 << 2) | 3,))  # px1 = +1 each
    body += bytes((0b1100_0000 | 1,))          # px2..3 = run of 2
    body += bytes((h,))                        # px4 = INDEX -> px0
    dec = decode_qoi(header + body + _END)
    assert dec["pixels"] == bytes(
        (120, 7, 33, 121, 8, 34, 121, 8, 34, 121, 8, 34, 120, 7, 33)
    )


def test_error_paths():
    with pytest.raises(ImageDecodeError, match="magic"):
        decode_qoi(b"nope" + b"\x00" * 20)
    good = encode_qoi(2, 2, bytes(12), 3)
    with pytest.raises(ImageDecodeError, match="end marker"):
        decode_qoi(good[:-1])
    with pytest.raises(ImageDecodeError, match="channels"):
        decode_qoi(b"qoif" + struct.pack(">IIBB", 2, 2, 5, 0) + good[14:])
    # stream that ends before the raster is complete
    header = b"qoif" + struct.pack(">IIBB", 4, 4, 3, 0)
    with pytest.raises(ImageDecodeError, match="ended before"):
        decode_qoi(header + bytes((0xFE, 1, 2, 3)) + _END)
    # run overflowing the raster
    with pytest.raises(ImageDecodeError, match="overflows"):
        decode_qoi(
            b"qoif"
            + struct.pack(">IIBB", 2, 1, 3, 0)
            + bytes((0xFE, 1, 2, 3, 0b1100_0000 | 40))
            + _END
        )


def test_truncated_mid_chunk_refuses_loudly():
    # ADVICE r11 #3: a stream with a VALID end marker but a multi-byte
    # chunk cut short must raise ImageDecodeError, never IndexError —
    # callers of decode_image catch the former ("refuses loudly").
    header = b"qoif" + struct.pack(">IIBB", 4, 4, 3, 0)
    # RGB opcode with only 2 of its 3 payload bytes
    with pytest.raises(ImageDecodeError, match="chunk truncated"):
        decode_qoi(header + bytes((0xFE, 1, 2)) + _END)
    # RGBA opcode with 3 of 4 payload bytes
    with pytest.raises(ImageDecodeError, match="chunk truncated"):
        decode_qoi(header + bytes((0xFF, 1, 2, 3)) + _END)
    # LUMA opcode (tag 0b10) missing its second byte
    with pytest.raises(ImageDecodeError, match="chunk truncated"):
        decode_qoi(header + bytes((0b1000_0000 | 5,)) + _END)


def test_decode_image_dispatches_qoi():
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    px = bytes((i % 256 for i in range(9 * 4 * 3)))
    img = decode_image(encode_qoi(9, 4, px, 3))
    assert (img["width"], img["height"], img["channels"]) == (9, 4, 3)
    assert img["pixels"] == px
