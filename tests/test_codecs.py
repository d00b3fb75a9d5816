"""Pure-Python image codec tests (llm/codecs.py) + the real decode
path in llm/multimodal.decode_image. No Spark session needed."""

from __future__ import annotations

import pytest

from sparkifydb_datawarehouse_spark.llm.codecs import (
    ImageDecodeError,
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp_24,
    encode_png,
    encode_ppm_p6,
)
from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

# a 2x2 RGB image: red, green / blue, white (row-major, top-down)
PX_2X2 = bytes(
    [255, 0, 0, 0, 255, 0,
     0, 0, 255, 255, 255, 255]
)


def test_ppm_p6_roundtrip():
    blob = encode_ppm_p6(2, 2, PX_2X2)
    img = decode_ppm(blob)
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == PX_2X2


def test_ppm_p6_with_comments_and_odd_whitespace():
    blob = b"P6 # a comment\n# full comment line\n 2\t2 #trailing\n255\n" + PX_2X2
    img = decode_ppm(blob)
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == PX_2X2


def test_ppm_p3_ascii():
    body = " ".join(str(b) for b in PX_2X2).encode()
    blob = b"P3\n2 2\n255\n" + body
    img = decode_ppm(blob)
    assert img["pixels"] == PX_2X2


def test_ppm_raster_binary_values_not_eaten_by_tokenizer():
    # raster bytes that LOOK like whitespace (0x0A, 0x20) must survive:
    # the P6 raster starts exactly one byte after the maxval token
    px = bytes([10, 32, 9] * 4)
    img = decode_ppm(encode_ppm_p6(2, 2, px))
    assert img["pixels"] == px


def test_ppm_truncated_raster_raises():
    blob = encode_ppm_p6(2, 2, PX_2X2)[:-1]
    with pytest.raises(ImageDecodeError, match="truncated"):
        decode_ppm(blob)


def test_ppm_bad_maxval_raises():
    with pytest.raises(ImageDecodeError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + PX_2X2 * 2)


def test_ppm_non_numeric_header_token_raises_decode_error():
    # int() must not escape as bare ValueError (ADVICE r4)
    with pytest.raises(ImageDecodeError, match="non-numeric"):
        decode_ppm(b"P6\n2 zz\n255\n" + PX_2X2)


def test_ppm_p3_sample_over_255_raises_decode_error():
    # bytes() on a sample > 255 must not escape as bare ValueError
    with pytest.raises(ImageDecodeError, match="0..255"):
        decode_ppm(b"P3\n1 1\n255\n300 0 0")
    with pytest.raises(ImageDecodeError, match="0..255"):
        decode_ppm(b"P3\n1 1\n255\nxx 0 0")


def test_ppm_comment_adjacent_to_token_terminates_it():
    # netpbm: comments may appear wherever whitespace may, so
    # "2#c\n" is the token 2 followed by comment-as-whitespace
    blob = b"P6\n2#c\n2 255#end\n" + PX_2X2
    img = decode_ppm(blob)
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == PX_2X2


def test_bmp_roundtrip_normalizes_to_topdown_rgb():
    blob = encode_bmp_24(2, 2, PX_2X2)
    img = decode_bmp(blob)
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == PX_2X2


def test_bmp_row_padding():
    # width 3 -> 9 bytes/row, padded to 12: padding must be skipped
    px = bytes(range(3 * 2 * 3))
    img = decode_bmp(encode_bmp_24(3, 2, px))
    assert (img["width"], img["height"]) == (3, 2)
    assert img["pixels"] == px


def test_bmp_rejects_compressed():
    blob = bytearray(encode_bmp_24(2, 2, PX_2X2))
    blob[30] = 1  # BI_RLE8
    with pytest.raises(ImageDecodeError, match="BI_RGB"):
        decode_bmp(bytes(blob))


def test_decode_image_dispatches_by_magic():
    assert decode_image(encode_ppm_p6(2, 2, PX_2X2))["pixels"] == PX_2X2
    assert decode_image(encode_bmp_24(2, 2, PX_2X2))["pixels"] == PX_2X2


def test_decode_image_malformed_payloads_are_decode_errors():
    """Round 10: the codec gate is gone — a WebP container with no
    image chunk and a truncated JPEG are both DECODE errors."""
    webp_magic = b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8
    with pytest.raises(ImageDecodeError):
        decode_image(webp_magic)
    with pytest.raises(ImageDecodeError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # truncated JPEG


# --- PNG (stdlib-zlib decoder) ---------------------------------------------


def _gradient(n):
    return bytes((7 * i + 13) % 256 for i in range(n))


def test_png_roundtrip_rgb_exercises_all_filters():
    # height 10 > 5 rows: encoder cycles filter types 0-4 twice, so a
    # wrong Sub/Up/Average/Paeth implementation cannot round-trip
    w, h = 6, 10
    px = _gradient(w * h * 3)
    img = decode_png(encode_png(w, h, px, channels=3))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert img["pixels"] == px


def test_png_roundtrip_rgba():
    w, h = 5, 7
    px = _gradient(w * h * 4)
    img = decode_png(encode_png(w, h, px, channels=4))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 4)
    assert img["pixels"] == px


def test_png_crc_mismatch_raises():
    blob = bytearray(encode_png(2, 2, _gradient(12)))
    # flip one byte inside the IDAT payload: magic 8 + IHDR chunk 25,
    # then 8 bytes of IDAT length+type put offset 35 in the deflate data
    blob[8 + 25 + 8 + 2] ^= 0x01
    with pytest.raises(ImageDecodeError, match="CRC"):
        decode_png(bytes(blob))


def test_png_truncated_chunk_raises():
    blob = encode_png(2, 2, _gradient(12))
    with pytest.raises(ImageDecodeError, match="truncated|IEND|IHDR"):
        decode_png(blob[: len(blob) // 2])


def test_png_unsupported_forms_raise():
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    def png_with_ihdr(depth, color, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        raw = zlib.compress(b"\x00" * (2 * 3 + 1) * 2)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", raw)
            + chunk(b"IEND", b"")
        )

    with pytest.raises(ImageDecodeError, match="bit depth 16"):
        decode_png(png_with_ihdr(16, 2))
    with pytest.raises(ImageDecodeError, match="color type 0"):
        decode_png(png_with_ihdr(8, 0))  # grayscale
    with pytest.raises(ImageDecodeError, match="color type 3"):
        decode_png(png_with_ihdr(8, 3))  # palette
    with pytest.raises(ImageDecodeError, match="Adam7"):
        decode_png(png_with_ihdr(8, 2, interlace=1))


def test_png_raster_size_mismatch_raises():
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = zlib.compress(b"\x00" * 5)  # not (stride+1)*height
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", short)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ImageDecodeError, match="size mismatch"):
        decode_png(blob)


def test_decode_image_dispatches_png_by_magic():
    px = _gradient(2 * 2 * 3)
    assert decode_image(encode_png(2, 2, px))["pixels"] == px


def test_planted_gradient_matches_closed_form():
    # the q_multimodal_decode_ppm contract: pixel[i] = (31*d + 7*i) % 256
    import numpy as np

    d = 123
    w, h = d % 64 + 1, d % 48 + 1
    px = ((np.arange(w * h * 3, dtype=np.int64) * 7 + d * 31) % 256).astype(np.uint8)
    img = decode_ppm(encode_ppm_p6(w, h, px.tobytes()))
    rgb = np.frombuffer(img["pixels"], dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    expect_r = sum((31 * d + 7 * i) % 256 for i in range(w * h * 3) if i % 3 == 0)
    assert int(rgb[:, 0].sum()) == expect_r
