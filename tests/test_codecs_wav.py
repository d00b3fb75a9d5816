"""Pins for the pure-Python WAV (RIFF integer-PCM) codec
(codecs_wav.py). The oracled query value-checks 8/16-bit mono/stereo
end to end; these tests pin the rest: 24/32-bit depths, the 8-bit
unsigned recentre, chunk-walk robustness (extra chunks, odd-size
padding), and the error contract."""

from __future__ import annotations

import random
import struct

import pytest

from sparkifydb_datawarehouse_spark.llm.codecs_wav import (
    AudioDecodeError,
    decode_wav,
    encode_wav,
)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_roundtrip_all_depths(bits, channels):
    rng = random.Random(bits * 10 + channels)
    half = 1 << (bits - 1)
    chans = [
        [rng.randrange(-half, half) for _ in range(37)] for _ in range(channels)
    ]
    a = decode_wav(encode_wav(44100, channels, bits, chans))
    assert (a["sample_rate"], a["channels"], a["bits"], a["n_frames"]) == (
        44100,
        channels,
        bits,
        37,
    )
    assert a["samples"] == chans


def test_eight_bit_unsigned_storage():
    """8-bit PCM is stored unsigned: byte 0 must decode to -128,
    byte 255 to +127 (a missed recentre shifts every sum by 128·n)."""
    blob = encode_wav(8000, 1, 8, [[-128, 0, 127]])
    data_off = blob.index(b"data") + 8
    assert blob[data_off : data_off + 3] == bytes([0, 128, 255])
    assert decode_wav(blob)["samples"] == [[-128, 0, 127]]


def test_extra_chunks_and_odd_padding_are_walked():
    """Real WAVs carry LIST/INFO/cue chunks; the parser must skip
    unknown chunks including odd-sized ones with their pad byte."""
    inner = encode_wav(22050, 2, 16, [[1, -2, 3], [-4, 5, -6]])
    # splice an odd-sized junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"
    spliced = inner[:12] + junk + inner[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    a = decode_wav(spliced)
    assert a["samples"] == [[1, -2, 3], [-4, 5, -6]]


def test_empty_audio():
    a = decode_wav(encode_wav(16000, 1, 16, [[]]))
    assert a["n_frames"] == 0 and a["samples"] == [[]]


def test_error_contract():
    good = encode_wav(8000, 1, 16, [[10, -10]])
    with pytest.raises(AudioDecodeError):
        decode_wav(b"RIFX" + good[4:])  # bad magic
    with pytest.raises(AudioDecodeError):
        decode_wav(good[:20])  # truncated fmt
    # non-PCM format refuses with a clear message
    bad_fmt = bytearray(good)
    fmt_off = good.index(b"fmt ") + 8
    bad_fmt[fmt_off] = 3  # IEEE float
    with pytest.raises(AudioDecodeError, match="format 3"):
        decode_wav(bytes(bad_fmt))
    # a data chunk that is not a whole number of frames
    torn = bytearray(good)
    data_off = good.index(b"data") + 4
    n = struct.unpack("<I", good[data_off : data_off + 4])[0]
    torn[data_off : data_off + 4] = struct.pack("<I", n - 1)
    with pytest.raises(AudioDecodeError, match="whole number of frames"):
        decode_wav(bytes(torn[: len(torn) - 1]))
    # inconsistent block_align
    ba = bytearray(good)
    ba[fmt_off + 12] = 5
    with pytest.raises(AudioDecodeError, match="block_align"):
        decode_wav(bytes(ba))


def test_corruption_fuzz_refuses_cleanly():
    rng = random.Random(3)
    blob = bytearray(encode_wav(8000, 2, 16, [[1] * 50, [-1] * 50]))
    for _ in range(150):
        m = bytearray(blob)
        for _ in range(rng.randint(1, 3)):
            m[rng.randrange(4, len(m))] = rng.randrange(256)
        try:
            a = decode_wav(bytes(m))
            assert a["channels"] >= 1
        except AudioDecodeError:
            pass
