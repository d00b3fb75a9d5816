"""Pins for the pure-Python GIF codec (codecs_gif.py). The oracled
query value-checks interlaced + sequential full frames end to end;
these tests pin what it can't reach: LZW dictionary growth/clears and
the KwKwK case, partial-frame compositing with offsets and
transparency holes, disposal modes, local color tables, sub-block
boundaries, and the error contract."""

from __future__ import annotations

import random

import pytest

from sparkifydb_datawarehouse_spark.llm.codecs import ImageDecodeError
from sparkifydb_datawarehouse_spark.llm.codecs_gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pal(n, seed=0):
    rng = random.Random(seed)
    return [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(n)
    ]


def _rgb(pal, indices):
    return b"".join(bytes(pal[i]) for i in indices)


def test_lzw_roundtrip_fuzz():
    rng = random.Random(2)
    for _ in range(30):
        min_code = rng.randint(2, 8)
        n = rng.randint(1, 3000)
        syms = [rng.randrange(1 << min_code) for _ in range(n)]
        blob = _lzw_encode(min_code, syms)
        # strip sub-block framing for the raw decoder
        raw = bytearray()
        p = 0
        while blob[p] != 0:
            raw += blob[p + 1 : p + 1 + blob[p]]
            p += 1 + blob[p]
        assert _lzw_decode(min_code, bytes(raw), n) == syms


def test_lzw_kwkwk_case():
    """'ababab...' style input forces codes referencing the entry
    being defined (the classic KwKwK decoder special case)."""
    syms = [0, 1] * 50
    blob = _lzw_encode(2, syms)
    raw = bytearray()
    p = 0
    while blob[p] != 0:
        raw += blob[p + 1 : p + 1 + blob[p]]
        p += 1 + blob[p]
    assert _lzw_decode(2, bytes(raw), len(syms)) == syms


def test_single_and_multi_frame_roundtrip():
    rng = random.Random(7)
    pal = _pal(16, 1)
    for w, h, nf in [(1, 1, 1), (13, 9, 3), (40, 25, 2)]:
        frames = [
            {"indices": [rng.randrange(16) for _ in range(w * h)]}
            for _ in range(nf)
        ]
        g = decode_gif(encode_gif(w, h, pal, frames))
        assert (g["width"], g["height"], g["n_frames"]) == (w, h, nf)
        for i, fr in enumerate(frames):
            assert g["frames"][i] == _rgb(pal, fr["indices"]), i


def test_interlaced_equals_sequential():
    rng = random.Random(9)
    pal = _pal(8, 2)
    w, h = 17, 23  # odd sizes stress the 4-pass row order
    idx = [rng.randrange(8) for _ in range(w * h)]
    a = decode_gif(encode_gif(w, h, pal, [{"indices": idx}]))
    b = decode_gif(encode_gif(w, h, pal, [{"indices": idx, "interlaced": True}]))
    assert a["frames"][0] == b["frames"][0]


def test_partial_frame_transparency_composites():
    rng = random.Random(3)
    pal = _pal(16, 3)
    w, h = 12, 8
    base = [rng.randrange(16) for _ in range(w * h)]
    sub = [0 if i % 3 else 5 for i in range(4 * 3)]
    g = decode_gif(
        encode_gif(
            w,
            h,
            pal,
            [
                {"indices": base},
                {"indices": sub, "x": 2, "y": 3, "w": 4, "h": 3, "transparent": 0},
            ],
        )
    )
    want = bytearray(_rgb(pal, base))
    for row in range(3):
        for x in range(4):
            idx = sub[row * 4 + x]
            if idx == 0:
                continue
            off = 3 * ((3 + row) * w + (2 + x))
            want[off : off + 3] = bytes(pal[idx])
    assert g["frames"][1] == bytes(want)


def test_disposal_restore_background_and_previous():
    pal = _pal(4, 5)
    w, h = 6, 4
    base = [1] * (w * h)
    spot = [2] * 4  # 2x2 patch
    # disposal 2: after the patch frame, its rect restores to bg color
    g = decode_gif(
        encode_gif(
            w,
            h,
            pal,
            [
                {"indices": base},
                {"indices": spot, "x": 1, "y": 1, "w": 2, "h": 2, "disposal": 2},
                {"indices": [3] * 1, "x": 0, "y": 0, "w": 1, "h": 1},
            ],
            bg_index=0,
        )
    )
    # frame 2's canvas: base, with the 2x2 rect = bg color, plus (0,0)=3
    want = bytearray(_rgb(pal, base))
    for row in (1, 2):
        for x in (1, 2):
            off = 3 * (row * w + x)
            want[off : off + 3] = bytes(pal[0])
    want[0:3] = bytes(pal[3])
    assert g["frames"][2] == bytes(want)
    # disposal 3: restore to previous
    g3 = decode_gif(
        encode_gif(
            w,
            h,
            pal,
            [
                {"indices": base},
                {"indices": spot, "x": 1, "y": 1, "w": 2, "h": 2, "disposal": 3},
                {"indices": [3] * 1, "x": 0, "y": 0, "w": 1, "h": 1},
            ],
        )
    )
    want3 = bytearray(_rgb(pal, base))
    want3[0:3] = bytes(pal[3])
    assert g3["frames"][2] == bytes(want3)


def test_256_color_and_code_growth():
    rng = random.Random(11)
    pal = [(i, (i * 3) % 256, 255 - i) for i in range(256)]
    idx = [rng.randrange(256) for _ in range(60 * 40)]
    g = decode_gif(encode_gif(60, 40, pal, [{"indices": idx}]))
    assert g["frames"][0] == _rgb(pal, idx)


def test_error_contract():
    pal = _pal(4, 8)
    blob = encode_gif(5, 4, pal, [{"indices": [1] * 20}])
    with pytest.raises(ImageDecodeError):
        decode_gif(b"JIF89a" + blob[6:])
    with pytest.raises(ImageDecodeError):
        decode_gif(blob[:-8])  # truncated LZW stream
    # frame rect escaping the logical screen
    bad = encode_gif(5, 4, pal, [{"indices": [1] * 20}])
    i = bad.index(b"\x2c")
    mangled = bytearray(bad)
    mangled[i + 1 : i + 3] = (3).to_bytes(2, "little")  # x offset 3, w 5 > 5
    with pytest.raises(ImageDecodeError):
        decode_gif(bytes(mangled))


def test_corruption_fuzz_refuses_cleanly():
    rng = random.Random(13)
    pal = _pal(16, 9)
    blob = bytearray(
        encode_gif(
            10, 10, pal, [{"indices": [rng.randrange(16) for _ in range(100)]}]
        )
    )
    for _ in range(150):
        m = bytearray(blob)
        for _ in range(rng.randint(1, 3)):
            m[rng.randrange(13, len(m))] = rng.randrange(256)
        try:
            g = decode_gif(bytes(m))
            assert g["n_frames"] >= 1
        except ImageDecodeError:
            pass


def test_decode_image_dispatches_gif():
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    pal = _pal(8, 21)
    idx = [i % 8 for i in range(7 * 5)]
    img = decode_image(encode_gif(7, 5, pal, [{"indices": idx}]))
    assert (img["width"], img["height"], img["channels"]) == (7, 5, 3)
    assert img["pixels"] == _rgb(pal, idx)
