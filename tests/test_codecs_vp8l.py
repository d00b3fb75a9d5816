"""Pins for the pure-Python lossless-WebP codec (codecs_vp8l.py).

The oracled query (q_multimodal_decode_webp) value-checks decode
end-to-end through Spark with options cycling by doc_id; these tests
pin the parts the oracle can't isolate: the full option matrix under
fuzz (lossless ⇒ byte-exact roundtrip), each transform alone, pixel
bundling at every palette width, the distance-map anchors, the
max-symbol / full-alphabet code-length paths, meta-huffman group
switching, and the error contract."""

from __future__ import annotations

import random

import pytest

from sparkifydb_datawarehouse_spark.llm.codecs import ImageDecodeError
from sparkifydb_datawarehouse_spark.llm.codecs_vp8l import (
    _DIST_MAP,
    decode_vp8l,
    encode_vp8l,
)


def _rand_px(rng, w, h, ch):
    return bytes(rng.randrange(256) for _ in range(w * h * ch))


def test_distance_map_anchors():
    """The generated code→offset table matches the spec's documented
    anchors: 120 entries, near neighbors first, (8, 7) last."""
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:6] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0)]
    assert _DIST_MAP[-1] == (8, 7)
    assert len(set(_DIST_MAP)) == 120


def test_basic_roundtrip_rgb_and_rgba():
    rng = random.Random(1)
    for ch in (3, 4):
        for w, h in [(1, 1), (4, 6), (21, 13), (32, 1), (1, 24)]:
            px = _rand_px(rng, w, h, ch)
            img = decode_vp8l(encode_vp8l(w, h, px, ch))
            assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
            assert img["pixels"] == px, (w, h, ch)


def test_option_matrix_fuzz():
    """Random rasters through random option combinations must decode
    byte-exactly — subtract-green, predictor, cross-color, LZ77 (map
    and offset distance forms), color cache, max-symbol on/off."""
    rng = random.Random(7)
    for _ in range(50):
        w, h = rng.randint(1, 24), rng.randint(1, 20)
        ch = rng.choice([3, 4])
        px = _rand_px(rng, w, h, ch)
        opts = dict(
            subtract_green=rng.random() < 0.5,
            predictor=rng.random() < 0.5,
            color_element=(
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                if rng.random() < 0.4
                else None
            ),
            cache_bits=rng.choice([0, 0, 2, 5, 8]),
            lz77=rng.random() < 0.5,
            distance_map=rng.random() < 0.5,
            use_max_symbol=rng.random() < 0.5,
            transform_bits=rng.choice([2, 3, 4]),
        )
        img = decode_vp8l(encode_vp8l(w, h, px, ch, **opts))
        assert img["pixels"] == px, opts


def test_each_transform_alone():
    rng = random.Random(3)
    px = _rand_px(rng, 17, 11, 3)
    for opts in (
        {"subtract_green": True},
        {"predictor": True},
        {"color_element": (200, 5, 130)},
    ):
        img = decode_vp8l(encode_vp8l(17, 11, px, 3, **opts))
        assert img["pixels"] == px, opts


@pytest.mark.parametrize("n_colors", [2, 3, 4, 11, 16, 17, 200])
def test_palette_and_pixel_bundling(n_colors):
    """Color-indexing at every bundling width (8/4/2/1 px per byte),
    including non-multiple row widths where the last packed byte is
    partial."""
    rng = random.Random(n_colors)
    w, h = 13, 7
    colors = [
        bytes((rng.randrange(256), rng.randrange(256), rng.randrange(256)))
        for _ in range(n_colors)
    ]
    px = b"".join(colors[rng.randrange(n_colors)] for _ in range(w * h))
    img = decode_vp8l(encode_vp8l(w, h, px, 3, palette=True))
    assert img["pixels"] == px


def test_lz77_texture_and_flat():
    """Repetitive rasters drive real backward references (horizontal
    dist-1 runs and vertical dist-width runs) through both the
    distance-map and plain-offset encodings."""
    rng = random.Random(9)
    tile = _rand_px(rng, 4, 1, 3)
    w, h = 16, 12
    px = (tile * (w * h // 4 + 1))[: w * h * 3]
    for dmap in (True, False):
        img = decode_vp8l(encode_vp8l(w, h, px, 3, lz77=True, distance_map=dmap))
        assert img["pixels"] == px, dmap
    flat = bytes([9, 250, 77]) * (10 * 10)
    img = decode_vp8l(encode_vp8l(10, 10, flat, 3, lz77=True, cache_bits=4))
    assert img["pixels"] == flat


def test_meta_huffman_groups():
    rng = random.Random(13)
    for groups in (2, 3, 5):
        w, h = rng.randint(9, 30), rng.randint(9, 25)
        px = _rand_px(rng, w, h, 3)
        img = decode_vp8l(
            encode_vp8l(w, h, px, 3, meta_groups=groups, cache_bits=3, lz77=True)
        )
        assert img["pixels"] == px, groups


def test_combined_kitchen_sink():
    """All pixel-domain features at once."""
    rng = random.Random(21)
    w, h = 25, 19
    px = _rand_px(rng, w, h, 4)
    img = decode_vp8l(
        encode_vp8l(
            w,
            h,
            px,
            4,
            subtract_green=True,
            predictor=True,
            color_element=(88, 17, 240),
            cache_bits=5,
            lz77=True,
            meta_groups=3,
            transform_bits=2,
        )
    )
    assert img["pixels"] == px


def test_error_contract():
    rng = random.Random(5)
    px = _rand_px(rng, 6, 4, 3)
    blob = encode_vp8l(6, 4, px, 3)
    with pytest.raises(ImageDecodeError):
        decode_vp8l(b"XXXX" + blob[4:])  # bad RIFF magic
    with pytest.raises(ImageDecodeError):
        decode_vp8l(blob[:30])  # truncated bitstream
    bad_sig = bytearray(blob)
    bad_sig[20] = 0x2E  # corrupt the VP8L signature byte
    with pytest.raises(ImageDecodeError):
        decode_vp8l(bytes(bad_sig))
    # lossy VP8 chunk refuses with a clear message, not garbage
    lossy = blob[:12] + b"VP8 " + blob[16:]
    with pytest.raises(ImageDecodeError, match="VP8L"):
        decode_vp8l(lossy)


def test_decode_image_dispatches_webp():
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    rng = random.Random(17)
    px = _rand_px(rng, 8, 5, 3)
    img = decode_image(encode_vp8l(8, 5, px, 3, lz77=True))
    assert img["pixels"] == px
    # a VP8L chunk misdeclared as VP8X is a malformed container:
    # round 10's chunk walk rejects it (bogus VP8X feature flags /
    # missing image chunk), never a silent misparse
    blob = encode_vp8l(8, 5, px, 3)
    ext = blob[:12] + b"VP8X" + blob[16:]
    with pytest.raises(ImageDecodeError):
        decode_image(ext)


def test_oracle_query_option_cycle_covers_features():
    """The registered query's doc_id-cycled options must hit every
    feature at least once across the fixture's id range."""
    from sparkifydb_datawarehouse_spark.llm.multimodal import _webp_encode_opts

    seen = {k: set() for k in _webp_encode_opts(0)}
    for d in range(60):
        for k, v in _webp_encode_opts(d).items():
            seen[k].add(bool(v) if not isinstance(v, bool) else v)
    for k, vals in seen.items():
        assert vals == {True, False}, f"option {k} never varies"


def test_distance_map_paths_are_really_exercised():
    """The widened tokenizer must emit map-coded copies beyond codes
    1-2 on a diagonal-repetitive raster (regression guard: the first
    encoder only mapped dist 1 and dist w)."""
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8l import _tokenize

    rng = random.Random(31)
    w, h = 12, 10
    base = [rng.randrange(1 << 24) | 0xFF000000 for _ in range(w)]
    # rows repeat the row above shifted by one pixel -> dist w-1 or w+1
    argb = list(base)
    for y in range(1, h):
        prev = argb[(y - 1) * w : y * w]
        argb.extend(prev[1:] + prev[:1])
    toks = _tokenize(argb, w, cache_bits=0, lz77=True, distance_map=True)
    planes = {t[2] for t in toks if t[0] == "copy"}
    assert planes, "expected LZ77 copies"
    assert any(2 < p <= 120 for p in planes), planes
    # and the stream still roundtrips
    px = b"".join(
        bytes(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)) for p in argb
    )
    img = decode_vp8l(encode_vp8l(w, h, px, 3, lz77=True, distance_map=True))
    assert img["pixels"] == px


def test_corruption_fuzz_refuses_cleanly():
    """Randomly corrupted/truncated VP8L payloads must either decode
    (corruption may land in padding) or raise ImageDecodeError — never
    another exception type, a hang, or silently wrong dimensions."""
    rng = random.Random(43)
    px = _rand_px(rng, 14, 9, 3)
    blob = bytearray(
        encode_vp8l(14, 9, px, 3, lz77=True, cache_bits=3, subtract_green=True)
    )
    for _ in range(200):
        mutated = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            mutated[rng.randrange(22, len(mutated))] = rng.randrange(256)
        try:
            img = decode_vp8l(bytes(mutated))
            assert (img["width"], img["height"]) == (14, 9)
            assert len(img["pixels"]) == 14 * 9 * 3
        except ImageDecodeError:
            pass
    for cut in range(22, len(blob), 7):
        try:
            decode_vp8l(bytes(blob[:cut]))
        except ImageDecodeError:
            pass
