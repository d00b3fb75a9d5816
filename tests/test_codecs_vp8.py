"""VP8 (lossy WebP) codec tests — round 10 (VERDICT r9 #4).

Validation model (same as codecs_vp8l / codecs_jpeg_arith: no codec
library exists in this container to cross-check against): exact
roundtrips of planted rasters through the real bitstream, boolean-
coder fuzz (hypothesis), hand vectors for the normative inverse
transforms, loop-filter invariance theorems, and container-walk
error paths.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkifydb_datawarehouse_spark.llm.codecs import ImageDecodeError
from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import (
    B_PRED,
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    BoolDecoder,
    BoolEncoder,
    decode_vp8_frame,
    decode_webp_lossy,
    encode_vp8_frame,
    encode_webp_vp8,
    inverse_dct4x4,
    inverse_wht,
)


def _targets(mbw: int, mbh: int, d: int = 3) -> list[list[int]]:
    return [[(11 * d + 5 * x + 3 * y) % 256 for x in range(mbw)] for y in range(mbh)]


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 255)), min_size=1, max_size=500
    )
)
def test_bool_coder_roundtrip_fuzz(seq):
    be = BoolEncoder()
    for bit, prob in seq:
        be.put(bit, prob)
    bd = BoolDecoder(be.finish())
    for bit, prob in seq:
        assert bd.get(prob) == bit


def test_bool_coder_carry_chain():
    # all-ones at extreme probability stresses the 0xFF carry ripple
    be = BoolEncoder()
    for _ in range(2000):
        be.put(1, 1)
    bd = BoolDecoder(be.finish())
    assert all(bd.get(1) == 1 for _ in range(2000))


def test_bool_literal_roundtrip():
    be = BoolEncoder()
    be.put_literal(0b1011001, 7)
    be.put_literal(0, 1)
    be.put_literal(63, 6)
    bd = BoolDecoder(be.finish())
    assert bd.get_literal(7) == 0b1011001
    assert bd.get_literal(1) == 0
    assert bd.get_literal(6) == 63


# ---------------------------------------------------------------------------
# inverse transforms: DC-only closed forms (§14.3/14.4) — the algebra
# the planted-raster oracle rests on
# ---------------------------------------------------------------------------


def test_inverse_wht_dc_only():
    for d in (-512, -64, -8, 0, 8, 64, 513):
        out = inverse_wht([d] + [0] * 15)
        assert out == [(d + 3) >> 3] * 16


def test_inverse_dct_dc_only():
    for e in (-2048, -80, -8, 0, 8, 80, 2047):
        out = inverse_dct4x4([e] + [0] * 15)
        assert (out == (e + 4) >> 3).all()


def test_inverse_dct_ac_hand_vector():
    # single AC coefficient at raster position 1 (horizontal first
    # harmonic): first pass leaves column values, second pass applies
    # the 35468/20091 Q16 taps — pin one row against hand math
    coefs = [0] * 16
    coefs[1] = 100
    out = inverse_dct4x4(coefs)
    c1 = ((100 * 35468) >> 16) - 0  # c1 with ip[1]=100, ip[3]=0
    d1 = 100 + ((100 * 20091) >> 16)
    row = [(0 + d1 + 4) >> 3, (0 + c1 + 4) >> 3, (0 - c1 + 4) >> 3, (0 - d1 + 4) >> 3]
    assert out[0].tolist() == row
    # all four rows identical (the coefficient is a pure column-0 row
    # harmonic after the first pass)
    for r in range(1, 4):
        assert out[r].tolist() == row


# ---------------------------------------------------------------------------
# roundtrips + planted exactness
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,mode_fn",
    [
        (16, 16, None),
        (48, 32, None),
        (47, 29, None),
        (47, 29, lambda x, y: [DC_PRED, V_PRED, H_PRED, TM_PRED][(x + y) % 4]),
        (47, 29, lambda x, y: B_PRED),
        (45, 37, lambda x, y: [DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED][(x + 2 * y) % 5]),
        (9, 9, lambda x, y: B_PRED),
    ],
)
def test_planted_raster_roundtrip_exact(w, h, mode_fn):
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    t = _targets(mbw, mbh)
    payload, frame = encode_vp8_frame(t, w, h, y_mode_fn=mode_fn)
    dec = decode_vp8_frame(payload)
    assert (dec["width"], dec["height"]) == (w, h)
    for pl in ("y", "u", "v"):
        assert np.array_equal(dec[pl], frame[pl])
    exp = np.zeros((mbh * 16, mbw * 16), dtype=np.uint8)
    for my in range(mbh):
        for mx in range(mbw):
            exp[my * 16 : (my + 1) * 16, mx * 16 : (mx + 1) * 16] = t[my][mx]
    assert np.array_equal(dec["y"], exp)
    assert (dec["u"] == 128).all() and (dec["v"] == 128).all()


def test_chroma_planting_and_uv_mode_cycle():
    t = _targets(3, 3, 5)
    ct = [[(70 + 9 * x + 17 * y) % 256 for x in range(3)] for y in range(3)]
    payload, frame = encode_vp8_frame(
        t,
        48,
        48,
        chroma_targets=ct,
        uv_mode_fn=lambda x, y: [DC_PRED, V_PRED, H_PRED, TM_PRED][(x + y) % 4],
    )
    dec = decode_vp8_frame(payload)
    for pl in ("y", "u", "v"):
        assert np.array_equal(dec[pl], frame[pl])
    for my in range(3):
        for mx in range(3):
            assert (dec["u"][my * 8 : (my + 1) * 8, mx * 8 : (mx + 1) * 8] == ct[my][mx]).all()


def test_all_ten_bpred_submodes_are_exercised_and_exact():
    # a 2x2 B_PRED grid cycles (r*4+c+mbx+2*mby) % 10 over the nine
    # interior subblocks per MB — every sub-mode appears
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import _default_b_submode

    seen = set()
    for mby in range(2):
        for mbx in range(2):
            for r in range(4):
                for c in range(4):
                    seen.add(_default_b_submode(mbx, mby, r, c))
    assert seen == set(range(10))
    t = _targets(2, 2, 13)
    payload, frame = encode_vp8_frame(t, 32, 32, y_mode_fn=lambda x, y: B_PRED)
    dec = decode_vp8_frame(payload)
    assert np.array_equal(dec["y"], frame["y"])
    exp = np.zeros((32, 32), dtype=np.uint8)
    for my in range(2):
        for mx in range(2):
            exp[my * 16 : (my + 1) * 16, mx * 16 : (mx + 1) * 16] = t[my][mx]
    assert np.array_equal(dec["y"], exp)


def test_token_categories_and_zero_runs_roundtrip():
    rng = random.Random(7)

    def ov(plane, mbx, mby, sb):
        if plane == "y" and (mbx + mby + sb) % 3 == 0:
            lv = [0] * 16
            for mag in (1, 3, 5, 8, 15, 25, 50, 400, 1500):  # literals + cat1-6
                lv[rng.randrange(1, 16)] = mag * rng.choice([-1, 1])
            return lv
        return None

    payload, frame = encode_vp8_frame(_targets(3, 2, 9), 48, 32, level_override_fn=ov)
    dec = decode_vp8_frame(payload)
    assert np.array_equal(dec["y"], frame["y"])

    def ov2(plane, mbx, mby, sb):
        if plane == "y":
            lv = [0] * 16
            lv[0], lv[10], lv[15] = 7, -2, 1  # zero runs between nonzeros
            return lv
        return None

    payload, frame = encode_vp8_frame(
        _targets(2, 2, 4), 32, 32, y_mode_fn=lambda x, y: B_PRED, level_override_fn=ov2
    )
    assert np.array_equal(decode_vp8_frame(payload)["y"], frame["y"])


# ---------------------------------------------------------------------------
# loop filter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1])
def test_loop_filter_constant_frame_invariance(ftype):
    # every cross-edge difference is 0 ⇒ adjustments are identically 0
    const = [[100] * 4 for _ in range(3)]
    _, f_off = encode_vp8_frame(const, 64, 48, filter_level=0, filter_type=ftype)
    p_on, f_on = encode_vp8_frame(const, 64, 48, filter_level=63, filter_type=ftype)
    d_on = decode_vp8_frame(p_on)
    assert np.array_equal(d_on["y"], f_on["y"])
    assert np.array_equal(f_on["y"], f_off["y"])
    assert np.array_equal(f_on["u"], f_off["u"])


@pytest.mark.parametrize("ftype,lvl,sharp", [(0, 10, 0), (0, 25, 0), (0, 63, 0), (1, 25, 3), (1, 63, 7)])
def test_loop_filter_roundtrip_decoder_matches_encoder(ftype, lvl, sharp):
    payload, frame = encode_vp8_frame(
        _targets(3, 3, 11),
        48,
        48,
        y_mode_fn=lambda x, y: [DC_PRED, V_PRED, B_PRED][(x + y) % 3],
        filter_level=lvl,
        filter_type=ftype,
        sharpness=sharp,
    )
    dec = decode_vp8_frame(payload)
    for pl in ("y", "u", "v"):
        assert np.array_equal(dec[pl], frame[pl]), pl


def test_loop_filter_preserves_extreme_edges_and_smooths_moderate_ones():
    # §15 threshold design: a 0|255 MB edge EXCEEDS the edge limit
    # (2·255 + 0 > mb_edge at any level) and must be preserved — it is
    # a real edge, not blocking artifact...
    hard = [[0, 255, 0]]
    _, h_off = encode_vp8_frame(hard, 48, 16, filter_level=0)
    p_hard, h_on = encode_vp8_frame(hard, 48, 16, filter_level=63)
    assert np.array_equal(h_on["y"], h_off["y"])
    # ...while a moderate 100|140 edge passes the limits and smooths
    mod = [[100, 140, 100]]
    _, m_off = encode_vp8_frame(mod, 48, 16, filter_level=0)
    p_mod, m_on = encode_vp8_frame(mod, 48, 16, filter_level=63)
    assert not np.array_equal(m_on["y"], m_off["y"]), (
        "normal filter must smooth a 100|140 macroblock edge at level 63"
    )
    # and the decoder reproduces both filtered planes exactly
    assert np.array_equal(decode_vp8_frame(p_hard)["y"], h_on["y"])
    assert np.array_equal(decode_vp8_frame(p_mod)["y"], m_on["y"])


def test_simple_filter_touches_luma_only():
    t = [[100, 140, 100]]
    ct = [[110, 150, 110]]
    _, f_off = encode_vp8_frame(t, 48, 16, chroma_targets=ct, filter_level=0)
    _, f_on = encode_vp8_frame(
        t, 48, 16, chroma_targets=ct, filter_level=63, filter_type=1
    )
    assert not np.array_equal(f_on["y"], f_off["y"])
    assert np.array_equal(f_on["u"], f_off["u"])  # simple filter: luma only
    assert np.array_equal(f_on["v"], f_off["v"])


def test_mb_no_coeff_skip_roundtrips_and_shrinks():
    # all-128 frame: every MB's residual is zero ⇒ all MBs skip;
    # contexts reset per §13.1 and the stream shrinks
    const = [[128] * 3, [128] * 3]
    p_skip, f_skip = encode_vp8_frame(const, 48, 32, use_skip=True)
    p_full, _ = encode_vp8_frame(const, 48, 32, use_skip=False)
    d = decode_vp8_frame(p_skip)
    assert np.array_equal(d["y"], f_skip["y"]) and (d["y"] == 128).all()
    assert len(p_skip) < len(p_full)
    # mixed: one MB equals its left neighbor (skippable under some
    # modes), the rest carry coefficients — roundtrip + planted values
    t = _targets(3, 2, 7)
    t[1][1] = t[1][0]
    for modefn in (None, lambda x, y: [DC_PRED, V_PRED, B_PRED][(x + y) % 3]):
        payload, frame = encode_vp8_frame(t, 48, 32, use_skip=True, y_mode_fn=modefn)
        dec = decode_vp8_frame(payload)
        assert np.array_equal(dec["y"], frame["y"])
        exp = np.zeros((32, 48), dtype=np.uint8)
        for my in range(2):
            for mx in range(3):
                exp[my * 16 : (my + 1) * 16, mx * 16 : (mx + 1) * 16] = t[my][mx]
        assert np.array_equal(dec["y"], exp)


# ---------------------------------------------------------------------------
# container + error paths
# ---------------------------------------------------------------------------


def test_container_vp8x_walk_and_rgb_closed_form():
    t = _targets(3, 2, 7)
    for extended in (False, True):
        blob = encode_webp_vp8(t, 47, 29, extended=extended)
        img = decode_webp_lossy(blob)
        assert (img["width"], img["height"], img["channels"]) == (47, 29, 3)
        px = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(29, 47, 3)
        assert (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 1] == px[:, :, 2]).all()
        for my in range(2):
            for mx in range(3):
                sub = px[my * 16 : min((my + 1) * 16, 29), mx * 16 : min((mx + 1) * 16, 47), 0]
                assert (sub == t[my][mx]).all()


def test_vp8x_wrapping_vp8l_still_decodes():
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8l import encode_vp8l

    px = bytes((7 * i) % 256 for i in range(8 * 5 * 3))
    lossless = encode_vp8l(8, 5, px, 3)
    # rebuild: RIFF [VP8X header] [VP8L chunk from the lossless blob]
    import struct

    vp8l_chunk = lossless[12:]
    vp8x = bytes(4) + struct.pack("<I", 7)[:3] + struct.pack("<I", 4)[:3]
    chunks = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x + vp8l_chunk
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
    img = decode_webp_lossy(blob)
    assert img["pixels"] == px


def test_error_paths():
    with pytest.raises(ImageDecodeError):
        decode_webp_lossy(b"RIFF\x00\x00\x00\x00WEBP")  # no image chunk
    with pytest.raises(ImageDecodeError):
        decode_vp8_frame(b"\x00" * 5)  # too short
    payload, _ = encode_vp8_frame([[100]], 16, 16)
    with pytest.raises(ImageDecodeError):
        decode_vp8_frame(payload[:3] + b"\x00\x00\x00" + payload[6:])  # bad start code
    # interframe (bit 0 of the tag set) is refused, not misparsed
    bad = bytes([payload[0] | 1]) + payload[1:]
    with pytest.raises(ImageDecodeError):
        decode_vp8_frame(bad)


# ---------------------------------------------------------------------------
# registered-query fixture properties
# ---------------------------------------------------------------------------


def test_query_fixture_cycles_cover_all_modes_and_container():
    seen_y, seen_uv, seen_ext = set(), set(), set()
    for d in range(40):
        w, h = d % 24 + 9, d % 16 + 9
        mbw, mbh = (w + 15) // 16, (h + 15) // 16
        seen_ext.add(d % 7 == 0)
        for my in range(mbh):
            for mx in range(mbw):
                seen_y.add((d + mx + my) % 5)
                seen_uv.add((d + mx + 2 * my) % 4)
    assert seen_y == set(range(5))  # DC/V/H/TM/B_PRED all planted
    assert seen_uv == set(range(4))
    assert seen_ext == {True, False}


def test_coef_prob_updates_are_entropy_layer_only():
    # §13.4 updates change the bitstream, never the decoded values;
    # both sides use the spliced table so contexts are live
    rng = random.Random(9)
    updates = {
        (rng.randrange(4), rng.randrange(8), rng.randrange(3), rng.randrange(11)):
        rng.randrange(1, 256)
        for _ in range(40)
    }
    t = _targets(3, 2, 7)
    for modefn in (None, lambda x, y: [DC_PRED, V_PRED, B_PRED][(x + y) % 3]):
        p0, f0 = encode_vp8_frame(t, 47, 29, y_mode_fn=modefn)
        p1, f1 = encode_vp8_frame(
            t, 47, 29, y_mode_fn=modefn, coef_prob_updates=updates
        )
        assert p0 != p1
        d0, d1 = decode_vp8_frame(p0), decode_vp8_frame(p1)
        assert np.array_equal(d0["y"], d1["y"])
        assert np.array_equal(d1["y"], f1["y"])
        assert np.array_equal(d0["u"], d1["u"])


def test_alph_roundtrips_all_filters_and_compressions():
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import decode_alph, encode_alph

    rng = random.Random(3)
    for w, h in [(9, 7), (24, 16), (31, 13), (1, 1)]:
        plane = bytes(rng.randrange(256) for _ in range(w * h))
        for filt in range(4):
            for comp in range(2):
                assert decode_alph(encode_alph(plane, w, h, filt, comp), w, h) == plane


def test_alpha_still_rgba_closed_form():
    w, h = 33, 25
    alpha = bytes(((13 * 5 + 7 * y) % 256) for y in range(h) for _ in range(w))
    blob = encode_webp_vp8(
        _targets(3, 2, 5), w, h, alpha=alpha, alpha_filtering=2, alpha_compression=1
    )
    img = decode_webp_lossy(blob)
    assert img["channels"] == 4
    px = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(h, w, 4)
    assert px[:, :, 3].tobytes() == alpha
    assert (px[:, :, 0] == px[:, :, 1]).all()  # neutral chroma: R=G=B
    for my in range(2):
        for mx in range(3):
            sub = px[my * 16 : min((my + 1) * 16, h), mx * 16 : min((mx + 1) * 16, w), 0]
            assert (sub == _targets(3, 2, 5)[my][mx]).all()


def test_anim_frames_compositing_and_both_codecs():
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import (
        decode_webp_frames,
        encode_webp_anim,
    )

    w, h = 33, 25
    specs = []
    for f in range(4):
        v = (29 * 5 + 41 * f) % 256
        if f % 2 == 0:
            specs.append(
                {"kind": "vp8", "mb_targets": [[v] * 3 for _ in range(2)], "duration": 50 + f}
            )
        else:
            specs.append({"kind": "vp8l", "rgb": (v, v, v), "duration": 50 + f})
    anim = decode_webp_frames(encode_webp_anim(specs, w, h))
    assert len(anim["frames"]) == 4 and anim["durations"] == [50, 51, 52, 53]
    for f in range(4):
        v = (29 * 5 + 41 * f) % 256
        fr = np.frombuffer(anim["frames"][f], dtype=np.uint8).reshape(h, w, 3)
        assert (fr == v).all(), f
    # sub-rect + disposal + blend (opaque src-over == overwrite)
    specs = [
        {"kind": "vp8l", "rgb": (10, 20, 30)},
        {"kind": "vp8l", "rgb": (200, 100, 50), "x": 16, "y": 8, "w": 8, "h": 8, "dispose": True},
        {"kind": "vp8l", "rgb": (1, 2, 3), "x": 0, "y": 0, "w": 8, "h": 8, "blend": True},
    ]
    anim = decode_webp_frames(encode_webp_anim(specs, w, h, bg=(9, 9, 9, 255)))
    f1 = np.frombuffer(anim["frames"][1], dtype=np.uint8).reshape(h, w, 3)
    assert (f1[8:16, 16:24] == [200, 100, 50]).all()
    assert (f1[0, 0] == [10, 20, 30]).all()
    f2 = np.frombuffer(anim["frames"][2], dtype=np.uint8).reshape(h, w, 3)
    assert (f2[8:16, 16:24] == [9, 9, 9]).all()  # disposed to background
    assert (f2[0:8, 0:8] == [1, 2, 3]).all()
    # decode_image returns the FIRST composited frame (GIF convention)
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    first = decode_image(encode_webp_anim(specs, w, h, bg=(9, 9, 9, 255)))
    assert first["channels"] == 3 and first["pixels"] == anim["frames"][0]


def test_decode_image_dispatches_lossy_webp():
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    blob = encode_webp_vp8(_targets(2, 1, 3), 25, 12)
    img = decode_image(blob)
    assert (img["width"], img["height"], img["channels"]) == (25, 12, 3)


# ---------------------------------------------------------------------------
# round 11: Vp8Tables injection seam + third-party interop guard
# (VERDICT r10 #4 / ADVICE r10) and the ANMF spec src-over blend
# ---------------------------------------------------------------------------


def _synthetic_tables(seed: int):
    """Deterministic non-uniform probability tables (entries 1..254)."""
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import Vp8Tables

    rng = random.Random(seed)

    def p():
        return rng.randrange(1, 255)

    coef = [
        [[[p() for _ in range(11)] for _ in range(3)] for _ in range(8)]
        for _ in range(4)
    ]
    bmode = [[[p() for _ in range(9)] for _ in range(10)] for _ in range(10)]
    upd = [
        [[[p() for _ in range(11)] for _ in range(3)] for _ in range(8)]
        for _ in range(4)
    ]
    return Vp8Tables(coef, bmode, upd)


def test_tables_injection_roundtrips_bit_true_nonuniform():
    # VERDICT r10 #4: any valid probability table must roundtrip —
    # two distinct non-uniform synthetic sets, modes covering B_PRED
    # (exercises the context-indexed §11.4 table on both sides) and a
    # §13.4 update transmitted against non-uniform update-flag probs.
    t = _targets(3, 2, 7)
    payloads = []
    for seed in (101, 202):
        tb = _synthetic_tables(seed)
        payload, frame = encode_vp8_frame(
            t,
            41,
            23,
            tables=tb,
            y_mode_fn=lambda x, y: (x + y) % 5,  # includes B_PRED
            coef_prob_updates={(0, 0, 0, 0): 200, (2, 1, 2, 3): 77},
        )
        dec = decode_vp8_frame(payload, tables=tb)
        assert np.array_equal(dec["y"], frame["y"])
        assert np.array_equal(dec["u"], frame["u"])
        assert np.array_equal(dec["v"], frame["v"])
        payloads.append(payload)
    # the entropy layer is live: different tables → different bits
    assert payloads[0] != payloads[1]
    default_payload, _ = encode_vp8_frame(
        t, 41, 23, y_mode_fn=lambda x, y: (x + y) % 5,
        coef_prob_updates={(0, 0, 0, 0): 200, (2, 1, 2, 3): 77},
    )
    assert default_payload != payloads[0]


def test_placeholder_guard_refuses_external_vp8_streams():
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import _FIXTURE_TRAILER

    payload, frame = encode_vp8_frame(_targets(2, 1), 25, 12)
    assert payload.endswith(_FIXTURE_TRAILER)
    # fixture stream decodes under the placeholder defaults
    assert np.array_equal(decode_vp8_frame(payload)["y"], frame["y"])
    # the same bits WITHOUT the trailer model a third-party stream:
    # refused loudly instead of decoding to garbage (ADVICE r10)
    with pytest.raises(ImageDecodeError, match="interop unsupported"):
        decode_vp8_frame(payload[: -len(_FIXTURE_TRAILER)])
    # ...and through the container walk too
    import struct as _struct

    bare = payload[: -len(_FIXTURE_TRAILER)]
    chunk = b"VP8 " + _struct.pack("<I", len(bare)) + bare
    if len(bare) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    with pytest.raises(ImageDecodeError, match="interop unsupported"):
        decode_webp_lossy(riff)
    # injected non-placeholder tables lift the guard (the trailer is
    # inert, so a trailer-less stream decodes once real tables exist)
    tb = _synthetic_tables(303)
    p2, f2 = encode_vp8_frame(_targets(2, 1), 25, 12, tables=tb)
    dec = decode_vp8_frame(p2[: -len(_FIXTURE_TRAILER)], tables=tb)
    assert np.array_equal(dec["y"], f2["y"])


def test_anmf_blend_follows_container_spec_src_over():
    # ADVICE r10 #3: semi-transparent frame over a semi-transparent
    # canvas must use the spec's src-over (alpha-weighted destination
    # and composited alpha), not an opaque-dst lerp + max() alpha.
    from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import (
        decode_webp_frames,
        encode_webp_anim,
    )

    w, h = 16, 8
    bg = (100, 150, 200, 100)  # semi-transparent canvas
    f1 = (40, 80, 120, 128)
    f2 = (250, 10, 60, 64)
    specs = [
        {"kind": "vp8l", "rgb": f1, "blend": True},
        {"kind": "vp8l", "rgb": f2, "blend": True},
    ]
    anim = decode_webp_frames(encode_webp_anim(specs, w, h, bg=bg))

    def src_over(dst, src):
        # independent integer reference of the container-spec formula
        ws = src[3] * 255
        wd = dst[3] * (255 - src[3])
        den = ws + wd
        rgb = tuple(
            0 if den == 0 else (src[i] * ws + dst[i] * wd + den // 2) // den
            for i in range(3)
        )
        return rgb + ((den + 127) // 255,)

    exp1 = src_over(bg, f1)
    exp2 = src_over(exp1, f2)
    got1 = np.frombuffer(anim["frames"][0], dtype=np.uint8).reshape(h, w, 3)
    got2 = np.frombuffer(anim["frames"][1], dtype=np.uint8).reshape(h, w, 3)
    assert (got1 == exp1[:3]).all(), (got1[0, 0], exp1)
    # frame 2 sees the COMPOSITED alpha from frame 1 — the old max()
    # canvas alpha would shift these values
    assert (got2 == exp2[:3]).all(), (got2[0, 0], exp2)
    # fully-transparent src over fully-transparent dst → RGB zeroed
    specs0 = [
        {"kind": "vp8l", "rgb": (9, 9, 9, 0), "blend": True},
    ]
    anim0 = decode_webp_frames(encode_webp_anim(specs0, w, h, bg=(7, 7, 7, 0)))
    g0 = np.frombuffer(anim0["frames"][0], dtype=np.uint8).reshape(h, w, 3)
    assert (g0 == 0).all()
