"""Arithmetic-coded JPEG (SOF9, T.81 Annex D/F) — coder primitives,
entropy-layer equivalence with the Huffman baseline, restart markers,
DAC conditioning, and graceful refusals.

The verification strategy (stated in codecs_jpeg_arith's module
docstring): no third-party arithmetic-JPEG decoder exists in this
container, so correctness is pinned by (a) byte-exact roundtrip fuzz
of the QM coder and of whole images, (b) pixel EQUALITY between the
arithmetic decode and the Huffman baseline decode of the SAME
quantized coefficients (the entropy layer must be lossless), and
(c) a compression-ratio check showing the Table D.3 state machine
actually adapts toward the source entropy.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from sparkifydb_datawarehouse_spark.llm.codecs import ImageDecodeError
from sparkifydb_datawarehouse_spark.llm.codecs_jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    encode_jpeg_from_coeffs,
)
from sparkifydb_datawarehouse_spark.llm.codecs_jpeg_arith import (
    _QE_TABLE,
    ArithDecoder,
    ArithEncoder,
    encode_jpeg_arith,
    encode_jpeg_arith_from_coeffs,
)


def test_qe_table_structure():
    """Structural invariants of Table D.3: 113 adaptive states + the
    fixed sign bin; every Qe below 0x8000 (a valid LPS estimate);
    transitions in range; SWITCH only on states whose Qe is near 0.5
    (an MPS flip only makes sense when the estimate says 'coin
    flip'); state 13 is the terminal smallest estimate."""
    assert len(_QE_TABLE) == 114
    for i, (qe, nmps, nlps, switch) in enumerate(_QE_TABLE):
        assert 0 < qe < 0x8000, i
        assert 0 <= nmps < 114 and 0 <= nlps < 114, i
        if switch:
            assert qe > 0x5000, f"state {i}: switch on a skewed estimate"
    assert _QE_TABLE[13][1] == 13  # smallest Qe self-loops on MPS
    assert _QE_TABLE[113] == (0x5A1D, 113, 113, 0)  # fixed sign bin


def test_coder_roundtrip_fuzz():
    rng = random.Random(20260816)
    for trial in range(60):
        n = rng.randrange(0, 600)
        p = rng.choice([0.02, 0.2, 0.5, 0.8, 0.98])
        nctx = rng.choice([1, 4, 16])
        bits = [
            (rng.randrange(nctx), 1 if rng.random() < p else 0)
            for _ in range(n)
        ]
        enc = ArithEncoder()
        st_e = bytearray(nctx)
        for idx, b in bits:
            enc.encode(st_e, idx, b)
        data = enc.flush() + b"\xff\xd9"
        dec = ArithDecoder(data, 0)
        st_d = bytearray(nctx)
        got = [dec.decode(st_d, idx) for idx, _ in bits]
        assert got == [b for _, b in bits], f"trial {trial} (n={n}, p={p})"
        assert st_e == st_d  # both sides walked the same state path


def test_coder_zero_symbols_flush():
    enc = ArithEncoder()
    data = enc.flush() + b"\xff\xd9"
    # nothing to decode, but the stream must be well-formed for a
    # decoder that reads nothing
    ArithDecoder(data, 0)


def test_coder_adapts_toward_entropy():
    """A 20k-bit iid Bernoulli(0.95) stream has H ~= 0.286 bits/sym;
    the adaptive QM coder should land well under 0.45 — a broken
    NMPS/NLPS wiring (e.g. transposed columns) fails this by sitting
    near 1 bit/sym."""
    rng = random.Random(99)
    n = 20_000
    bits = [1 if rng.random() < 0.95 else 0 for _ in range(n)]
    enc = ArithEncoder()
    st = bytearray(1)
    for b in bits:
        enc.encode(st, 0, b)
    out = enc.flush()
    bits_per_sym = len(out) * 8 / n
    assert bits_per_sym < 0.45, bits_per_sym


def test_stuffing_after_ff():
    """Every 0xFF in entropy data must be followed by 0x00 (T.81
    byte stuffing) so scan data can never alias a marker."""
    rng = np.random.default_rng(11)
    qb = rng.integers(-60, 60, size=(4, 4, 8, 8)).astype(np.int32)
    blob = encode_jpeg_arith_from_coeffs(qb, 32, 32)
    sos = blob.find(b"\xff\xda")
    data = blob[sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big") :]
    i = 0
    while i < len(data) - 2:  # stop before EOI
        if data[i] == 0xFF:
            assert data[i + 1] == 0x00, f"unstuffed 0xFF at {i}"
            i += 2
        else:
            i += 1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_arith_equals_huffman_on_random_coefficients(seed):
    """The entropy layer is lossless: decoding the arithmetic and the
    Huffman encoding of the SAME quantized coefficient grid must give
    identical pixels (both feed the identical dequant + IDCT tail)."""
    rng = np.random.default_rng(seed)
    bw, bh = int(rng.integers(1, 5)), int(rng.integers(1, 4))
    w, h = bw * 8 - int(rng.integers(0, 3)), bh * 8 - int(rng.integers(0, 3))
    qb = rng.integers(-100, 100, size=(bh, bw, 8, 8)).astype(np.int32)
    # thin the AC population (realistic sparsity exercises runs + EOB)
    mask = rng.random(size=qb.shape) < 0.7
    qb[mask] = 0
    a = decode_jpeg(encode_jpeg_arith_from_coeffs(qb, w, h))
    b = decode_jpeg(encode_jpeg_from_coeffs(qb, w, h))
    assert a["width"] == b["width"] and a["height"] == b["height"]
    assert a["pixels"] == b["pixels"]


def test_arith_equals_huffman_color_420():
    rng = np.random.default_rng(5)
    h, w = 21, 37
    planes = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8) for _ in range(3)
    ]
    a = decode_jpeg(encode_jpeg_arith(planes, w, h, "420"))
    b = decode_jpeg(encode_jpeg_baseline(planes, w, h, "420"))
    assert a["channels"] == b["channels"] == 3
    assert a["pixels"] == b["pixels"]


@pytest.mark.parametrize("samp,dri", [("444", 0), ("420", 0), ("420", 2), ("444", 3)])
def test_non_interleaved_scans_equal_interleaved_and_huffman(samp, dri):
    """ADVICE r9 #4: per-component sequential SOF9 scans (the layout
    libjpeg emits for non-interleaved arith files) decode identically
    to the one-scan interleaved encoding of the same planes AND to the
    independent Huffman baseline — same coefficients, three entropy
    layouts, one pixel result."""
    rng = np.random.default_rng(11)
    h, w = 19, 29
    planes = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8) for _ in range(3)
    ]
    inter = decode_jpeg(
        encode_jpeg_arith(planes, w, h, samp, restart_interval=dri)
    )
    noninter = decode_jpeg(
        encode_jpeg_arith(
            planes, w, h, samp, restart_interval=dri, per_component_scans=True
        )
    )
    huff = decode_jpeg(encode_jpeg_baseline(planes, w, h, samp))
    assert noninter["pixels"] == inter["pixels"]
    assert noninter["pixels"] == huff["pixels"]
    # restarts actually present when requested
    if dri:
        blob = encode_jpeg_arith(
            planes, w, h, samp, restart_interval=dri, per_component_scans=True
        )
        assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))


def test_restart_interval_roundtrip():
    rng = np.random.default_rng(17)
    qb = rng.integers(-50, 50, size=(3, 5, 8, 8)).astype(np.int32)
    plain = decode_jpeg(encode_jpeg_arith_from_coeffs(qb, 40, 24))
    for dri in (1, 2, 7):
        blob = encode_jpeg_arith_from_coeffs(qb, 40, 24, restart_interval=dri)
        assert blob.count(b"\xff\xd0") >= 1 or dri > 15
        got = decode_jpeg(blob)
        assert got["pixels"] == plain["pixels"], f"DRI={dri}"


def test_dac_conditioning_roundtrip():
    """Non-default DC L/U and AC Kx change the context selection on
    both sides identically — pixels must still match the Huffman
    decode of the same grid."""
    rng = np.random.default_rng(23)
    qb = rng.integers(-200, 200, size=(2, 2, 8, 8)).astype(np.int32)
    ref = decode_jpeg(encode_jpeg_from_coeffs(qb, 16, 16))
    for dc_cond, kx in [((0, 0), 1), ((2, 4), 63), ((1, 1), 5)]:
        blob = encode_jpeg_arith_from_coeffs(
            qb, 16, 16, dc_cond=dc_cond, ac_kx=kx
        )
        assert decode_jpeg(blob)["pixels"] == ref["pixels"], (dc_cond, kx)


def test_decode_image_dispatch_sof9():
    from sparkifydb_datawarehouse_spark.llm.multimodal import decode_image

    plane = np.full((8, 8), 100, dtype=np.uint8)
    img = decode_image(encode_jpeg_arith([plane], 8, 8))
    assert img["channels"] == 1
    assert np.frombuffer(img["pixels"], dtype=np.uint8).tolist() == [100] * 64


def test_bad_dac_refused():
    plane = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(encode_jpeg_arith([plane], 8, 8))
    dac = blob.find(b"\xff\xcc")
    assert dac > 0
    blob[dac + 5] = 0x00  # DC conditioning byte -> L=0,U=0 is legal; AC next
    # corrupt the AC Kx (second table entry value) to 0
    blob[dac + 7] = 0x00
    with pytest.raises(ImageDecodeError):
        decode_jpeg(bytes(blob))


def test_truncated_scan_degrades_cleanly():
    """Arithmetic scans zero-feed past a marker/end — truncation must
    either produce an image or raise ImageDecodeError, never hang or
    throw a foreign exception."""
    rng = np.random.default_rng(31)
    qb = rng.integers(-50, 50, size=(2, 2, 8, 8)).astype(np.int32)
    blob = encode_jpeg_arith_from_coeffs(qb, 16, 16)
    sos = blob.find(b"\xff\xda")
    for cut in (sos + 10, len(blob) - 4):
        try:
            decode_jpeg(blob[:cut] + b"\xff\xd9")
        except ImageDecodeError:
            pass


def test_lossless_process_still_refused():
    """SOF11 (lossless) stays behind the honest gate."""
    plane = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(encode_jpeg_arith([plane], 8, 8))
    sof = blob.find(b"\xff\xc9")
    blob[sof + 1] = 0xCB
    with pytest.raises(ImageDecodeError, match="unsupported JPEG coding"):
        decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# Progressive arithmetic (SOF10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_progressive_arith_equals_baseline(seed):
    """The full default scan script (DC first+refine, AC spectral
    bands, two AC refinement passes) through the QM coder must
    reconstruct the identical pixels the single-scan Huffman baseline
    produces from the same planes — entropy layer and scan scheduling
    are both lossless."""
    from sparkifydb_datawarehouse_spark.llm.codecs_jpeg_arith import (
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(8, 30)), int(rng.integers(8, 40))
    planes = [
        rng.integers(0, 256, size=(h, w)).astype(np.uint8) for _ in range(3)
    ]
    for samp in ("444", "420"):
        a = decode_jpeg(encode_jpeg_progressive_arith(planes, w, h, samp))
        b = decode_jpeg(encode_jpeg_baseline(planes, w, h, samp))
        assert a["pixels"] == b["pixels"], samp
    a = decode_jpeg(encode_jpeg_progressive_arith([planes[0]], w, h))
    b = decode_jpeg(encode_jpeg_baseline([planes[0]], w, h))
    assert a["pixels"] == b["pixels"], "grayscale"


def test_progressive_arith_restart_and_dac():
    from sparkifydb_datawarehouse_spark.llm.codecs_jpeg_arith import (
        encode_jpeg_progressive_arith,
    )

    rng = np.random.default_rng(3)
    planes = [
        rng.integers(0, 256, size=(24, 24)).astype(np.uint8) for _ in range(3)
    ]
    ref = decode_jpeg(encode_jpeg_baseline(planes, 24, 24, "420"))
    got = decode_jpeg(
        encode_jpeg_progressive_arith(planes, 24, 24, "420", restart_interval=2)
    )
    assert got["pixels"] == ref["pixels"]
    ref4 = decode_jpeg(encode_jpeg_baseline(planes, 24, 24, "444"))
    got4 = decode_jpeg(
        encode_jpeg_progressive_arith(
            planes, 24, 24, "444", dc_cond=(1, 3), ac_kx=2
        )
    )
    assert got4["pixels"] == ref4["pixels"]


# ---------------------------------------------------------------------------
# Hypothesis property tests — stronger than the seeded fuzz above:
# shrinking finds minimal counterexamples in the coder's renorm /
# carry / flush edges if any exist.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 1)), max_size=300
    )
)
def test_coder_roundtrip_property(bits):
    """ANY (context, bit) sequence roundtrips byte-exactly, and both
    sides finish in identical statistics states."""
    enc = ArithEncoder()
    st_e = bytearray(8)
    for idx, b in bits:
        enc.encode(st_e, idx, b)
    data = enc.flush() + b"\xff\xd9"
    dec = ArithDecoder(data, 0)
    st_d = bytearray(8)
    assert [dec.decode(st_d, idx) for idx, _ in bits] == [b for _, b in bits]
    assert st_e == st_d


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-1023, 1023), min_size=64, max_size=64),
    st.integers(0, 3),
)
def test_block_model_roundtrip_property(coeffs, tbl):
    """ANY coefficient block (DC diff chains included) survives the
    Annex-F DC+AC statistical models: encode then decode over a shared
    coder recovers the exact zigzag coefficients."""
    from sparkifydb_datawarehouse_spark.llm.codecs_jpeg_arith import (
        _CoderStats,
        _decode_ac,
        _decode_dc,
        _encode_ac,
        _encode_dc,
    )

    zz = np.array(coeffs, dtype=np.int32)
    enc = ArithEncoder()
    se = _CoderStats()
    _encode_dc(enc, se, tbl, 0, int(zz[0]), (0, 1))
    _encode_ac(enc, se, tbl, zz, 5)
    data = enc.flush() + b"\xff\xd9"
    dec = ArithDecoder(data, 0)
    sd = _CoderStats()
    out = np.zeros(64, dtype=np.int32)
    out[0] = _decode_dc(dec, sd, tbl, 0, (0, 1))
    _decode_ac(dec, sd, tbl, out, 5)
    assert (out == zz).all()
