"""Byte-exactness equivalence tests for the optimized RFC 6386 §7
boolean coder (optimization round 14, guide §4.2).

The optimized BoolEncoder accumulates the interval base as ONE
arbitrary-precision integer (carries become big-int adds; bytes are
produced once at finish) and the optimized BoolDecoder keeps a wide
bit reservoir (32-bit refills, batched renormalization via
bit_length). Both must be BIT-IDENTICAL to the RFC's byte-at-a-time
register machines — this file pins that equivalence against verbatim
reference copies of the pre-optimization implementations (round-13
tree, codecs_vp8.py), driven by adversarial probability/bit sequences
(carry ripples, all-extreme probabilities, long runs).
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkifydb_datawarehouse_spark.llm.codecs_vp8 import BoolDecoder, BoolEncoder

# ---------------------------------------------------------------------------
# reference implementations: verbatim copies of the round-13
# codecs_vp8.py register machines (RFC 6386 §7.3 / §7 structure)
# ---------------------------------------------------------------------------


class _RefBoolEncoder:
    def __init__(self) -> None:
        self.bottom = 0
        self.range = 255
        self.bit_count = 24
        self.out = bytearray()

    def _carry(self) -> None:
        pos = len(self.out) - 1
        while pos >= 0 and self.out[pos] == 0xFF:
            self.out[pos] = 0
            pos -= 1
        if pos < 0:
            raise AssertionError("bool-encoder carry underflow")
        self.out[pos] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
                self.bottom &= (1 << 31) - 1
            self.bottom <<= 1
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return None

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(0, 128)
        return bytes(self.out)


class _RefBoolDecoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            bit = 1
            self.range -= split
            self.value -= big_split
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
                self.value |= nxt
        return bit


_seq = st.lists(
    st.tuples(st.integers(0, 1), st.integers(1, 255)), min_size=1, max_size=800
)


@settings(max_examples=300, deadline=None)
@given(_seq)
def test_encoder_bytes_identical_fuzz(seq):
    ref, opt = _RefBoolEncoder(), BoolEncoder()
    for bit, prob in seq:
        ref.put(bit, prob)
        opt.put(bit, prob)
    assert opt.finish() == ref.finish()


@settings(max_examples=300, deadline=None)
@given(_seq)
def test_decoder_bits_identical_fuzz(seq):
    enc = _RefBoolEncoder()
    for bit, prob in seq:
        enc.put(bit, prob)
    data = enc.finish()
    ref, opt = _RefBoolDecoder(data), BoolDecoder(data)
    # decode MORE symbols than encoded: the zero-feed tail past
    # end-of-stream must also agree bit-for-bit
    probs = [p for _, p in seq] + [1, 128, 255] * 8
    for p in probs:
        assert opt.get(p) == ref.get(p)


def test_encoder_carry_ripple_bytes_identical():
    # all-ones at prob 1: maximal 0xFF runs -> deepest carry chains
    ref, opt = _RefBoolEncoder(), BoolEncoder()
    for _ in range(5000):
        ref.put(1, 1)
        opt.put(1, 1)
    assert opt.finish() == ref.finish()


def test_decoder_on_arbitrary_byte_streams():
    # the decoder must track the reference on ANY byte input (not just
    # well-formed encoder output), including the zero-feed past EOS
    rng = random.Random(0xC0DEC)
    for trial in range(50):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 60)))
        ref, opt = _RefBoolDecoder(data), BoolDecoder(data)
        for _ in range(600):
            p = rng.randrange(1, 256)
            assert opt.get(p) == ref.get(p)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(1, 255), min_size=1, max_size=200),
    st.data(),
)
def test_batched_lattice_methods_match_scalar_loop(probs, data):
    # random flag pattern with random literals, random per-slot probs:
    # encoder put_zero_flags must equal the put(0, p) loop byte-for-
    # byte; decoder read_flag_lattice must equal the get/get_literal
    # walk bit-for-bit INCLUDING the coder end state
    fired = {
        i: data.draw(st.integers(0, 255))
        for i in range(len(probs))
        if data.draw(st.booleans())
    }
    # --- encoder: zero-flag batch (only valid when nothing fires) ---
    ref, opt = _RefBoolEncoder(), BoolEncoder()
    for p in probs:
        ref.put(0, p)
    opt.put_zero_flags(probs)
    assert opt.finish() == ref.finish()
    # --- decoder: build a stream that fires `fired`, read both ways ---
    enc = _RefBoolEncoder()
    for i, p in enumerate(probs):
        if i in fired:
            enc.put(1, p)
            for shift in range(7, -1, -1):
                enc.put((fired[i] >> shift) & 1, 128)
        else:
            enc.put(0, p)
    enc.put(1, 77)  # trailing sentinel symbol to pin the end state
    stream = enc.finish()
    ref_d, opt_d = _RefBoolDecoder(stream), BoolDecoder(stream)
    expect = []
    for i, p in enumerate(probs):
        if ref_d.get(p):
            v = 0
            for _ in range(8):
                v = (v << 1) | ref_d.get(128)
            expect.append((i, v))
    got = opt_d.read_flag_lattice(probs)
    assert got == expect == sorted(fired.items())
    assert opt_d.get(77) == ref_d.get(77) == 1  # end states agree


def test_literals_and_trees_roundtrip_through_both():
    # put_literal/get_literal and put_tree/get_tree ride the optimized
    # core; cross-decode: reference decoder reads optimized bytes
    opt = BoolEncoder()
    vals = [(0b1011001, 7), (0, 1), (63, 6), (255, 8), (1, 2)]
    for v, n in vals:
        opt.put_literal(v, n)
    data = opt.finish()
    ref = _RefBoolDecoder(data)
    for v, n in vals:
        got = 0
        for _ in range(n):
            got = (got << 1) | ref.get(128)
        assert got == v
