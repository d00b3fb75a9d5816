"""Pure-Python WebP-lossless (VP8L) codec: decode + a fixture encoder.

Round 8 closes the next codec-tail item (VERDICT r7 #6): VP8L decode
against the public "WebP Lossless Bitstream Specification" (Google,
RFC-style; the container is RIFF per the WebP Container Specification).
Like codecs.py / codecs_jpeg.py this is an original implementation
with its own fixture ENCODER so correctness is pinned by closed-form
roundtrips (lossless format ⇒ decoded pixels must equal the planted
raster byte-for-byte), not by a codec library. The reference repo
(/root/reference) has no image codecs at all — this extends the
mandated multimodal capability surface (SURVEY.md §2 B-rows).

Decoder coverage: LSB-first bitstream, simple + normal (code-length
coded, incl. RLE 16/17/18 and the max-symbol early-stop) Huffman
codes, canonical deflate-style code assignment with a Kraft
completeness check, color cache, LZ77 backward references with the
2D distance map, meta-Huffman (entropy image), and all four
transforms (predictor ×14 modes with libwebp border semantics,
cross-color, subtract-green, color indexing incl. sub-byte pixel
bundling). Still gated in multimodal.decode_image: VP8 (lossy) and
VP8X (extended) WebP — those need a DCT/arithmetic stack out of scope
here.

Distance map note: the spec's 120-entry code→(dx, dy) table is
exactly the near-neighborhood {(x, 0): 1 ≤ x ≤ 8} ∪ {(x, y):
1 ≤ y ≤ 7, −7 ≤ x ≤ 8} sorted by (x² + y², −y, −x); the table here is
GENERATED from that rule (tests pin the documented anchor entries)
rather than transcribed.
"""

from __future__ import annotations

import struct

from .codecs import ImageDecodeError

# ---------------------------------------------------------------------------
# shared tables / helpers
# ---------------------------------------------------------------------------

_MAX_CODE_LENGTH = 15
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_NUM_LENGTH_CODES = 24  # LZ77 length prefix codes in the green alphabet
_NUM_DIST_CODES = 40
_CACHE_MUL = 0x1E35A7BD  # spec §5: color-cache hash multiplier
_MAX_LZ77_LEN = 4096

# transform type ids (spec §3)
_T_PREDICTOR = 0
_T_COLOR = 1
_T_SUBTRACT_GREEN = 2
_T_COLOR_INDEXING = 3


def _build_distance_map() -> list[tuple[int, int]]:
    cand = [(x, 0) for x in range(1, 9)] + [
        (x, y) for y in range(1, 8) for x in range(-7, 9)
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cand


_DIST_MAP = _build_distance_map()
assert len(_DIST_MAP) == 120
_DIST_CODE = {p: i + 1 for i, p in enumerate(_DIST_MAP)}


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _prefix_decode(code: int, br: "_BitReader") -> int:
    """LZ77 length/distance prefix coding (spec §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_bits_value, n_extra_bits)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    eb = x.bit_length() - 2
    top = x >> eb  # 2 or 3
    return (eb << 1) + top, x - (top << eb), eb


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# bit I/O — LSB-first within bytes (deflate convention), Huffman codes
# transmitted MSB-of-code first (walked bit-by-bit)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.data) * 8:
            raise ImageDecodeError("VP8L bitstream truncated")
        v = 0
        p = self.pos
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.data) * 8:
            raise ImageDecodeError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical Huffman (deflate-style assignment, spec §4.1)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, int]:
    """symbol → code for nonzero lengths, deflate canonical order."""
    bl_count: dict[int, int] = {}
    for ln in lengths:
        if ln:
            bl_count[ln] = bl_count.get(ln, 0) + 1
    code = 0
    next_code: dict[int, int] = {}
    for bits in range(1, max(bl_count) + 1):
        code = (code + bl_count.get(bits - 1, 0)) << 1
        next_code[bits] = code
    out: dict[int, int] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = next_code[ln]
            next_code[ln] += 1
    return out


class _HuffCode:
    """Decoder-side code: walk bits MSB-first through by_len buckets."""

    __slots__ = ("single", "by_len", "max_len")

    def __init__(self, lengths: list[int]) -> None:
        used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ImageDecodeError("VP8L huffman code with no symbols")
        if len(used) == 1:
            # single-symbol code: consumes no bits (spec/libwebp special)
            self.single: int | None = used[0][1]
            self.by_len: dict[int, dict[int, int]] = {}
            self.max_len = 0
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        if max_len > _MAX_CODE_LENGTH:
            raise ImageDecodeError("VP8L huffman code length > 15")
        # Kraft completeness — an over/under-subscribed code is invalid
        if sum(1 << (max_len - ln) for ln, _ in used) != 1 << max_len:
            raise ImageDecodeError("VP8L huffman code lengths not complete")
        codes = _canonical_codes(lengths)
        self.by_len = {}
        for sym, code in codes.items():
            self.by_len.setdefault(lengths[sym], {})[code] = sym
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            bucket = self.by_len.get(length)
            if bucket is not None and code in bucket:
                return bucket[code]
        raise ImageDecodeError("invalid VP8L huffman code in stream")


def _read_huffman_code(alphabet_size: int, br: _BitReader) -> _HuffCode:
    lengths = [0] * alphabet_size
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_bits = 8 if br.read_bit() else 1
        s0 = br.read(first_bits)
        if s0 >= alphabet_size:
            raise ImageDecodeError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ImageDecodeError("VP8L simple-code symbol invalid")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1  # becomes the 0-bit single-symbol code
        return _HuffCode(lengths)
    # normal code: code-length code first
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _HuffCode(cl_lengths)
    if br.read_bit():  # max-symbol early stop
        length_nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(length_nbits)
    else:
        max_tokens = alphabet_size
    sym = 0
    prev_len = 8  # spec: default repeat length
    while sym < alphabet_size and max_tokens > 0:
        max_tokens -= 1
        code = cl_code.decode(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_len = code
        else:
            if code == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if sym + repeat > alphabet_size:
                raise ImageDecodeError("VP8L code-length repeat overflows")
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
    return _HuffCode(lengths)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_ALPHABETS = (0, 256, 256, 256, _NUM_DIST_CODES)  # [0] filled per cache size


def _read_entropy_coded_image(
    br: _BitReader, w: int, h: int, level0: bool
) -> tuple[list[int], list]:
    """Returns (argb pixel list, transforms list) — transforms only at
    level 0, recorded in read order as (type, payload...)."""
    transforms: list = []
    seen_types: set[int] = set()
    cur_w = w
    if level0:
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen_types:
                raise ImageDecodeError("VP8L transform repeated")
            seen_types.add(ttype)
            if ttype == _T_SUBTRACT_GREEN:
                transforms.append((_T_SUBTRACT_GREEN,))
            elif ttype in (_T_PREDICTOR, _T_COLOR):
                bits = 2 + br.read(3)
                tw = _subsample_size(cur_w, bits)
                th = _subsample_size(h, bits)
                sub, _ = _read_entropy_coded_image(br, tw, th, False)
                transforms.append((ttype, bits, cur_w, sub))
            elif ttype == _T_COLOR_INDEXING:
                n_colors = br.read(8) + 1
                pal_deltas, _ = _read_entropy_coded_image(br, n_colors, 1, False)
                palette: list[int] = []
                prev = 0
                for d in pal_deltas:  # componentwise delta-decoded
                    prev = (
                        (((prev >> 24) + (d >> 24)) & 0xFF) << 24
                        | ((((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF) << 16
                        | ((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8
                        | (((prev & 0xFF) + (d & 0xFF)) & 0xFF)
                    )
                    palette.append(prev)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((_T_COLOR_INDEXING, width_bits, cur_w, palette))
                cur_w = _subsample_size(cur_w, width_bits)

    # color cache
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ImageDecodeError("VP8L color-cache bits out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta-huffman (level 0 only — sub-images read no bit here)
    meta: list[int] | None = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if level0 and br.read_bit():
        meta_bits = 2 + br.read(3)
        meta_w = _subsample_size(cur_w, meta_bits)
        meta_h = _subsample_size(h, meta_bits)
        meta_img, _ = _read_entropy_coded_image(br, meta_w, meta_h, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        n_groups = max(meta) + 1

    green_alpha = 256 + _NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            tuple(
                _read_huffman_code(a if a else green_alpha, br)
                for a in _ALPHABETS
            )
        )

    n_px = cur_w * h
    pixels = [0] * n_px
    cache = [0] * cache_size
    pos = 0
    group = groups[0]
    while pos < n_px:
        if meta is not None:
            x, y = pos % cur_w, pos // cur_w
            group = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        g = group[0].decode(br)
        if g < 256:
            r = group[1].decode(br)
            b = group[2].decode(br)
            a = group[3].decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif g < 256 + _NUM_LENGTH_CODES:
            length = _prefix_decode(g - 256, br)
            dist_code = group[4].decode(br)
            dist = _plane_code_to_distance(cur_w, _prefix_decode(dist_code, br))
            if dist > pos or pos + length > n_px:
                raise ImageDecodeError("VP8L backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_size:
                    cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:
            idx = g - 256 - _NUM_LENGTH_CODES
            if idx >= cache_size:
                raise ImageDecodeError("VP8L color-cache index out of range")
            pixels[pos] = cache[idx]
            pos += 1
    return pixels, transforms


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = (l >> sh & 0xFF) + (t >> sh & 0xFF) - (tl >> sh & 0xFF)
        out |= max(0, min(255, c)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = ave >> sh & 0xFF
        b = tl >> sh & 0xFF
        d = a - b
        # C-style trunc-toward-zero division by 2
        c = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, c)) << sh
    return out


def _select(t: int, l: int, tl: int) -> int:
    pa_minus_pb = 0
    for sh in (24, 16, 8, 0):
        ac, bc, cc = t >> sh & 0xFF, l >> sh & 0xFF, tl >> sh & 0xFF
        pa_minus_pb += abs(bc - cc) - abs(ac - cc)
    return t if pa_minus_pb <= 0 else l


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ImageDecodeError(f"VP8L predictor mode {mode} invalid")


def _add_px(a: int, b: int) -> int:
    """Per-channel addition mod 256."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _delta(t: int, c: int) -> int:
    """Cross-color transform delta: (int8(t) * int8(c)) >> 5 (spec §3.3)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_predictor(pixels: list[int], w: int, h: int, bits: int, sub: list[int]) -> None:
    tiles_w = _subsample_size(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pixels[pos - 1]  # first row: left
        elif x == 0:
            pred = pixels[pos - w]  # first column: top
        else:
            mode = (sub[(y >> bits) * tiles_w + (x >> bits)] >> 8) & 0xFF
            # linear-memory neighbors; TR at the last column wraps to
            # the current row's first pixel (libwebp semantics)
            pred = _predict(
                mode,
                pixels[pos - 1],
                pixels[pos - w],
                pixels[pos - w - 1],
                pixels[pos - w + 1],
            )
        pixels[pos] = _add_px(pixels[pos], pred)


def _inverse_color(pixels: list[int], w: int, h: int, bits: int, sub: list[int]) -> None:
    tiles_w = _subsample_size(w, bits)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        elt = sub[(y >> bits) * tiles_w + (x >> bits)]
        g2r = elt & 0xFF
        g2b = (elt >> 8) & 0xFF
        r2b = (elt >> 16) & 0xFF
        px = pixels[pos]
        g = (px >> 8) & 0xFF
        red = ((px >> 16) & 0xFF) + _delta(g2r, g)
        blue = (px & 0xFF) + _delta(g2b, g) + _delta(r2b, red & 0xFF)
        pixels[pos] = (px & 0xFF00FF00) | ((red & 0xFF) << 16) | (blue & 0xFF)


def _inverse_subtract_green(pixels: list[int]) -> None:
    for pos, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (r << 16) | b


def _inverse_color_indexing(
    pixels: list[int], w: int, h: int, width_bits: int, palette: list[int]
) -> list[int]:
    pack = 1 << width_bits
    packed_w = _subsample_size(w, width_bits)
    mask = (1 << (8 >> width_bits)) - 1 if width_bits else 0xFF
    out = [0] * (w * h)
    n_pal = len(palette)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        g = (pixels[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
        idx = (g >> ((x % pack) * (8 >> width_bits))) & mask if width_bits else g
        if idx >= n_pal:
            raise ImageDecodeError("VP8L palette index out of range")
        out[pos] = palette[idx]
    return out


def decode_image_stream(br: "_BitReader", w: int, h: int) -> list[int]:
    """Decode a headerless VP8L image-stream (optional transforms +
    spatially-coded image) of known dimensions into ARGB ints. Shared
    by decode_vp8l (dimensions from the VP8L header) and the ALPH
    alpha-chunk decoder in codecs_vp8.py (dimensions from the VP8X
    canvas; the container spec ships alpha as a bare image-stream with
    the alpha values in the green channel)."""
    pixels, transforms = _read_entropy_coded_image(br, w, h, True)
    for t in reversed(transforms):
        if t[0] == _T_SUBTRACT_GREEN:
            _inverse_subtract_green(pixels)
        elif t[0] == _T_PREDICTOR:
            _inverse_predictor(pixels, t[2], h, t[1], t[3])
        elif t[0] == _T_COLOR:
            _inverse_color(pixels, t[2], h, t[1], t[3])
        else:
            pixels = _inverse_color_indexing(pixels, t[2], h, t[1], t[3])
    return pixels


def decode_vp8l(blob: bytes) -> dict:
    """Decode a lossless WebP. Returns the codecs.py normalized dict;
    channels follows the header's alpha-hint bit (3 → RGB, 4 → RGBA)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ImageDecodeError(f"not a WebP container: {blob[:4]!r}")
    pos = 12
    payload = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        if tag == b"VP8L":
            payload = blob[pos + 8 : pos + 8 + size]
            break
        if tag == b"VP8 ":
            raise ImageDecodeError(
                "lossy WebP (VP8) is codecs_vp8.py's format — this "
                "decoder handles only VP8L"
            )
        # VP8X is a metadata header chunk (round 10): skip it and keep
        # walking — a VP8X-wrapped VP8L still decodes here
        pos += 8 + size + (size & 1)
    if payload is None or len(payload) < 5:
        raise ImageDecodeError("WebP container has no VP8L chunk")
    if payload[0] != 0x2F:
        raise ImageDecodeError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read_bit()
    version = br.read(3)
    if version != 0:
        raise ImageDecodeError(f"VP8L version {version} unsupported")
    pixels = decode_image_stream(br, w, h)
    channels = 4 if has_alpha else 3
    out = bytearray(w * h * channels)
    i = 0
    for px in pixels:
        out[i] = (px >> 16) & 0xFF
        out[i + 1] = (px >> 8) & 0xFF
        out[i + 2] = px & 0xFF
        if channels == 4:
            out[i + 3] = (px >> 24) & 0xFF
        i += channels
    return {"width": w, "height": h, "channels": channels, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# fixture ENCODER — emits spec-legal VP8L streams so the decoder is
# pinned by lossless roundtrips on planted rasters (the PNG/JPEG
# discipline). Options exercise each decoder feature: simple + normal
# codes (with RLE 16/17/18 and the max-symbol stop), LZ77 (both the
# distance map and the offset form), color cache, and all four
# transforms.
# ---------------------------------------------------------------------------


def _huffman_lengths(hist: dict[int, int], alphabet: int) -> list[int]:
    """Code lengths (≤ 15) for a histogram; ≥ 2 used symbols required."""
    import heapq

    freqs = sorted((s, c) for s, c in hist.items() if c > 0)
    while True:
        heap: list[tuple[int, int, tuple[int, ...]]] = [
            (c, s, (s,)) for s, c in freqs
        ]
        heapq.heapify(heap)
        depth: dict[int, int] = {s: 0 for s, _ in freqs}
        tiebreak = alphabet
        while len(heap) > 1:
            c1, _, s1 = heapq.heappop(heap)
            c2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] += 1
            tiebreak += 1
            heapq.heappush(heap, (c1 + c2, tiebreak, s1 + s2))
        if max(depth.values()) <= _MAX_CODE_LENGTH:
            lengths = [0] * alphabet
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        freqs = [(s, (c + 1) // 2) for s, c in freqs]  # flatten and retry


def _cl_tokens(lengths: list[int], limit: int) -> list[tuple[int, int, int]]:
    """(cl_code, extra_value, extra_bits) tokens for lengths[:limit]."""
    toks: list[tuple[int, int, int]] = []
    i = 0
    seq = lengths[:limit]
    while i < len(seq):
        v = seq[i]
        run = 1
        while i + run < len(seq) and seq[i + run] == v:
            run += 1
        if v == 0:
            n = run
            while n >= 11:
                k = min(n, 138)
                toks.append((18, k - 11, 7))
                n -= k
            while n >= 3:
                k = min(n, 10)
                toks.append((17, k - 3, 3))
                n -= k
            toks.extend((0, 0, 0) for _ in range(n))
        else:
            toks.append((v, 0, 0))
            n = run - 1
            while n >= 3:
                k = min(n, 6)
                toks.append((16, k - 3, 2))
                n -= k
            toks.extend((v, 0, 0) for _ in range(n))
        i += run
    return toks


def _write_huffman_code(
    bw: _BitWriter,
    hist: dict[int, int],
    alphabet: int,
    use_max_symbol: bool = True,
) -> dict[int, tuple[int, int]]:
    """Write one Huffman code; returns symbol → (code, length)."""
    used = sorted(s for s, c in hist.items() if c > 0)
    if len(used) <= 2 and all(s <= 255 for s in used):
        # simple code
        bw.write(1, 1)
        if len(used) <= 1:
            s0 = used[0] if used else 0
            bw.write(0, 1)  # one symbol
            if s0 >= 2:
                bw.write(1, 1)
                bw.write(s0, 8)
            else:
                bw.write(0, 1)
                bw.write(s0, 1)
            return {s0: (0, 0)}
        s0, s1 = used
        bw.write(1, 1)  # two symbols
        if s0 >= 2:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    # normal code
    bw.write(0, 1)
    lengths = _huffman_lengths(hist, alphabet)
    limit = max(s for s, ln in enumerate(lengths) if ln) + 1
    with_stop = use_max_symbol and len(_cl_tokens(lengths, limit)) >= 2
    # without the max-symbol stop the decoder reads tokens covering
    # the FULL alphabet — the CL histogram must include the tail
    # zero-run tokens too
    toks = _cl_tokens(lengths, limit if with_stop else alphabet)
    cl_hist: dict[int, int] = {}
    for code, _, _ in toks:
        cl_hist[code] = cl_hist.get(code, 0) + 1
    if len(cl_hist) == 1:
        # a complete CL code needs ≥ 2 symbols; add an unused sibling
        only = next(iter(cl_hist))
        cl_lengths = [0] * 19
        cl_lengths[only] = 1
        cl_lengths[(only + 1) % 19] = 1
    else:
        cl_lengths = _huffman_lengths(cl_hist, 19)
        while max(cl_lengths) > 7:  # 3-bit length fields cap at 7
            cl_hist = {s: (c + 1) // 2 for s, c in cl_hist.items()}
            cl_lengths = _huffman_lengths(cl_hist, 19)
    num_codes = max(
        i for i, sym in enumerate(_CL_ORDER) if cl_lengths[sym] > 0
    ) + 1
    num_codes = max(num_codes, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    if with_stop:
        bw.write(1, 1)
        k = 0
        while (len(toks) - 2) >> (2 + 2 * k) and k < 7:
            k += 1
        bw.write(k, 3)
        bw.write(len(toks) - 2, 2 + 2 * k)
    else:
        bw.write(0, 1)
    for code, extra, nbits in toks:
        bw.write_code(cl_codes[code], cl_lengths[code])
        if nbits:
            bw.write(extra, nbits)
    codes = _canonical_codes(lengths)
    return {s: (codes[s], lengths[s]) for s in codes}


def _tokenize(
    argb: list[int],
    w: int,
    *,
    cache_bits: int,
    lz77: bool,
    distance_map: bool,
) -> list[tuple]:
    """('lit', px) | ('copy', length, plane_code) | ('cache', idx)."""
    tokens: list[tuple] = []
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    n = len(argb)
    pos = 0

    def insert(px: int) -> None:
        if cache_size:
            cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    # candidate match distances: horizontal runs, near-horizontal,
    # and the vertical neighborhood — every one expressible as a 2D
    # map offset (dy·w + dx), so the map path gets real coverage
    # across table rows, not just codes 1-2
    dists = [1, 2, 3]
    for dy in (1, 2):
        for dx in (-2, -1, 0, 1, 2):
            d = dy * w + dx
            if d > 0:
                dists.append(d)
    dist_plane = {1: _DIST_CODE[(1, 0)], 2: _DIST_CODE[(2, 0)], 3: _DIST_CODE[(3, 0)]}
    for dy in (1, 2):
        for dx in (-2, -1, 0, 1, 2):
            d = dy * w + dx
            if d > 0 and (dx, dy) in _DIST_CODE:
                dist_plane.setdefault(d, _DIST_CODE[(dx, dy)])

    while pos < n:
        best_len, best_dist = 0, 0
        if lz77:
            for dist in dists:
                if dist == 0 or dist > pos:
                    continue
                length = 0
                limit = min(n - pos, _MAX_LZ77_LEN)
                while length < limit and argb[pos + length] == argb[pos + length - dist]:
                    length += 1
                if length > best_len:
                    best_len, best_dist = length, dist
        if best_len >= 3:
            if distance_map and best_dist in dist_plane:
                plane = dist_plane[best_dist]
            else:
                plane = best_dist + 120
            tokens.append(("copy", best_len, plane))
            for i in range(best_len):
                insert(argb[pos + i])
            pos += best_len
            continue
        px = argb[pos]
        if cache_size:
            idx = ((_CACHE_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                tokens.append(("cache", idx))
                pos += 1
                continue
        tokens.append(("lit", px))
        insert(px)
        pos += 1
    return tokens


def _write_image_stream(
    bw: _BitWriter,
    argb: list[int],
    w: int,
    *,
    cache_bits: int = 0,
    lz77: bool = False,
    distance_map: bool = True,
    use_max_symbol: bool = True,
    level0: bool = False,
    meta_groups: int = 0,
    meta_bits: int = 3,
    height: int = 0,
) -> None:
    """Entropy-coded image body: cache bit, the level-0 meta-huffman
    bit, codes, tokens. `meta_groups ≥ 2` writes a real entropy image
    (tiles cycle through the groups) with IDENTICAL code tables per
    group — spec-legal, and it drives the decoder's per-tile group
    switching without complicating the tokenizer."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_tables = 1
    if level0:
        if meta_groups >= 2:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            mw = _subsample_size(w, meta_bits)
            mh = _subsample_size(height, meta_bits)
            entropy = [
                0xFF000000 | ((i % meta_groups) << 8) for i in range(mw * mh)
            ]
            _write_image_stream(bw, entropy, mw)
            # the decoder reads max(entropy index) + 1 groups — fewer
            # tiles than requested groups caps the table count
            n_tables = min(meta_groups, mw * mh)
        else:
            bw.write(0, 1)  # sub-images read no bit here
    tokens = _tokenize(
        argb, w, cache_bits=cache_bits, lz77=lz77, distance_map=distance_map
    )
    hists: list[dict[int, int]] = [{}, {}, {}, {}, {}]

    def bump(i: int, s: int) -> None:
        hists[i][s] = hists[i].get(s, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            bump(0, (px >> 8) & 0xFF)
            bump(1, (px >> 16) & 0xFF)
            bump(2, px & 0xFF)
            bump(3, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            bump(0, 256 + _prefix_encode(t[1])[0])
            bump(4, _prefix_encode(t[2])[0])
        else:
            bump(0, 256 + _NUM_LENGTH_CODES + t[1])
    cache_size = (1 << cache_bits) if cache_bits else 0
    # same alphabet rule as the decoder (_ALPHABETS); slot 0 is the
    # green alphabet, sized per cache
    alphabets = [a or (256 + _NUM_LENGTH_CODES + cache_size) for a in _ALPHABETS]
    for _ in range(n_tables):  # identical tables per meta group
        tables = [
            _write_huffman_code(bw, hists[i], alphabets[i], use_max_symbol)
            for i in range(5)
        ]
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            for i, sh in ((0, 8), (1, 16), (2, 0), (3, 24)):
                c, ln = tables[i][(px >> sh) & 0xFF]
                bw.write_code(c, ln)
        elif t[0] == "copy":
            lc, lx, lb = _prefix_encode(t[1])
            c, ln = tables[0][256 + lc]
            bw.write_code(c, ln)
            if lb:
                bw.write(lx, lb)
            dc, dx, db = _prefix_encode(t[2])
            c, ln = tables[4][dc]
            bw.write_code(c, ln)
            if db:
                bw.write(dx, db)
        else:
            c, ln = tables[0][256 + _NUM_LENGTH_CODES + t[1]]
            bw.write_code(c, ln)


def _forward_predictor(argb: list[int], w: int, h: int) -> tuple[list[int], int]:
    """Residuals under a constant predictor mode chosen per image
    (mode 2, 'top' — exercises the tile sub-image plumbing; border
    rules identical to the inverse)."""
    mode = 2
    res = [0] * (w * h)
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = argb[pos - 1]
        elif x == 0:
            pred = argb[pos - w]
        else:
            pred = _predict(
                mode, argb[pos - 1], argb[pos - w], argb[pos - w - 1], argb[pos - w + 1]
            )
        res[pos] = _sub_px(argb[pos], pred)
    return res, mode


def _sub_px(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def encode_vp8l(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    *,
    subtract_green: bool = False,
    predictor: bool = False,
    color_element: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    lz77: bool = False,
    distance_map: bool = True,
    transform_bits: int = 4,
    use_max_symbol: bool = True,
    meta_groups: int = 0,
    headerless: bool = False,
) -> bytes:
    """Encode an RGB(A) raster as lossless WebP. `color_element` is a
    (green_to_red, green_to_blue, red_to_blue) triple applied as one
    global cross-color tile. `palette` is mutually exclusive with the
    pixel-domain transforms. ``headerless=True`` returns the bare
    image-stream bytes (no RIFF, no 0x2F signature, no dimension
    header) — the payload shape the VP8X ALPH chunk carries for
    compression method 1 (dimensions travel in the container)."""
    if palette and (subtract_green or predictor or color_element):
        raise ValueError("palette cannot combine with pixel transforms")
    n = width * height
    argb = [0] * n
    for i in range(n):
        r = pixels[i * channels]
        g = pixels[i * channels + 1]
        b = pixels[i * channels + 2]
        a = pixels[i * channels + 3] if channels == 4 else 0xFF
        argb[i] = (a << 24) | (r << 16) | (g << 8) | b

    bw = _BitWriter()
    if not headerless:
        bw.write(width - 1, 14)
        bw.write(height - 1, 14)
        bw.write(1 if channels == 4 else 0, 1)
        bw.write(0, 3)  # version

    cur_w = width
    if subtract_green:
        bw.write(1, 1)
        bw.write(_T_SUBTRACT_GREEN, 2)
        for i, px in enumerate(argb):
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            argb[i] = (px & 0xFF00FF00) | (r << 16) | b
    if color_element is not None:
        g2r, g2b, r2b = color_element
        bw.write(1, 1)
        bw.write(_T_COLOR, 2)
        bw.write(transform_bits - 2, 3)
        tw = _subsample_size(cur_w, transform_bits)
        th = _subsample_size(height, transform_bits)
        elt = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _write_image_stream(bw, [elt] * (tw * th), tw)
        for i, px in enumerate(argb):
            g = (px >> 8) & 0xFF
            r0 = (px >> 16) & 0xFF
            r = (r0 - _delta(g2r, g)) & 0xFF
            b = ((px & 0xFF) - _delta(g2b, g) - _delta(r2b, r0)) & 0xFF
            argb[i] = (px & 0xFF00FF00) | (r << 16) | b
    if predictor:
        bw.write(1, 1)
        bw.write(_T_PREDICTOR, 2)
        bw.write(transform_bits - 2, 3)
        tw = _subsample_size(cur_w, transform_bits)
        th = _subsample_size(height, transform_bits)
        argb, mode = _forward_predictor(argb, cur_w, height)
        _write_image_stream(bw, [0xFF000000 | (mode << 8)] * (tw * th), tw)
    if palette:
        colors = sorted(set(argb))
        if len(colors) > 256:
            raise ValueError("palette encoding needs <= 256 distinct colors")
        bw.write(1, 1)
        bw.write(_T_COLOR_INDEXING, 2)
        bw.write(len(colors) - 1, 8)
        deltas = [
            colors[0] if i == 0 else _sub_px(colors[i], colors[i - 1])
            for i in range(len(colors))
        ]
        _write_image_stream(bw, deltas, len(colors))
        index_of = {c: i for i, c in enumerate(colors)}
        nc = len(colors)
        width_bits = 3 if nc <= 2 else 2 if nc <= 4 else 1 if nc <= 16 else 0
        pack = 1 << width_bits
        ibits = 8 >> width_bits
        packed_w = _subsample_size(cur_w, width_bits)
        packed = [0] * (packed_w * height)
        for pos in range(n):
            x, y = pos % cur_w, pos // cur_w
            g = index_of[argb[pos]] << ((x % pack) * ibits) if width_bits else index_of[argb[pos]]
            packed[y * packed_w + (x >> width_bits)] |= g << 8
        argb = [0xFF000000 | p for p in packed]
        cur_w = packed_w
    bw.write(0, 1)  # end of transforms

    _write_image_stream(
        bw,
        argb,
        cur_w,
        cache_bits=cache_bits,
        lz77=lz77,
        distance_map=distance_map,
        use_max_symbol=use_max_symbol,
        level0=True,
        meta_groups=meta_groups,
        height=height,
    )

    if headerless:
        return bw.tobytes()
    payload = b"\x2f" + bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
