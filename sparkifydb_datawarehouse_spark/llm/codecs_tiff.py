"""Pure-Python baseline TIFF codec (TIFF 6.0 specification, public;
Adobe 1992), round 11: encoder + decoder for the uncompressed and
PackBits subsets a data lake actually meets from scanners/exports.

Covered surface:
- both byte orders ("II" little / "MM" big — every multi-byte field
  honors it),
- the IFD walk (entry count, 12-byte entries, inline vs offset values
  for SHORT/LONG arrays),
- 8-bit grayscale (PhotometricInterpretation 1) and 8-bit RGB
  (Photometric 2, SamplesPerPixel 3),
- multiple strips (RowsPerStrip + StripOffsets/StripByteCounts),
- Compression 1 (none), 32773 (PackBits, spec §9: n ≥ 0 → n+1
  literal bytes, −127 ≤ n ≤ −1 → repeat next byte 1−n times, −128 is
  a no-op), and 5 (LZW, spec §13 — round 12: MSB-first code packing,
  9→12-bit codes with the EARLY width change at 511/1023/2047,
  ClearCode 256 / EOI 257, per-strip streams).

Like QOI the format is fully normative here — no tuned tables — so
the decoder is interop-complete for conforming streams in this
subset, and refuses loudly outside it (bit depths ≠ 8, predictors,
JPEG-in-TIFF, tiles, planar configuration 2). Correctness is
pinned by roundtrips over both endians × all three compressions ×
strip splits, a hand-assembled stream, PackBits vectors, and LZW
fuzz that crosses the 10/11-bit width boundaries
(tests/test_codecs_tiff.py). The reference repo has no image codecs;
this extends the mandated multimodal surface (SURVEY.md §2 B1).
"""

from __future__ import annotations

import struct

from .codecs import ImageDecodeError

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def packbits_encode(data: bytes) -> bytes:
    """TIFF §9 PackBits: greedy run/literal packing (runs ≥ 3 become
    repeats, the spec's recommended strategy)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)  # -(run-1) as unsigned byte
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
        chunk = data[lit_start : min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ImageDecodeError("PackBits strip ended early")
        b = data[i]
        i += 1
        if b == 128:  # -128: no-op
            continue
        if b < 128:
            if i + b + 1 > n:
                raise ImageDecodeError("PackBits literal overruns the strip")
            out += data[i : i + b + 1]
            i += b + 1
        else:
            if i >= n:
                raise ImageDecodeError("PackBits run misses its byte")
            out += bytes((data[i],)) * (257 - b)
            i += 1
    if len(out) != expected:
        raise ImageDecodeError("PackBits output overruns the expected size")
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF LZW (spec §13, Compression 5) — round 12 (VERDICT r11 #6).
# Differs from the GIF flavor (llm/codecs_gif.py) in exactly two
# normative ways: codes are packed MSB-first into the strip (GIF is
# LSB-first in 255-byte sub-blocks), and the code width grows ONE CODE
# EARLY — when the next table slot reaches 2^width - 1 (511/1023/2047),
# not 2^width. Symbols are always bytes (ClearCode 256, EOI 257, first
# dictionary code 258, 12-bit max); every strip begins with a
# ClearCode and ends with EOI. The encoder derives its width bumps
# from a simulated decoder table, so the two sides cannot drift.
# ---------------------------------------------------------------------------

_LZW_CLEAR = 256
_LZW_EOI = 257


class _MsbBitReader:
    """MSB-first bit reader over a whole LZW strip."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            p = self.pos
            if p >= len(self.data) * 8:
                raise ImageDecodeError("TIFF LZW strip truncated")
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            self.pos += 1
        return v


def lzw_decode(data: bytes, expected: int) -> bytes:
    """Decode one TIFF LZW strip to exactly ``expected`` bytes."""
    br = _MsbBitReader(data)
    out = bytearray()
    table: list[bytes] = []
    code_size = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [bytes((i,)) for i in range(256)] + [b"", b""]
        code_size = 9
        prev = None

    reset()
    while len(out) < expected:
        code = br.read(code_size)
        if code == _LZW_CLEAR:
            reset()
            continue
        if code == _LZW_EOI:
            break
        if code < len(table) and code not in (_LZW_CLEAR, _LZW_EOI):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ImageDecodeError(f"TIFF LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY CHANGE (spec §13): bump when the NEXT slot would
            # need the wider code, i.e. at 511/1023/2047 — one earlier
            # than GIF
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < expected:
        raise ImageDecodeError("TIFF LZW strip ended before its rows filled")
    if len(out) > expected:
        raise ImageDecodeError("TIFF LZW strip overruns its rows")
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Encode one strip as TIFF LZW. Width bumps mirror a simulated
    decoder (table length 258 + data-codes-since-clear − 1), so the
    early-change schedule is decoder-exact by construction."""
    codes: list[tuple[int, int]] = []  # (code, width at emit time)
    table: dict[bytes, int] = {}
    next_code = 258
    code_size = 9
    dec_len = 258  # simulated decoder table length
    k = 0  # data codes emitted since the last clear

    def reset() -> None:
        nonlocal table, next_code, code_size, dec_len, k
        table = {bytes((i,)): i for i in range(256)}
        next_code = 258
        code_size = 9
        dec_len = 258
        k = 0

    def emit_data(code: int) -> None:
        # the decoder adds one table entry while processing every data
        # code after the first since clear, and bumps its read width
        # at 2^w - 1 BEFORE reading the next code
        nonlocal dec_len, code_size, k
        codes.append((code, code_size))
        k += 1
        if k >= 2 and dec_len < 4096:
            dec_len += 1
            if dec_len == (1 << code_size) - 1 and code_size < 12:
                code_size += 1

    reset()
    codes.append((_LZW_CLEAR, code_size))
    cur = b""
    for byte in data:
        cand = cur + bytes((byte,))
        if cand in table:
            cur = cand
            continue
        emit_data(table[cur])
        table[cand] = next_code
        next_code += 1
        cur = cand[-1:]
        if next_code >= 4093:  # leave room before the 12-bit ceiling
            emit_data(table[cur])
            codes.append((_LZW_CLEAR, code_size))
            reset()
            cur = b""
    if cur:
        emit_data(table[cur])
    codes.append((_LZW_EOI, code_size))
    # MSB-first bit packing
    out = bytearray()
    acc = nbits = 0
    for code, width in codes:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    *,
    big_endian: bool = False,
    packbits: bool = False,
    lzw: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Write a baseline 8-bit TIFF (gray or RGB) with the requested
    byte order, compression (none / PackBits / LZW), and strip
    height."""
    if channels not in (1, 3):
        raise ValueError("TIFF fixture encoder supports 1 or 3 channels")
    if packbits and lzw:
        raise ValueError("pick one compression")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or height
    row_bytes = width * channels
    strips = []
    for y0 in range(0, height, rps):
        raw = pixels[y0 * row_bytes : min(y0 + rps, height) * row_bytes]
        strips.append(
            packbits_encode(raw) if packbits else lzw_encode(raw) if lzw else raw
        )

    entries = []  # (tag, type, count, value_or_bytes)

    def short_arr(vals):
        return struct.pack(f"{bo}{len(vals)}H", *vals)

    def long_arr(vals):
        return struct.pack(f"{bo}{len(vals)}I", *vals)

    header = struct.pack(f"{bo}2sHI", b"MM" if big_endian else b"II", 42, 8)
    # layout: header(8) | IFD | overflow arrays | strip data
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    overflow_at = 8 + ifd_size
    overflow = bytearray()

    def value_field(type_id, vals):
        nonlocal overflow
        packed = short_arr(vals) if type_id == 3 else long_arr(vals)
        if len(packed) <= 4:
            return packed + b"\x00" * (4 - len(packed)), None
        off = overflow_at + len(overflow)
        overflow += packed
        return struct.pack(f"{bo}I", off), len(packed)

    # strip offsets resolved after overflow is complete: reserve with
    # placeholders, then patch
    strip_counts = [len(s) for s in strips]
    n_strips = len(strips)

    fields = [
        (_TAG_WIDTH, 3, 1, [width]),
        (_TAG_HEIGHT, 3, 1, [height]),
        (_TAG_BITS, 3, channels, [8] * channels),
        (_TAG_COMPRESSION, 3, 1, [32773 if packbits else 5 if lzw else 1]),
        (_TAG_PHOTOMETRIC, 3, 1, [2 if channels == 3 else 1]),
        (_TAG_STRIP_OFFSETS, 4, n_strips, [0] * n_strips),  # patched below
        (_TAG_SAMPLES, 3, 1, [channels]),
        (_TAG_ROWS_PER_STRIP, 3, 1, [rps]),
        (_TAG_STRIP_COUNTS, 4, n_strips, strip_counts),
    ]
    rendered = []
    offsets_slot = None
    for tag, type_id, count, vals in fields:
        vf, _ = value_field(type_id, vals)
        rendered.append((tag, type_id, count, vf))
        if tag == _TAG_STRIP_OFFSETS:
            # remember where the placeholder array (or inline) lives
            offsets_slot = (len(rendered) - 1, len(overflow) - (
                4 * n_strips if 4 * n_strips > 4 else 0
            ))
    data_at = overflow_at + len(overflow)
    strip_offsets = []
    pos = data_at
    for c in strip_counts:
        strip_offsets.append(pos)
        pos += c
    packed_offsets = long_arr(strip_offsets)
    idx, ov_pos = offsets_slot
    if len(packed_offsets) <= 4:
        tag, type_id, count, _ = rendered[idx]
        rendered[idx] = (
            tag,
            type_id,
            count,
            packed_offsets + b"\x00" * (4 - len(packed_offsets)),
        )
    else:
        overflow[ov_pos : ov_pos + len(packed_offsets)] = packed_offsets

    ifd = struct.pack(f"{bo}H", n_entries)
    for tag, type_id, count, vf in rendered:
        ifd += struct.pack(f"{bo}HHI", tag, type_id, count) + vf
    ifd += struct.pack(f"{bo}I", 0)  # next-IFD pointer
    return header + ifd + bytes(overflow) + b"".join(strips)


def _read_values(blob: bytes, bo: str, type_id: int, count: int, field: bytes):
    size = _TYPE_SIZES.get(type_id)
    if size is None:
        raise ImageDecodeError(f"unsupported TIFF field type {type_id}")
    total = size * count
    if total <= 4:
        raw = field[:total]
    else:
        (off,) = struct.unpack(f"{bo}I", field)
        if off + total > len(blob):
            raise ImageDecodeError("TIFF value offset out of range")
        raw = blob[off : off + total]
    if type_id == 3:
        return list(struct.unpack(f"{bo}{count}H", raw))
    if type_id == 4:
        return list(struct.unpack(f"{bo}{count}I", raw))
    if type_id in (1, 2):
        return list(raw)
    raise ImageDecodeError(f"unsupported TIFF field type {type_id}")


def decode_tiff(blob: bytes) -> dict:
    """Decode a baseline 8-bit gray/RGB TIFF (either byte order,
    none/PackBits compression, any strip layout) → {width, height,
    channels, pixels}. Refuses the unsupported TIFF universe loudly
    (module docstring)."""
    if len(blob) < 8:
        raise ImageDecodeError("TIFF too short")
    order = blob[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ImageDecodeError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack(f"{bo}HI", blob[2:8])
    if magic != 42:
        raise ImageDecodeError("not a TIFF (magic != 42)")
    if ifd_off + 2 > len(blob):
        raise ImageDecodeError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack(f"{bo}H", blob[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        at = ifd_off + 2 + 12 * k
        if at + 12 > len(blob):
            raise ImageDecodeError("TIFF IFD truncated")
        tag, type_id, count = struct.unpack(f"{bo}HHI", blob[at : at + 8])
        tags[tag] = _read_values(blob, bo, type_id, count, blob[at + 8 : at + 12])

    def one(tag, default=None):
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ImageDecodeError(f"TIFF missing required tag {tag}")
        return default

    width, height = one(_TAG_WIDTH), one(_TAG_HEIGHT)
    channels = one(_TAG_SAMPLES, 1)
    compression = one(_TAG_COMPRESSION, 1)
    photometric = one(_TAG_PHOTOMETRIC)
    planar = one(_TAG_PLANAR, 1)
    bits = tags.get(_TAG_BITS, [8])
    if any(b != 8 for b in bits):
        raise ImageDecodeError("only 8-bit TIFF samples are supported")
    if planar != 1:
        raise ImageDecodeError("planar TIFF (PlanarConfiguration 2) unsupported")
    if compression not in (1, 5, 32773):
        raise ImageDecodeError(
            f"TIFF compression {compression} unsupported (none/LZW/PackBits only)"
        )
    if (photometric, channels) not in ((1, 1), (2, 3)):
        raise ImageDecodeError(
            f"unsupported TIFF photometric/samples ({photometric}/{channels})"
        )
    if width == 0 or height == 0 or width * height > 64_000_000:
        raise ImageDecodeError("bad TIFF dimensions")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ImageDecodeError("TIFF strip tables missing or inconsistent")
    rps = one(_TAG_ROWS_PER_STRIP, height)
    row_bytes = width * channels
    out = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(blob):
            raise ImageDecodeError("TIFF strip out of range")
        rows = min(rps, height - rows_done)
        expected = rows * row_bytes
        raw = blob[off : off + cnt]
        if compression == 32773:
            out += packbits_decode(raw, expected)
        elif compression == 5:
            out += lzw_decode(raw, expected)
        else:
            out += raw[:expected]
        if compression == 1 and cnt < expected:
            raise ImageDecodeError("TIFF strip shorter than its rows")
        rows_done += rows
    if rows_done < height or len(out) != height * row_bytes:
        raise ImageDecodeError("TIFF strips do not cover the raster")
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }
