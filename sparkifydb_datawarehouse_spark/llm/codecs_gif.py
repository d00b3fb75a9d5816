"""Pure-Python GIF (87a/89a) codec: multi-frame decode + a fixture
encoder.

Round 8: gives the FRAME-SAMPLING modality a real container decode —
animated GIF is the simplest public multi-frame format (GIF89a spec:
logical screen + global/local color tables, LZW-compressed index
streams in 255-byte sub-blocks, interlacing, graphic-control
extensions with transparency + disposal). The planted-raster
discipline of the image codecs applies: the fixture encoder emits
real LZW streams (dictionary growth, code-size bumps, clear codes)
and pytest pins byte-exact frame reconstruction, including
interlaced rows, partial-frame compositing with offsets,
transparency holes, and restore-to-background disposal.

Decode returns every frame as an RGB canvas snapshot (the composited
state after that frame), which is what frame sampling consumes.
"""

from __future__ import annotations

import struct

from .codecs import ImageDecodeError

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LZWReader:
    """GIF LZW: little-endian bit packing across 255-byte sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            if p >= len(self.data) * 8:
                raise ImageDecodeError("GIF LZW stream truncated")
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.pos += n
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _LZWReader(data)
    out: list[int] = []
    table: list[list[int]] = []
    code_size = 0
    prev: list[int] | None = None

    def reset() -> None:
        nonlocal table, code_size, prev
        table = [[i] for i in range(clear)] + [[], []]
        code_size = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_expected:
        code = br.read(code_size)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if code < len(table) and code not in (clear, eoi):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ImageDecodeError(f"GIF LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_expected:
        raise ImageDecodeError("GIF LZW stream ended before frame filled")
    return out[:n_expected]


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[int] = []

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {}
    next_code = eoi + 1

    def emit(code: int) -> None:
        nonlocal code_size
        for i in range(code_size):
            bits.append((code >> i) & 1)

    def reset() -> None:
        nonlocal table, next_code, code_size
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        code_size = min_code_size + 1

    reset()
    emit(clear)
    cur: tuple[int, ...] = ()
    for idx in indices:
        cand = cur + (idx,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = next_code
        next_code += 1
        # the DECODER bumps when its next slot reaches 1<<code_size;
        # its table is one entry behind ours at emit time
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            reset()
        cur = (idx,)
    if cur:
        emit(table[cur])
    emit(eoi)
    raw = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            raw[i >> 3] |= 1 << (i & 7)
    out = bytearray()
    for i in range(0, len(raw), 255):
        block = raw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    return bytes(out)


def decode_gif(blob: bytes) -> dict:
    """Decode an (animated) GIF. Returns {"width", "height",
    "n_frames", "frames"}: frames[i] is the composited RGB canvas
    AFTER frame i (what a frame sampler consumes), row-major bytes."""
    try:
        return _decode_gif(blob)
    except (IndexError, struct.error) as exc:
        # truncated/corrupt containers surface as the codec error
        # family, never a raw parser IndexError
        raise ImageDecodeError(f"GIF container truncated/corrupt: {exc}") from exc


def _decode_gif(blob: bytes) -> dict:
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError(f"not a GIF: {blob[:6]!r}")
    w, h, flags, bg_idx, _ratio = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = blob[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ImageDecodeError("global color table truncated")
        pos += 3 * n
    canvas = bytearray(w * h * 3)
    if gct is not None:
        r, g, b = gct[3 * bg_idx : 3 * bg_idx + 3] or b"\x00\x00\x00"
        for i in range(w * h):
            canvas[3 * i : 3 * i + 3] = bytes((r, g, b))
    frames: list[bytes] = []
    transparent: int | None = None
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while p < len(blob) and blob[p] != 0:
            p += 1 + blob[p]
        return p + 1

    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = blob[pos]
                gce = blob[pos + 1 : pos + 1 + size]
                disposal = (gce[0] >> 2) & 7
                transparent = gce[3] if gce[0] & 1 else None
                pos = skip_subblocks(pos)
            else:  # comment / application / plain text: skip
                pos = skip_subblocks(pos)
            continue
        if marker != 0x2C:
            raise ImageDecodeError(f"unexpected GIF block 0x{marker:02x}")
        fx, fy, fw, fh, fflags = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        if fx + fw > w or fy + fh > h:
            raise ImageDecodeError("GIF frame exceeds logical screen")
        ct = gct
        if fflags & 0x80:  # local color table
            n = 2 << (fflags & 7)
            ct = blob[pos : pos + 3 * n]
            if len(ct) != 3 * n:
                raise ImageDecodeError("local color table truncated")
            pos += 3 * n
        if ct is None:
            raise ImageDecodeError("GIF frame has no color table")
        min_code_size = blob[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ImageDecodeError(f"bad LZW min code size {min_code_size}")
        lzw = bytearray()
        while pos < len(blob) and blob[pos] != 0:
            n = blob[pos]
            lzw += blob[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1  # sub-block terminator
        indices = _lzw_decode(min_code_size, bytes(lzw), fw * fh)
        # row order: interlaced GIFs store 4 passes
        if fflags & 0x40:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
        else:
            order = list(range(fh))
        before = bytes(canvas)
        for src_row, dst_row in enumerate(order):
            for x in range(fw):
                idx = indices[src_row * fw + x]
                if transparent is not None and idx == transparent:
                    continue
                if 3 * idx + 3 > len(ct):
                    raise ImageDecodeError("GIF index outside color table")
                off = 3 * ((fy + dst_row) * w + (fx + x))
                canvas[off : off + 3] = ct[3 * idx : 3 * idx + 3]
        frames.append(bytes(canvas))
        if disposal == 2:  # restore to background
            bgc = (
                ct[3 * bg_idx : 3 * bg_idx + 3]
                if gct is None
                else gct[3 * bg_idx : 3 * bg_idx + 3]
            )
            for row in range(fh):
                for x in range(fw):
                    off = 3 * ((fy + row) * w + (fx + x))
                    canvas[off : off + 3] = bgc
        elif disposal == 3:  # restore to the canvas before THIS frame
            canvas = bytearray(before)
        transparent = None
        disposal = 0
    if not frames:
        raise ImageDecodeError("GIF contains no image frames")
    return {"width": w, "height": h, "n_frames": len(frames), "frames": frames}


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[dict],
    bg_index: int = 0,
) -> bytes:
    """Encode an animated GIF89a. Each frame dict: {"indices":
    row-major palette indices, "x", "y", "w", "h" (default full
    frame), "interlaced": bool, "transparent": index | None,
    "disposal": 0-3}."""
    if not 2 <= len(palette) <= 256:
        raise ValueError("palette must hold 2..256 colors")
    depth = max(1, (len(palette) - 1).bit_length())
    table_n = 1 << depth
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), bg_index, 0)
    for i in range(table_n):
        out += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
    for fr in frames:
        fx, fy = fr.get("x", 0), fr.get("y", 0)
        fw, fh = fr.get("w", width), fr.get("h", height)
        indices = fr["indices"]
        if len(indices) != fw * fh:
            raise ValueError("indices must cover the frame rect")
        transparent = fr.get("transparent")
        disposal = fr.get("disposal", 0)
        gce_flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_flags, 0, 0, transparent or 0, 0])
        interlaced = bool(fr.get("interlaced"))
        out += b"\x2c" + struct.pack(
            "<HHHHB", fx, fy, fw, fh, 0x40 if interlaced else 0
        )
        if interlaced:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, fh, step)
            ]
            stored: list[int] = []
            for y in order:
                stored.extend(indices[y * fw : (y + 1) * fw])
        else:
            stored = list(indices)
        min_code = max(2, depth)
        out += bytes([min_code]) + _lzw_encode(min_code, stored)
    out += b"\x3b"
    return bytes(out)
