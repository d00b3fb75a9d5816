"""Pure-Python image codecs: PPM, BMP, and PNG (stdlib zlib only).

The container ships no image libraries, but none are needed for these
formats: PPM (netpbm P6/P3) and 24-bit BI_RGB BMP are plain headers
over raw pixel bytes, and PNG's only compression is DEFLATE — which
stdlib `zlib` inflates — leaving just chunk framing and the five
scanline filters (None/Sub/Up/Average/Paeth) to implement. These
decoders make the multimodal DECODE step real — `multimodal.
decode_image` dispatches here by magic bytes (baseline JPEG decodes
in the sibling codecs_jpeg.py) and keeps its NotImplementedError gate
only for formats that genuinely require an external codec library
(WebP, progressive/arithmetic JPEG, ...).

All decoders return the same normalized dict:
    {"width": int, "height": int, "channels": int,  # 3=RGB, 4=RGBA
     "pixels": bytes}   # row-major, top-down, interleaved

Format references are public specifications: netpbm ppm(5) man page,
the Windows BITMAPINFOHEADER layout, and the PNG spec (RFC 2083 /
ISO 15948: chunk layout §5, IHDR §11.2.2, filters §9).
"""

from __future__ import annotations


class ImageDecodeError(ValueError):
    """Raised when bytes claim a supported magic but violate the spec."""


def _ppm_tokens(blob: bytes, n: int) -> tuple[list[bytes], int]:
    """First n whitespace-delimited header tokens, skipping '#' comments
    (comments run to end-of-line per the netpbm spec, and may appear
    wherever whitespace may — so a '#' adjacent to a token terminates
    that token, acting as its delimiting whitespace). Returns the
    tokens and the offset of the byte AFTER the single whitespace that
    terminates the last token — for P6 that byte starts the raster."""
    tokens: list[bytes] = []
    i = 0
    cur = bytearray()
    while i < len(blob) and len(tokens) < n:
        c = blob[i : i + 1]
        if c == b"#":
            if cur:
                tokens.append(bytes(cur))
                cur = bytearray()
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            if i < len(blob):
                i += 1  # consume the comment-terminating newline
            if len(tokens) == n:
                return tokens, i
        elif c.isspace():
            if cur:
                tokens.append(bytes(cur))
                cur = bytearray()
            i += 1
            if len(tokens) == n:
                return tokens, i
        else:
            cur += c
            i += 1
    if cur and len(tokens) < n:
        tokens.append(bytes(cur))
    if len(tokens) < n:
        raise ImageDecodeError(f"PPM header truncated: {len(tokens)}/{n} tokens")
    return tokens, i


def decode_ppm(blob: bytes) -> dict:
    """Decode netpbm PPM — P6 (binary) or P3 (ASCII), maxval ≤ 255."""
    if blob[:2] not in (b"P6", b"P3"):
        raise ImageDecodeError(f"not a PPM: magic {blob[:2]!r}")
    magic = blob[:2]
    tokens, off = _ppm_tokens(blob, 4)
    try:
        width, height, maxval = (int(t) for t in tokens[1:4])
    except ValueError:
        raise ImageDecodeError(
            f"non-numeric PPM header token in {tokens[1:4]!r}"
        ) from None
    if width <= 0 or height <= 0:
        raise ImageDecodeError(f"bad PPM dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ImageDecodeError(f"unsupported PPM maxval {maxval} (need 1..255)")
    n = width * height * 3
    if magic == b"P6":
        pixels = blob[off : off + n]
        if len(pixels) < n:
            raise ImageDecodeError(f"P6 raster truncated: {len(pixels)}/{n} bytes")
    else:  # P3: ASCII sample values, whitespace separated
        samples = blob[off:].split()
        if len(samples) < n:
            raise ImageDecodeError(f"P3 raster truncated: {len(samples)}/{n} samples")
        try:
            # bytes() rejects non-ints and values outside 0..255, so a
            # malformed or >maxval-violating sample lands here too
            pixels = bytes(int(s) for s in samples[:n])
        except ValueError:
            raise ImageDecodeError("P3 sample not an integer in 0..255") from None
    return {"width": width, "height": height, "channels": 3, "pixels": pixels}


def decode_bmp(blob: bytes) -> dict:
    """Decode an uncompressed 24-bit BI_RGB Windows BMP (the plain
    header-over-raw-bytes BMP every screenshot tool can emit). Rows are
    4-byte aligned and stored bottom-up in BGR; output is normalized to
    top-down RGB like decode_ppm."""
    if blob[:2] != b"BM":
        raise ImageDecodeError(f"not a BMP: magic {blob[:2]!r}")
    if len(blob) < 54:
        raise ImageDecodeError("BMP header truncated")

    def _u32(o: int) -> int:
        return int.from_bytes(blob[o : o + 4], "little")

    def _i32(o: int) -> int:
        return int.from_bytes(blob[o : o + 4], "little", signed=True)

    raster_off = _u32(10)
    dib_size = _u32(14)
    if dib_size < 40:
        raise ImageDecodeError(f"unsupported DIB header size {dib_size} (need >=40)")
    width = _i32(18)
    height = _i32(22)
    bpp = int.from_bytes(blob[28:30], "little")
    compression = _u32(30)
    if bpp != 24 or compression != 0:
        raise ImageDecodeError(
            f"only 24-bit BI_RGB supported, got bpp={bpp} compression={compression}"
        )
    if width <= 0 or height == 0:
        raise ImageDecodeError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = raster_off + row_stride * height
    if len(blob) < need:
        raise ImageDecodeError(f"BMP raster truncated: {len(blob)}/{need} bytes")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = (height - 1 - y) if bottom_up else y
        base = raster_off + src_row * row_stride
        dst = y * width * 3
        for x in range(width):
            b, g, r = blob[base + 3 * x : base + 3 * x + 3]
            out[dst + 3 * x] = r
            out[dst + 3 * x + 1] = g
            out[dst + 3 * x + 2] = b
    return {"width": width, "height": height, "channels": 3, "pixels": bytes(out)}


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> dict:
    """Decode a PNG via stdlib zlib (VERDICT r4 #3): 8-bit truecolor
    (color type 2, RGB) and truecolor+alpha (6, RGBA), non-interlaced.
    Chunk CRCs are verified; IDAT chunks are concatenated and inflated;
    every scanline is unfiltered per its leading filter byte
    (None/Sub/Up/Average/Paeth). Unsupported spec corners (palette,
    grayscale, 16-bit, Adam7) raise ImageDecodeError, not garbage."""
    import struct
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ImageDecodeError(f"not a PNG: magic {blob[:8]!r}")
    ihdr = None
    idat = bytearray()
    seen_iend = False
    pos = 8
    while pos + 8 <= len(blob):
        length = int.from_bytes(blob[pos : pos + 4], "big")
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        crc = blob[pos + 8 + length : pos + 12 + length]
        if len(data) < length or len(crc) < 4:
            raise ImageDecodeError(f"PNG chunk {ctype!r} truncated")
        if zlib.crc32(ctype + data) != int.from_bytes(crc, "big"):
            raise ImageDecodeError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise ImageDecodeError("PNG missing or malformed IHDR")
    if not seen_iend:
        raise ImageDecodeError("PNG missing IEND")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color not in (2, 6):
        raise ImageDecodeError(
            f"unsupported PNG: bit depth {depth}, color type {color} "
            "(supported: 8-bit RGB/RGBA)"
        )
    if comp != 0 or filt != 0:
        raise ImageDecodeError(
            f"nonstandard PNG compression/filter method {comp}/{filt}"
        )
    if interlace != 0:
        raise ImageDecodeError("Adam7-interlaced PNG not supported")
    if width <= 0 or height <= 0:
        raise ImageDecodeError(f"bad PNG dimensions {width}x{height}")
    ch = 3 if color == 2 else 4
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ImageDecodeError(f"PNG IDAT inflate failed: {exc}") from None
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ImageDecodeError(
            f"PNG raster size mismatch: {len(raw)} vs {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev = bytes(stride)  # conceptual zero row above the first
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ft == 0:
            pass
        elif ft == 1:  # Sub: left neighbor (same channel)
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average (floor of left+up mean)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ImageDecodeError(f"unknown PNG filter type {ft} at row {y}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return {"width": width, "height": height, "channels": ch, "pixels": bytes(out)}


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal PNG writer (test fixtures + the planted-media
    generator): 8-bit RGB/RGBA, single IDAT. Row y is forward-filtered
    with type y % 5, so any image taller than 4 rows forces a decoder
    through EVERY unfilter path — the planted-raster oracle query then
    value-checks all five, not just filter 0."""
    import struct
    import zlib

    if channels not in (3, 4) or len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size/channels mismatch")
    ch = channels
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:
            raw += bytes(
                (line[i] - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2 if ch == 3 else 6, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_ppm_p6(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal P6 writer (test fixtures + the planted-media generator)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def encode_bmp_24(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit BI_RGB bottom-up BMP writer (test fixtures)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    row_stride = (width * 3 + 3) & ~3
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[(y * width + x) * 3 : (y * width + x) * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (row_stride - len(row))
        raster += row
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return bytes(header) + bytes(raster)
