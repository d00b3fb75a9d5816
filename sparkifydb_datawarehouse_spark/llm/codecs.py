"""Pure-Python image codecs for UNCOMPRESSED formats (PPM, BMP).

The container ships no image libraries, but uncompressed formats need
none: PPM (netpbm P6/P3) and 24-bit BI_RGB BMP are plain headers over
raw pixel bytes. These decoders make the multimodal DECODE step real —
`multimodal.decode_image` dispatches here by magic bytes and keeps its
NotImplementedError gate only for genuinely compressed formats
(JPEG/PNG/...), which require a real codec library (PIL/libvips).

Both decoders return the same normalized dict:
    {"width": int, "height": int, "channels": int,
     "pixels": bytes}   # RGB row-major, top-down, interleaved

Format references are public specifications: netpbm ppm(5) man page
and the Windows BITMAPINFOHEADER layout.
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
