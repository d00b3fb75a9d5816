"""Pure-Python QOI ("Quite OK Image", qoiformat.org — public one-page
spec) codec: complete encoder + decoder, round 11.

QOI is the modern lossless interchange format a training-data lake
actually meets in the wild next to PNG (games/tooling exports): a
14-byte header (magic ``qoif``, width/height u32 BE, channels 3|4,
colorspace) followed by a single pass of six chunk kinds over
row-major pixels with wrapping (mod-256) channel arithmetic:

  QOI_OP_RGB   0xFE r g b         (alpha = previous pixel's)
  QOI_OP_RGBA  0xFF r g b a
  QOI_OP_INDEX 0b00iiiiii         64-slot running array, slot
                                  (3r+5g+7b+11a) % 64
  QOI_OP_DIFF  0b01_dr_dg_db      2-bit channel deltas, bias 2
  QOI_OP_LUMA  0b10_dddddd + byte 6-bit dg bias 32; dr−dg / db−dg
                                  4-bit bias 8 in the second byte
  QOI_OP_RUN   0b11_rrrrrr        run of previous pixel, bias −1,
                                  lengths 1..62 (63/64 collide with
                                  the RGB/RGBA tags)

ending with the 8-byte marker 00×7 01. Unlike the VP8/JPEG-arith
family there are NO empirically-tuned tables — the whole format is
normative — so this decoder is interop-complete for any conforming
third-party stream, and the encoder/decoder pair is additionally
pinned by full-raster roundtrips that force every chunk kind
(tests/test_codecs_qoi.py). The reference repo (/root/reference) has
no image codecs; this extends the mandated multimodal surface
(SURVEY.md §2 B1) like codecs.py / codecs_vp8l.py.
"""

from __future__ import annotations

import struct

from .codecs import ImageDecodeError

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode a row-major RGB/RGBA raster into a QOI stream using the
    spec's greedy strategy (run → index → diff/luma when alpha is
    unchanged → rgb → rgba)."""
    if channels not in (3, 4):
        raise ValueError("QOI supports 3 or 4 channels")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    out = bytearray(_MAGIC)
    out += struct.pack(">IIBB", width, height, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    n = width * height
    for i in range(n):
        off = i * channels
        r, g, b = pixels[off], pixels[off + 1], pixels[off + 2]
        a = pixels[off + 3] if channels == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0b1100_0000 | (run - 1))
                run = 0
        else:
            if run:
                out.append(0b1100_0000 | (run - 1))
                run = 0
            h = _hash(r, g, b, a)
            if index[h] == (r, g, b, a):
                out.append(h)
            elif a == pa:
                dr = (r - pr) & 0xFF
                dg = (g - pg) & 0xFF
                db = (b - pb) & 0xFF
                # signed views of the wrapping deltas
                sdr = dr - 256 if dr > 127 else dr
                sdg = dg - 256 if dg > 127 else dg
                sdb = db - 256 if db > 127 else db
                if -2 <= sdr <= 1 and -2 <= sdg <= 1 and -2 <= sdb <= 1:
                    out.append(
                        0b0100_0000 | ((sdr + 2) << 4) | ((sdg + 2) << 2) | (sdb + 2)
                    )
                elif (
                    -32 <= sdg <= 31
                    and -8 <= sdr - sdg <= 7
                    and -8 <= sdb - sdg <= 7
                ):
                    out.append(0b1000_0000 | (sdg + 32))
                    out.append(((sdr - sdg + 8) << 4) | (sdb - sdg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
            index[h] = (r, g, b, a)
            pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0b1100_0000 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(blob: bytes) -> dict:
    """Decode a QOI stream → {width, height, channels, pixels
    (row-major RGB or RGBA bytes)}. Interop-complete: the format has
    no implementation-defined tables (module docstring)."""
    if len(blob) < 14 + len(_END) or blob[:4] != _MAGIC:
        raise ImageDecodeError("not a QOI stream (bad magic or truncated)")
    width, height, channels, colorspace = struct.unpack(">IIBB", blob[4:14])
    if channels not in (3, 4):
        raise ImageDecodeError(f"bad QOI channels {channels}")
    if colorspace not in (0, 1):
        raise ImageDecodeError(f"bad QOI colorspace {colorspace}")
    if width == 0 or height == 0 or width * height > 64_000_000:
        raise ImageDecodeError("bad QOI dimensions")
    if blob[-len(_END):] != _END:
        raise ImageDecodeError("missing QOI end marker")
    data = blob[14 : -len(_END)]
    n = width * height
    out = bytearray(n * channels)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 0
    i = 0
    dlen = len(data)
    while i < n:
        if pos >= dlen:
            raise ImageDecodeError("QOI stream ended before raster was full")
        b1 = data[pos]
        pos += 1
        if b1 == 0xFE:  # QOI_OP_RGB
            if pos + 3 > dlen:  # ADVICE r11 #3: refuse loudly, not IndexError
                raise ImageDecodeError("QOI chunk truncated")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif b1 == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > dlen:
                raise ImageDecodeError("QOI chunk truncated")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = b1 >> 6
            if tag == 0b00:  # QOI_OP_INDEX
                r, g, b, a = index[b1 & 0x3F]
            elif tag == 0b01:  # QOI_OP_DIFF
                r = (r + ((b1 >> 4) & 3) - 2) & 0xFF
                g = (g + ((b1 >> 2) & 3) - 2) & 0xFF
                b = (b + (b1 & 3) - 2) & 0xFF
            elif tag == 0b10:  # QOI_OP_LUMA
                if pos + 1 > dlen:
                    raise ImageDecodeError("QOI chunk truncated")
                b2 = data[pos]
                pos += 1
                dg = (b1 & 0x3F) - 32
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0xF) - 8) & 0xFF
            else:  # QOI_OP_RUN
                run = (b1 & 0x3F) + 1
                if i + run > n:
                    raise ImageDecodeError("QOI run overflows the raster")
                px = bytes((r, g, b, a))[:channels]
                out[i * channels : (i + run) * channels] = px * run
                i += run
                continue
        off = i * channels
        out[off] = r
        out[off + 1] = g
        out[off + 2] = b
        if channels == 4:
            out[off + 3] = a
        index[_hash(r, g, b, a)] = (r, g, b, a)
        i += 1
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }
