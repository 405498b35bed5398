"""Stdlib-only image decode: PNG (dims + full pixel decode), JPEG (dims),
GIF (dims).  No PIL/cv2 in this container — but PNG is just zlib (stdlib)
plus five per-scanline filters, and JPEG/GIF dimensions are plain header
fields, so the multimodal pipeline's decode leg (operators/multimodal.py)
is REAL for these formats; the ``NotImplementedError`` seam remains only
for payloads that genuinely need a codec (JPEG pixels, video frames).

Reference parity: the reference decodes with PIL and feeds (grayscale,
crop, binarize) OCR preprocessing (/root/reference/src/utils.py:41-50);
here the pixel source for PNG is this kernel and the preprocessing math
lives in operators/multimodal (crop_box / resize_spec).

Pure-python per-byte unfiltering is the honest trade at test scale; a
production pixel path would swap ``_unfilter`` for a vectorized numpy
implementation behind the same function signature (the Paeth/Sub/Up/
Average recurrences vectorize per scanline).
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (bit depth 8 supported)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_dimensions(data: bytes) -> Tuple[int, int]:
    """(width, height) from the IHDR chunk (always first, by spec)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    if len(data) < 24 or data[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h = struct.unpack(">II", data[16:24])
    if w == 0 or h == 0:
        raise ValueError("PNG zero dimension")
    return w, h


def _png_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse the five PNG scanline filters → packed pixel bytes."""
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev = base - stride
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[base + i - channels] if i >= channels else 0
                out[base + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev + i] if y > 0 else 0
                out[base + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[base + i - channels] if i >= channels else 0
                up = out[prev + i] if y > 0 else 0
                out[base + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[base + i - channels] if i >= channels else 0
                up = out[prev + i] if y > 0 else 0
                ul = out[prev + i - channels] if (y > 0 and i >= channels) else 0
                out[base + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> Tuple[int, int, int, bytes]:
    """Full PNG decode → (width, height, channels, pixel_bytes).

    Supports bit depth 8, color types 0/2/3/4/6, no interlace (Adam7
    raises — it is rare in web images and a scope cut, not a stub).
    Palette images resolve through PLTE to RGB."""
    w, h = png_dimensions(data)
    depth, ctype, _comp, _filt, interlace = data[24:29]
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    channels = _PNG_CHANNELS[ctype]
    idat = bytearray()
    palette = b""
    for name, body in _png_chunks(data):
        if name == b"IDAT":
            idat.extend(body)
        elif name == b"PLTE":
            palette = body
    if not idat:
        raise ValueError("PNG has no IDAT")
    raw = zlib.decompress(bytes(idat))
    pixels = _unfilter(raw, w, h, channels)
    if ctype == 3:  # palette → RGB
        if not palette:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(w * h * 3)
        for i, idx in enumerate(pixels):
            off = idx * 3
            if off + 3 > len(palette):
                raise ValueError("palette index out of range")
            rgb[i * 3 : i * 3 + 3] = palette[off : off + 3]
        return w, h, 3, bytes(rgb)
    return w, h, channels, bytes(pixels)


# JPEG SOF markers that carry frame dimensions (baseline, extended,
# progressive, lossless, differential & arithmetic variants); NOT SOF4/8/C
# lookalikes DHT(C4)/JPG(C8)/DAC(CC)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF
}


def jpeg_dimensions(data: bytes) -> Tuple[int, int]:
    """(width, height) from the first SOFn frame header."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers, no length field
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                raise ValueError("truncated JPEG SOF")
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            if w == 0 or h == 0:
                raise ValueError("JPEG zero dimension")
            return w, h
        if marker == 0xDA:  # SOS: entropy data follows; SOF must precede
            break
        pos += 2 + seglen
    raise ValueError("JPEG has no SOF header")


def gif_dimensions(data: bytes) -> Tuple[int, int]:
    """(width, height) from the GIF logical screen descriptor."""
    if data[:4] != b"GIF8" or len(data) < 10:
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        raise ValueError("GIF zero dimension")
    return w, h


def image_dimensions(data: bytes) -> Tuple[int, int]:
    """Dispatch on magic bytes → (width, height).  Raises ValueError for
    formats without a stdlib-parsable header."""
    if data[:4] == b"\x89PNG":  # PNG intent; truncated magic raises inside
        return png_dimensions(data)
    if data[:3] == b"\xff\xd8\xff":
        return jpeg_dimensions(data)
    if data[:4] == b"GIF8":
        return gif_dimensions(data)
    raise ValueError("unsupported image format for header decode")


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, filter_type: int = 0
) -> bytes:
    """Minimal PNG writer (the test-fixture half of :func:`decode_png`):
    8-bit gray/RGB/RGBA, one filter type for every scanline."""
    ctype = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels

    def chunk(name: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + name
            + body
            + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF)
        )

    # apply the requested filter so decode exercises the reverse path
    filtered = bytearray()
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        filtered.append(filter_type)
        if filter_type == 0:
            filtered.extend(line)
        elif filter_type == 1:  # Sub
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                filtered.append((line[i] - left) & 0xFF)
        elif filter_type == 2:  # Up
            prev = pixels[(y - 1) * stride : y * stride] if y > 0 else b"\x00" * stride
            for i in range(stride):
                filtered.append((line[i] - prev[i]) & 0xFF)
        elif filter_type == 3:  # Average
            prev = pixels[(y - 1) * stride : y * stride] if y > 0 else b"\x00" * stride
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                filtered.append((line[i] - ((left + prev[i]) >> 1)) & 0xFF)
        elif filter_type == 4:  # Paeth
            prev = pixels[(y - 1) * stride : y * stride] if y > 0 else b"\x00" * stride
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = prev[i]
                ul = prev[i - channels] if (y > 0 and i >= channels) else 0
                filtered.append((line[i] - _paeth(left, up, ul)) & 0xFF)
        else:
            raise ValueError(f"encode filter {filter_type} not supported")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def grayscale(width: int, height: int, channels: int, pixels: bytes) -> List[int]:
    """Integer-luma grayscale (the reference's cv2.cvtColor BGR2GRAY leg,
    /root/reference/src/utils.py:43, with ITU-R 601 weights in integer
    arithmetic for cross-platform determinism)."""
    if channels == 1:
        return list(pixels)
    out = []
    for i in range(0, width * height * channels, channels):
        r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
        out.append((299 * r + 587 * g + 114 * b) // 1000)
    return out
