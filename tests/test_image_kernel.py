"""Stdlib image kernel (kernels/image.py): PNG encode/decode roundtrips
across every filter type, JPEG/GIF header dims, grayscale math."""

from __future__ import annotations

import struct
import zlib

import pytest

from document_automation_spark.kernels.image import (
    decode_png,
    encode_png,
    gif_dimensions,
    grayscale,
    image_dimensions,
    jpeg_dimensions,
    png_dimensions,
)


def _pix(w: int, h: int, c: int) -> bytes:
    # deterministic non-trivial pattern exercising all filter predictors
    return bytes(((x * 7 + y * 13 + ch * 29) % 256)
                 for y in range(h) for x in range(w) for ch in range(c))


class TestPngRoundtrip:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_roundtrip_every_filter(self, filter_type, channels):
        w, h = 13, 9
        pixels = _pix(w, h, channels)
        data = encode_png(w, h, channels, pixels, filter_type=filter_type)
        assert png_dimensions(data) == (w, h)
        dw, dh, dc, dpx = decode_png(data)
        assert (dw, dh, dc) == (w, h, channels)
        assert dpx == pixels  # byte-exact through filter + zlib

    def test_palette_png(self):
        # hand-build a 2x2 palette image: indices 0..3 -> distinct colors
        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(name, body):
            return (struct.pack(">I", len(body)) + name + body
                    + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
        raw = bytes([0, 0, 1, 0, 2, 3])  # 2 scanlines, filter 0
        data = (sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        w, h, c, px = decode_png(data)
        assert (w, h, c) == (2, 2, 3)
        assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])

    def test_malformed_pngs_raise(self):
        with pytest.raises(ValueError, match="signature"):
            png_dimensions(b"\x89PNGxxxx")
        good = encode_png(4, 4, 1, _pix(4, 4, 1))
        with pytest.raises(ValueError, match="truncated"):
            decode_png(good[:-20])  # cut into the IDAT body itself
        # interlaced flag rejected honestly, not silently misdecoded
        interlaced = bytearray(good)
        interlaced[28] = 1
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(bytes(interlaced))

    def test_truncated_idat_raises(self):
        w, h = 6, 6
        data = encode_png(w, h, 3, _pix(w, h, 3))
        # re-build with IDAT holding too little inflated data
        sig = data[:8]

        def chunk(name, body):
            return (struct.pack(">I", len(body)) + name + body
                    + struct.pack(">I", zlib.crc32(name + body) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        bad = (sig + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="truncated PNG pixel"):
            decode_png(bad)


class TestJpegGifDims:
    def _jpeg(self, w, h, sof=0xC0, prefix_segments=b""):
        return (b"\xff\xd8" + prefix_segments
                + bytes([0xFF, sof]) + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", h, w) + b"\x01\x11\x00")

    def test_baseline_and_progressive(self):
        assert jpeg_dimensions(self._jpeg(800, 600)) == (800, 600)
        assert jpeg_dimensions(self._jpeg(31, 17, sof=0xC2)) == (31, 17)

    def test_skips_app_and_quant_segments(self):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
        data = self._jpeg(1920, 1080, prefix_segments=app0 + dqt)
        assert jpeg_dimensions(data) == (1920, 1080)

    def test_dht_c4_not_mistaken_for_sof(self):
        # DHT (0xC4) looks adjacent to the SOF range; must be skipped
        dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x11\x22"
        data = self._jpeg(44, 33, prefix_segments=dht)
        assert jpeg_dimensions(data) == (44, 33)

    def test_no_sof_raises(self):
        with pytest.raises(ValueError, match="no SOF"):
            jpeg_dimensions(b"\xff\xd8\xff\xd9")

    def test_gif(self):
        assert gif_dimensions(b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00") == (320, 200)
        assert gif_dimensions(b"GIF87a" + struct.pack("<HH", 1, 1) + b"\x00\x00\x00") == (1, 1)
        with pytest.raises(ValueError):
            gif_dimensions(b"GIF8")

    def test_dispatch(self):
        assert image_dimensions(self._jpeg(10, 20)) == (10, 20)
        with pytest.raises(ValueError, match="unsupported"):
            image_dimensions(b"RIFF....WEBP")


class TestGrayscale:
    def test_identity_on_gray(self):
        assert grayscale(3, 1, 1, bytes([0, 128, 255])) == [0, 128, 255]

    def test_luma_weights(self):
        # ITU-R 601 integer luma: (299R + 587G + 114B) // 1000
        assert grayscale(1, 1, 3, bytes([255, 0, 0])) == [(299 * 255) // 1000]
        assert grayscale(1, 1, 3, bytes([0, 255, 0])) == [(587 * 255) // 1000]
        assert grayscale(1, 1, 3, bytes([10, 20, 30])) == [
            (299 * 10 + 587 * 20 + 114 * 30) // 1000
        ]
