"""GIF pixel decode (kernels/image.decode_gif) — a hand-packed LZW
stream with known codes pins the bit-level contract; a test-side LZW
compressor (independent standard implementation) drives roundtrips,
interlace reorder, KwKwK, and palette handling."""

from __future__ import annotations

import struct

import pytest

from document_automation_spark.kernels.image import decode_gif, decode_pixels


def lzw_encode(mcs: int, indices: list) -> bytes:
    """Test-side GIF-LZW compressor (independent of the decoder)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    codes = [(clear, width)]
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
        else:
            codes.append((table[w], width))
            table[wk] = next_code
            next_code += 1
            # grow AFTER an entry needing the wider code exists (the
            # decoder lags one entry, so it grows one code later — the
            # standard pairing)
            if next_code > (1 << width) and width < 12:
                width += 1
            if next_code == 4096:
                codes.append((clear, width))
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                width = mcs + 1
            w = bytes([k])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def build_gif(w, h, palette, lzw_mcs, lzw_data, interlace=False, ext=b""):
    n = max(2, len(palette) // 3)
    size_field = max(1, (n - 1).bit_length()) - 1
    padded = palette + b"\x00" * ((2 << size_field) * 3 - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, 0, 0])
    out += padded
    out += ext
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([lzw_mcs])
    for i in range(0, len(lzw_data), 255):
        chunk = lzw_data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # R G B gray


class TestGifDecode:
    def test_hand_packed_bit_stream(self):
        """2x1 indices [0,1] at mcs=2, packed by hand: codes (LSB-first,
        3 bits each — the dictionary stays below the width-growth
        boundary) clear=4, 0, 1, end=5."""
        codes = [4, 0, 1, 5]
        acc = nbits = 0
        raw = bytearray()
        for c in codes:
            acc |= c << nbits
            nbits += 3
            while nbits >= 8:
                raw.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            raw.append(acc & 0xFF)
        data = build_gif(2, 1, PAL4, 2, bytes(raw))
        gw, gh, ch, px = decode_gif(data)
        assert (gw, gh, ch) == (2, 1, 3)
        assert bytes(px) == bytes([255, 0, 0, 0, 255, 0])

    def test_roundtrip_patterns(self):
        w, h = 13, 7
        indices = [(x * 3 + y * 5) % 4 for y in range(h) for x in range(w)]
        data = build_gif(w, h, PAL4, 2, lzw_encode(2, indices))
        gw, gh, ch, px = decode_gif(data)
        assert (gw, gh, ch) == (w, h, 3)
        for i, idx in enumerate(indices):
            assert bytes(px[i * 3 : i * 3 + 3]) == PAL4[idx * 3 : idx * 3 + 3]

    def test_kwkwk_case(self):
        """The classic LZW edge: a code referencing the entry being
        defined (cScSc pattern)."""
        indices = [1, 1, 1, 1, 1, 1, 1]
        data = build_gif(7, 1, PAL4, 2, lzw_encode(2, indices))
        _, _, _, px = decode_gif(data)
        assert bytes(px) == PAL4[3:6] * 7

    def test_interlaced_rows_reordered(self):
        w, h = 4, 8
        indices = [y % 4 for y in range(h) for _ in range(w)]  # row = y%4
        # compressor sees rows in INTERLACED transmission order
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        transmitted = [v for y in order for v in indices[y * w : (y + 1) * w]]
        data = build_gif(w, h, PAL4, 2, lzw_encode(2, transmitted), interlace=True)
        _, _, _, px = decode_gif(data)
        for y in range(h):
            row = bytes(px[y * w * 3 : (y + 1) * w * 3])
            assert row == PAL4[(y % 4) * 3 : (y % 4) * 3 + 3] * w

    def test_extensions_skipped(self):
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        comment = b"\x21\xfe\x05hello\x00"
        indices = [0, 3, 3, 0]
        data = build_gif(2, 2, PAL4, 2, lzw_encode(2, indices), ext=gce + comment)
        _, _, _, px = decode_gif(data)
        assert bytes(px[:3]) == PAL4[:3]
        assert bytes(px[3:6]) == PAL4[9:12]

    def test_dispatch_and_errors(self):
        data = build_gif(2, 2, PAL4, 2, lzw_encode(2, [0, 1, 2, 3]))
        assert decode_pixels(data)[:3] == (2, 2, 3)
        with pytest.raises(ValueError, match="truncated"):
            decode_gif(build_gif(4, 4, PAL4, 2, lzw_encode(2, [0, 1])))
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"NOPE")
        # palette index beyond the table
        bad = build_gif(2, 2, PAL4[:6], 2, lzw_encode(2, [0, 1, 3, 3]))
        with pytest.raises(ValueError, match="palette index"):
            decode_gif(bad)

    def test_width_growth_stress(self):
        """A large seeded pattern pushes the LZW dictionary through
        several code-width increases (3 → 9+ bits); byte-exact roundtrip
        proves encoder/decoder width pairing at every boundary."""
        import random

        rng = random.Random(7)
        w, h = 101, 83
        pal16 = bytes(v for i in range(16) for v in (i * 16, 255 - i * 16, i))
        indices = [rng.randrange(16) for _ in range(w * h)]
        data = build_gif(w, h, pal16, 4, lzw_encode(4, indices))
        gw, gh, ch, px = decode_gif(data)
        assert (gw, gh, ch) == (w, h, 3)
        for i in (0, 1, w * h // 2, w * h - 1):
            idx = indices[i]
            assert bytes(px[i * 3 : i * 3 + 3]) == pal16[idx * 3 : idx * 3 + 3]
        # full equality, not just spot checks
        expect = b"".join(pal16[i * 3 : i * 3 + 3] for i in indices)
        assert bytes(px) == expect

    def test_frame_placement_on_logical_screen(self):
        """A 1x1 first frame at offset (2,1) inside a 4x3 screen renders
        on a background-colored canvas — dims and pixels describe the
        same image."""
        frame = lzw_encode(2, [2])  # single blue pixel
        out = bytearray(b"GIF89a")
        out += struct.pack("<HH", 4, 3)
        out += bytes([0x81, 3, 0])  # GCT present, size 1 (4 colors); bg idx 3
        out += PAL4
        out += b"\x2c" + struct.pack("<HHHH", 2, 1, 1, 1) + b"\x00"
        out += bytes([2])
        for i in range(0, len(frame), 255):
            chunk = frame[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00\x3b"
        gw, gh, ch, px = decode_gif(bytes(out))
        assert (gw, gh, ch) == (4, 3, 3)
        grid = [bytes(px[i * 3 : i * 3 + 3]) for i in range(12)]
        blue, gray = PAL4[6:9], PAL4[9:12]
        assert grid[1 * 4 + 2] == blue  # the frame pixel at (2,1)
        assert all(c == gray for i, c in enumerate(grid) if i != 6)

    def test_gce_transparent_index_keeps_background(self):
        """ADVICE round-4: a GCE with the transparency flag set makes
        pixels carrying the transparent index composite as the BACKGROUND
        color (what a viewer shows), not their palette color."""
        # 2x2 frame: indices [0, 1, 1, 0]; GCE declares index 1 transparent
        gce = b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # packed bit0=1, tidx=1
        indices = [0, 1, 1, 0]
        data = bytearray(build_gif(2, 2, PAL4, 2, lzw_encode(2, indices), ext=gce))
        data[11] = 3  # background index = gray
        _, _, _, px = decode_gif(bytes(data))
        red, gray = PAL4[0:3], PAL4[9:12]
        grid = [bytes(px[i * 3 : i * 3 + 3]) for i in range(4)]
        assert grid == [red, gray, gray, red]

    def test_gce_without_transparency_flag_uses_palette(self):
        """Transparency bit clear → the declared index renders normally
        (the GCE's delay/disposal fields alone change nothing)."""
        gce = b"\x21\xf9\x04\x00\x0a\x00\x01\x00"  # bit0=0, tidx byte set
        indices = [0, 1, 1, 0]
        data = build_gif(2, 2, PAL4, 2, lzw_encode(2, indices), ext=gce)
        _, _, _, px = decode_gif(data)
        red, green = PAL4[0:3], PAL4[3:6]
        grid = [bytes(px[i * 3 : i * 3 + 3]) for i in range(4)]
        assert grid == [red, green, green, red]
