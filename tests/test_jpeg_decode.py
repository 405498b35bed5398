"""Baseline JPEG pixel decode (kernels/image.decode_jpeg) — verified
WITHOUT any reference codec in the container: entropy streams are
hand-assembled bit by bit from T.81 primitives with known DCT
coefficients, and expected pixels come from an INDEPENDENT numpy matrix
IDCT (different formulation from the kernel's separable loop)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from document_automation_spark.kernels.image import decode_jpeg, jpeg_dimensions

# --- tiny hand-rolled encoder-side primitives (test-only) -----------------

# DC table: categories 0..8 as 4-bit codes (canonical; all-ones free)
DC_BITS = bytes([0, 0, 0, 9] + [0] * 12)
DC_VALS = bytes(range(9))
# AC table: the run/size symbols the fixtures use (EOB, run-0 sizes 1-6,
# (1,1), (15,3), ZRL)
AC_SYMS = [0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x11, 0xF3, 0xF0]
AC_BITS = bytes([0, 0, 0, len(AC_SYMS)] + [0] * 12)
AC_VALS = bytes(AC_SYMS)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _codes(bits: bytes, values: bytes) -> dict:
    """Canonical Huffman code per symbol — independent mirror of C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


DC_CODES = _codes(DC_BITS, DC_VALS)
AC_CODES = _codes(AC_BITS, AC_VALS)


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def put_code(self, code: tuple) -> None:
        length, val = code
        self.put(val, length)

    def to_bytes(self) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(1)  # pad with 1s per T.81
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _category(v: int) -> tuple:
    """(SSSS, magnitude-bits) for a signed coefficient difference."""
    if v == 0:
        return 0, 0
    n = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def encode_block(w: BitWriter, dc_diff: int, ac: dict) -> None:
    """ac: {zigzag_index: value} with small run gaps (fixtures keep runs
    expressible by the tiny AC table)."""
    n, bits = _category(dc_diff)
    w.put_code(DC_CODES[n])
    w.put(bits, n)
    last = 0
    for k in sorted(ac):
        run = k - last - 1
        val = ac[k]
        n, bits = _category(val)
        sym = (run << 4) | n
        w.put_code(AC_CODES[sym])
        w.put(bits, n)
        last = k
    if last != 63:
        w.put_code(AC_CODES[0x00])  # EOB


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def build_jpeg(
    w: int,
    h: int,
    comps: list,
    entropy: bytes,
    quant: list,
    restart_interval: int = 0,
) -> bytes:
    """comps: [(id, h_samp, v_samp)], all on quant table 0 + huff pair 0."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(quant))
    out += _seg(0xC4, bytes([0x00]) + DC_BITS + DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + AC_BITS + AC_VALS)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def reference_idct(coeffs_natural: np.ndarray) -> np.ndarray:
    """Independent matrix IDCT: pixel = C^T @ F @ C with the DCT-II basis."""
    C = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8) * 1.0
            C[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    spatial = C.T @ coeffs_natural @ C
    return np.clip(np.round(spatial) + 128, 0, 255).astype(int)


FLAT_Q = [1] * 64  # identity quantization: coefficients pass through


class TestJpegGray:
    def test_dc_only_flat_block(self):
        """A single DC coefficient decodes to a flat block of
        DC/8 + 128 — the hand-computable base case."""
        w = BitWriter()
        encode_block(w, dc_diff=40, ac={})
        data = build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q)
        assert jpeg_dimensions(data) == (8, 8)
        gw, gh, ch, px = decode_jpeg(data)
        assert (gw, gh, ch) == (8, 8, 1)
        expected = round(40 * 0.125) + 128  # DC * 1/8 + level shift
        assert set(px) == {expected}

    def test_ac_coefficients_vs_independent_idct(self):
        """Blocks with DC + several ACs must match the numpy matrix IDCT
        exactly (different algorithm, same math)."""
        ac = {1: -30, 2: 17, 3: 9, 19: -5}  # zigzag positions
        w = BitWriter()
        encode_block(w, dc_diff=25, ac=ac)
        data = build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q)
        _, _, _, px = decode_jpeg(data)
        coeffs = np.zeros((8, 8))
        coeffs.flat[0] = 25
        for k, v in ac.items():
            coeffs.flat[ZIGZAG[k]] = v
        expected = reference_idct(coeffs)
        got = np.array(list(px)).reshape(8, 8)
        assert (got == expected).all()

    def test_quantization_scales_coefficients(self):
        q = [2] * 64
        w = BitWriter()
        encode_block(w, dc_diff=40, ac={})
        data = build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), q)
        _, _, _, px = decode_jpeg(data)
        assert set(px) == {round(40 * 2 * 0.125) + 128}

    def test_dc_prediction_chain_and_crop(self):
        """Two MCUs wide, 12px wide image (crop of the second block);
        second block's DC is a DIFFERENCE from the first."""
        w = BitWriter()
        encode_block(w, dc_diff=40, ac={})   # abs DC 40 → 133
        encode_block(w, dc_diff=-16, ac={})  # abs DC 24 → 131
        data = build_jpeg(12, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q)
        gw, gh, ch, px = decode_jpeg(data)
        assert (gw, gh) == (12, 8)
        img = np.array(list(px)).reshape(8, 12)
        assert set(img[:, :8].flat) == {133}
        assert set(img[:, 8:].flat) == {131}

    def test_restart_marker_resets_dc_prediction(self):
        w1 = BitWriter()
        encode_block(w1, dc_diff=40, ac={})
        w2 = BitWriter()
        encode_block(w2, dc_diff=40, ac={})  # ABSOLUTE again after RST0
        entropy = w1.to_bytes() + b"\xff\xd0" + w2.to_bytes()
        data = build_jpeg(16, 8, [(1, 1, 1)], entropy, FLAT_Q, restart_interval=1)
        _, _, _, px = decode_jpeg(data)
        assert set(px) == {round(40 * 0.125) + 128}  # both MCUs identical

    def test_zrl_long_zero_run(self):
        """A coefficient after a 16-zero ZRL run lands at the right
        zigzag position."""
        w = BitWriter()
        # DC 0; then ZRL (16 zeros) + (run 1, size 1) -> k = 0+16+1+1 = 18
        n, bits = _category(0)
        w.put_code(DC_CODES[n])
        w.put_code(AC_CODES[0xF0])       # ZRL
        w.put_code(AC_CODES[0x11])       # run 1, size 1
        w.put(1, 1)                      # value +1
        w.put_code(AC_CODES[0x00])       # EOB
        data = build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q)
        _, _, _, px = decode_jpeg(data)
        coeffs = np.zeros((8, 8))
        coeffs.flat[ZIGZAG[18]] = 1
        assert (np.array(list(px)).reshape(8, 8) == reference_idct(coeffs)).all()


class TestJpegColor:
    def test_444_color_neutral_chroma(self):
        """3 components 4:4:4, chroma at 128 (DC 0) → RGB == Y."""
        w = BitWriter()
        encode_block(w, dc_diff=40, ac={})  # Y → 133
        encode_block(w, dc_diff=0, ac={})   # Cb 128
        encode_block(w, dc_diff=0, ac={})   # Cr 128
        data = build_jpeg(8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], w.to_bytes(), FLAT_Q)
        gw, gh, ch, px = decode_jpeg(data)
        assert (gw, gh, ch) == (8, 8, 3)
        arr = np.array(list(px)).reshape(8, 8, 3)
        assert (arr == 133).all()

    def test_444_red_from_cr(self):
        """Cr above neutral pushes red: check against the exact BT.601
        integer math on one uniform block."""
        w = BitWriter()
        encode_block(w, dc_diff=0, ac={})    # Y 128
        encode_block(w, dc_diff=0, ac={})    # Cb 128
        encode_block(w, dc_diff=80, ac={})   # Cr = round(80/8)+128 = 138
        data = build_jpeg(8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], w.to_bytes(), FLAT_Q)
        _, _, _, px = decode_jpeg(data)
        y, cb, cr = 128, 128, 138
        exp_r = round(y + 1.402 * (cr - 128))
        exp_g = round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
        exp_b = round(y + 1.772 * (cb - 128))
        arr = np.array(list(px)).reshape(8, 8, 3)
        assert (arr[:, :, 0] == exp_r).all()
        assert (arr[:, :, 1] == exp_g).all()
        assert (arr[:, :, 2] == exp_b).all()

    def test_420_subsampling_quadrants(self):
        """16x16, Y at 2x2 sampling (4 blocks/MCU, distinct flat values),
        neutral chroma → grayscale quadrants survive the chroma upsample."""
        w = BitWriter()
        # Y blocks raster order within MCU: DC diffs chain
        encode_block(w, dc_diff=40, ac={})    # 133
        encode_block(w, dc_diff=40, ac={})    # 138  (cumulative 80)
        encode_block(w, dc_diff=-80, ac={})   # 128  (cumulative 0)
        encode_block(w, dc_diff=160, ac={})   # 148  (cumulative 160)
        encode_block(w, dc_diff=0, ac={})     # Cb neutral
        encode_block(w, dc_diff=0, ac={})     # Cr neutral
        data = build_jpeg(
            16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], w.to_bytes(), FLAT_Q
        )
        gw, gh, ch, px = decode_jpeg(data)
        assert (gw, gh, ch) == (16, 16, 3)
        arr = np.array(list(px)).reshape(16, 16, 3)
        assert (arr[:, :, 0] == arr[:, :, 1]).all() and (arr[:, :, 1] == arr[:, :, 2]).all()
        g = arr[:, :, 0]
        assert set(g[:8, :8].flat) == {133}
        assert set(g[:8, 8:].flat) == {138}
        assert set(g[8:, :8].flat) == {128}
        assert set(g[8:, 8:].flat) == {148}


class TestJpegErrors:
    def test_lossless_sof3_raises(self):
        """Progressive (SOF2) now decodes (tests/test_jpeg_progressive.py);
        the remaining honest scope cuts — lossless, arithmetic — still
        raise instead of misdecoding."""
        w = BitWriter()
        encode_block(w, dc_diff=0, ac={})
        data = bytearray(build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q))
        i = bytes(data).find(b"\xff\xc0")
        data[i + 1] = 0xC3  # SOF3 lossless
        with pytest.raises(ValueError, match="SOF0.*SOF2|baseline"):
            decode_jpeg(bytes(data))

    def test_missing_tables_raise(self):
        data = b"\xff\xd8" + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                                  + bytes([1, 1, 0x11, 0])) \
            + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + b"\xff\xd9"
        with pytest.raises(ValueError, match="Huffman"):
            decode_jpeg(data)


class TestDecodePixelsDispatch:
    def test_dispatch(self):
        from document_automation_spark.kernels.image import decode_pixels, encode_png

        png = encode_png(4, 3, 1, bytes(range(12)))
        assert decode_pixels(png) == (4, 3, 1, bytes(range(12)))
        w = BitWriter()
        encode_block(w, dc_diff=40, ac={})
        jpg = build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q)
        gw, gh, ch, px = decode_pixels(jpg)
        assert (gw, gh, ch) == (8, 8, 1)
        # GIF dispatches to decode_gif since round 4 (malformed body still
        # errors, but inside the GIF decoder); unknown formats reject here
        with pytest.raises(ValueError, match="GIF"):
            decode_pixels(b"GIF89a........")
        with pytest.raises(ValueError, match="PNG, baseline JPEG, and GIF"):
            decode_pixels(b"RIFF....WEBP....")


class TestJpegGuards:
    def test_zero_height_raises(self):
        w = BitWriter()
        encode_block(w, dc_diff=0, ac={})
        data = bytearray(build_jpeg(8, 8, [(1, 1, 1)], w.to_bytes(), FLAT_Q))
        i = bytes(data).find(b"\xff\xc0")
        data[i + 5 : i + 7] = struct.pack(">H", 0)  # frame height = 0
        with pytest.raises(ValueError, match="zero dimension"):
            decode_jpeg(bytes(data))

    def test_multi_scan_raises_instead_of_garbage(self):
        """A 3-component frame whose first SOS covers only one component
        must raise — decoding it as the whole image would silently emit
        zero chroma planes."""
        w = BitWriter()
        encode_block(w, dc_diff=0, ac={})
        out = bytearray(b"\xff\xd8")
        out += _seg(0xDB, bytes([0x00]) + bytes(FLAT_Q))
        out += _seg(0xC4, bytes([0x00]) + DC_BITS + DC_VALS)
        out += _seg(0xC4, bytes([0x10]) + AC_BITS + AC_VALS)
        sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3])
        for cid in (1, 2, 3):
            sof += bytes([cid, 0x11, 0])
        out += _seg(0xC0, sof)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # scan: comp 1 only
        out += w.to_bytes() + b"\xff\xd9"
        with pytest.raises(ValueError, match="multi-scan"):
            decode_jpeg(bytes(out))
