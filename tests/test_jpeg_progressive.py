"""Progressive JPEG decode (kernels/image._ProgressiveState) — verified
WITHOUT a reference codec: progressive scan streams are hand-assembled
from T.81 §G.2 primitives, and the decoded pixels must equal decoding a
BASELINE encoding of the same final coefficients (both paths share the
dequant/IDCT/assembly tail, and the baseline path is already pinned
against an independent numpy IDCT in test_jpeg_decode.py)."""

from __future__ import annotations

import struct

import pytest

from document_automation_spark.kernels.image import decode_jpeg

from tests.test_jpeg_decode import (
    DC_BITS,
    DC_CODES,
    DC_VALS,
    FLAT_Q,
    BitWriter,
    _category,
    _codes,
    _seg,
)

# FULL test AC table: every (run 0-15, size 1-6) pair plus EOB, ZRL and
# EOB-run symbols (r<<4|0, r=1..3), all at code length 8 (canonical,
# 107 symbols < 256 capacity, all-ones code left free)
ACP_SYMS = (
    [0x00, 0xF0, 0x10, 0x20, 0x30]
    + [(r << 4) | s for r in range(16) for s in range(1, 7)]
)
ACP_BITS = bytes([0, 0, 0, 0, 0, 0, 0, len(ACP_SYMS)] + [0] * 8)
ACP_VALS = bytes(ACP_SYMS)
ACP_CODES = _codes(ACP_BITS, ACP_VALS)


def encode_block(w: BitWriter, dc_diff: int, ac: dict) -> None:
    """Baseline block encoder over the FULL test AC table."""
    n, bits = _category(dc_diff)
    w.put_code(DC_CODES[n])
    w.put(bits, n)
    last = 0
    for k in sorted(ac):
        run = k - last - 1
        while run > 15:
            w.put_code(ACP_CODES[0xF0])
            run -= 16
        n, bits = _category(ac[k])
        w.put_code(ACP_CODES[(run << 4) | n])
        w.put(bits, n)
        last = k
    if last != 63:
        w.put_code(ACP_CODES[0x00])


def build_jpeg(w, h, comps, entropy, quant, restart_interval=0):
    """Baseline (SOF0) builder using the FULL test AC table."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(quant))
    out += _seg(0xC4, bytes([0x00]) + DC_BITS + DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + ACP_BITS + ACP_VALS)
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


def build_progressive(w, h, comps, quant, scans, restart_interval=0):
    """comps: [(id, h, v)]; scans: [(comp_ids, Ss, Se, Ah, Al, entropy)].
    All components use quant 0, DC table 0, AC table 0 (the progressive
    test table above)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(quant))
    out += _seg(0xC4, bytes([0x00]) + DC_BITS + DC_VALS)
    out += _seg(0xC4, bytes([0x10]) + ACP_BITS + ACP_VALS)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC2, sof)  # SOF2: progressive
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    for comp_ids, ss, se, ah, al, entropy in scans:
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# --- encoder-side scan primitives (test-only, mirrors of G.2) -------------

def enc_dc_first(dcs, al=0):
    """dcs: full DC coefficients in scan order; encodes (dc >> al) diffs."""
    w = BitWriter()
    pred = 0
    for dc in dcs:
        v = _shift(dc, al)
        n, bits = _category(v - pred)
        w.put_code(DC_CODES[n])
        w.put(bits, n)
        pred = v
    return w.to_bytes()


def enc_dc_refine(dcs, al):
    w = BitWriter()
    for dc in dcs:
        w.put((_shift(dc, 0) >> al) & 1, 1)
    return w.to_bytes()


def _shift(v, al):
    """T.81 point transform: sign * (|v| >> al)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def enc_ac_first(blocks, ss, se, al=0):
    """blocks: [{zigzag_index: full_value}] in block order; first AC scan
    of band [ss, se] at approximation al; plain EOB per block (no runs)."""
    w = BitWriter()
    for ac in blocks:
        band = {k: _shift(v, al) for k, v in ac.items() if ss <= k <= se}
        band = {k: v for k, v in band.items() if v != 0}
        last = ss - 1
        for k in sorted(band):
            run = k - last - 1
            while run > 15:
                w.put_code(ACP_CODES[0xF0])
                run -= 16
            n, bits = _category(band[k])
            w.put_code(ACP_CODES[(run << 4) | n])
            w.put(bits, n)
            last = k
        if last != se:
            w.put_code(ACP_CODES[0x00])  # EOB (run length 1)
    return w.to_bytes()


class TestSpectralSelection:
    def test_spectral_split_equals_baseline(self):
        """DC scan + two AC band scans reassemble the exact baseline
        image: 16x16 gray, 4 blocks with distinct coefficients."""
        blocks = [
            (90, {1: 12, 3: -7, 9: 5, 40: 3}),
            (-40, {2: 30, 17: -11}),
            (0, {}),
            (127, {1: -1, 63: 4}),
        ]
        # baseline reference
        wb = BitWriter()
        pred = 0
        for dc, ac in blocks:
            encode_block(wb, dc - pred, ac)
            pred = dc
        base = build_jpeg(16, 16, [(1, 1, 1)], wb.to_bytes(), FLAT_Q)
        want = decode_jpeg(base)

        dc_scan = enc_dc_first([b[0] for b in blocks])
        ac_lo = enc_ac_first([b[1] for b in blocks], 1, 5)
        ac_hi = enc_ac_first([b[1] for b in blocks], 6, 63)
        prog = build_progressive(
            16, 16, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 0, dc_scan),
             ([1], 1, 5, 0, 0, ac_lo),
             ([1], 6, 63, 0, 0, ac_hi)],
        )
        assert decode_jpeg(prog) == want

    def test_eob_run_spans_blocks(self):
        """EOBRUN: blocks 2-4 have an empty high band — encoded as ONE
        EOB-run of 3 (symbol 0x20 + no extra bits ≡ run 4? no: r=1 →
        (1<<1)+bit; use r=1 with bit=1 → run 3)."""
        blocks = [(10, {1: 3, 7: -2}), (20, {1: 5}), (30, {2: 1}), (40, {3: -1})]
        wb = BitWriter()
        pred = 0
        for dc, ac in blocks:
            encode_block(wb, dc - pred, ac)
            pred = dc
        want = decode_jpeg(build_jpeg(16, 16, [(1, 1, 1)], wb.to_bytes(), FLAT_Q))

        dc_scan = enc_dc_first([b[0] for b in blocks])
        lo = enc_ac_first([b[1] for b in blocks], 1, 5)
        # high band [6,63]: block 0 has 7:-2 then EOB; blocks 1-3 empty:
        # EOB-run r=1 → eobrun = 2 + extra bit(1) = 3
        w = BitWriter()
        n, bits = _category(-2)
        w.put_code(ACP_CODES[(1 << 4) | n])  # run 1 (index 6 skipped), size
        w.put(bits, n)
        w.put_code(ACP_CODES[0x00])  # EOB for block 0 (rest of band zero)
        w.put_code(ACP_CODES[0x10])  # r=1 EOB-run
        w.put(1, 1)  # extra bit → eobrun = 2 + 1 = 3
        prog = build_progressive(
            16, 16, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 0, dc_scan),
             ([1], 1, 5, 0, 0, lo),
             ([1], 6, 63, 0, 0, w.to_bytes())],
        )
        assert decode_jpeg(prog) == want


class TestSuccessiveApproximation:
    def test_dc_first_plus_refine(self):
        """DC at Al=1 then a refinement bit restores exact DC values."""
        dcs = [91, -41, 0, 126]  # LSBs 1,1,0,0 exercise both bit values
        wb = BitWriter()
        pred = 0
        for dc in dcs:
            encode_block(wb, dc - pred, {})
            pred = dc
        want = decode_jpeg(build_jpeg(16, 16, [(1, 1, 1)], wb.to_bytes(), FLAT_Q))

        first = enc_dc_first(dcs, al=1)
        refine = enc_dc_refine(dcs, al=0)
        empty_ac = enc_ac_first([{} for _ in dcs], 1, 63)
        prog = build_progressive(
            16, 16, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 1, first),
             ([1], 0, 0, 1, 0, refine),
             ([1], 1, 63, 0, 0, empty_ac)],
        )
        assert decode_jpeg(prog) == want

    def test_ac_refinement_hand_assembled(self):
        """AC band at Al=1 then a hand-assembled Ah=1→Al=0 refinement scan
        (correction bits for history-nonzero coefficients, insertion of a
        new ±1) reconstructs the exact coefficients.

        Single block, full coefficients: k1=3, k2=-3, k4=2, k6=1.
        At Al=1 the first scan sees 1, -1, 1, 0.
        The refine scan walks k=1..63:
          k1 nonzero → correction bit (3>>0)&1 = 1
          k2 nonzero → correction bit (|-3|)&1 = 1
          k3 zero-history: part of the run before the new coefficient
          k4 nonzero → correction bit (2)&1 = 0
          k5 zero-history (run continues)
          k6 NEW ±1: symbol (r=2, s=1), sign bit 1 (positive)
          then EOB (rest of band has no new nonzeros)
        """
        full = {1: 3, 2: -3, 4: 2, 6: 1}
        wb = BitWriter()
        encode_block(wb, 50, full)
        want = decode_jpeg(build_jpeg(8, 8, [(1, 1, 1)], wb.to_bytes(), FLAT_Q))

        dc_scan = enc_dc_first([50])
        ac1 = enc_ac_first([full], 1, 63, al=1)
        w = BitWriter()
        w.put_code(ACP_CODES[(2 << 4) | 1])  # r=2 zero-history, new size-1
        w.put(1, 1)  # sign: positive
        # correction bits ride AFTER the symbol, in coefficient order as
        # the decoder crosses k1, k2 (nonzero) then skips k3 (r 2→1),
        # crosses k4 (nonzero), skips k5 (r 1→0), inserts at k6:
        # bit order on the wire: corrections interleave inside the walk
        # — rebuild precisely: decoder reads huff FIRST, sign bit, then
        # walks k=1: nonzero → read bit (k1 correction=1); k=2: nonzero →
        # read bit (1); k=3: zero, r 2→1; k=4: nonzero → read bit (0);
        # k=5: zero, r 1→0; k=6: zero & r==0 → place new value.
        w.put(1, 1)  # k1 correction
        w.put(1, 1)  # k2 correction
        w.put(0, 1)  # k4 correction
        w.put_code(ACP_CODES[0x00])  # EOB: correction bits for the rest —
        # all remaining coefficients are zero-history → no bits follow
        prog = build_progressive(
            8, 8, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 0, dc_scan),
             ([1], 1, 63, 0, 1, ac1),
             ([1], 1, 63, 1, 0, w.to_bytes())],
        )
        assert decode_jpeg(prog) == want


class TestProgressiveColor:
    def test_420_color_interleaved_dc_noninterleaved_ac(self):
        """4:2:0 color: the DC scan interleaves all three components (MCU
        order), the AC scans walk each component's own effective block
        grid — decoded pixels equal the baseline 4:2:0 encoding of the
        same coefficients."""
        # 16x16 image: Y is 2x2 blocks, Cb/Cr 1 block each
        y_blocks = [(60, {1: 8}), (70, {2: -5}), (-30, {}), (15, {1: 1, 8: 2})]
        cb = (64, {1: 4})
        cr = (-64, {2: -6})

        # baseline reference: interleaved MCU = 4 Y + Cb + Cr
        wb = BitWriter()
        pred = {"y": 0, "cb": 0, "cr": 0}
        for dc, ac in y_blocks:
            encode_block(wb, dc - pred["y"], ac)
            pred["y"] = dc
        encode_block(wb, cb[0] - pred["cb"], cb[1])
        encode_block(wb, cr[0] - pred["cr"], cr[1])
        base = build_jpeg(
            16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], wb.to_bytes(), FLAT_Q
        )
        want = decode_jpeg(base)

        # progressive: interleaved DC scan in MCU order (4Y, Cb, Cr) —
        # per-component DC prediction
        w = BitWriter()
        pred = 0
        for dc, _ in y_blocks:
            n, bits = _category(dc - pred)
            w.put_code(DC_CODES[n])
            w.put(bits, n)
            pred = dc
        for dc in (cb[0], cr[0]):
            n, bits = _category(dc)
            w.put_code(DC_CODES[n])
            w.put(bits, n)
        dc_scan = w.to_bytes()
        ac_y = enc_ac_first([b[1] for b in y_blocks], 1, 63)
        ac_cb = enc_ac_first([cb[1]], 1, 63)
        ac_cr = enc_ac_first([cr[1]], 1, 63)
        prog = build_progressive(
            16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], FLAT_Q,
            [([1, 2, 3], 0, 0, 0, 0, dc_scan),
             ([1], 1, 63, 0, 0, ac_y),
             ([2], 1, 63, 0, 0, ac_cb),
             ([3], 1, 63, 0, 0, ac_cr)],
        )
        assert decode_jpeg(prog) == want

    def test_luma_only_on_progressive(self):
        blocks = [(80, {1: 6}), (90, {}), (100, {2: 2}), (110, {})]
        w = BitWriter()
        pred = 0
        for dc, _ in blocks:
            n, bits = _category(dc - pred)
            w.put_code(DC_CODES[n])
            w.put(bits, n)
            pred = dc
        for dc in (0, 0):
            n, bits = _category(dc)
            w.put_code(DC_CODES[n])
            w.put(bits, n)
        prog = build_progressive(
            16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], FLAT_Q,
            [([1, 2, 3], 0, 0, 0, 0, w.to_bytes()),
             ([1], 1, 63, 0, 0, enc_ac_first([b[1] for b in blocks], 1, 63)),
             ([2], 1, 63, 0, 0, enc_ac_first([{}], 1, 63)),
             ([3], 1, 63, 0, 0, enc_ac_first([{}], 1, 63))],
        )
        cw, ch, nc, px = decode_jpeg(prog, luma_only=True)
        assert (cw, ch, nc) == (16, 16, 1)
        full = decode_jpeg(prog)
        assert full[:3] == (16, 16, 3)


class TestProgressiveErrors:
    def test_multi_component_ac_scan_raises(self):
        prog = build_progressive(
            16, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], FLAT_Q,
            [([1, 2, 3], 0, 0, 0, 0, enc_dc_first([0, 0, 0, 0, 0, 0])),
             ([1, 2], 1, 63, 0, 0, b"\x00")],
        )
        with pytest.raises(ValueError, match="single-component"):
            decode_jpeg(prog)

    def test_extended_sequential_still_raises(self):
        """SOF1 (extended sequential) remains an honest scope cut."""
        data = bytearray(build_jpeg(8, 8, [(1, 1, 1)], b"\x00", FLAT_Q))
        idx = bytes(data).find(b"\xff\xc0")
        data[idx + 1] = 0xC1
        with pytest.raises(ValueError, match="SOF0.*SOF2|baseline.*progressive"):
            decode_jpeg(bytes(data))

    def test_truncated_progressive_raises(self):
        blocks = [(10, {})]
        prog = build_progressive(
            8, 8, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 0, enc_dc_first([10]))],
        )
        with pytest.raises(ValueError):
            decode_jpeg(prog[:-2] )  # chop EOI: truncated after scan


class TestProgressiveRestart:
    def test_dc_scan_restart_resets_prediction(self):
        """RST markers between MCUs of a progressive DC scan reset the
        DC predictor (and are skipped by the entropy reader)."""
        dcs = [100, 101, 102, 103]
        # encode with restart_interval=2: predictor resets after 2 MCUs
        w = BitWriter()
        pred = 0
        parts = []
        for i, dc in enumerate(dcs):
            if i == 2:
                parts.append(w.to_bytes() + b"\xff\xd0")  # RST0
                w = BitWriter()
                pred = 0
            n, bits = _category(dc - pred)
            w.put_code(DC_CODES[n])
            w.put(bits, n)
            pred = dc
        parts.append(w.to_bytes())
        dc_scan = b"".join(parts)

        wb = BitWriter()
        pred = 0
        for dc in dcs:
            encode_block(wb, dc - pred, {})
            pred = dc
        want = decode_jpeg(build_jpeg(16, 16, [(1, 1, 1)], wb.to_bytes(), FLAT_Q))

        # DRI applies to every scan: the AC scan needs its own RST
        # after 2 of its (single-block) units, with EOBRUN reset
        ac_scan = (
            enc_ac_first([{}, {}], 1, 63)
            + b"\xff\xd1"
            + enc_ac_first([{}, {}], 1, 63)
        )
        prog = build_progressive(
            16, 16, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 0, dc_scan),
             ([1], 1, 63, 0, 0, ac_scan)],
            restart_interval=2,
        )
        assert decode_jpeg(prog) == want


class TestDispatch:
    def test_decode_pixels_handles_progressive(self):
        from document_automation_spark.kernels.image import decode_pixels

        prog = build_progressive(
            8, 8, [(1, 1, 1)], FLAT_Q,
            [([1], 0, 0, 0, 0, enc_dc_first([64])),
             ([1], 1, 63, 0, 0, enc_ac_first([{}], 1, 63))],
        )
        w, h, c, px = decode_pixels(prog)
        assert (w, h, c) == (8, 8, 1)
        assert set(px) == {136}  # DC 64 → 64/8 + 128 level shift
