"""Progressive (SOF2) JPEG ENCODER — the test harness for the
progressive decode path in operators/jpeg.py.

Progressive JPEG reorders the SAME quantized DCT coefficients a
baseline file carries into multiple scans (spectral selection splits
the zigzag spectrum into bands; successive approximation delivers each
band a bit layer at a time).  Because the entropy layer is lossless,
`parse_jpeg(encode_progressive_jpeg(img))` must equal
`parse_jpeg(encode_baseline_jpeg(img))` pixel-for-pixel for the same
quant tables — tests/test_jpeg_progressive.py pins exactly that on
arbitrary content, which exercises every scan kind: interleaved DC
first + refinement, per-component AC first scans with EOBn run
lengths, ZRL-in-refinement, AC refinement correction bits, and
restart markers inside progressive scans.

The scan script mirrors the shape real encoders emit (libjpeg's
default progression): DC first (Al=1) -> per-component AC 1..5 and
6..63 first scans (Al=1) -> DC refinement -> per-component AC
refinements (Ah=1, Al=0).

Reference analogue: the PIL/pdf2image raster side of
/root/reference/pdfextraction.py:16,72-73 — web-crawled JPEGs are
very often progressive, so a decode path that only handles SOF0
would reject a large share of real inputs.
"""

from __future__ import annotations

import numpy as np

from pdf_extraction_spark.operators.jpeg import (
    ZIGZAG,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    _BitWriter,
    _dht_segment,
    _magnitude_size,
    _prepare_planes,
    _quantize_plane,
    build_huffman_codes,
)

# One flat Huffman table for progressive AC scans.  The Annex-K
# baseline AC tables lack the EOBn symbols (r, 0) for r = 1..14 that
# progressive first scans emit, so real encoders ship custom tables;
# this one assigns every symbol progressive AC coding can produce —
# (r << 4) | s for r 0..15, s 0..10 — a flat 8-bit code each (176
# codes; the canonical all-ones 8-bit word stays unused, as T.81
# requires).  Deliberately suboptimal but valid: the decoder must not
# care about code-length choices.
AC_PROG_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_PROG_VALS), 0, 0, 0, 0, 0, 0, 0, 0]

DEFAULT_SCRIPT = (
    # (component indices, Ss, Se, Ah, Al)
    ("all", 0, 0, 0, 1),  # DC first, interleaved
    (0, 1, 5, 0, 1),
    (0, 6, 63, 0, 1),
    (1, 1, 63, 0, 1),
    (2, 1, 63, 0, 1),
    ("all", 0, 0, 1, 0),  # DC refinement
    (0, 1, 5, 1, 0),
    (0, 6, 63, 1, 0),
    (1, 1, 63, 1, 0),
    (2, 1, 63, 1, 0),
)

DEFAULT_SCRIPT_GRAY = (
    ("all", 0, 0, 0, 1),
    (0, 1, 63, 0, 1),
    ("all", 0, 0, 1, 0),
    (0, 1, 63, 1, 0),
)


class _ScanState:
    """Per-scan encoder state: bit writer plus the EOB-run machinery
    AC scans share (first scans buffer only the run count; refinement
    scans also buffer the correction bits owed for blocks inside the
    run — T.81 G.1.2.2/G.1.2.3)."""

    def __init__(self, ac_codes):
        self.w = _BitWriter()
        self.ac = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[(nbits << 4) | 0]
            self.w.put(code, ln)
            if nbits:
                self.w.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        if self.pending_bits:
            for b in self.pending_bits:
                self.w.put(b, 1)
            self.pending_bits = []


def _encode_dc_first(state, dc_shifted, pred, dc_codes):
    diff = dc_shifted - pred
    size = _magnitude_size(diff)
    if size > 11:
        raise ValueError("DC difference out of range")
    code, ln = dc_codes[size]
    state.w.put(code, ln)
    if size:
        state.w.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    return dc_shifted


def _encode_ac_first(state, row, ss, se, al):
    """AC first scan for one block (T.81 G.1.2.2): values are the
    point-transformed magnitudes |coef| >> Al with sign reapplied."""
    r = 0
    for k in range(ss, se + 1):
        coef = row[ZIGZAG[k]]
        v = abs(coef) >> al
        if v == 0:
            r += 1
            continue
        state.flush_eobrun()
        while r > 15:
            code, ln = state.ac[0xF0]
            state.w.put(code, ln)
            r -= 16
        s = _magnitude_size(v)
        if s > 10:
            raise ValueError("AC coefficient out of range")
        code, ln = state.ac[(r << 4) | s]
        state.w.put(code, ln)
        sv = v if coef > 0 else -v
        state.w.put(sv if sv > 0 else sv + (1 << s) - 1, s)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def _encode_ac_refine(state, row, ss, se, al):
    """AC refinement for one block (T.81 G.1.2.3): newly-significant
    coefficients (|coef| >> Al == 1) are run-length coded over
    zero-HISTORY positions; already-nonzero ones contribute one
    correction bit each, emitted in stream order."""
    absv = [abs(int(row[ZIGZAG[k]])) >> al for k in range(ss, se + 1)]
    eob_i = -1  # band-relative index of the last newly-significant coef
    for i, v in enumerate(absv):
        if v == 1:
            eob_i = i
    r = 0
    br: list[int] = []
    for i, v in enumerate(absv):
        if v == 0:
            r += 1
            continue
        # emit pending ZRLs as soon as 16 zero-history slots accumulate
        # (checked at EVERY nonzero coefficient, history included, so the
        # buffered correction bits flush in the same positional windows
        # the decoder reads them in) — but never past the last
        # newly-significant coefficient, where zeros fold into the EOB run
        while r > 15 and i <= eob_i:
            state.flush_eobrun()
            code, ln = state.ac[0xF0]
            state.w.put(code, ln)
            r -= 16
            for b in br:
                state.w.put(b, 1)
            br = []
        if v > 1:  # history coefficient: one correction bit
            br.append(v & 1)
            continue
        # newly significant
        state.flush_eobrun()
        code, ln = state.ac[(r << 4) | 1]
        state.w.put(code, ln)
        state.w.put(1 if row[ZIGZAG[ss + i]] > 0 else 0, 1)
        for b in br:
            state.w.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state.eobrun += 1
        state.pending_bits.extend(br)
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def encode_progressive_jpeg(
    img: np.ndarray,
    *,
    luma_q: np.ndarray | None = None,
    chroma_q: np.ndarray | None = None,
    restart_interval: int = 0,
    extra_segments: bytes = b"",
    scan_script=None,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as a
    progressive (SOF2) JFIF JPEG carrying exactly the same quantized
    coefficients as encode_baseline_jpeg with the same tables — colour
    images use 4:2:0 subsampling, grayscale a single component."""
    # identical pixel pipeline to the baseline encoder, by construction
    gray, h, w, mcux, mcuy, planes, lq, cq = _prepare_planes(img, luma_q, chroma_q)
    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    # quantized zigzag-natural rows per component, raster block order
    comp_rows = []
    comp_geom = []  # (bw, nbx, nby, hs, vs)
    for plane, qt, hs, vs in planes:
        rows, _ = _quantize_plane(plane, qt)
        # rows are zigzag-ordered; re-natural them once for band math
        nat = np.zeros((len(rows), 64), np.int64)
        zzi = np.array(ZIGZAG)
        nat[:, zzi] = np.asarray(rows, np.int64)
        comp_rows.append(nat)
        bw = plane.shape[1] // 8
        compw = (w * hs + hmax - 1) // hmax
        comph = (h * vs + vmax - 1) // vmax
        comp_geom.append((bw, (compw + 7) // 8, (comph + 7) // 8, hs, vs))

    dc_l = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_p = build_huffman_codes(AC_PROG_BITS, AC_PROG_VALS)
    dc_tabs = [dc_l] + [dc_c] * 2

    if scan_script is None:
        scan_script = DEFAULT_SCRIPT_GRAY if gray else DEFAULT_SCRIPT

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += extra_segments
    zz_l = bytes(int(lq.reshape(64)[ZIGZAG[k]]) for k in range(64))
    out += seg(0xDB, b"\x00" + zz_l)
    if not gray:
        zz_c = bytes(int(cq.reshape(64)[ZIGZAG[k]]) for k in range(64))
        out += seg(0xDB, b"\x01" + zz_c)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    sof += bytes([1, 0x11, 0]) if gray else bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_PROG_BITS, AC_PROG_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        # chroma AC scans reference table 1; same flat table works
        out += _dht_segment(1, 1, AC_PROG_BITS, AC_PROG_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    for which, ss, se, ah, al in scan_script:
        if gray and which not in ("all", 0):
            continue
        comps = list(range(ncomp)) if which == "all" else [which]
        state = _ScanState(ac_p)
        sos = bytes([len(comps)])
        for ci in comps:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)

        preds = [0] * ncomp
        unit = 0
        rst_idx = 0

        def boundary():
            nonlocal rst_idx, preds
            state.flush_eobrun()
            state.w.align_ones()
            state.w.out += bytes([0xFF, 0xD0 + rst_idx])
            rst_idx = (rst_idx + 1) & 7
            preds = [0] * ncomp

        if ss == 0:  # DC scan
            interleaved = len(comps) > 1
            units = (
                [(my, mx) for my in range(mcuy) for mx in range(mcux)]
                if interleaved
                else [
                    (by, bx)
                    for by in range(comp_geom[comps[0]][2])
                    for bx in range(comp_geom[comps[0]][1])
                ]
            )
            for uy, ux in units:
                if restart_interval and unit and unit % restart_interval == 0:
                    boundary()
                for ci in comps:
                    bw, nbx, nby, hs, vs = comp_geom[ci]
                    idxs = (
                        [(uy * vs + by) * bw + (ux * hs + bx)
                         for by in range(vs) for bx in range(hs)]
                        if interleaved
                        else [uy * bw + ux]
                    )
                    for idx in idxs:
                        dc = int(comp_rows[ci][idx, 0])
                        if ah == 0:
                            preds[ci] = _encode_dc_first(
                                state, dc >> al, preds[ci], dc_tabs[ci]
                            )
                        else:
                            state.w.put((dc >> al) & 1, 1)
                unit += 1
        else:  # AC scan, single component
            ci = comps[0]
            bw, nbx, nby, hs, vs = comp_geom[ci]
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and unit and unit % restart_interval == 0:
                        boundary()
                    unit += 1
                    row = comp_rows[ci][by * bw + bx]
                    if ah == 0:
                        _encode_ac_first(state, row, ss, se, al)
                    else:
                        _encode_ac_refine(state, row, ss, se, al)
        state.flush_eobrun()
        state.w.align_ones()
        out += state.w.out
    out += b"\xff\xd9"
    return bytes(out)
