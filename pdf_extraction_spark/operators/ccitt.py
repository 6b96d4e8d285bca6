"""From-scratch ITU-T T.6 (CCITT Group 4 / MMR) bilevel codec.

Group 4 is THE compression of real-world scanned documents: virtually every
office scanner, fax archive, and digitization project emits bilevel pages as
G4 — inside TIFF (Compression=4) or inside PDF image XObjects
(``/Filter /CCITTFaxDecode`` with ``K < 0``).  The reference workflow this
engine generalizes (``/root/reference/pdfextraction.py:16,72-73`` — render a
scanned PDF, then OCR it) therefore meets G4 on nearly every real scanned
input.  This module implements the wire format from the spec, pure Python:

* **T.6 2-D coding** (ITU-T Rec. T.6 §2): every line is coded against the
  line above it (an imaginary all-white line above the first) via pass /
  horizontal / vertical(±3) modes; no EOL codes between lines, optional
  EOFB (two EOLs) at the end of the data.
* **T.4 run-length alphabets** (ITU-T Rec. T.4 Table 2/Table 3 white and
  black terminating + make-up codes, plus the shared extended make-up codes
  to 2560) — used by the horizontal mode.  The tables below are transcribed
  from the published Recommendation; ``tests/test_ccitt.py`` pins well-known
  codewords (white-0 ``00110101``, black-2 ``11``, white make-up-64
  ``11011``, ...) and asserts each alphabet is prefix-free, so a transcription
  typo cannot hide behind encoder/decoder self-consistency.

Pixel convention: a row is a ``bytes`` of 0x00 (white) / 0x01 (black) per
pixel — T.4/T.6 define runs starting with white, and the caller (TIFF's
PhotometricInterpretation, PDF's ``/BlackIs1``) owns the mapping to output
bit values.  Both directions are implemented; the encoder exists so test
fixtures are REAL G4 bytes and ``decode(encode(img)) == img`` is exact
(G4 is lossless).

Containment: malformed input raises ``ValueError`` (never crashes, never
loops) — the per-document error contract of the extraction kernel
(``kernel.py``, reference F18) wraps it.
"""

from __future__ import annotations

import bisect

# --- T.4 run-length alphabets (Rec. T.4 §4.1, Tables 2-4) -------------------
# code strings are MSB-first bit strings exactly as published.

WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
}

BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended make-up codes, shared by both colours (Rec. T.4 Table 4)
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# --- T.6 mode codes (Rec. T.6 Table 1) --------------------------------------
_MODE_V0 = "1"
_MODE_VR = {1: "011", 2: "000011", 3: "0000011"}
_MODE_VL = {1: "010", 2: "000010", 3: "0000010"}
_MODE_H = "001"
_MODE_P = "0001"
_EOL = "000000000001"  # EOFB = two of these


# --- bit I/O -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, code: str) -> None:
        for c in code:
            self._acc = (self._acc << 1) | (c == "1")
            self._nbits += 1
            if self._nbits == 8:
                self._out.append(self._acc)
                self._acc = 0
                self._nbits = 0

    def pad_to_byte(self) -> None:
        while self._nbits:
            self.write("0")

    def getvalue(self) -> bytes:
        if self._nbits:
            # pad the final byte with 0 bits (spec: fill bits are 0)
            self._out.append(self._acc << (8 - self._nbits))
        out = bytes(self._out)
        if self._nbits:  # leave the writer reusable/consistent
            self._out.pop()
        return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self._data):
            raise ValueError("ccitt: truncated data")
        self.pos = p + 1
        return (self._data[byte] >> (7 - (p & 7))) & 1

    def bits_left(self) -> int:
        return len(self._data) * 8 - self.pos

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _decode_table(*tables: dict[int, str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            if code in out:
                raise AssertionError(f"duplicate code {code}")
            out[code] = run
    return out


_WHITE_DEC = _decode_table(WHITE_TERM, WHITE_MAKEUP, EXT_MAKEUP)
_BLACK_DEC = _decode_table(BLACK_TERM, BLACK_MAKEUP, EXT_MAKEUP)
_MAX_CODE_LEN = 13


def _read_run(r: _BitReader, table: dict[str, int]) -> int:
    """One complete run length: zero or more make-up codes, then a
    terminating code (< 64).  Accepts repeated make-ups for robustness."""
    total = 0
    while True:
        code = ""
        while len(code) <= _MAX_CODE_LEN:
            code += "1" if r.read_bit() else "0"
            if code in table:
                break
        else:
            raise ValueError("ccitt: bad run-length code")
        run = table[code]
        total += run
        if run < 64:
            return total


# --- changing-element helpers ------------------------------------------------


def _changes(row: bytes) -> list[int]:
    """Positions where colour differs from the pixel to the left (first
    pixel's imaginary left neighbour is white)."""
    out = []
    prev = 0
    for i, px in enumerate(row):
        if px != prev:
            out.append(i)
            prev = px
    return out


def _b1_b2(ref_changes: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """b1 = first changing element on the reference line right of a0 with
    the OPPOSITE colour of a0's colour (i.e. an even/odd transition index
    matching the current colour phase); b2 = the next one after it."""
    # ref_changes alternate white->black (even indices) and black->white
    # (odd).  When the current colour is white, b1 must be a white->black
    # transition (even index); when black, a black->white one (odd index).
    i = bisect.bisect_right(ref_changes, a0)
    # parity of the transition at index i: even = to-black, odd = to-white
    want_parity = 0 if color == 0 else 1
    while i < len(ref_changes) and (i & 1) != want_parity:
        i += 1
    b1 = ref_changes[i] if i < len(ref_changes) else width
    b2 = ref_changes[i + 1] if i + 1 < len(ref_changes) else width
    return b1, b2


# --- public API ----------------------------------------------------------------


def _encode_row_2d(w: _BitWriter, row: bytes, ref: list[int], width: int) -> None:
    """One line of T.4/T.6 two-dimensional coding against ``ref``
    (shared verbatim by G4 and G3-2D — the mode alphabet is the same)."""
    cur = _changes(row)
    a0 = -1
    color = 0
    ci = 0  # index into cur of the next changing element > a0
    while a0 < width:
        a1 = cur[ci] if ci < len(cur) else width
        b1, b2 = _b1_b2(ref, a0, color, width)
        if b2 < a1:
            w.write(_MODE_P)
            a0 = b2
            # colour unchanged; ci unchanged (a1 still next change)
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            if d == 0:
                w.write(_MODE_V0)
            elif d > 0:
                w.write(_MODE_VR[d])
            else:
                w.write(_MODE_VL[-d])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else width
            w.write(_MODE_H)
            start = max(a0, 0)
            _write_run(w, a1 - start, color)
            _write_run(w, a2 - a1, color ^ 1)
            a0 = a2
            ci += 2
            # colour unchanged after the two runs
        if a0 >= width:
            break


def _encode_row_1d(w: _BitWriter, row: bytes, width: int) -> None:
    """One T.4 one-dimensional line: alternating white/black runs (a
    zero-length white lead when the row starts black)."""
    color = 0
    pos = 0
    for nxt in _changes(row) + [width]:
        _write_run(w, nxt - pos, color)
        pos = nxt
        color ^= 1


def g4_encode(rows: list[bytes], width: int, byte_align: bool = False) -> bytes:
    """Encode rows of 0x00/0x01 pixels as T.6 (G4/MMR) bits with EOFB.
    ``byte_align`` starts every coded line on a byte boundary — the
    layout PDF's ``/EncodedByteAlign true`` declares."""
    for r_ in rows:
        if len(r_) != width:
            raise ValueError("ccitt: row width mismatch")
    w = _BitWriter()
    ref: list[int] = []  # imaginary all-white line: no changing elements
    for row in rows:
        if byte_align:
            w.pad_to_byte()
        _encode_row_2d(w, row, ref, width)
        ref = _changes(row)
    if byte_align:
        # the EOFB starts aligned too, so a height-unaware aligned read
        # (align -> peek EOFB -> decode) terminates exactly
        w.pad_to_byte()
    w.write(_EOL)
    w.write(_EOL)
    return w.getvalue()


def _write_run(w: _BitWriter, run: int, color: int) -> None:
    if run < 0:
        raise ValueError("ccitt: negative run")
    term = BLACK_TERM if color else WHITE_TERM
    makeup = BLACK_MAKEUP if color else WHITE_MAKEUP
    while run > 2623:  # 2560 + 63: emit max extended make-up + continue
        w.write(EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        w.write(EXT_MAKEUP[m] if m >= 1792 else makeup[m])
        run -= m
    w.write(term[run])


def g4_decode(
    data: bytes,
    width: int,
    height: int | None = None,
    byte_align: bool = False,
) -> list[bytes]:
    """Decode T.6 bits into rows of 0x00/0x01 pixels.

    ``height=None`` decodes until EOFB or data exhaustion (the PDF
    ``/Rows`` -absent / TIFF RowsPerStrip-bounded cases pass an explicit
    height).  ``byte_align`` implements PDF's ``/EncodedByteAlign``.
    """
    if width <= 0:
        raise ValueError("ccitt: bad width")
    if height is not None and height <= 0:
        raise ValueError("ccitt: bad height")
    r = _BitReader(data)
    rows: list[bytes] = []
    ref: list[int] = []
    max_rows = height if height is not None else 1 << 20
    while len(rows) < max_rows:
        if byte_align:
            r.align()
        if r.bits_left() <= 0:
            break
        if _peek_eofb(r):
            break
        row = _decode_row_2d(r, ref, width)
        rows.append(row)
        ref = _changes(row)
    return rows


def _decode_row_2d(r: _BitReader, ref: list[int], width: int) -> bytes:
    """Decode one two-dimensionally-coded line against ``ref`` (shared
    by G4 and G3-2D — the mode alphabet is the same)."""
    row = bytearray(width)
    a0 = -1
    color = 0
    while a0 < width:
        mode = _read_mode(r)
        b1, b2 = _b1_b2(ref, a0, color, width)
        if mode == "P":
            if color:
                for i in range(max(a0, 0), b2):
                    row[i] = 1
            a0 = b2
        elif mode == "H":
            start = max(a0, 0)
            run1 = _read_run(r, _BLACK_DEC if color else _WHITE_DEC)
            run2 = _read_run(r, _WHITE_DEC if color else _BLACK_DEC)
            a1 = start + run1
            a2 = a1 + run2
            if a2 > width:
                raise ValueError("ccitt: run past row end")
            if color:
                for i in range(start, a1):
                    row[i] = 1
            else:
                for i in range(a1, a2):
                    row[i] = 1
            a0 = a2
        else:  # vertical mode, mode is the signed offset as int
            a1 = b1 + mode
            if a1 < 0 or a1 > width:
                raise ValueError("ccitt: vertical move out of range")
            if color:
                for i in range(max(a0, 0), a1):
                    row[i] = 1
            a0 = a1
            color ^= 1
    return bytes(row)


def _decode_row_1d(r: _BitReader, width: int) -> bytes:
    """Decode one T.4 one-dimensional line: alternating white/black
    runs that must total exactly ``width``."""
    row = bytearray(width)
    color = 0
    pos = 0
    while pos < width:
        run = _read_run(r, _BLACK_DEC if color else _WHITE_DEC)
        if pos + run > width:
            raise ValueError("ccitt: run past row end")
        if color:
            for i in range(pos, pos + run):
                row[i] = 1
        pos += run
        color ^= 1
    return bytes(row)


def mh_encode(rows: list[bytes], width: int) -> bytes:
    """Encode rows as Modified Huffman (T.4 one-dimensional) in the
    TIFF Compression=2 shape: pure run-length lines — white first, a
    zero-length white run when a row starts black — with NO EOL codes
    and every row starting on a byte boundary (TIFF 6.0 §10)."""
    w = _BitWriter()
    for row in rows:
        if len(row) != width:
            raise ValueError("ccitt: row width mismatch")
        _encode_row_1d(w, row, width)
        w.pad_to_byte()
    return w.getvalue()


def mh_decode(
    data: bytes, width: int, height: int, byte_align: bool = True
) -> list[bytes]:
    """Decode bare Modified Huffman lines: alternating white/black T.4
    runs that must total exactly ``width`` per row.  ``byte_align=True``
    is TIFF Compression=2 (each row starts on a byte boundary);
    ``byte_align=False`` is the continuous form PDF ``/K 0`` streams use
    when ``/EncodedByteAlign`` is false (the PDF default — no EOLs, no
    padding).  Raises ValueError on malformed input."""
    if width <= 0 or height <= 0:
        raise ValueError("ccitt: bad geometry")
    r = _BitReader(data)
    rows: list[bytes] = []
    for _ in range(height):
        if byte_align:
            r.align()
        rows.append(_decode_row_1d(r, width))
    return rows


def g3_encode(
    rows: list[bytes], width: int, *, two_d: bool = False, k: int = 2
) -> bytes:
    """Encode rows as Group 3 (Rec. T.4): an EOL before every line and a
    six-EOL RTC after the last.  ``two_d=False`` is pure 1-D (every line
    run-length coded).  ``two_d=True`` is the mixed T.4 2-D scheme: each
    EOL carries a tag bit (1 = the next line is 1-D, 0 = 2-D) and every
    ``k``-th line is coded 1-D — the K-factor error-confinement real fax
    machines use — with the lines between coded 2-D against their
    predecessor using the same mode alphabet as G4."""
    if k < 1:
        raise ValueError("ccitt: bad K factor")
    w = _BitWriter()
    ref: list[int] = []
    for idx, row in enumerate(rows):
        if len(row) != width:
            raise ValueError("ccitt: row width mismatch")
        w.write(_EOL)
        one_d = (idx % k == 0) if two_d else True
        if two_d:
            w.write("1" if one_d else "0")
        if one_d:
            _encode_row_1d(w, row, width)
        else:
            _encode_row_2d(w, row, ref, width)
        ref = _changes(row)
    for _ in range(6):  # RTC
        w.write(_EOL)
        if two_d:
            w.write("1")
    return w.getvalue()


def g3_decode(
    data: bytes, width: int, height: int | None = None, *, two_d: bool = False
) -> list[bytes]:
    """Decode Group 3 lines (EOL-framed 1-D, or mixed 2-D when
    ``two_d``).  Stops at ``height`` rows, the RTC, or data exhaustion;
    raises ValueError on malformed framing or codes."""
    if width <= 0:
        raise ValueError("ccitt: bad width")
    if height is not None and height <= 0:
        raise ValueError("ccitt: bad height")
    r = _BitReader(data)
    rows: list[bytes] = []
    max_rows = height if height is not None else 1 << 20
    while len(rows) < max_rows:
        if not _seek_eol(r):
            break  # data exhausted cleanly
        one_d = True
        if two_d:
            one_d = r.read_bit() == 1
        if _peek_eol(r):
            break  # consecutive EOL = RTC
        rows.append(
            _decode_row_1d(r, width) if one_d else _decode_row_2d(r, rows and _changes(rows[-1]) or [], width)
        )
    return rows


def decode_ccitt_pdf_image(data: bytes, parms: dict | None) -> list[bytes]:
    """Decode a PDF ``/CCITTFaxDecode`` image stream from its resolved
    ``/DecodeParms`` — THE single dispatch both OCR consumers share:

      /K < 0  -> T.6 (G4), honouring /EncodedByteAlign
      /K = 0  -> pure 1-D: EOL-framed when /EndOfLine true, else the
                 continuous (PDF-default) run stream, honouring
                 /EncodedByteAlign per line
      /K > 0  -> mixed 2-D G3 (EOL tag bits select per line)

    Returns rows of semantic ink (1 = black) regardless of /BlackIs1,
    which only maps OUTPUT bit values; raises ValueError on malformed
    input (callers contain per document)."""
    p = parms or {}
    k = int(p.get("K", 0))
    cols = int(p.get("Columns", 1728))
    nrows = int(p.get("Rows", 0)) or None
    align = bool(p.get("EncodedByteAlign", False))
    if k < 0:
        return g4_decode(data, cols, nrows, byte_align=align)
    if k == 0 and not bool(p.get("EndOfLine", False)):
        if nrows is None:
            raise ValueError("ccitt: K=0 without /EndOfLine requires /Rows")
        return mh_decode(data, cols, nrows, byte_align=align)
    return g3_decode(data, cols, nrows, two_d=k > 0)


def _seek_eol(r: _BitReader) -> bool:
    """Consume fill zeros and one EOL (>=11 zeros then a 1).  False when
    the data ends first; ValueError on a stray 1 inside the framing."""
    zeros = 0
    while True:
        if r.bits_left() <= 0:
            return False
        if r.read_bit():
            if zeros >= 11:
                return True
            raise ValueError("ccitt: bad EOL framing")
        zeros += 1


def _peek_eol(r: _BitReader) -> bool:
    """True if the next 12 bits are exactly an EOL (position restored)."""
    save = r.pos
    try:
        ok = all(r.read_bit() == (c == "1") for c in _EOL)
    except ValueError:
        ok = True  # only fill bits remain
    r.pos = save
    return ok


def _read_mode(r: _BitReader):
    """Return 'P', 'H', or a vertical offset int in -3..3."""
    if not r.read_bit():
        if not r.read_bit():
            if not r.read_bit():
                # 000...: P (0001), V±2 (00001x), V±3 (0000x1x) or EOL
                if r.read_bit():
                    return "P"  # 0001
                if r.read_bit():
                    return 2 if r.read_bit() else -2  # 000011 / 000010
                if r.read_bit():
                    return 3 if r.read_bit() else -3  # 0000011 / 0000010
                raise ValueError("ccitt: unexpected code (EOL/extension)")
            return "H"  # 001
        return 1 if r.read_bit() else -1  # 011 / 010
    return 0  # 1


def _peek_eofb(r: _BitReader) -> bool:
    """True if the next bits are an EOL (start of EOFB / end of data)."""
    save = r.pos
    try:
        for i, c in enumerate(_EOL):
            if r.read_bit() != (c == "1"):
                r.pos = save
                return False
        return True  # leave position past the EOL; caller stops anyway
    except ValueError:
        r.pos = save
        return True  # fewer than 12 bits left: only fill bits remain
