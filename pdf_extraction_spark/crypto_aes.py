"""Pure-Python AES-128 + CBC for V4 encrypted PDFs (no crypto libs).

Spec-pinned to FIPS-197: the S-box pair is generated from the GF(2^8)
inverse + affine transform (not pasted tables), key expansion follows
§5.2, and the cipher/inverse-cipher follow §5.1/§5.3; the FIPS-197
Appendix B/C vectors are asserted in tests/test_pdf_aes.py.  The CBC
layer implements the PDF AESV2 crypt filter scheme (PDF 32000 §7.6.2):
a 16-byte IV prepended to the ciphertext and PKCS#5 padding.

Scale note: this runs inside Arrow-batched mapInPandas kernels on
(small) per-document streams; pure-Python AES is the honest in-env
cost of reading V4 PDFs, exactly like the from-scratch JPEG decoder.
"""

from __future__ import annotations


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sboxes() -> tuple[list[int], list[int]]:
    # multiplicative inverse in GF(2^8) via 3 as generator
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    exp[255] = exp[0]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = [0] * 256
    inv_sbox = [0] * 256
    for a in range(256):
        b = inv(a)
        # affine transform: b ^ rotl(b,1..4) ^ 0x63
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        s = (s ^ 0x63) & 0xFF
        sbox[a] = s
        inv_sbox[s] = a
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sboxes()
_RCON = [0x01]
while len(_RCON) < 10:
    _RCON.append(_gf_mul(_RCON[-1], 2))

# precomputed GF(2^8) multiplication tables for the six MixColumns
# constants — the per-block hot path does table lookups, not bit loops
_M2, _M3, _M9, _M11, _M13, _M14 = (
    [_gf_mul(a, c) for a in range(256)] for c in (2, 3, 9, 11, 13, 14)
)


def _expand_key(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2: 11 round keys of 16 bytes each (AES-128)."""
    if len(key) != 16:
        raise ValueError("aes: AES-128 requires a 16-byte key")
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[r * 4 : r * 4 + 4], []) for r in range(11)]


def _add_round_key(s: list[int], rk: list[int]) -> None:
    for i in range(16):
        s[i] ^= rk[i]


# state layout: s[r + 4*c] (column-major, as FIPS-197's in/out mapping)
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, 10):
        s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
        t = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            t[4 * c + 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
            t[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
            t[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
            t[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
        s = t
        _add_round_key(s, rks[rnd])
    s = [_SBOX[s[_SHIFT[i]]] for i in range(16)]
    _add_round_key(s, rks[10])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    s = list(block)
    _add_round_key(s, rks[10])
    for rnd in range(9, 0, -1):
        s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
        _add_round_key(s, rks[rnd])
        t = [0] * 16
        for c in range(4):
            a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
            t[4 * c + 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            t[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            t[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            t[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
        s = t
    s = [_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16)]
    _add_round_key(s, rks[0])
    return bytes(s)


def aes128_encrypt_block(block: bytes, key: bytes) -> bytes:
    return _encrypt_block(block, _expand_key(key))


def aes128_decrypt_block(block: bytes, key: bytes) -> bytes:
    return _decrypt_block(block, _expand_key(key))


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PDF AESV2 shape: returns iv + ciphertext over PKCS#5-padded data."""
    if len(iv) != 16:
        raise ValueError("aes: IV must be 16 bytes")
    rks = _expand_key(key)
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """Inverse of aes128_cbc_encrypt: data = iv + ciphertext; strips the
    PKCS#5 padding.  Malformed input raises ValueError (contained per
    document by the extraction kernel's F18 guard)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("aes: bad AESV2 payload length")
    rks = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("aes: bad padding")
    return bytes(out[:-pad])
