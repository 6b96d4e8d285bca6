"""AES-V4 encrypted PDFs (round-5 verdict ask #3): pure-Python AES-128
pinned to FIPS-197 test vectors, the /CF crypt-filter dictionary walk,
and wrong-key / malformed-dictionary rejection.  V5/AES-256 coverage
lives in tests/test_pdf_aes256.py."""

from __future__ import annotations

import hashlib

import pytest

from pdf_extraction_spark.crypto_aes import (
    aes128_cbc_decrypt,
    aes128_cbc_encrypt,
    aes128_decrypt_block,
    aes128_encrypt_block,
)
from pdf_extraction_spark.pdf_parse import (
    _esc_literal,
    _rc4,
    _std_file_key,
    _std_object_key,
    _std_owner_entry,
    _std_user_entry,
    build_pdf,
    extract_pdf_pages,
)


def test_fips197_vectors():
    # Appendix B
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = aes128_encrypt_block(pt, key)
    assert ct == bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    assert aes128_decrypt_block(ct, key) == pt
    # Appendix C.1
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes128_encrypt_block(pt, key)
    assert ct == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert aes128_decrypt_block(ct, key) == pt


def test_cbc_roundtrip_and_malformed():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    for n in (0, 1, 15, 16, 17, 100, 4096):
        data = (bytes(range(256)) * (n // 256 + 1))[:n]
        enc = aes128_cbc_encrypt(key, iv, data)
        assert enc[:16] == iv and len(enc) % 16 == 0
        assert aes128_cbc_decrypt(key, enc) == data
    with pytest.raises(ValueError, match="length"):
        aes128_cbc_decrypt(key, b"\x00" * 17)
    with pytest.raises(ValueError, match="length"):
        aes128_cbc_decrypt(key, b"\x00" * 16)  # IV only, no block
    # bad padding: decrypting garbage blocks almost surely yields pad>16
    with pytest.raises(ValueError, match="padding"):
        aes128_cbc_decrypt(key, aes128_cbc_encrypt(key, iv, b"x")[:-1] + b"\x00")


def test_aes_pdf_roundtrip_identity():
    texts = ["aes text é 日本 😀\nsecond line", ""]
    for t in texts:
        pages = [t, t[::-1]]
        for kw in (
            {},
            {"xref_stream": True, "use_objstm": True},
            {"compress": False},
            {"indirect_length": True},
            {"font": "cid"},
            {"font": "winansi"},
        ):
            blob = build_pdf(pages, encrypt="aes-128", **kw)
            assert b"/AESV2" in blob or kw.get("use_objstm")
            assert extract_pdf_pages(blob) == pages, (kw, t)


def test_aes_pdf_scan_recovery():
    import re

    pages = ["recovered through the damaged-xref scan", "page two"]
    blob = build_pdf(pages, encrypt="aes-128")
    blob = re.sub(rb"startxref\s+\d+", b"startxref\n0", blob)
    assert extract_pdf_pages(blob) == pages


def test_wrong_key_rejected():
    """Tampering /U must fail password verification, not silently emit
    mojibake."""
    blob = build_pdf(["secret"], encrypt="aes-128")
    at = blob.find(b"/U <")
    tampered = bytearray(blob)
    digit = tampered[at + 4]
    tampered[at + 4] = ord("0") if digit != ord("0") else ord("1")
    with pytest.raises(ValueError, match="password required"):
        extract_pdf_pages(bytes(tampered))


def test_v5_with_v4_crypt_filter_rejected():
    """V5 is supported (test_pdf_aes256.py) but a V5 dict whose /StdCF
    still names the V4-only /AESV2 method is malformed and rejected at
    the CF walk."""
    blob = build_pdf(["future"], encrypt="aes-128")
    tampered = blob.replace(b"/V 4 /R 4", b"/V 5 /R 6")
    with pytest.raises(ValueError, match="unsupported crypt filter"):
        extract_pdf_pages(tampered)


def test_unknown_crypt_filter_rejected():
    blob = build_pdf(["aesv3?"], encrypt="aes-128")
    tampered = blob.replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(ValueError, match="unsupported crypt filter"):
        extract_pdf_pages(tampered)


def _hand_built_v4_rc4_pdf(text: str) -> bytes:
    """V4/R4 with /CFM /V2 (an RC4 crypt filter — the OTHER V4 method
    real writers emit), hand-assembled so the builder's AES-only V4
    path cannot mask the parser's CF walk."""
    id0 = hashlib.md5(b"v4-rc4-fixture").digest()
    o_entry = _std_owner_entry(b"", b"", 4, 16)
    key = _std_file_key(b"", o_entry, -44, id0, 4, 16)
    u_entry = _std_user_entry(key, id0, 4)
    content = b"BT /F1 12 Tf (" + _esc_literal(text.encode()) + b") Tj ET"
    enc_content = _rc4(_std_object_key(key, 5), content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (
            b"<< /Type /Page /Parent 2 0 R /Resources"
            b" << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"
        ),
        5: b"<< /Length %d >>" % len(enc_content),
        6: (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44"
            b" /CF << /StdCF << /CFM /V2 /Length 16 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /O <" + o_entry.hex().encode() + b">"
            b" /U <" + u_entry.hex().encode() + b"> >>"
        ),
    }
    out = bytearray(b"%PDF-1.6\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num]
        if num == 5:
            out += b"\nstream\n" + enc_content + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offs[num]
    out += (
        b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID [ <"
        + id0.hex().encode() + b"> <" + id0.hex().encode() + b"> ] >>\n"
        b"startxref\n%d\n%%%%EOF\n" % xref_at
    )
    return bytes(out)


def test_v4_rc4_crypt_filter():
    assert extract_pdf_pages(_hand_built_v4_rc4_pdf("v4 rc4 filter ok")) == [
        "v4 rc4 filter ok"
    ]


def test_encrypt_metadata_false_changes_key():
    """R4 key derivation appends 0xFFFFFFFF when /EncryptMetadata is
    false (§7.6.4.3.2 step f) — pinned so the branch cannot rot."""
    id0 = b"\x01" * 16
    o = _std_owner_entry(b"", b"", 4, 16)
    k_true = _std_file_key(b"", o, -44, id0, 4, 16)
    k_false = _std_file_key(b"", o, -44, id0, 4, 16, meta_false=True)
    assert k_true != k_false
    # and R3 ignores the flag entirely
    assert _std_file_key(b"", o, -44, id0, 3, 16, meta_false=True) == (
        _std_file_key(b"", o, -44, id0, 3, 16)
    )


def test_aes_object_key_salted():
    key = bytes(range(16))
    assert _std_object_key(key, 7) != _std_object_key(key, 7, aes=True)
    md = hashlib.md5(
        key + (7).to_bytes(3, "little") + (0).to_bytes(2, "little") + b"sAlT"
    )
    assert _std_object_key(key, 7, aes=True) == md.digest()[:16]
