"""PDF standard security handler (operators/pdf_crypt.py).

Ground truth comes from three independent directions: published
FIPS-197 / RC4 test vectors pin the ciphers, an in-test hashlib
re-derivation pins Algorithm 2, and the writer/reader round-trip over
REAL encrypted re-emissions of the four structural generator variants
pins the end-to-end path (including the driver-oracle variants 4/5).
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from tl_spark.operators.pdf import (
    LINES_PER_PAGE,
    extract_pdf_pages,
    pdf_bytes,
    pdf_bytes_variant,
    pdf_doc_info,
    wrap_lines,
)
from tl_spark.operators.pdf_crypt import (
    _PAD,
    _aes_ecb_encrypt,
    _alg2_file_key,
    _hash_2b,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    encrypt_pdf,
    rc4,
)


def expected_pages(text: str) -> list[str]:
    lines = wrap_lines(text)
    return [
        "\n".join(lines[i : i + LINES_PER_PAGE])
        for i in range(0, len(lines), LINES_PER_PAGE)
        if lines[i : i + LINES_PER_PAGE]
    ]


# -- cipher primitives vs published vectors --------------------------------


def test_aes128_fips197_vector():
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _aes_ecb_encrypt(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    assert aes_cbc_decrypt(key, bytes(16), ct, unpad=False) == pt


def test_aes256_fips197_vector():
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _aes_ecb_encrypt(key, pt)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"  # FIPS-197 C.3
    assert aes_cbc_decrypt(key, bytes(16), ct, unpad=False) == pt


def test_rc4_vector():
    # the classic public test vector
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    # involution
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_cbc_roundtrip_and_padding():
    key = b"0123456789abcdef"
    iv = b"\x07" * 16
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes(range(256))[:n]
        assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, msg)) == msg
    # scalar CBC-encrypt core agrees with the numpy ECB core
    one = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes_cbc_encrypt(key, bytes(16), one, pad=False) == _aes_ecb_encrypt(
        key, one
    )


def test_padding_string_is_the_spec_constant():
    # ISO 32000-1 §7.6.3.3 publishes these exact 32 bytes
    assert _PAD[:8] == bytes(
        [0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41]
    )
    assert len(_PAD) == 32 and _PAD[-1] == 0x7A


def test_alg2_matches_independent_recomputation():
    """Re-derive Algorithm 2 with hashlib directly (independent of the
    production code path) for R3/128-bit."""
    o = hashlib.sha256(b"fake-O").digest()  # any 32 bytes
    id0 = b"0123456789abcdef"
    p = 0xFFFFFFFC
    key = _alg2_file_key(_PAD, o, p, id0, r=3, n=16, encrypt_metadata=True)
    h = hashlib.md5(_PAD + o[:32] + struct.pack("<i", p - 2**32) + id0).digest()
    k = h[:16]
    for _ in range(50):
        k = hashlib.md5(k[:16]).digest()[:16]
    assert key == k


def test_hash_2b_shape_and_determinism():
    a = _hash_2b(b"", b"saltsalt", b"")
    b = _hash_2b(b"", b"saltsalt", b"")
    assert a == b and len(a) == 32
    assert _hash_2b(b"", b"other--!", b"") != a


# -- end-to-end: encrypted files through the kernel ------------------------

TEXT = "the fast key order sort table scan merge part window small hash " * 4
UNI = "héllo wörld ünïcode çheck " * 9 + "emoji 🙂 pair"


@pytest.mark.parametrize("method", ["rc4", "aes128"])
@pytest.mark.parametrize("variant", [0, 1, 2, 3])
def test_roundtrip_all_variants(method, variant):
    enc = encrypt_pdf(pdf_bytes(TEXT, variant, rot=variant + 1), method)
    got = [p for p in extract_pdf_pages(enc) if p]
    assert got == expected_pages(TEXT)


@pytest.mark.parametrize("method", ["rc4", "aes128", "aes256"])
def test_roundtrip_unicode_type0(method):
    enc = encrypt_pdf(pdf_bytes(UNI, 2), method)
    got = [p for p in extract_pdf_pages(enc) if p]
    assert got == expected_pages(UNI)


def test_encrypted_info_metadata_decrypts():
    enc = encrypt_pdf(pdf_bytes("plain doc here", 0), "aes128")
    meta = pdf_doc_info(enc)
    assert meta["producer"] == "tl_spark synth v1"
    assert meta["encrypted"] is True


@pytest.mark.parametrize("method", ["rc4", "aes128", "aes256"])
def test_locked_pdf_raises_valueerror(method):
    enc = encrypt_pdf(
        pdf_bytes("secret text", 0),
        method,
        user_pwd=b"hunter2",
        owner_pwd=b"admin-pass",
    )
    with pytest.raises(ValueError, match="password"):
        extract_pdf_pages(enc)


@pytest.mark.parametrize("method", ["aes128", "aes256"])
def test_empty_owner_password_opens(method):
    """Non-empty USER password but empty OWNER password: the owner-side
    authentication (Algorithm 7 / the R6 O-record) must open the file."""
    enc = encrypt_pdf(
        pdf_bytes(TEXT, 1),
        method,
        user_pwd=b"userpw",
        owner_pwd=b"",
    )
    got = [p for p in extract_pdf_pages(enc) if p]
    assert got == expected_pages(TEXT)


def test_generator_variants_4_5_are_encrypted():
    for v, method in ((4, "rc4"), (5, "aes128")):
        data = pdf_bytes_variant(TEXT, v)
        assert b"/Encrypt" in data
        got = [p for p in extract_pdf_pages(data) if p]
        assert got == expected_pages(TEXT)
    # structural variants still come out unencrypted
    assert b"/Encrypt" not in pdf_bytes_variant(TEXT, 0)


def test_spark_pdf_text_pages_encrypted(spark):
    from tl_spark.operators.pdf import pdf_text_pages

    locked = encrypt_pdf(
        pdf_bytes("locked away", 0), "rc4", user_pwd=b"x", owner_pwd=b"y"
    )
    rows = pdf_text_pages(
        spark.createDataFrame(
            [
                (4, bytearray(pdf_bytes_variant(TEXT, 4))),
                (5, bytearray(pdf_bytes_variant(TEXT, 5))),
                (6, bytearray(locked)),
            ],
            "doc_id long, payload binary",
        ),
        on_error="skip",
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.text)
    assert by_doc[4] == expected_pages(TEXT)
    assert by_doc[5] == expected_pages(TEXT)
    assert 6 not in by_doc  # locked doc skipped, not crashed


# -- adversarial: mutated encrypted files keep the ValueError contract ----

from hypothesis import given, settings, strategies as st  # noqa: E402

_ENC_BASE = encrypt_pdf(pdf_bytes("mutate me gently now", 1), "aes128")


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=200))
def test_fuzz_mutated_encrypted_pdf(data):
    base = bytearray(_ENC_BASE)
    pos = (len(data) * 6271) % max(1, len(base) - len(data) - 1)
    base[pos : pos + len(data)] = data
    try:
        pages = extract_pdf_pages(bytes(base))
    except ValueError:
        return
    assert isinstance(pages, list)
