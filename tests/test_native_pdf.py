"""Native PDF legs vs the pure-Python kernel: bit-equality.

Three native legs are covered (all optional; tests skip when the
cdylib isn't present):
- content-stream interpreter (pdf.rs `tl_pdf_interp`) — chunks must be
  bit-equal to `_Interp._run_py`, including coordinates (IEEE-identical
  op order) and error behavior (native bails → Python raises the
  documented ValueError);
- RC4 / AES-CBC decrypt (crypt.rs) — exact ciphers, pinned against the
  Python implementation and FIPS-197 vectors;
- ASCII85 decode (crypt.rs) — `_a85_decode_slow` semantics.

The differential mutation fuzz is the load-bearing gate: random byte
mutations over real generated PDFs must produce the SAME pages or the
SAME exception type with the native legs on and off.
"""

from __future__ import annotations

import contextlib
import os
import random

import pytest

from tl_spark.kernel import native_crypt, native_pdf

pytestmark = pytest.mark.skipif(
    native_pdf.load() is None, reason="native cdylib not built"
)


@contextlib.contextmanager
def _native_disabled():
    os.environ["TL_SPARK_NATIVE_PDF"] = "0"
    os.environ["TL_SPARK_NATIVE_CRYPT"] = "0"
    for m in (native_pdf, native_crypt):
        m._LIB = None
        m._TRIED = False
    try:
        yield
    finally:
        del os.environ["TL_SPARK_NATIVE_PDF"]
        del os.environ["TL_SPARK_NATIVE_CRYPT"]
        for m in (native_pdf, native_crypt):
            m._LIB = None
            m._TRIED = False


def _extract_outcome(data: bytes, columns: str = "off"):
    from tl_spark.operators.pdf import extract_pdf_pages_with_spans

    try:
        return ("ok", extract_pdf_pages_with_spans(data, columns))
    except ValueError as e:
        return ("ValueError", str(e))
    except Exception as e:  # noqa: BLE001 - fuzz wants the exact class
        return (type(e).__name__, str(e))


def _texts(n=48, words=40):
    rng = random.Random(7)
    pool = (
        "alpha bravo Charlie δέλτα echo foxtrot golf hôtel india "
        "juliett kilo lima Mike nové oscar papa 北京 québec romeo "
        "sierra tango 😀 uniform victor whiskey xray yankee zulu"
    ).split()
    return [
        " ".join(rng.choice(pool) for _ in range(rng.randrange(8, words)))
        for _ in range(n)
    ]


def test_native_interp_matches_python_on_eight_variants():
    from tl_spark.operators.pdf import pdf_bytes_variant

    docs = [
        pdf_bytes_variant(t, i, rot=i % 3)
        for i, t in enumerate(_texts(48))
    ]
    nat = [_extract_outcome(d) for d in docs]
    with _native_disabled():
        ref = [_extract_outcome(d) for d in docs]
    assert nat == ref
    assert all(k == "ok" for k, _ in nat)


def test_native_interp_two_column_layout_matches():
    from tl_spark.operators.pdf import pdf_bytes

    for v in range(4):
        d = pdf_bytes("one two three four five six seven eight " * 6, v,
                      layout="twocol")
        nat = _extract_outcome(d, columns="auto")
        with _native_disabled():
            ref = _extract_outcome(d, columns="auto")
        assert nat == ref and nat[0] == "ok"


def test_native_interp_mutation_fuzz_differential():
    """Random byte mutations: same pages or same exception class."""
    from tl_spark.operators.pdf import pdf_bytes_variant

    rng = random.Random(11)
    base = [pdf_bytes_variant(t, i) for i, t in enumerate(_texts(8))]
    n_checked = 0
    for trial in range(300):
        d = bytearray(rng.choice(base))
        for _ in range(rng.randrange(1, 6)):
            pos = rng.randrange(len(d))
            d[pos] = rng.randrange(256)
        d = bytes(d)
        nat = _extract_outcome(d)
        with _native_disabled():
            ref = _extract_outcome(d)
        assert nat == ref, (trial, nat[0], ref[0])
        n_checked += 1
    assert n_checked == 300


def test_native_interp_content_stream_edge_ops():
    """Operators/edge syntax the generator never emits, via a raw
    content stream run through _Interp directly."""
    from tl_spark.operators.pdf import PdfDocument, _Interp, pdf_bytes

    doc = PdfDocument(pdf_bytes("seed text", 0))
    page = doc.pages()[0]
    cases = [
        # bool inside TJ is an offset in Python (isinstance(True, int))
        b"BT /F1 12 Tf [(a) true (b)] TJ ET",
        b"BT /F1 12 Tf 2 Tz 100 700 Td (wide) Tj ET",
        b"BT /F1 12 Tf 1.5 TL (x) ' (y) ' ET",
        b"BT /F1 12 Tf 3 1 2 \" ET",
        b"q 2 0 0 2 10 20 cm BT /F1 7 Tf (s) Tj ET Q",
        b"BT /Nope 9 Tf (default font) Tj ET",
        b"BT /F1 12 Tf (esc \\n \\053 \\( ) Tj ET",
        b"BT /F1 12 Tf <48656c6c 6f> Tj ET",
        b"BT /F1 12 Tf % comment\n(after) Tj ET",
        b"BT /F1 12 Tf [(k) -120 (ern)] TJ ET",
        b"BI /W 2 /H 2 ID \x00\x01\x02\x03 EI BT /F1 12 Tf (img) Tj ET",
        b"BT /F1 12 Tf (unterminated",
        b"BT /F1 12 Tf ) stray (ok) Tj ET",
        b"BT /F1 0 Tf (zero size) Tj ET",
        b"BT /F1 12 Tf 0 0 0 0 0 0 Tm (degenerate) Tj ET",
    ]
    for content in cases:
        nat = _Interp(doc, page.get("Resources", {})).run(content)
        ref = _Interp(doc, page.get("Resources", {}))._run_py(content)
        assert [
            (c.x0, c.y, c.x1, c.size, c.text) for c in nat
        ] == [(c.x0, c.y, c.x1, c.size, c.text) for c in ref], content


def test_native_aes_vectors_and_roundtrip():
    import secrets

    import tl_spark.operators.pdf_crypt as pc

    # FIPS-197 appendix C encrypt vector (exercises the sbox tables)
    ct = pc._aes_ecb_encrypt(
        bytes.fromhex("000102030405060708090a0b0c0d0e0f"),
        bytes.fromhex("00112233445566778899aabbccddeeff"),
    )
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    for klen in (16, 24, 32):
        for n in (16, 160, 1600):
            k = secrets.token_bytes(klen)
            iv = secrets.token_bytes(16)
            data = secrets.token_bytes(n - 5)
            enc = pc.aes_cbc_encrypt(k, iv, data, pad=True)
            nat = pc.aes_cbc_decrypt(k, iv, enc)
            with _native_disabled():
                ref = pc.aes_cbc_decrypt(k, iv, enc)
            assert nat == ref == data


def test_native_rc4_differential():
    import secrets

    import tl_spark.operators.pdf_crypt as pc

    # Wikipedia/RFC 6229-style known answer
    assert pc.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    for n in (0, 1, 33, 5000):
        k = secrets.token_bytes(9)
        d = secrets.token_bytes(n)
        nat = pc.rc4(k, d)
        with _native_disabled():
            ref = pc.rc4(k, d)
        assert nat == ref


def test_native_a85_differential():
    import base64
    import secrets

    import tl_spark.operators.pdf as P

    cases = [
        b"", b"z", b"~>rest", b"87cUR", b"87cU~>x", b" 8 7 c U R \n",
        b"zz~>", b"87cURDZ", b"u" * 5, b"s8W-!", b"a", b"az",
    ]
    for n in (0, 1, 2, 3, 4, 5, 100, 1001):
        enc = base64.a85encode(secrets.token_bytes(n))
        cases += [enc, enc + b"~>junk"]
    for c in cases:
        def _run():
            try:
                return ("ok", P._a85_decode(c))
            except Exception as e:  # noqa: BLE001
                return (type(e).__name__, None)

        nat = _run()
        with _native_disabled():
            ref = _run()
        assert nat == ref, c


def test_native_pdf_kill_switch():
    from tl_spark.operators.pdf import PdfDocument, _Interp, pdf_bytes

    doc = PdfDocument(pdf_bytes("seed", 0))
    page = doc.pages()[0]
    with _native_disabled():
        assert (
            native_pdf.run_native(
                _Interp(doc, page.get("Resources", {})), b"BT ET"
            )
            is None
        )


def test_batched_pages_equals_per_page_leg():
    """run_native_pages (one FFI call per doc) must be bit-equal to the
    per-page native leg AND to pure Python, across all 8 structural
    variants (incl. encrypted + embedded-subset-font NeedFont retries)
    and multi-page docs."""
    from tl_spark.operators import pdf as P

    docs = [
        P.pdf_bytes_variant(t, i, rot=i % 3)
        for i, t in enumerate(_texts(16, words=120))
    ]
    batched = [_extract_outcome(d) for d in docs]
    # force the per-page leg by hiding the batched symbol
    lib = native_pdf.load()
    assert lib is not None and lib._tl_has_pages
    lib._tl_has_pages = False
    try:
        per_page = [_extract_outcome(d) for d in docs]
    finally:
        lib._tl_has_pages = True
    assert batched == per_page
    with _native_disabled():
        ref = [_extract_outcome(d) for d in docs]
    assert batched == ref
    assert all(k == "ok" for k, _ in batched)


def test_batched_pages_mixed_resources_groups_fall_back_cleanly():
    """Pages whose /Font dicts differ must split into separate batch
    groups (or fall back) with output unchanged."""
    from tl_spark.operators.pdf import PdfDocument, _Interp
    from tl_spark.operators import pdf as P

    # one doc per variant pair -> interps with DIFFERENT font_res dicts
    d1 = PdfDocument(P.pdf_bytes("alpha beta gamma " * 20, 0))
    d2 = PdfDocument(P.pdf_bytes("δέλτα epsilon ζήτα " * 20, 1))
    interps, contents = [], []
    for doc in (d1, d2):
        for page in doc.pages():
            contents.append(doc.page_content(page))
            interps.append(_Interp(doc, page.get("Resources", {})))
    res = native_pdf.run_native_pages(interps, contents)
    assert res is not None and len(res) == len(interps)
    for k, (interp, content) in enumerate(zip(interps, contents)):
        ref = _Interp(interp.doc, {"Font": interp.font_res}).run(content)
        if res[k] is not None:
            want = [(c.x0, c.y, c.x1, c.size, c.text) for c in ref]
            assert res[k] == want


# ---------------------------------------------------------------------------
# Whole-document native leg (doc.rs: xref/objects/filters/page tree)
# ---------------------------------------------------------------------------


def _doc_leg_off():
    return os.environ.get("TL_SPARK_NATIVE_PDF_DOC") == "0"


def test_doc_leg_used_and_bitequal_on_eight_variants():
    """doc_chunks must (a) engage on every non-encrypted variant —
    guards against the leg silently always bailing — and (b) produce
    chunk tuples bit-equal to the pure-Python _doc_chunks."""
    from tl_spark.operators.pdf import (
        PdfDocument,
        _doc_chunks,
        pdf_bytes_variant,
    )

    for i, t in enumerate(_texts(16)):
        v = i % 8
        d = pdf_bytes_variant(t, v, rot=i % 3)
        nat = native_pdf.doc_chunks(d)
        assert nat is not None, f"doc leg bailed on variant {v}"
        # variants 4 (RC4 V2/R3) and 5 (AES-128 V4/R4) pin the native
        # security handler: a single wrong MD5 constant or key-salting
        # byte fails authentication and the leg bails
        ref = [
            [(c.x0, c.y, c.x1, c.size, c.text) for c in page]
            for page in _doc_chunks(PdfDocument(d))
        ]
        assert nat == ref, f"variant {v}"


def test_doc_leg_kill_switch():
    from tl_spark.operators.pdf import pdf_bytes

    d = pdf_bytes("alpha beta gamma " * 10, 0)
    assert native_pdf.doc_chunks(d) is not None
    os.environ["TL_SPARK_NATIVE_PDF_DOC"] = "0"
    try:
        assert native_pdf.doc_chunks(d) is None
    finally:
        del os.environ["TL_SPARK_NATIVE_PDF_DOC"]


def test_doc_leg_zero_pages_and_junk_prefix():
    from tl_spark.operators.pdf import extract_pdf_pages, pdf_bytes

    # junk before %PDF (≤1024) must parse through the doc leg too
    d = b"\xff\xfejunk" * 3 + pdf_bytes("alpha beta " * 8, 1)
    got = extract_pdf_pages(d)
    with _native_disabled():
        want = extract_pdf_pages(d)
    assert got == want and got


def test_doc_leg_structural_mutation_fuzz():
    """Mutations aimed at the OBJECT layer the doc leg now owns: xref
    offsets, trailer bytes, stream /Length digits, truncations. The
    contract is end-to-end: same pages or the same exception."""
    from tl_spark.operators.pdf import pdf_bytes_variant

    rng = random.Random(23)
    base = [pdf_bytes_variant(t, i % 8) for i, t in enumerate(_texts(8))]
    for trial in range(240):
        src = rng.choice(base)
        mode = trial % 4
        if mode == 0:  # random byte flips
            d = bytearray(src)
            for _ in range(rng.randrange(1, 6)):
                d[rng.randrange(len(d))] = rng.randrange(256)
            d = bytes(d)
        elif mode == 1:  # truncate
            d = src[: rng.randrange(16, len(src))]
        elif mode == 2:  # corrupt near startxref / trailer tail
            d = bytearray(src)
            lo = max(0, len(d) - 120)
            for _ in range(rng.randrange(1, 4)):
                d[rng.randrange(lo, len(d))] = rng.randrange(256)
            d = bytes(d)
        else:  # splice two docs (incremental-update-ish garbage)
            other = rng.choice(base)
            cut = rng.randrange(1, len(src))
            d = src[:cut] + other[rng.randrange(len(other)) :]
        nat = _extract_outcome(d)
        with _native_disabled():
            ref = _extract_outcome(d)
        assert nat == ref, (trial, mode, nat[0], ref[0])


def test_doc_leg_closure_font_cache_reuse():
    """The same font closure across documents must hit the
    process-wide cache (cross-doc reuse is the 100-TB win: a crawl's
    font population is tiny compared to its page population)."""
    from tl_spark.operators.pdf import pdf_bytes

    native_pdf._CLOSURE_FONTS.clear()
    docs = [pdf_bytes(f"alpha beta gamma doc{i} " * 6, 1) for i in range(12)]
    for d in docs:
        assert native_pdf.doc_chunks(d) is not None
    # all twelve docs share the one WinAnsi Type1 closure
    assert 1 <= len(native_pdf._CLOSURE_FONTS) <= 2


def test_native_inflate_differential_fuzz():
    """The from-scratch DEFLATE decoder vs CPython zlib, exact:
    - valid streams (levels 0-9, strategies): equal bytes
    - truncations at every prefix length: equal partial bytes
    - random mutations: zlib raises ⇔ native status 1, else equal."""
    import ctypes
    import zlib

    from tl_spark.operators.pdf import _flate_decode

    lib = native_pdf.load()
    try:
        lib.tl_zlib_inflate_test.restype = ctypes.POINTER(
            native_pdf._TlBytesOut
        )
        lib.tl_zlib_inflate_test.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    except AttributeError:
        pytest.skip("stale cdylib without the inflate test hook")

    def native(data: bytes):
        out = lib.tl_zlib_inflate_test(data, len(data))
        assert out
        try:
            o = out.contents
            if o.status != 0:
                return None
            return ctypes.string_at(o.data, o.len) if o.len else b""
        finally:
            lib.tl_bytes_free(out)

    def python(data: bytes):
        try:
            return _flate_decode(data)
        except ValueError:
            return None

    rng = random.Random(31)
    payloads = [
        b"",
        b"a",
        b"abc" * 1000,
        bytes(rng.randrange(256) for _ in range(4096)),
        bytes(rng.randrange(4) for _ in range(8192)),  # low entropy
        b"\x00" * 70000,  # > one stored block if level 0
    ]
    streams = []
    for p in payloads:
        for level in (0, 1, 6, 9):
            streams.append(zlib.compress(p, level))
    # exactness on valid streams
    for s in streams:
        assert native(s) == python(s)
    # truncations: every prefix of a sample of streams
    for s in (streams[2], streams[5], streams[13], streams[-1]):
        step = max(1, len(s) // 200)
        for cut in range(0, len(s), step):
            t = s[:cut]
            assert native(t) == python(t), ("truncate", len(s), cut)
    # random mutations
    n_div = 0
    for trial in range(600):
        s = bytearray(rng.choice(streams))
        if not s:
            continue
        for _ in range(rng.randrange(1, 4)):
            s[rng.randrange(len(s))] = rng.randrange(256)
        t = bytes(s)
        n, p = native(t), python(t)
        assert n == p, ("mutate", trial)
        n_div += n is None
    assert n_div > 0  # the corpus did exercise the error paths


def test_doc_leg_decrypts_aes256_v5r6():
    """ISO 32000-2 AES-256 (V5/R6): the native doc leg must ENGAGE
    (not bail) and match the Python handler byte-for-byte. This
    end-to-end pins the from-scratch SHA-256/384/512 and the
    Algorithm 2.B hardened hash — a single wrong constant fails
    authentication and the engagement assertion trips."""
    from tl_spark.operators.pdf import extract_pdf_pages_with_spans, pdf_bytes
    from tl_spark.operators.pdf_crypt import encrypt_pdf

    for i, t in enumerate(
        ["alpha beta gamma delta " * 30, "δέλτα 北京 😀 über " * 25]
    ):
        enc = encrypt_pdf(pdf_bytes(t, i % 4), method="aes256")
        assert native_pdf.doc_chunks(enc) is not None, "doc leg bailed"
        nat = extract_pdf_pages_with_spans(enc)
        with _native_disabled():
            ref = extract_pdf_pages_with_spans(enc)
        assert nat == ref and nat


def test_doc_leg_aes256_mutation_fuzz():
    """Mutations over AES-256 fixtures: same pages or same exception
    (corrupt /U//UE validation salts, wrapped keys, stream bodies)."""
    from tl_spark.operators.pdf import pdf_bytes
    from tl_spark.operators.pdf_crypt import encrypt_pdf

    rng = random.Random(41)
    base = [
        encrypt_pdf(pdf_bytes(t, i % 4), method="aes256")
        for i, t in enumerate(_texts(4, words=24))
    ]
    for trial in range(120):
        src = rng.choice(base)
        d = bytearray(src)
        if trial % 2 == 0:
            # aim at the /Encrypt dictionary region
            at = max(0, src.find(b"/Encrypt") - 600)
            lo, hi = at, min(len(d), at + 1200)
        else:
            lo, hi = 0, len(d)
        for _ in range(rng.randrange(1, 5)):
            d[rng.randrange(lo, hi)] = rng.randrange(256)
        d = bytes(d)
        nat = _extract_outcome(d)
        with _native_disabled():
            ref = _extract_outcome(d)
        assert nat == ref, (trial, nat[0], ref[0])


def test_native_r56_hash_parity():
    """Algorithm 2.B native leg vs the pure-Python loop: bit-equal
    over random pwd/salt/udata shapes (both the handler and the
    fixture writer route through it)."""
    from tl_spark.kernel import native_crypt
    from tl_spark.operators.pdf_crypt import _hash_2b

    if native_crypt.r56_hash(b"", b"\x00" * 8, b"", 6) is None:
        pytest.skip("stale cdylib without tl_r56_hash")
    rng = random.Random(5)
    for _ in range(24):
        pwd = bytes(rng.randrange(256) for _ in range(rng.choice([0, 3, 8])))
        salt = bytes(rng.randrange(256) for _ in range(8))
        ud = bytes(rng.randrange(256) for _ in range(rng.choice([0, 48])))
        assert native_crypt.r56_hash(pwd, salt, ud, 6) == _hash_2b(pwd, salt, ud)
