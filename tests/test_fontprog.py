"""Embedded font-program decode (operators/fontprog.py): TrueType
cmap/post + bare-CFF charset/Encoding/strings parsing, the fixture
builders, the _Font fallback wiring, and the ValueError contract.
No reference analog — y21/tl is HTML-only."""

from __future__ import annotations

import struct
import zlib

import pytest

from tl_spark.operators.fontprog import (
    CFF_STANDARD_STRINGS,
    MAC_GLYPH_ORDER,
    build_sfnt,
    build_subset_cff,
    build_subset_ttf,
    cff_code_map,
    fontfile_code_map,
    truetype_code_map,
)
from tl_spark.operators.pdf import (
    extract_pdf_pages,
    pdf_bytes,
    pdf_bytes_variant,
    wrap_lines,
)


def _charmap(text: str) -> dict[str, int]:
    return {ch: 0x20 + i for i, ch in enumerate(sorted(set(text)))}


def _decode(m: dict[int, str], cm: dict[str, int], text: str) -> str:
    return "".join(m[cm[ch]] for ch in text)


# -- builder / parser round-trips ------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "Hello subset font world 0123!",
        "quotes ' \" and (parens) plus \\backslash",
        "café naïve ünïcode",
        "你好 世界 mixed ascii too",
        "𝄞 non-BMP music glyph",  # u+1D11E → uXXXXX glyph name path
    ],
)
def test_ttf_and_cff_roundtrip(text):
    cm = _charmap(text)
    for build, parse in (
        (build_subset_ttf, truetype_code_map),
        (build_subset_cff, cff_code_map),
    ):
        m = parse(build(cm))
        assert _decode(m, cm, text) == text


def test_builders_reject_bad_charmaps():
    with pytest.raises(ValueError):
        build_subset_ttf({})
    with pytest.raises(ValueError):
        build_subset_ttf({"a": 0x20, "b": 0x25})  # non-contiguous
    with pytest.raises(ValueError):
        build_subset_cff({"a": 300})  # not a byte


def test_dispatch_by_signature():
    cm = _charmap("abc")
    assert fontfile_code_map(build_subset_ttf(cm))
    assert fontfile_code_map(build_subset_cff(cm))
    with pytest.raises(ValueError):
        fontfile_code_map(b"\x80garbage prefix")


# -- TrueType table details ------------------------------------------------


def _sub4(pairs: list[tuple[int, int]]) -> bytes:
    """cmap format 4 with one single-code segment per pair."""
    segs = sorted(pairs) + [(0xFFFF, 0)]
    n = len(segs)
    hdr = struct.pack(">HHHHHHH", 4, 16 + 8 * n, 0, 2 * n, 2, 1, 0)
    ends = b"".join(struct.pack(">H", c) for c, _ in segs)
    starts = b"".join(struct.pack(">H", c) for c, _ in segs)
    deltas = b"".join(
        struct.pack(">H", (g - c) & 0xFFFF) for c, g in segs[:-1]
    ) + struct.pack(">H", 1)
    ros = b"\x00\x00" * n
    return hdr + ends + b"\x00\x00" + starts + deltas + ros


def _cmap_table(subs: list[tuple[int, int, bytes]]) -> bytes:
    hdr = struct.pack(">HH", 0, len(subs))
    off = 4 + 8 * len(subs)
    recs, bodies = [], []
    for pid, eid, body in subs:
        recs.append(struct.pack(">HHI", pid, eid, off))
        bodies.append(body)
        off += len(body)
    return hdr + b"".join(recs) + b"".join(bodies)


def test_cmap_format0_and_mac_order_post():
    """(1,0) byte cmap format 0 + post 2.0 indices < 258 (standard
    Macintosh glyph order names)."""
    fmt0 = struct.pack(">HHH", 0, 262, 0) + bytes(
        {0x41: 1, 0x27: 2}.get(c, 0) for c in range(256)
    )
    post = (
        struct.pack(">IiHHIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
        + struct.pack(">HHHH", 3, 0,
                      MAC_GLYPH_ORDER.index("A"),
                      MAC_GLYPH_ORDER.index("quotesingle"))
    )
    font = build_sfnt({b"cmap": _cmap_table([(1, 0, fmt0)]), b"post": post})
    m = truetype_code_map(font)
    assert m[0x41] == "A" and m[0x27] == "'"


def test_cmap_format6():
    fmt6 = struct.pack(">HHHHHHH", 6, 20, 0, 0x61, 2, 1, 2)
    post = (
        struct.pack(">IiHHIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
        + struct.pack(">HHHH", 3, 0, 258, 259)
        + b"\x07uni0078\x07uni0079"
    )
    font = build_sfnt({b"cmap": _cmap_table([(1, 0, fmt6)]), b"post": post})
    m = truetype_code_map(font)
    assert m[0x61] == "x" and m[0x62] == "y"


def test_unicode_cmap_inverse_when_post_has_no_names():
    """Nonsymbolic shape: (1,0) byte cmap for codes, (3,1) Unicode
    cmap inverted for gid→unicode, post format 3.0 (no names)."""
    byte_map = _sub4([(0x30, 5), (0x31, 6)])
    uni_map = _sub4([(0x2603, 5), (0x2604, 6)])  # snowman, comet
    post3 = struct.pack(">IiHHIIIII", 0x00030000, 0, 0, 0, 0, 0, 0, 0, 0)
    font = build_sfnt({
        b"cmap": _cmap_table([(1, 0, byte_map), (3, 1, uni_map)]),
        b"post": post3,
    })
    m = truetype_code_map(font)
    assert m[0x30] == "☃" and m[0x31] == "☄"


def test_symbol_cmap_surfaces_low_byte_codes():
    cm = _charmap("AZ")
    m = truetype_code_map(build_subset_ttf(cm))
    for ch, code in cm.items():
        assert m[code] == ch  # low byte
        assert m[0xF000 | code] == ch  # full symbol code


def test_otto_wrapper_routes_to_cff():
    cm = _charmap("otto path")
    cff = build_subset_cff(cm)
    font = build_sfnt({b"CFF ": cff})
    # build_sfnt writes a 1.0 version tag; patch to OTTO
    font = b"OTTO" + font[4:]
    m = truetype_code_map(font)
    assert _decode(m, cm, "otto path") == "otto path"


# -- CFF details -----------------------------------------------------------


def test_cff_standard_strings_prefix_exact():
    assert CFF_STANDARD_STRINGS[0] == ".notdef"
    assert CFF_STANDARD_STRINGS[1] == "space"
    assert CFF_STANDARD_STRINGS[8] == "quoteright"
    assert CFF_STANDARD_STRINGS[34] == "A"
    assert CFF_STANDARD_STRINGS[66] == "a"
    assert CFF_STANDARD_STRINGS[95] == "asciitilde"
    assert len(MAC_GLYPH_ORDER) == 258


def test_cff_standard_encoding_and_standard_sids():
    """charset with standard SIDs + Encoding offset 0 (Standard):
    printable-ASCII code c → SID c-31 → AGL name → unicode."""
    text = "Standard! (abc XYZ)"
    sids = [ord(ch) - 31 for ch in sorted(set(text))]
    n = len(sids)
    header = b"\x01\x00\x04\x04"
    name_idx = b"\x00\x01\x01\x01\x02T"  # INDEX ["T"]
    string_idx = b"\x00\x00"
    gsubr_idx = b"\x00\x00"
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids)
    charstrings = (
        struct.pack(">HB", n + 1, 1)
        + bytes(range(1, n + 3))
        + b"\x0e" * (n + 1)
    )

    def top(cs, chs):
        return (
            b"\x1d" + struct.pack(">i", chs) + b"\x0f"
            + b"\x1d" + struct.pack(">i", 0) + b"\x10"
            + b"\x1d" + struct.pack(">i", cs) + b"\x11"
        )

    td = top(0, 0)
    top_idx_len = 3 + 2 + len(td)
    base = len(header) + len(name_idx) + top_idx_len + len(string_idx) + len(gsubr_idx)
    chs_off = base
    cs_off = chs_off + len(charset)
    td = top(cs_off, chs_off)
    top_idx = struct.pack(">HB", 1, 1) + bytes([1, 1 + len(td)]) + td
    cff = header + name_idx + top_idx + string_idx + gsubr_idx + charset + charstrings
    m = cff_code_map(cff)
    assert _decode(m, {ch: ord(ch) for ch in set(text)}, text) == text


def test_cff_charset_range_formats():
    """Format 1/2 charset ranges resolve consecutive SIDs."""
    cm = _charmap("abcd")
    cff = bytearray(build_subset_cff(cm))
    # the builder emits format 0 charset: locate and rewrite as
    # format 1 (first SID 391, nLeft 3) padded to the same length
    fmt0 = b"\x00" + b"".join(struct.pack(">H", 391 + i) for i in range(4))
    i = bytes(cff).find(fmt0)
    assert i > 0
    fmt1 = b"\x01" + struct.pack(">HB", 391, 3) + b"\x00" * (len(fmt0) - 5)
    # trailing pad bytes would shift CharStrings; instead rebuild the
    # tail: charset is immediately before CharStrings in the builder
    rest = bytes(cff[i + len(fmt0):])
    prefix = bytes(cff[:i])
    # patch CharStrings offset in the Top DICT (shrunk by pad delta)
    delta = len(fmt0) - len(b"\x01" + struct.pack(">HB", 391, 3))
    old = struct.pack(">i", i + len(fmt0))
    new = struct.pack(">i", i + len(fmt0) - delta)
    assert prefix.count(old) == 1
    prefix = prefix.replace(old, new)
    cff2 = prefix + b"\x01" + struct.pack(">HB", 391, 3) + rest
    m = cff_code_map(cff2)
    assert _decode(m, cm, "abcd") == "abcd"


# -- PDF end-to-end --------------------------------------------------------


@pytest.mark.parametrize("variant", [6, 7])
def test_pdf_subset_font_variants_extract(variant):
    text = "embedded subset font text decodes only through the program"
    b = pdf_bytes_variant(text, variant)
    assert b"/ToUnicode" not in b
    assert b"/Encoding" not in b
    pages = extract_pdf_pages(b)
    lines = wrap_lines(text)
    assert pages == ["\n".join(lines[i : i + 5]) for i in range(0, len(lines), 5)]


def test_pdf_symbolic_font_with_garbage_program_raises_valueerror():
    b = pdf_bytes("fail fast on broken font", 1, font="subset-ttf")
    raw = zlib.decompress  # locate the flate fontfile stream and corrupt it
    import re

    m = re.search(rb"5 0 obj\n<< [^>]*/Length (\d+) >>\nstream\n", b)
    assert m
    start = m.end()
    ln = int(m.group(1))
    corrupted = b[:start] + zlib.compress(b"\x80not a font") + b[start + ln :]
    # /Length changed → rebuild with same length by padding
    pad = ln - len(zlib.compress(b"\x80not a font"))
    assert pad >= 0
    corrupted = (
        b[:start] + zlib.compress(b"\x80not a font") + b" " * pad + b[start + ln :]
    )
    with pytest.raises(ValueError):
        extract_pdf_pages(corrupted)


def test_nonsymbolic_font_not_routed_through_program(monkeypatch):
    """Flags without bit 3 (or no /FontFile) must keep the WinAnsi
    base path — the fallback is gated on the spec condition."""
    import tl_spark.operators.fontprog as FP

    def boom(data):  # pragma: no cover - must not be called
        raise AssertionError("fontfile_code_map called for nonsymbolic font")

    monkeypatch.setattr(FP, "fontfile_code_map", boom)
    b = pdf_bytes("plain winansi text here", 0)  # Helvetica, no descriptor
    assert extract_pdf_pages(b)[0].startswith("plain winansi")


# -- fuzz: the ValueError contract over the new surface --------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=1, max_size=60), st.integers(0, 3))
def test_fuzz_mutated_font_program_contract(data, which):
    """Splice random bytes into a real font program: fontfile_code_map
    either returns a dict or raises ValueError — never hangs, never
    leaks another exception type."""
    cm = _charmap("fuzz the font tables hard")
    base = bytearray(
        build_subset_ttf(cm) if which % 2 == 0 else build_subset_cff(cm)
    )
    pos = (len(data) * 2654435761 + which) % max(1, len(base) - len(data))
    base[pos : pos + len(data)] = data
    try:
        out = fontfile_code_map(bytes(base))
    except ValueError:
        return
    assert isinstance(out, dict)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_fuzz_mutated_subset_pdf_contract(data):
    """Same contract one level up: mutate a subset-font PDF and run
    the full extraction."""
    base = bytearray(pdf_bytes("mutate the embedded font path", 1, font="subset-cff"))
    pos = (len(data) * 7919) % max(1, len(base) - len(data) - 1)
    base[pos : pos + len(data)] = data
    try:
        pages = extract_pdf_pages(bytes(base))
    except ValueError:
        return
    assert isinstance(pages, list)
