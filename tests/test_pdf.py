"""PDF kernel + Spark plumbing tests (operators/pdf.py).

Ground-truth strategy mirrors the media codecs: the deterministic
generator (four structural variants of real ISO 32000 files) defines
expected text via the closed wrap rule, and hand-built documents pin
the parser features the generator doesn't emit (LZW, RunLength,
literal-string escape table, damaged-xref scan recovery, /Differences,
/Widths word gaps, bfchar CMaps, inline-image skip).
"""

from __future__ import annotations

import zlib

import pytest

from tl_spark.operators.pdf import (
    LINES_PER_PAGE,
    PdfDocument,
    _a85_decode,
    _ahx_decode,
    _apply_filters,
    _lzw_decode,
    _rl_decode,
    extract_pdf_pages,
    pdf_bytes,
    pdf_bytes_variant,
    wrap_lines,
)

TEXTS = [
    "the fast key order sort table scan merge part window small hash "
    "scan join order batch batch batch stream spark window window dup",
    "héllo wörld ünïcode çheck " * 12 + "emoji 🙂 pair",
    "a",
    "",
    "par(en) and back\\slash words here ok " * 6,
    "word " * 97,  # multi-page, non-multiple-of-line tail
]


def expected_pages(text: str) -> list[str]:
    lines = wrap_lines(text)
    return [
        "\n".join(lines[i : i + LINES_PER_PAGE])
        for i in range(0, len(lines), LINES_PER_PAGE)
        if lines[i : i + LINES_PER_PAGE]
    ]


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
@pytest.mark.parametrize("ti", range(len(TEXTS)))
def test_roundtrip_variants(variant, ti):
    text = TEXTS[ti]
    got = [p for p in extract_pdf_pages(pdf_bytes(text, variant, rot=ti + 1)) if p]
    assert got == [p for p in expected_pages(text) if p]


def test_rotated_draw_order_is_reassembled():
    """Variant 0 draws lines starting mid-page and wrapping around;
    extraction must still return reading order."""
    text = "alpha beta gamma delta epsilon zeta eta theta " * 10
    for rot in range(1, 6):
        got = extract_pdf_pages(pdf_bytes(text, 0, rot=rot))
        assert got == expected_pages(text)


def test_incremental_update_newest_object_wins():
    b = pdf_bytes("some words here", 3)
    doc = PdfDocument(b)
    info = doc.resolve(doc.trailer.get("Info"))
    assert info["Producer"] == b"tl_spark synth v2"


def test_objstm_and_xref_stream_parse():
    b = pdf_bytes("words " * 30, 2)
    assert b"/ObjStm" in b and b"/XRef" in b
    doc = PdfDocument(b)
    assert len(doc.pages()) == len(expected_pages("words " * 30))


def test_scan_fallback_on_damaged_startxref():
    b = bytearray(pdf_bytes("recover me please now", 0))
    idx = b.rfind(b"startxref")
    end = b.find(b"\n", idx + 10)
    num = b[idx + 10 : end].strip()
    b[idx + 10 : end] = b"9" * len(num)  # bogus offset
    got = extract_pdf_pages(bytes(b))
    assert got == expected_pages("recover me please now")


def test_junk_before_header_is_tolerated():
    b = b"\n\nGARBAGE\n" + pdf_bytes("leading junk case", 0)
    # offsets are now shifted — the classic xref misses, scan recovers
    assert extract_pdf_pages(b) == expected_pages("leading junk case")


def test_bogus_encrypt_dict_rejected():
    """/Encrypt pointing at a non-handler dict (here: the font object)
    is a clean ValueError, not a crash. Genuinely encrypted files now
    OPEN via the standard security handler — see test_pdf_crypt.py."""
    b = pdf_bytes("secret", 0)
    b = b.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 3 0 R")
    with pytest.raises(ValueError, match="encryption filter"):
        PdfDocument(b)


# -- filters ---------------------------------------------------------------


def _lzw_encode_pdf(data: bytes, early: int = 1) -> bytes:
    """Minimal MSB-first PDF LZW encoder (test-only reference)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    w = b""
    for c in data:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code + early - 1 >= (1 << width) and width < 12:
            width += 1
        w = bytes([c])
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize(
    "data",
    [b"", b"A", b"TOBEORNOTTOBEORTOBEORNOT" * 40, bytes(range(256)) * 9],
)
def test_lzw_roundtrip(data):
    assert _lzw_decode(_lzw_encode_pdf(data)) == data


def test_runlength_decode():
    # literal run of 3, repeat 'X' 5 times, EOD
    assert _rl_decode(b"\x02abc\xfcX\x80") == b"abcXXXXX"


def test_a85_and_ahx():
    assert _a85_decode(b"<+oue+DGm>@3BZ'F*%~>".replace(b"<+oue", b"<+oue")) != b""
    # spec example: 'z' is four zero bytes
    assert _a85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ahx_decode(b"48 65 6c 6c 6f3>") == b"Hello0"[:-1] + b"0"


def test_filter_cascade_order():
    data = b"cascade order matters" * 10
    enc = _lzw_encode_pdf(zlib.compress(data))
    out = _apply_filters(enc, ["LZWDecode", "FlateDecode"], None)
    assert out == data


def test_lzw_in_stream_dict():
    """A content stream with /LZWDecode end-to-end."""
    base = pdf_bytes("lzw stream check words", 0)
    doc = PdfDocument(base)
    page = doc.pages()[0]
    raw_content = doc.page_content(page)
    enc = _lzw_encode_pdf(raw_content)
    # splice: replace the raw content stream with an LZW one
    old = b"stream\n" + raw_content + b"\nendstream"
    new = b"stream\n" + enc + b"\nendstream"
    b2 = base.replace(old, new).replace(
        b"<< /Length %d >>" % len(raw_content),
        b"<< /Filter /LZWDecode /Length %d >>" % len(enc),
    )
    assert extract_pdf_pages(b2) == expected_pages("lzw stream check words")


# -- lexer / strings -------------------------------------------------------


def _mini_pdf(content_ops: bytes, font_extra: bytes = b"") -> bytes:
    """One-page raw PDF around arbitrary content ops (WinAnsi font)."""
    from tl_spark.operators.pdf import _emit_classic, _plain_body, _stream_body

    bodies = {
        1: _plain_body(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _plain_body(
            2,
            b"<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> >>",
        ),
        3: _plain_body(
            3,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding " + font_extra + b">>",
        ),
        4: _plain_body(4, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
        5: _stream_body(5, {}, content_ops),
    }
    return _emit_classic(bodies, root=1)[0]


def test_literal_string_escapes():
    ops = (
        b"BT /F1 11 Tf 1 0 0 1 72 760 Tm "
        b"(octal \\101\\102 nl\\nparen \\( deep (nested) done) Tj ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == [
        "octal AB nl\nparen ( deep (nested) done"
    ]


def test_string_line_continuation_and_crlf():
    ops = (
        b"BT /F1 11 Tf 1 0 0 1 72 760 Tm (joined \\\r\nhalves; raw\r\neol) Tj ET"
    )
    # \<EOL> vanishes; raw CRLF inside a string becomes \n
    assert extract_pdf_pages(_mini_pdf(ops)) == ["joined halves; raw\neol"]


def test_hex_string_odd_digits_and_ws():
    ops = b"BT /F1 11 Tf 1 0 0 1 72 760 Tm <48 65 6C6C 6F2> Tj ET"
    # odd count pads a trailing 0 -> final pair 0x20 == trailing space
    assert extract_pdf_pages(_mini_pdf(ops)) == ["Hello "]


def test_winansi_high_bytes():
    ops = b"BT /F1 11 Tf 1 0 0 1 72 760 Tm (caf\xe9 \x93quoted\x94 \x80) Tj ET"
    assert extract_pdf_pages(_mini_pdf(ops)) == ["café “quoted” €"]


def test_differences_encoding():
    font_extra = (
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 65 /bullet /Euro 200 /eacute ] >> "
    )
    ops = b"BT /F1 11 Tf 1 0 0 1 72 760 Tm (xAB\xc8x) Tj ET"
    assert extract_pdf_pages(_mini_pdf(ops, font_extra)) == ["x•€éx"]


def test_comments_ignored():
    ops = (
        b"% leading comment\nBT /F1 11 Tf % mid comment\n"
        b"1 0 0 1 72 760 Tm (visible) Tj ET % tail"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["visible"]


# -- layout ----------------------------------------------------------------


def test_word_gap_inserts_space_abutting_does_not():
    # default width 500/1000 at size 10 -> "AB" advances 10pt from x=100
    ops = (
        b"BT /F1 10 Tf "
        b"1 0 0 1 100 700 Tm (AB) Tj "
        b"1 0 0 1 110.4 700 Tm (cd) Tj "  # gap 0.4pt < 1.3 -> merged
        b"1 0 0 1 124 700 Tm (EF) Tj "  # gap 3.6pt >= 1.3 -> space
        b"ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["ABcd EF"]


def test_explicit_widths_drive_pen():
    font_extra = b"/FirstChar 65 /Widths [ 1000 1000 ] "  # A,B are 1000/1000
    ops = (
        b"BT /F1 10 Tf "
        b"1 0 0 1 100 700 Tm (AB) Tj "  # pen ends at 120 with w=1000
        b"1 0 0 1 120.4 700 Tm (C) Tj "  # gap 0.4 -> merged
        b"ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops, font_extra)) == ["ABC"]


def test_rows_split_by_y_and_sorted():
    ops = (
        b"BT /F1 11 Tf "
        b"1 0 0 1 72 700 Tm (second) Tj "
        b"1 0 0 1 72 720 Tm (first) Tj "
        b"1 0 0 1 72 680 Tm (third) Tj "
        b"ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["first\nsecond\nthird"]


def test_tz_tc_and_ctm_do_not_corrupt_text():
    ops = (
        b"q 2 0 0 2 10 10 cm "
        b"BT /F1 11 Tf 120 Tz 0.4 Tc 1 0 0 1 36 350 Tm (scaled text) Tj ET Q"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["scaled text"]


def test_tw_word_spacing_applies_and_ts_rise():
    ops = (
        b"BT /F1 11 Tf 2 Tw 3 Ts 1 0 0 1 72 760 Tm (two words) Tj ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["two words"]


def test_inline_image_skipped():
    payload = b"\x00\x01EI\x02\x03" * 4  # contains EI without ws boundary
    ops = (
        b"BT /F1 11 Tf 1 0 0 1 72 760 Tm (before) Tj ET "
        b"BI /W 2 /H 2 /BPC 8 /CS /RGB ID " + payload + b" EI "
        b"BT /F1 11 Tf 1 0 0 1 72 740 Tm (after) Tj ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["before\nafter"]


def test_quote_ops_and_leading():
    ops = (
        b"BT /F1 11 Tf 14 TL 1 0 0 1 72 774 Tm "
        b"(l1) ' (l2) ' 1 2 (l3) \" ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops)) == ["l1\nl2\nl3"]


def test_tounicode_bfchar_overrides_encoding():
    from tl_spark.operators.pdf import _parse_tounicode

    cmap = (
        b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
        b"2 beginbfchar\n<41> <0042>\n<42> <D83DDE42>\nendbfchar\nendcmap"
    )
    m = _parse_tounicode(cmap)
    assert m[0x41] == "B"
    assert m[0x42].encode("utf-16-be", "surrogatepass") == b"\xd8\x3d\xde\x42"


def test_bfrange_array_form():
    from tl_spark.operators.pdf import _parse_tounicode

    cmap = (
        b"1 beginbfrange\n<20> <22> [ <0058> <0059> <005A> ]\nendbfrange\n"
    )
    m = _parse_tounicode(cmap)
    assert (m[0x20], m[0x21], m[0x22]) == ("X", "Y", "Z")


def test_surrogate_pairs_recombine():
    text = "astral 🙂🚀 pair"
    got = extract_pdf_pages(pdf_bytes(text, 1))
    assert got == expected_pages(text)
    assert "🙂🚀" in got[0]


# -- Spark plumbing --------------------------------------------------------


@pytest.mark.usefixtures("spark")
class TestSparkOps:
    def test_synth_and_extract(self, spark):
        from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media

        docs = spark.createDataFrame(
            [(i, TEXTS[i % len(TEXTS)]) for i in range(8)],
            "doc_id long, text string",
        )
        out = pdf_text_pages(synth_pdf_media(docs)).orderBy("doc_id", "page_no")
        rows = out.collect()
        exp = []
        for i in range(8):
            for pg, t in enumerate(p for p in expected_pages(TEXTS[i % len(TEXTS)]) if p):
                exp.append((i, pg, t, len(t)))
        assert [tuple(r) for r in rows] == exp

    def test_on_error_skip_drops_bad_payloads(self, spark):
        from tl_spark.operators.pdf import pdf_text_pages

        df = spark.createDataFrame(
            [(1, bytearray(pdf_bytes("good words", 0))), (2, bytearray(b"not a pdf"))],
            "doc_id long, payload binary",
        )
        ok = pdf_text_pages(df, on_error="skip").collect()
        assert {r.doc_id for r in ok} == {1}
        with pytest.raises(Exception):
            pdf_text_pages(df, on_error="raise").collect()

    def test_plan_is_map_only(self, spark):
        from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            pdf_text_pages(synth_pdf_media(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


# -- X-Y-cut column segmentation ------------------------------------------


def _two_column_ops() -> bytes:
    """Full-width title band, then a left column (x=72) and a right
    column (x=320); short lines so a wide gutter exists."""
    ops = [b"BT /F1 10 Tf"]
    ops.append(b"1 0 0 1 72 760 Tm (Grand Unified Title Spanning Columns) Tj")
    for i, t in enumerate([b"(left one)", b"(left two)", b"(left three)"]):
        ops.append(b"1 0 0 1 72 %d Tm %s Tj" % (720 - 14 * i, t))
    for i, t in enumerate([b"(right one)", b"(right two)", b"(right three)"]):
        ops.append(b"1 0 0 1 320 %d Tm %s Tj" % (720 - 14 * i, t))
    ops.append(b"ET")
    return b"\n".join(ops)


def test_xycut_two_columns_with_title_band():
    from tl_spark.operators.pdf import PdfDocument, _assemble, _Interp

    doc = PdfDocument(_mini_pdf(_two_column_ops()))
    page = doc.pages()[0]
    chunks = _Interp(doc, page.get("Resources", {})).run(doc.page_content(page))
    # default (off): rows merge across the gutter
    off = _assemble(chunks, "off")
    assert off.splitlines()[1] == "left one right one"
    # auto: title band first, then left column fully, then right
    auto = _assemble(chunks, "auto")
    assert auto == (
        "Grand Unified Title Spanning Columns\n"
        "left one\nleft two\nleft three\n"
        "right one\nright two\nright three"
    )


def test_xycut_single_column_output_unchanged():
    """columns='auto' must be a no-op on everything the generator
    emits (single-column pages) — the driver oracle depends on it."""
    for variant in range(4):
        for ti, text in enumerate(TEXTS):
            b = pdf_bytes(text, variant, rot=ti + 1)
            assert extract_pdf_pages(b, columns="auto") == extract_pdf_pages(b)


def test_xycut_word_gap_is_not_a_gutter():
    # two chunks on ONE row with a wide gap: only one text row per
    # side, so no vertical cut fires — stays a word gap
    ops = (
        b"BT /F1 10 Tf "
        b"1 0 0 1 100 700 Tm (AB) Tj "
        b"1 0 0 1 200 700 Tm (EF) Tj ET"
    )
    assert extract_pdf_pages(_mini_pdf(ops), columns="auto") == ["AB EF"]


def test_xycut_spark_op_passthrough(spark):
    from tl_spark.operators.pdf import pdf_text_pages

    pdf = _mini_pdf(_two_column_ops())
    df = spark.createDataFrame(
        [(7, bytearray(pdf))], "doc_id long, payload binary"
    )
    row = pdf_text_pages(df, columns="auto").collect()[0]
    assert row.text.startswith("Grand Unified Title")
    assert "left three\nright one" in row.text


@pytest.mark.parametrize("variant", range(8))
def test_twocol_generator_roundtrip(variant):
    """layout='twocol' scrambles draw order (right column first,
    rotated) so plain row assembly interleaves the columns; X-Y-cut
    segmentation recovers exactly the sequential wrap order — byte
    equal to the single-column expected pages."""
    text = " ".join(f"w{i:03d}" for i in range(100))
    b = pdf_bytes_variant(text, variant, layout="twocol")
    assert extract_pdf_pages(b, columns="auto") == expected_pages(text)
    assert extract_pdf_pages(b, columns="off") != expected_pages(text)


def test_twocol_generator_edge_cases():
    """Short pages (<4 lines) stay single-column; empty text yields
    one empty page; both match the closed oracle rule under auto."""
    for text in ("one two three", "", " ".join(f"x{i}" for i in range(8 * 13))):
        for variant in range(8):
            b = pdf_bytes_variant(text, variant, layout="twocol")
            exp = expected_pages(text) or [""]
            assert extract_pdf_pages(b, columns="auto") == exp


def test_twocol_query_matches_oracle(spark):
    """Suite gate for pdf_extract_twocol_docs (VERDICT r6 item 6):
    the columns='auto' X-Y-cut path against the SAME closed-form
    DuckDB oracle as the driver's pdf_extract_docs row — plus the
    pinned negative that columns='off' does NOT reproduce the oracle
    on the two-column input, so the check certifies the recursive cut
    rather than a vacuous pass-through."""
    import duckdb

    from tl_spark import queries as Q
    from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    res = con.execute(Q.PDF_EXTRACT_SQL)
    duck_cols = [d[0] for d in res.description]
    duck_rows = sorted(tuple(r) for r in res.fetchall())

    qdf = Q.queries()["pdf_extract_twocol_docs"](spark, sf)
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert sorted(tuple(r) for r in qdf.collect()) == duck_rows

    off = pdf_text_pages(
        synth_pdf_media(
            spark.read.parquet(f"{sf}/documents.parquet").select(
                "doc_id", "text"
            ),
            layout="twocol",
        ),
        columns="off",
    )
    assert sorted(tuple(r) for r in off.collect()) != duck_rows


def test_scan_fallback_recovers_objstm_members():
    """Damaged startxref on a file whose catalog lives inside an
    /ObjStm: the scan indexes object-stream members too."""
    for variant in (2, 3):
        b = bytearray(pdf_bytes("recover objstm case words now ok", variant))
        idx = b.rfind(b"startxref")
        end = b.find(b"\n", idx + 10)
        b[idx + 10 : end] = b"9" * len(b[idx + 10 : end].strip())
        assert extract_pdf_pages(bytes(b)) == expected_pages(
            "recover objstm case words now ok"
        )


# -- document metadata -----------------------------------------------------


def test_pdf_doc_info_fields():
    from tl_spark.operators.pdf import pdf_doc_info

    meta = pdf_doc_info(pdf_bytes("word " * 60, 3))
    assert meta["version"] == "1.7"
    assert meta["n_pages"] == 2  # 60 words -> 8 lines -> 2 pages
    assert meta["producer"] == "tl_spark synth v2"  # incremental update wins
    assert meta["has_objstm"] is False

    meta2 = pdf_doc_info(pdf_bytes("word " * 60, 2))
    assert meta2["has_objstm"] is True
    assert meta2["n_pages"] == 2

    meta0 = pdf_doc_info(pdf_bytes("word " * 60, 0))
    assert meta0["producer"] == "tl_spark synth v1"  # classic /Info


def test_pdf_doc_info_utf16_title():
    from tl_spark.operators.pdf import pdf_doc_info

    b = pdf_bytes("short text", 0)
    # splice a UTF-16BE /Title into the Info dict
    title = "été 🙂".encode("utf-16-be")
    b = b.replace(
        b"<< /Producer (tl_spark synth v1) >>",
        b"<< /Producer (tl_spark synth v1) /Title <FEFF"
        + title.hex().encode()
        + b"> >>",
    )
    meta = pdf_doc_info(b)
    assert meta["title"] == "été 🙂"


def test_pdf_info_spark_op(spark):
    from tl_spark.operators.pdf import pdf_info

    df = spark.createDataFrame(
        [
            (1, bytearray(pdf_bytes("some words here now", 2))),
            (2, bytearray(b"junk not a pdf")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in pdf_info(df, on_error="skip").collect()}
    assert rows[1].version == "1.7" and rows[1].error is None
    assert rows[1].has_objstm and rows[1].n_pages == 1
    assert rows[2].error is not None and rows[2].n_pages is None
    with pytest.raises(Exception):
        pdf_info(df, on_error="raise").collect()


def test_streaming_pdf_extraction_batch_parity(spark, tmp_path):
    from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media
    from tl_spark.streaming.extract_stream import run_streaming_pdf_extraction

    inp = str(tmp_path / "pdf_in")
    outp = str(tmp_path / "pdf_out")
    ckpt = str(tmp_path / "pdf_ckpt")
    docs = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)]) for i in range(10)],
        "doc_id long, text string",
    )
    synth_pdf_media(docs).write.parquet(inp)
    run_streaming_pdf_extraction(spark, inp, outp, ckpt)
    got = sorted(
        tuple(r) for r in spark.read.parquet(outp).collect()
    )
    batch = sorted(
        tuple(r)
        for r in pdf_text_pages(spark.read.parquet(inp)).collect()
    )
    assert got == batch and len(got) > 0
    # idempotent replay: a second availableNow drain adds nothing
    run_streaming_pdf_extraction(spark, inp, outp, ckpt)
    assert sorted(
        tuple(r) for r in spark.read.parquet(outp).collect()
    ) == batch


# -- adversarial parser paths ----------------------------------------------


def test_indirect_length_and_contents_array():
    """/Length via indirect ref; /Contents as an array of streams."""
    from tl_spark.operators.pdf import _emit_classic, _plain_body

    ops1 = b"BT /F1 11 Tf 1 0 0 1 72 760 Tm (part one) Tj ET"
    ops2 = b"BT /F1 11 Tf 1 0 0 1 72 746 Tm (part two) Tj ET"
    bodies = {
        1: _plain_body(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _plain_body(
            2,
            b"<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> >>",
        ),
        3: _plain_body(
            3,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>",
        ),
        4: _plain_body(
            4, b"<< /Type /Page /Parent 2 0 R /Contents [5 0 R 7 0 R] >>"
        ),
        5: (
            b"5 0 obj\n<< /Length 6 0 R >>\nstream\n" + ops1
            + b"\nendstream\nendobj\n"
        ),
        6: _plain_body(6, b"%d" % len(ops1)),
        7: (
            b"7 0 obj\n<< /Length %d >>\nstream\n" % len(ops2) + ops2
            + b"\nendstream\nendobj\n"
        ),
    }
    pdf = _emit_classic(bodies, root=1)[0]
    assert extract_pdf_pages(pdf) == ["part one\npart two"]


def test_filter_abbreviations():
    data = b"abbreviated filter names" * 5
    assert _apply_filters(zlib.compress(data), ["Fl"], None) == data
    assert _apply_filters(data.hex().encode() + b">", ["AHx"], None) == data
    from tl_spark.operators.pdf import _a85_encode

    assert _apply_filters(_a85_encode(data), ["A85"], None) == data


def test_real_number_forms():
    from tl_spark.operators.pdf import _Lexer

    lx = _Lexer(b"4. -.5 +3 0.25 -2")
    got = [lx.next() for _ in range(5)]
    assert got == [4.0, -0.5, 3, 0.25, -2]


def test_name_hash_escapes():
    from tl_spark.operators.pdf import _Lexer, _Name

    lx = _Lexer(b"/A#42C /Lime#20Green")
    assert lx.next() == _Name("ABC")
    assert lx.next() == _Name("Lime Green")


def test_cid_w_widths_both_forms():
    from tl_spark.operators.pdf import PdfDocument, _Font

    doc = PdfDocument(pdf_bytes("seed", 0))  # any doc, just for resolve()
    font = _Font.__new__(_Font)
    font.widths = {}
    font._parse_cid_widths(doc, [65, [100, 200, 300], 70, 75, 500])
    assert font.widths[65] == 100 and font.widths[67] == 300
    assert all(font.widths[c] == 500 for c in range(70, 76))


def test_nested_page_tree_inheritance():
    """Intermediate Pages node: Resources inherited two levels down,
    Kids order defines page order."""
    from tl_spark.operators.pdf import _emit_classic, _plain_body, _stream_body

    def page(n, ct, text, y=760):
        return (
            _plain_body(n, b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % ct),
            _stream_body(
                ct, {}, b"BT /F1 11 Tf 1 0 0 1 72 %d Tm (%s) Tj ET" % (y, text)
            ),
        )

    p1, c1 = page(6, 7, b"first")
    p2, c2 = page(8, 9, b"second")
    bodies = {
        1: _plain_body(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _plain_body(
            2,
            b"<< /Type /Pages /Kids [5 0 R 8 0 R] /Count 2 "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> >>",
        ),
        3: _plain_body(
            3,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>",
        ),
        5: _plain_body(5, b"<< /Type /Pages /Parent 2 0 R /Kids [6 0 R] /Count 1 >>"),
        6: p1, 7: c1, 8: p2, 9: c2,
    }
    pdf = _emit_classic(bodies, root=1)[0]
    assert extract_pdf_pages(pdf) == ["first", "second"]


# -- property tests --------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates in input
        blacklist_characters=" \n\r",
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=120, deadline=None)
@given(st.lists(_word, min_size=0, max_size=60), st.integers(0, 3))
def test_fuzz_roundtrip_any_unicode(words, variant):
    text = " ".join(words)
    got = [p for p in extract_pdf_pages(pdf_bytes(text, variant)) if p]
    assert got == [p for p in expected_pages(text) if p]


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_garbage_never_hangs(data):
    """Arbitrary bytes: clean ValueError (or empty result), never a
    hang or a non-ValueError crash."""
    try:
        pages = extract_pdf_pages(b"%PDF-1.7\n" + data)
    except ValueError:
        return
    assert isinstance(pages, list)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_mutated_real_pdf(data):
    """Splice random bytes into a real PDF body: same contract."""
    base = bytearray(pdf_bytes("mutate me gently now", 2))
    pos = (len(data) * 7919) % max(1, len(base) - len(data) - 1)
    base[pos : pos + len(data)] = data
    try:
        pages = extract_pdf_pages(bytes(base))
    except ValueError:
        return
    assert isinstance(pages, list)


# -- composition: archives of PDFs ----------------------------------------


def test_archive_of_pdfs_composes(spark, tmp_path):
    """zip-of-PDFs → expand_archives → pdf_text_concat: the crawl
    shape for bulk document dumps."""
    import io
    import zipfile

    from tl_spark.operators.archives import expand_archives
    from tl_spark.operators.pdf import pdf_text_concat

    buf = io.BytesIO()
    texts = {f"doc{i}.pdf": f"zip member number {i} words here" for i in range(3)}
    with zipfile.ZipFile(buf, "w") as zf:
        for name, t in texts.items():
            zf.writestr(name, pdf_bytes(t, i := int(name[3]) % 4))
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "archive_id long, payload binary"
    )
    members = expand_archives(df)
    out = pdf_text_concat(
        members,
        payload_col="member_bytes",
        passthrough=("archive_id", "member_name"),
    ).collect()
    got = {r.member_name: r.text for r in out}
    assert got == texts


def test_stray_close_paren_never_loops():
    """A lone ')' outside any string hit no lexer branch and looped
    forever (found by the mutation fuzzer). The lexer must always
    advance."""
    from tl_spark.operators.pdf import _Lexer

    lx = _Lexer(b")) << /A )5) >> ]")
    toks = []
    while True:
        t = lx.next()
        if t is None:
            break
        toks.append(t)
    assert len(toks) < 20  # terminates

    base = bytearray(pdf_bytes("mutate me gently now", 1))
    # inject stray close-parens into the trailer region
    idx = base.rfind(b"trailer")
    base[idx + 8 : idx + 8] = b"))) "
    try:
        pages = extract_pdf_pages(bytes(base))
        assert isinstance(pages, list)
    except ValueError:
        pass


def test_type_confused_objects_raise_or_skip():
    """Kids/Resources/Font resolving to non-dict objects must not
    escape as AttributeError/TypeError (mutation-fuzzer findings)."""
    b = pdf_bytes("confuse the types here", 0)
    for bad in (
        (b"/Kids [4 0 R]", b"/Kids 4"),
        (b"/Resources << /Font << /F1 3 0 R >> >>", b"/Resources /Nope"),
        (b"/Font << /F1 3 0 R >>", b"/Font 9"),
    ):
        m = b.replace(*bad)
        try:
            pages = extract_pdf_pages(m)
            assert isinstance(pages, list)
        except ValueError:
            pass


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_fast_lexer_token_differential(data):
    """_FastLexer (regex content tokenizer) must be token-for-token
    identical to _Lexer on arbitrary bytes."""
    from tl_spark.operators.pdf import _FastLexer, _Lexer

    content = b"BT /F1 11 Tf (s) Tj [ <48> -2 ] TJ " + data
    a, f = _Lexer(content), _FastLexer(content)
    for _ in range(300):
        try:
            ta = a.next()
        except ValueError:
            ta = "VE"
        try:
            tf_ = f.next()
        except ValueError:
            tf_ = "VE"
        assert ta == tf_ or (ta is tf_)
        if ta is None or ta == "VE":
            break


# -- spans (text + layout-span contract, HTML-kernel analog) ---------------


def test_spans_slice_text_exactly():
    from tl_spark.operators.pdf import extract_pdf_pages_with_spans

    for variant in range(4):
        text = "alpha beta gamma delta epsilon zeta eta theta " * 9
        for page_text, spans in extract_pdf_pages_with_spans(
            pdf_bytes(text, variant, rot=2)
        ):
            lines = page_text.split("\n")
            assert len(spans) == len(lines)
            for (st, en, x, y), line in zip(spans, lines):
                assert page_text[st:en] == line
                assert x == 72.0  # generator draws at x=72
            ys = [sp[3] for sp in spans]
            assert ys == sorted(ys, reverse=True)  # reading order


def test_spans_with_columns_auto():
    from tl_spark.operators.pdf import (
        PdfDocument,
        _assemble,
        _assemble_spans,
        _Interp,
    )

    doc = PdfDocument(_mini_pdf(_two_column_ops()))
    page = doc.pages()[0]
    chunks = _Interp(doc, page.get("Resources", {})).run(doc.page_content(page))
    text = _assemble(chunks, "auto")
    spans = _assemble_spans(chunks, "auto")
    lines = text.split("\n")
    assert len(spans) == len(lines)
    for (st, en, x, y), line in zip(spans, lines):
        assert text[st:en] == line
    # right-column lines carry the right-column x
    assert [round(sp[2]) for sp in spans] == [72, 72, 72, 72, 320, 320, 320]


def test_pdf_text_pages_emit_spans(spark):
    from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media

    docs = spark.createDataFrame(
        [(3, "words " * 30)], "doc_id long, text string"
    )
    rows = pdf_text_pages(synth_pdf_media(docs), emit_spans=True).collect()
    assert rows and "spans" in rows[0].asDict()
    for r in rows:
        for sp in r.spans:
            assert r.text[sp.start : sp.end] == r.text.split("\n")[
                [s.start for s in r.spans].index(sp.start)
            ]
        assert len(r.spans) == len(r.text.split("\n"))


# -- links + XMP -----------------------------------------------------------


def _linked_pdf() -> bytes:
    from tl_spark.operators.pdf import _emit_classic, _plain_body, _stream_body

    ops = b"BT /F1 11 Tf 1 0 0 1 72 760 Tm (see links) Tj ET"
    xmp = (
        b'<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF>'
        b"<dc:title><rdf:Alt><rdf:li xml:lang=\"x-default\">An XMP "
        b"Title &amp; More</rdf:li></rdf:Alt></dc:title>"
        b"<dc:creator><rdf:Seq><rdf:li>Jan Writer</rdf:li></rdf:Seq>"
        b"</dc:creator></rdf:RDF></x:xmpmeta>"
    )
    bodies = {
        1: _plain_body(
            1, b"<< /Type /Catalog /Pages 2 0 R /Metadata 8 0 R >>"
        ),
        2: _plain_body(
            2,
            b"<< /Type /Pages /Kids [4 0 R] /Count 1 /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> >>",
        ),
        3: _plain_body(
            3,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>",
        ),
        4: _plain_body(
            4,
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/Annots [6 0 R 7 0 R 9 0 R] >>",
        ),
        5: _stream_body(5, {}, ops),
        6: _plain_body(
            6,
            b"<< /Type /Annot /Subtype /Link /Rect [72 750 200 770] "
            b"/A << /S /URI /URI (http://ex.org/first) >> >>",
        ),
        7: _plain_body(
            7,
            b"<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] "
            b"/A << /S /GoTo /D (x) /Next << /S /URI "
            b"/URI (https://ex.org/chained?a=1&b=2) >> >> >>",
        ),
        8: _stream_body(8, {"Type": b"/Metadata", "Subtype": b"/XML"}, xmp),
        9: _plain_body(  # non-link annot: ignored
            9, b"<< /Type /Annot /Subtype /Text /Contents (note) >>"
        ),
    }
    return _emit_classic(bodies, root=1)[0]


def test_pdf_links_extraction():
    from tl_spark.operators.pdf import pdf_links

    assert pdf_links(_linked_pdf()) == [
        (0, "http://ex.org/first"),
        (0, "https://ex.org/chained?a=1&b=2"),
    ]


def test_pdf_links_absent_is_empty():
    from tl_spark.operators.pdf import pdf_links

    assert pdf_links(pdf_bytes("no links here at all", 0)) == []


def test_xmp_metadata_fallback():
    from tl_spark.operators.pdf import pdf_doc_info

    meta = pdf_doc_info(_linked_pdf())
    assert meta["title"] == "An XMP Title & More"
    assert meta["author"] == "Jan Writer"
    # Info-dict strings still win when present
    meta2 = pdf_doc_info(pdf_bytes("plain doc", 0))
    assert meta2["producer"] == "tl_spark synth v1"


def test_pdf_outlinks_spark_op(spark):
    from tl_spark.operators.pdf import pdf_outlinks

    df = spark.createDataFrame(
        [(1, bytearray(_linked_pdf())), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = pdf_outlinks(df, on_error="skip").collect()
    assert [(r.doc_id, r.page_no, r.uri) for r in rows] == [
        (1, 0, "http://ex.org/first"),
        (1, 0, "https://ex.org/chained?a=1&b=2"),
    ]


# -- round-7 hardening (ADVICE + VERDICT items) ----------------------------


def test_flate_bomb_is_capped(monkeypatch):
    """A small crafted zlib bomb must ValueError at the decode cap,
    not expand to multi-GB in executor memory."""
    import tl_spark.operators.pdf as pdfmod

    monkeypatch.setattr(pdfmod, "_MAX_DECODE_BYTES", 1_000_000)
    bomb = zlib.compress(b"\x00" * 4_000_000)
    with pytest.raises(ValueError, match="decode cap"):
        pdfmod._apply_filters(bomb, "FlateDecode", None)
    # legitimate streams under the cap still round-trip
    ok = zlib.compress(b"fine" * 100)
    assert pdfmod._apply_filters(ok, "FlateDecode", None) == b"fine" * 100


def test_circular_objstm_reference_is_valueerror():
    """get() -> _load_objstm() -> get() on a crafted circular ObjStm
    reference must raise the contract ValueError, not RecursionError."""
    doc = PdfDocument(pdf_bytes("circular guard", 0))
    doc._xref[9991] = ("c", 9992, 0)
    doc._xref[9992] = ("c", 9991, 0)
    with pytest.raises(ValueError, match="circular"):
        doc.get(9991)


def test_parse_value_depth_cap():
    from tl_spark.operators.pdf import _FastLexer, _parse_value

    with pytest.raises(ValueError, match="nesting"):
        _parse_value(_FastLexer(b"[" * 5000 + b"]" * 5000, 0))


def test_deep_page_tree_is_valueerror():
    from tl_spark.operators.pdf import _emit_classic, _plain_body

    # a 400-deep linear Kids chain: Pages node i points at i+1
    n_chain = 400
    bodies = {1: _plain_body(1, b"<< /Type /Catalog /Pages 2 0 R >>")}
    for i in range(2, 2 + n_chain):
        bodies[i] = _plain_body(
            i,
            b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % (i + 1),
        )
    last = 2 + n_chain
    bodies[last] = _plain_body(
        last, b"<< /Type /Page /MediaBox [0 0 612 792] >>"
    )
    doc = PdfDocument(_emit_classic(bodies, root=1)[0])
    with pytest.raises(ValueError, match="page tree too deep"):
        doc.pages()


def test_xmp_empty_title_does_not_steal_creator():
    """dc:title with no rdf:li (empty Alt) must NOT lazily capture the
    first rdf:li of dc:creator (ADVICE r6)."""
    from tl_spark.operators.pdf import _emit_classic, _plain_body, _stream_body
    from tl_spark.operators.pdf import PdfDocument, _xmp_meta

    xmp = (
        b'<x:xmpmeta><rdf:RDF>'
        b"<dc:title><rdf:Alt></rdf:Alt></dc:title>"
        b"<dc:creator><rdf:Seq><rdf:li>Real Author</rdf:li></rdf:Seq>"
        b"</dc:creator></rdf:RDF></x:xmpmeta>"
    )
    bodies = {
        1: _plain_body(1, b"<< /Type /Catalog /Pages 2 0 R /Metadata 3 0 R >>"),
        2: _plain_body(2, b"<< /Type /Pages /Kids [] /Count 0 >>"),
        3: _stream_body(3, {"Type": b"/Metadata"}, xmp),
    }
    doc = PdfDocument(_emit_classic(bodies, root=1)[0])
    meta = _xmp_meta(doc)
    assert "title" not in meta
    assert meta["author"] == "Real Author"


def test_poisoned_kernel_propagates_under_skip(monkeypatch):
    """on_error='skip' swallows ONLY the audited ValueError surface; a
    kernel bug (non-ValueError) must fail the task (VERDICT r6)."""
    import pyarrow as pa

    import tl_spark.operators.pdf as pdfmod

    batch = pa.RecordBatch.from_arrays(
        [pa.array([1], type=pa.int64()), pa.array([b"%PDF-junk"])],
        names=["doc_id", "payload"],
    )
    fn = pdfmod._text_pages_fn("doc_id", "payload", "skip", "off", False)

    def boom(raw, columns="off"):
        raise RuntimeError("kernel bug, not malformed input")

    monkeypatch.setattr(pdfmod, "extract_pdf_pages", boom)
    with pytest.raises(RuntimeError):
        list(fn(iter([batch])))

    def malformed(raw, columns="off"):
        raise ValueError("malformed input")

    monkeypatch.setattr(pdfmod, "extract_pdf_pages", malformed)
    out = list(fn(iter([batch])))
    assert sum(b.num_rows for b in out) == 0


def test_font_cache_survives_dict_id_reuse():
    """Regression (round-7 whole-doc differential fuzz, trial 9305): a
    page whose Tf names a MISSING resource materializes the default
    font from a short-lived {}; with the old bare-id() doc cache key a
    later-parsed real font dict could land on the recycled address and
    silently inherit the default font. The cache now holds the dict in
    the value (identity-checked), so the aliasing is impossible; this
    pins the observable contract on a crafted two-page doc."""
    import gc

    from tl_spark.operators.pdf import PdfDocument, _Interp, pdf_bytes

    # two pages of non-ASCII text → Type0/Identity-H font, raw content
    d = pdf_bytes("δέλτα εψιλον " * 24, 0)
    # corrupt page 0's Tf operand only (the SECOND /F1 occurrence —
    # the first is the /Resources dict; variant-0 content is raw, so
    # the byte patch is safe)
    at = d.index(b"/F1 ", d.index(b"/F1 ") + 1)
    d = d[:at] + b"/Fx " + d[at + 4 :]
    doc = PdfDocument(d)
    pages = doc.pages()
    assert len(pages) >= 2
    outs = []
    for p in pages:
        it = _Interp(doc, p.get("Resources", {}))
        content = doc.page_content(p)
        outs.append(it.run(content))
        gc.collect()  # encourage id reuse between pages
    # page 0 used the default font (missing name) — 1-byte decode of
    # UTF-16BE codes; page 1 MUST still decode through the real font
    assert "δέλτα" not in "".join(c.text for c in outs[0])
    assert any("δέλτα" in c.text for c in outs[1])
    # structural pin: the doc-scoped cache holds the dict in the value
    for ent in doc._font_cache.values():
        assert isinstance(ent, tuple) and len(ent) == 2
