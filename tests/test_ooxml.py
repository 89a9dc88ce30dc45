"""OOXML text extraction (DOCX/PPTX/XLSX): exact semantics, entity
decoding, adversarial shapes, the Spark operator, and a closed-form
DuckDB oracle (tl_spark/operators/ooxml.py)."""

import io
import zipfile

import duckdb
import pytest

from tl_spark.operators.ooxml import (
    _unescape,
    docx_bytes,
    docx_text,
    office_extract,
    office_payload_info,
    pptx_bytes,
    pptx_text,
    synth_office_media,
    xlsx_bytes,
    xlsx_strings,
)


def test_docx_paragraphs_runs_tabs_breaks():
    d = docx_bytes(["Hello & <world>", "second para", ("left", "right")])
    t, n = docx_text(d)
    assert t == "Hello & <world>\nsecond para\nleft\tright" and n == 3
    # explicit break elements
    xml = (
        '<?xml version="1.0"?><w:document><w:body>'
        "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t><w:cr/><w:t>c</w:t>"
        "</w:r></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", xml)
    t, n = docx_text(buf.getvalue())
    assert t == "a\nb\nc" and n == 1


def test_pptx_slide_order_is_numeric_not_lexical():
    # slide10 must come AFTER slide2
    p = pptx_bytes([["one"]] * 10)  # slide1..slide10
    buf = io.BytesIO(p)
    with zipfile.ZipFile(buf) as zf:
        names = zf.namelist()
    assert "ppt/slides/slide10.xml" in names
    text, n = pptx_text(p)
    assert n == 10 and text.split("\n\n") == ["one"] * 10
    p2 = pptx_bytes([["first"], ["second"]])
    assert pptx_text(p2)[0] == "first\n\nsecond"


def test_xml_entities_exact():
    assert _unescape("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert _unescape("&#65;&#x42;") == "AB"
    assert _unescape("no entities") == "no entities"
    d = docx_bytes(["a&b<c>d\"e'f"])
    assert docx_text(d)[0] == "a&b<c>d\"e'f"


def test_malformed_contract():
    for bad in (b"", b"PK\x03\x04 truncated", b"not a zip at all"):
        with pytest.raises(ValueError):
            office_payload_info(bad)
    # a zip with no known document part
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "x")
    with pytest.raises(ValueError, match="no known document part"):
        office_payload_info(buf.getvalue())
    # missing slides
    with pytest.raises(ValueError):
        pptx_text(buf.getvalue())


def test_router_info():
    assert office_payload_info(docx_bytes(["x"]))["format"] == "docx"
    assert office_payload_info(pptx_bytes([["x"]]))["format"] == "pptx"
    assert office_payload_info(xlsx_bytes(["x"]))["format"] == "xlsx"


def test_operator_with_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["format"], r["text"], r["n_units"])
        for r in office_extract(synth_office_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            WITH p AS (
              SELECT id, 2 + id % 4 AS n, 23 + id AS seed, id % 3 AS v
              FROM range(30) t(id)),
            x AS (
              SELECT p.*, string_agg('unit ' || seed || '-' || k,
                                     chr(10) ORDER BY k) AS text
              FROM p JOIN range(6) s(k) ON s.k < p.n
              GROUP BY ALL)
            SELECT id AS media_id,
                   CASE v WHEN 0 THEN 'docx' WHEN 1 THEN 'pptx'
                          ELSE 'xlsx' END AS format,
                   -- pptx joins slides with a BLANK line
                   CASE WHEN v = 1
                        THEN replace(text, chr(10), chr(10) || chr(10))
                        ELSE text END AS text,
                   n AS n_units
            FROM x
            """
        ).fetchall()
    )
    assert rows == duck


def test_on_error_policy(spark):
    bad = spark.createDataFrame(
        [(9, bytearray(b"junk"))], "media_id long, payload binary"
    )
    assert office_extract(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        office_extract(bad, on_error="raise").collect()
