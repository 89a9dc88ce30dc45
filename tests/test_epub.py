"""EPUB extraction through the HTML kernel: container/OPF/spine walk,
kernel strip semantics, adversarial shapes, the Spark operator, and a
closed-form DuckDB oracle (tl_spark/operators/epub.py)."""

import io
import zipfile

import duckdb
import pytest

from tl_spark.operators.epub import (
    epub_bytes,
    epub_extract,
    epub_text,
    synth_epub_media,
)


def test_spine_order_and_kernel_strip():
    d = epub_bytes([["one "], ["two "], ["three "]])
    t, n = epub_text(d)
    assert t == "one \n\ntwo \n\nthree " and n == 3
    # the kernel strips nav/script boilerplate from every chapter
    assert "chrome" not in t and "var x" not in t


def test_opf_relative_href_resolution():
    # hrefs resolve against the OPF's own directory
    d = epub_bytes([["deep "]], opf_dir="a/b")
    assert epub_text(d) == ("deep ", 1)


def test_malformed_contract():
    with pytest.raises(ValueError):
        epub_text(b"not a zip")
    # zip without container.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="container.xml"):
        epub_text(buf.getvalue())
    # container pointing at a missing OPF
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "META-INF/container.xml",
            '<container><rootfiles><rootfile full-path="gone.opf"/>'
            "</rootfiles></container>",
        )
    with pytest.raises(ValueError, match="gone.opf"):
        epub_text(buf.getvalue())
    # spine idref with no manifest item
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "META-INF/container.xml",
            '<container><rootfiles><rootfile full-path="content.opf"/>'
            "</rootfiles></container>",
        )
        zf.writestr(
            "content.opf",
            '<package><manifest><item id="c1" href="ch1.xhtml"/></manifest>'
            '<spine><itemref idref="zz"/></spine></package>',
        )
    with pytest.raises(ValueError, match="zz"):
        epub_text(buf.getvalue())
    # a CRC-corrupted member must surface as ValueError, not BadZipFile
    broken = epub_bytes([["x "]]).replace(b"<p>x </p>", b"<p>y </p>")
    with pytest.raises(ValueError):
        epub_text(broken)


def test_operator_with_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["text"], r["n_chapters"])
        for r in epub_extract(synth_epub_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            WITH p AS (
              SELECT id, 1 + id % 3 AS nch, 2 + id % 2 AS npar,
                     29 + id AS seed
              FROM range(30) t(id)),
            ch AS (
              -- one chapter's text: paragraph raw texts concatenated
              SELECT p.id, c.c AS cno,
                     string_agg('para ' || seed || '-' || c.c || '-' ||
                                k.k || ' ', '' ORDER BY k.k) AS chtext
              FROM p
              JOIN range(3) c(c) ON c.c < p.nch
              JOIN range(3) k(k) ON k.k < p.npar
              GROUP BY p.id, c.c),
            bk AS (
              SELECT id, string_agg(chtext, chr(10) || chr(10)
                                    ORDER BY cno) AS text
              FROM ch GROUP BY id)
            SELECT p.id AS media_id, bk.text, p.nch AS n_chapters
            FROM p JOIN bk ON p.id = bk.id
            """
        ).fetchall()
    )
    assert rows == duck


def test_on_error_policy(spark):
    bad = spark.createDataFrame(
        [(3, bytearray(b"PK\x03\x04junk"))], "media_id long, payload binary"
    )
    assert epub_extract(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        epub_extract(bad, on_error="raise").collect()
