"""Unified document router: magic-byte dispatch to the PDF / OOXML /
EPUB / RTF / HTML kernels, mixed-corpus operator, and a closed-form
DuckDB oracle (tl_spark/operators/docrouter.py)."""

import duckdb
import pytest

from tl_spark.operators.docrouter import (
    document_extract,
    document_payload_info,
    synth_document_media,
)


def test_dispatch_every_format():
    from tl_spark.operators.epub import epub_bytes
    from tl_spark.operators.ooxml import docx_bytes, pptx_bytes, xlsx_bytes
    from tl_spark.operators.rtf import rtf_bytes

    assert document_payload_info(docx_bytes(["x"]))["format"] == "docx"
    assert document_payload_info(pptx_bytes([["x"]]))["format"] == "pptx"
    assert document_payload_info(xlsx_bytes(["x"]))["format"] == "xlsx"
    assert document_payload_info(epub_bytes([["x "]]))["format"] == "epub"
    assert document_payload_info(rtf_bytes(["x"]))["format"] == "rtf"
    info = document_payload_info(b"<html><body><p>hi</p></body></html>")
    assert info["format"] == "html" and info["text"] == "hi"


def test_pdf_leg_routes_through_the_kernel():
    from tl_spark.operators.pdf import pdf_bytes

    payload = pdf_bytes("alpha bravo charlie delta echo", variant=1)
    info = document_payload_info(payload)
    assert info["format"] == "pdf" and info["n_units"] >= 1
    assert "alpha bravo" in info["text"]


def test_html_strip_semantics_match_flagship():
    doc = (
        b"<html><body><nav>chrome</nav><main><p>keep me</p></main>"
        b"<script>var x=1;</script></body></html>"
    )
    info = document_payload_info(doc)
    assert info["text"] == "keep me"


def test_malformed_contract():
    for bad in (b"", b"\x00\x01\x02 binary junk", b"PK\x03\x04broken"):
        with pytest.raises(ValueError):
            document_payload_info(bad)
    # a zip that is neither EPUB nor OOXML
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "x")
    with pytest.raises(ValueError):
        document_payload_info(buf.getvalue())


def test_mixed_corpus_operator_with_duckdb_oracle(spark):
    base = spark.range(30).withColumnRenamed("id", "doc_id")
    out = document_extract(synth_document_media(base))
    rows = sorted(
        (r["doc_id"], r["format"], r["text"], r["n_units"])
        for r in out.collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            WITH p AS (
              SELECT id, 2 + id % 3 AS n, 37 + id AS seed, id % 4 AS v
              FROM range(30) t(id)),
            x AS (
              SELECT p.*,
                     string_agg('unit ' || seed || '-' || k,
                                chr(10) ORDER BY k) AS joined,
                     string_agg('unit ' || seed || '-' || k,
                                '' ORDER BY k) AS concat
              FROM p JOIN range(5) s(k) ON s.k < p.n
              GROUP BY ALL)
            SELECT id AS doc_id,
                   CASE v WHEN 0 THEN 'docx' WHEN 1 THEN 'epub'
                          WHEN 2 THEN 'rtf' ELSE 'html' END AS format,
                   CASE v
                     WHEN 0 THEN joined
                     WHEN 1 THEN replace(joined, chr(10),
                                         chr(10) || chr(10))
                     WHEN 2 THEN joined || chr(10)
                     ELSE concat
                   END AS text,
                   CASE WHEN v = 3 THEN 1 ELSE n END AS n_units
            FROM x
            """
        ).fetchall()
    )
    assert rows == duck


def test_on_error_policy(spark):
    bad = spark.createDataFrame(
        [(7, bytearray(b"\x00binary"))], "doc_id long, payload binary"
    )
    assert document_extract(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        document_extract(bad, on_error="raise").collect()


def test_gzip_envelope_reroutes_inner_payload():
    import gzip

    from tl_spark.operators.rtf import rtf_bytes

    inner = b"<html><body><p>zipped page</p></body></html>"
    info = document_payload_info(gzip.compress(inner))
    assert info["format"] == "gz+html" and info["text"] == "zipped page"
    info = document_payload_info(gzip.compress(rtf_bytes(["r"])))
    assert info["format"] == "gz+rtf"
    # nested gzip is refused, truncated gzip is ValueError
    with pytest.raises(ValueError, match="nested gzip"):
        document_payload_info(gzip.compress(gzip.compress(inner)))
    with pytest.raises(ValueError):
        document_payload_info(gzip.compress(inner)[:10])
