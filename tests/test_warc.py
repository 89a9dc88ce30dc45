"""WARC source: framing round-trip, HTTP split, Spark end-to-end."""

import pyspark.sql.functions as F


HTML = (
    b"<html><body><nav>site nav boilerplate</nav>"
    b"<main><p>the real article text</p></main>"
    b"<script>drop()</script></body></html>"
)


def _make_warc(gzip_members=False):
    from tl_spark.sources.warc import http_response_block, warc_bytes

    return warc_bytes(
        [
            ("warcinfo", None, b"software: synthetic\r\n"),
            ("response", "http://ex.org/a", http_response_block(HTML)),
            (
                "response",
                "http://ex.org/404",
                http_response_block(b"gone", status=404),
            ),
            (
                "response",
                "http://ex.org/img",
                http_response_block(
                    b"\x89PNGnotreally", content_type="image/png"
                ),
            ),
            ("request", "http://ex.org/a", b"GET /a HTTP/1.1\r\n\r\n"),
        ],
        gzip_members=gzip_members,
    )


def test_warc_framing_roundtrip_plain_and_gzip():
    from tl_spark.sources.warc import iter_warc_records, split_http_response

    for gz in (False, True):
        recs = list(iter_warc_records(_make_warc(gz)))
        assert [h["warc-type"] for h, _ in recs] == [
            "warcinfo", "response", "response", "response", "request",
        ]
        assert recs[1][0]["warc-target-uri"] == "http://ex.org/a"
        status, headers, body = split_http_response(recs[1][1])
        assert status == 200
        assert headers["content-type"].startswith("text/html")
        assert body == HTML
        assert split_http_response(recs[2][1])[0] == 404


def test_warc_rejects_malformed():
    import pytest as _pytest

    from tl_spark.sources.warc import iter_warc_records

    good = _make_warc()
    with _pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOTWARC/1.0\r\n\r\n"))
    with _pytest.raises(ValueError, match="truncated WARC"):
        list(iter_warc_records(good[: len(good) - 40]))
    with _pytest.raises(ValueError, match="truncated gzip"):
        list(iter_warc_records(_make_warc(True)[:-10]))


def test_read_warc_spark_end_to_end(spark, tmp_path):
    """read_warc expands every record across .warc AND .warc.gz files
    in one load; malformed archives drop under on_error='skip' and
    fail under 'raise'."""
    import pytest as _pytest

    from tl_spark.sources.warc import read_warc

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(_make_warc(False))
    (d / "b.warc.gz").write_bytes(_make_warc(True))
    (d / "broken.warc").write_bytes(b"NOTWARC garbage here")
    df = read_warc(spark, str(d) + "/*")
    rows = df.collect()
    assert len(rows) == 10  # 5 records x 2 good archives
    by = {(r["warc_file"].split("/")[-1], r["record_idx"]): r for r in rows}
    a2 = by[("a.warc", 1)]
    assert a2["warc_type"] == "response"
    assert a2["http_status"] == 200
    assert a2["target_uri"] == "http://ex.org/a"
    assert bytes(a2["body"]) == HTML
    assert by[("b.warc.gz", 2)]["http_status"] == 404
    assert by[("a.warc", 0)]["http_status"] is None  # warcinfo
    with _pytest.raises(Exception):
        read_warc(spark, str(d) + "/*", on_error="raise").collect()


def test_extract_warc_html_end_to_end(spark, tmp_path):
    """Crawl -> extraction: only 200 text/html responses reach the
    kernel; the extracted text equals a kernel-direct call on the
    same HTML (boilerplate stripped, spans attached)."""
    from tl_spark.functions.extract import DEFAULT_STRIP_TAGS
    from tl_spark.kernel.htmlparse import extract_scan
    from tl_spark.sources.warc import extract_warc_html

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(_make_warc(True))
    out = extract_warc_html(spark, str(d) + "/*").collect()
    assert len(out) == 1  # only the 200 text/html record
    row = out[0]
    assert row["target_uri"] == "http://ex.org/a"
    expected_text = extract_scan(HTML, DEFAULT_STRIP_TAGS)[0].decode()
    assert row["extracted_text"] == expected_text
    assert "site nav" not in row["extracted_text"]
    assert "drop()" not in row["extracted_text"]
    assert "the real article text" in row["extracted_text"]


def test_extract_warc_pdf_end_to_end(spark, tmp_path):
    from tl_spark.operators.pdf import pdf_bytes, wrap_lines, LINES_PER_PAGE
    from tl_spark.sources.warc import (
        extract_warc_pdf,
        http_response_block,
        warc_bytes,
    )

    text_a = "alpha beta gamma delta epsilon zeta eta theta " * 8
    text_b = "uno dos tres cuatro cinco seis siete ocho nueve diez " * 5
    recs = [
        (
            "response",
            "http://ex.org/a.pdf",
            http_response_block(
                pdf_bytes(text_a, 0), content_type="application/pdf"
            ),
        ),
        (
            "response",
            "http://ex.org/page.html",
            http_response_block(b"<html><p>not a pdf</p></html>"),
        ),
        (
            "response",
            "http://ex.org/b.pdf",
            http_response_block(
                pdf_bytes(text_b, 2), content_type="application/pdf"
            ),
        ),
        (
            "response",
            "http://ex.org/gone.pdf",
            http_response_block(
                b"broken bytes", status=404, content_type="application/pdf"
            ),
        ),
    ]
    p = tmp_path / "pdfs.warc"
    p.write_bytes(warc_bytes(recs))
    out = extract_warc_pdf(spark, str(p)).orderBy("target_uri").collect()

    def exp(text):
        lines = wrap_lines(text)
        return "\n".join(
            "\n".join(lines[i : i + LINES_PER_PAGE])
            for i in range(0, len(lines), LINES_PER_PAGE)
        )

    assert [r.target_uri for r in out] == [
        "http://ex.org/a.pdf",
        "http://ex.org/b.pdf",
    ]
    assert out[0].text == exp(text_a)
    assert out[1].text == exp(text_b)
    n_lines = len(wrap_lines(text_a))
    assert out[0].n_pages == -(-n_lines // LINES_PER_PAGE)
    assert out[0].nchars == len(exp(text_a))


def test_extract_warc_pdf_skips_malformed_payloads(spark, tmp_path):
    from tl_spark.operators.pdf import pdf_bytes
    from tl_spark.sources.warc import (
        extract_warc_pdf,
        http_response_block,
        warc_bytes,
    )

    recs = [
        (
            "response",
            "http://ex.org/ok.pdf",
            http_response_block(
                pdf_bytes("good words survive here", 1),
                content_type="application/pdf",
            ),
        ),
        (
            "response",
            "http://ex.org/bad.pdf",
            http_response_block(b"%PDF-corrupt", content_type="application/pdf"),
        ),
    ]
    p = tmp_path / "mix.warc"
    p.write_bytes(warc_bytes(recs))
    ok = extract_warc_pdf(spark, str(p), on_error="skip").collect()
    assert [r.target_uri for r in ok] == ["http://ex.org/ok.pdf"]
    assert ok[0].text == "good words survive here"
