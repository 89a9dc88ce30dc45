"""Unified document-text router: ONE operator a crawl pipeline calls
for any text-bearing payload, dispatched by MAGIC BYTES (Content-Type
headers lie; the payload does not) — the document-side twin of the
media router (operators/media_info.py):

- ``%PDF``      → the from-scratch ISO 32000 kernel (operators/pdf.py),
                  pages joined with a blank line
- ``PK..`` zips → EPUB (META-INF/container.xml present) via the HTML
                  kernel, else OOXML DOCX/PPTX/XLSX (operators/ooxml.py)
- ``{\\rtf``    → the RTF tokenizer (operators/rtf.py)
- markup text   → the HTML kernel itself (UTF-8 text containing a
                  ``<``; the flagship extraction semantics: inner_text
                  with the script/style/nav strip set)

Every leg is the REAL parser already oracle- or golden-pinned in its
own module; this file adds only dispatch, a uniform
(format, text, n_units) row shape, and the standard on_error
skip/raise posture. Unrecognized payloads raise ValueError.

Scale posture: map-only Arrow batches, zero shuffle; per-format cost
is the underlying kernel's (the PDF leg rides the native
whole-document path when the cdylib is present).
"""

from __future__ import annotations

from typing import Iterator

__all__ = ["document_payload_info", "document_extract", "synth_document_media"]


def _html_text(payload: bytes) -> tuple[str, int]:
    from tl_spark.functions.extract import DEFAULT_STRIP_TAGS
    from tl_spark.kernel.htmlparse import parse

    dom = parse(payload)
    roots = dom.children()
    if not roots:
        raise ValueError("empty HTML document")
    text = "".join(
        dom.inner_text(h, strip_tags=DEFAULT_STRIP_TAGS) for h in roots
    )
    return text, len(roots)


def document_payload_info(payload: bytes) -> dict:
    """Route one payload to its text extractor; returns
    (format, text, n_units) where n_units is pages / paragraphs /
    slides / strings / chapters / top-level nodes by format."""
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    payload = bytes(payload)
    if not payload:
        raise ValueError("empty document payload")
    if payload[:2] == b"\x1f\x8b":
        # gzip envelope (crawls ship .html.gz / .json.gz routinely):
        # decompress with a hard output cap, then re-route the inner
        # payload. One level only — gzip-in-gzip is an attack shape,
        # not a corpus shape.
        import zlib

        d = zlib.decompressobj(wbits=31)
        try:
            inner = d.decompress(payload, 256 * 1024 * 1024)
        except Exception as exc:
            raise ValueError(f"malformed gzip payload: {exc}") from exc
        if d.unconsumed_tail:
            raise ValueError("gzip payload exceeds the output cap")
        if not d.eof:
            # zlib does not raise on mid-stream truncation — without
            # this check a cut-off crawl record would silently route
            # partial text
            raise ValueError("truncated gzip payload")
        if inner[:2] == b"\x1f\x8b":
            raise ValueError("nested gzip payload refused")
        info = document_payload_info(inner)
        info["format"] = "gz+" + info["format"]
        return info
    if payload[:5] == b"%PDF-":
        from tl_spark.operators.pdf import extract_pdf_pages

        pages = extract_pdf_pages(payload)
        return {
            "format": "pdf",
            "text": "\n\n".join(pages),
            "n_units": len(pages),
        }
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                names = set(zf.namelist())
        except Exception as exc:
            raise ValueError(f"malformed zip payload: {exc}") from exc
        if "META-INF/container.xml" in names:
            from tl_spark.operators.epub import epub_text

            text, n = epub_text(payload)
            return {"format": "epub", "text": text, "n_units": n}
        from tl_spark.operators.ooxml import office_payload_info

        info = office_payload_info(payload)
        return {
            "format": info["format"],
            "text": info["text"],
            "n_units": info["n_units"],
        }
    if payload[:5] == b"{\\rtf":
        from tl_spark.operators.rtf import rtf_text

        text, n = rtf_text(payload)
        return {"format": "rtf", "text": text, "n_units": n}
    if b"<" in payload[:4096]:
        text, n = _html_text(payload)
        return {"format": "html", "text": text, "n_units": n}
    raise ValueError("unrecognized document payload")


def document_extract(
    df,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "raise",
):
    """Text for every recognized document payload: map-only Arrow
    batches; ``on_error="skip"`` drops unrecognized/malformed rows
    (the crawl posture)."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
    )

    _check_on_error(on_error)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            keep, fmts, texts, units = [], [], [], []
            for i, p in zip(ids, payloads):
                try:
                    info = _malformed_as_valueerror(
                        document_payload_info, p, "document"
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                keep.append(i)
                fmts.append(info["format"])
                texts.append(info["text"])
                units.append(info["n_units"])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(fmts, type=pa.string()),
                    pa.array(texts, type=pa.string()),
                    pa.array(units, type=pa.int64()),
                ],
                names=[id_col, "format", "text", "n_units"],
            )

    return df.select(id_col, payload_col).mapInArrow(
        fn, f"{id_col} long, format string, text string, n_units long"
    )


def synth_document_media(df, id_col: str = "doc_id", seed: int = 37):
    """doc_id-keyed payloads in FOUR closed-form formats (doc_id % 4 →
    docx / epub / rtf / html), each built by its module's writer with
    ``unit {seed+id}-{k}`` content — the mixed-corpus harness for
    :func:`document_extract`."""
    import pyarrow as pa

    from tl_spark.operators.epub import epub_bytes
    from tl_spark.operators.ooxml import docx_bytes
    from tl_spark.operators.rtf import rtf_bytes

    def _payload(i: int) -> bytes:
        n = 2 + i % 3
        items = [f"unit {seed + i}-{k}" for k in range(n)]
        v = i % 4
        if v == 0:
            return docx_bytes(items)
        if v == 1:
            # one chapter per item; kernel concatenates raw paragraph
            # text, so keep one paragraph per chapter
            return epub_bytes([[s] for s in items])
        if v == 2:
            return rtf_bytes(items, seed=seed + i)
        body = "".join(f"<p>{s}</p>" for s in items)
        return (
            "<html><body><nav>chrome</nav>"
            f"<main>{body}</main>"
            "<script>var x=1;</script></body></html>"
        ).encode()

    def fn(batches):
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([_payload(int(i)) for i in ids], type=pa.binary()),
                ],
                names=[id_col, "payload"],
            )

    return df.select(id_col).mapInArrow(fn, f"{id_col} long, payload binary")
