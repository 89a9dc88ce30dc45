"""OOXML text extraction: DOCX / PPTX / XLSX → document text.

Office documents are one of the biggest non-HTML text sources in a
web-scale corpus, and OOXML (ECMA-376, public) is just a ZIP of XML
parts. This extracts the text a training pipeline wants — no styling,
no layout — with exact, writer-pinned semantics:

- **DOCX** (``word/document.xml``): paragraphs split on ``</w:p>``;
  within a paragraph, ``<w:t>`` run contents concatenated in order,
  ``<w:tab/>`` → TAB, ``<w:br/>``/``<w:cr/>`` → newline; paragraphs
  joined with a single newline.
- **PPTX** (``ppt/slides/slideN.xml``, numeric order): ``<a:t>`` run
  contents; runs within one ``<a:p>`` paragraph concatenated,
  paragraphs newline-joined, slides joined with a blank line.
- **XLSX** (``xl/sharedStrings.xml``): the shared-string table's
  ``<t>`` contents newline-joined (cell-level reconstruction needs
  the sheet grid; the shared strings are where the prose lives).

XML entities: the five predefined (&amp; &lt; &gt; &quot; &apos;)
plus decimal/hex numeric references — XML has no other entities, so
this tiny decoder is exact, not a subset.

Malformed payloads raise ValueError (kernel-wide contract): not a
zip, missing the format's document part, or oversized members
(decompression-bomb cap shared with operators/archives.py).

Scale posture: map-only Arrow batches, one document per row; linear.

Reference parity note: the reference engine is an HTML parser with no
office-format surface; this is LLM-training-data pipeline scope
(SURVEY.md §6)."""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator

__all__ = [
    "docx_text",
    "pptx_text",
    "xlsx_strings",
    "office_payload_info",
    "office_extract",
    "docx_bytes",
    "pptx_bytes",
    "xlsx_bytes",
    "synth_office_media",
]

_MAX_MEMBER = 256 * 1024 * 1024  # decompression-bomb cap

_ENTITY = re.compile(r"&(#x[0-9a-fA-F]+|#\d+|amp|lt|gt|quot|apos);")
_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _unescape(s: str) -> str:
    def sub(m):
        e = m.group(1)
        if e.startswith("#x"):
            return chr(int(e[2:], 16))
        if e.startswith("#"):
            return chr(int(e[1:]))
        return _NAMED[e]

    return _ENTITY.sub(sub, s)


def _open(payload: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(payload))
    except Exception as exc:
        raise ValueError(f"not an OOXML payload: {exc}") from exc


def _read_from(zf: zipfile.ZipFile, name: str) -> str:
    """One member's text from an ALREADY-OPEN archive — the central
    directory is parsed once per document, not once per member (a
    many-slide PPTX would otherwise re-parse it per slide)."""
    try:
        info = zf.getinfo(name)
    except KeyError:
        raise ValueError(f"missing OOXML part {name!r}") from None
    if info.file_size > _MAX_MEMBER:
        raise ValueError(f"member {name!r} exceeds the size cap")
    try:
        return zf.read(name).decode("utf-8", "replace")
    except Exception as exc:  # BadZipFile / zlib.error / ...
        raise ValueError(f"malformed OOXML zip: {exc}") from exc


# one regex pass per paragraph: text runs + explicit breaks, in order
_W_TOKEN = re.compile(
    r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:t(?:\s[^>]*)?/>|<w:(tab|br|cr)\s*/>",
    re.S,
)
_A_TOKEN = re.compile(r"<a:t(?:\s[^>]*)?>(.*?)</a:t>|<a:t(?:\s[^>]*)?/>", re.S)
_T_TOKEN = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>|<t(?:\s[^>]*)?/>", re.S)


def _w_paragraph_text(par_xml: str) -> str:
    out = []
    for m in _W_TOKEN.finditer(par_xml):
        if m.group(2):  # tab/br/cr
            out.append("\t" if m.group(2) == "tab" else "\n")
        elif m.group(1) is not None:
            out.append(_unescape(m.group(1)))
    return "".join(out)


def _docx_from(zf: zipfile.ZipFile) -> tuple[str, int]:
    xml = _read_from(zf, "word/document.xml")
    pars = re.split(r"</w:p>", xml)[:-1]
    texts = [_w_paragraph_text(p) for p in pars]
    return "\n".join(texts), len(texts)


def _pptx_from(zf: zipfile.ZipFile) -> tuple[str, int]:
    slides = sorted(
        (int(m.group(1)), n)
        for n in zf.namelist()
        if (m := re.fullmatch(r"ppt/slides/slide(\d+)\.xml", n))
    )
    if not slides:
        raise ValueError("PPTX payload has no slides")
    out = []
    for _, name in slides:
        xml = _read_from(zf, name)
        pars = []
        for par in re.split(r"</a:p>", xml)[:-1]:
            runs = [
                _unescape(m.group(1))
                for m in _A_TOKEN.finditer(par)
                if m.group(1) is not None
            ]
            pars.append("".join(runs))
        out.append("\n".join(pars))
    return "\n\n".join(out), len(slides)


def _xlsx_from(zf: zipfile.ZipFile) -> tuple[str, int]:
    xml = _read_from(zf, "xl/sharedStrings.xml")
    vals = [
        _unescape(m.group(1))
        for m in _T_TOKEN.finditer(xml)
        if m.group(1) is not None
    ]
    return "\n".join(vals), len(vals)


def docx_text(payload: bytes) -> tuple[str, int]:
    """(text, n_paragraphs) from a DOCX payload."""
    with _open(bytes(payload)) as zf:
        return _docx_from(zf)


def pptx_text(payload: bytes) -> tuple[str, int]:
    """(text, n_slides) from a PPTX payload; slides in numeric order."""
    with _open(bytes(payload)) as zf:
        return _pptx_from(zf)


def xlsx_strings(payload: bytes) -> tuple[str, int]:
    """(newline-joined shared strings, count) from an XLSX payload."""
    with _open(bytes(payload)) as zf:
        return _xlsx_from(zf)


def office_payload_info(payload: bytes) -> dict:
    """Route one OOXML payload by its document part: DOCX / PPTX /
    XLSX → (format, text, n_units) where n_units is paragraphs /
    slides / shared strings. Raises ValueError otherwise. One
    ZipFile open serves detection AND extraction."""
    with _open(bytes(payload)) as zf:
        names = set(zf.namelist())
        if "word/document.xml" in names:
            text, n = _docx_from(zf)
            return {"format": "docx", "text": text, "n_units": n}
        if any(re.fullmatch(r"ppt/slides/slide\d+\.xml", n) for n in names):
            text, n = _pptx_from(zf)
            return {"format": "pptx", "text": text, "n_units": n}
        if "xl/sharedStrings.xml" in names:
            text, n = _xlsx_from(zf)
            return {"format": "xlsx", "text": text, "n_units": n}
    raise ValueError("unrecognized OOXML payload (no known document part)")


def office_extract(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
):
    """Office-document text per row: map-only Arrow batches;
    ``on_error="skip"`` drops unrecognized/malformed payloads."""
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
                        office_payload_info, p, "OOXML"
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


# ---------------------------------------------------------------------------
# Writers (test/oracle harness)
# ---------------------------------------------------------------------------

_CT_DOCX = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    'package/2006/content-types"><Default Extension="xml" ContentType='
    '"application/xml"/></Types>'
)


def _escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _zip(members: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, body in members.items():
            zf.writestr(name, body)
    return buf.getvalue()


def docx_bytes(paragraphs: list[str]) -> bytes:
    """A VALID minimal DOCX: [Content_Types].xml + word/document.xml
    with one ``<w:r><w:t>`` run per paragraph (split runs + a tab for
    multi-part inputs passed as tuples)."""
    body = []
    for p in paragraphs:
        if isinstance(p, tuple):  # split-run paragraph with a tab
            runs = "<w:r><w:tab/></w:r>".join(
                f"<w:r><w:t>{_escape(x)}</w:t></w:r>" for x in p
            )
        else:
            runs = f"<w:r><w:t xml:space=\"preserve\">{_escape(p)}</w:t></w:r>"
        body.append(f"<w:p>{runs}</w:p>")
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    return _zip({"[Content_Types].xml": _CT_DOCX, "word/document.xml": doc})


def pptx_bytes(slides: list[list[str]]) -> bytes:
    """A VALID minimal PPTX: one slideN.xml per slide, one ``<a:p>``
    per paragraph."""
    members = {"[Content_Types].xml": _CT_DOCX}
    for k, pars in enumerate(slides, 1):
        body = "".join(
            f"<a:p><a:r><a:t>{_escape(p)}</a:t></a:r></a:p>" for p in pars
        )
        members[f"ppt/slides/slide{k}.xml"] = (
            '<?xml version="1.0"?><p:sld xmlns:a="http://schemas.'
            'openxmlformats.org/drawingml/2006/main">'
            + body
            + "</p:sld>"
        )
    return _zip(members)


def xlsx_bytes(strings: list[str]) -> bytes:
    members = {
        "[Content_Types].xml": _CT_DOCX,
        "xl/sharedStrings.xml": (
            '<?xml version="1.0"?><sst><si>'
            + "</si><si>".join(f"<t>{_escape(s)}</t>" for s in strings)
            + "</si></sst>"
        ),
    }
    return _zip(members)


def synth_office_media(spark, n_rows: int = 30, seed: int = 23):
    """Deterministic OOXML table keyed by id (id%3 → docx/pptx/xlsx)
    with closed-form text: paragraph/slide/string k carries
    ``unit {seed+id}-{k}``; counts 2 + id%4."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        n = 2 + i % 4
        items = [f"unit {seed + i}-{k}" for k in range(n)]
        v = i % 3
        if v == 0:
            return docx_bytes(items)
        if v == 1:
            return pptx_bytes([[s] for s in items])
        return xlsx_bytes(items)

    def fn(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([_payload(int(i)) for i in ids], type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    return spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
