"""EPUB text extraction: the book-corpus source format, extracted
through the SAME from-scratch HTML kernel the north rule's transcript
extraction uses.

An EPUB (the public IDPF/W3C spec) is a ZIP with a ``mimetype``
member, ``META-INF/container.xml`` pointing at an OPF package, and
the OPF's manifest+spine giving the XHTML chapters in reading order.
This module walks exactly that chain:

- container.xml → first ``rootfile full-path`` (a tiny fixed-schema
  XML; matched structurally)
- OPF → manifest id→href map + spine idref order; hrefs resolved
  against the OPF directory
- each chapter → ``kernel.htmlparse`` DOM → ``inner_text`` with the
  pipeline strip set (script/style/nav), i.e. byte-for-byte the same
  extraction semantics as the HTML path — one kernel, two corpora.
  Chapters joined with a blank line.

Malformed payloads raise ValueError (kernel-wide contract): not a
zip, missing container/OPF/spine, unresolvable chapter hrefs, or
oversized members (bomb cap shared with operators/ooxml.py).

Scale posture: map-only Arrow batches, one book per row; chapter
parsing is the linear kernel scan.

Reference parity note: the reference has no container-format surface;
this LAYERS ON the §2-parity kernel (SURVEY.md §6)."""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from typing import Iterator

__all__ = [
    "epub_text",
    "epub_extract",
    "epub_bytes",
    "synth_epub_media",
]

_MAX_MEMBER = 256 * 1024 * 1024

_ROOTFILE = re.compile(r'<rootfile[^>]*full-path="([^"]+)"', re.S)
_ITEM = re.compile(r'<item\s[^>]*/?>', re.S)
_ATTR_ID = re.compile(r'\bid="([^"]+)"')
_ATTR_HREF = re.compile(r'\bhref="([^"]+)"')
_IDREF = re.compile(r'<itemref[^>]*idref="([^"]+)"', re.S)


def _read(zf: zipfile.ZipFile, name: str) -> bytes:
    try:
        info = zf.getinfo(name)
    except KeyError:
        raise ValueError(f"missing EPUB member {name!r}") from None
    if info.file_size > _MAX_MEMBER:
        raise ValueError(f"EPUB member {name!r} exceeds the size cap")
    try:
        return zf.read(name)
    except Exception as exc:  # BadZipFile / zlib.error on mutated members
        raise ValueError(f"malformed EPUB member {name!r}: {exc}") from exc


def epub_text(payload: bytes) -> tuple[str, int]:
    """(text, n_chapters): spine-ordered chapter text through the HTML
    kernel, chapters joined with a blank line."""
    from tl_spark.functions.extract import DEFAULT_STRIP_TAGS
    from tl_spark.kernel.htmlparse import parse

    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(payload)))
    except Exception as exc:
        raise ValueError(f"not an EPUB zip: {exc}") from exc
    with zf:
        container = _read(zf, "META-INF/container.xml").decode(
            "utf-8", "replace"
        )
        m = _ROOTFILE.search(container)
        if m is None:
            raise ValueError("EPUB container.xml has no rootfile")
        opf_path = m.group(1)
        opf = _read(zf, opf_path).decode("utf-8", "replace")
        base = posixpath.dirname(opf_path)
        hrefs = {}
        for item in _ITEM.finditer(opf):
            tag = item.group(0)
            mid = _ATTR_ID.search(tag)
            mhref = _ATTR_HREF.search(tag)
            if mid and mhref:
                hrefs[mid.group(1)] = mhref.group(1)
        order = [m.group(1) for m in _IDREF.finditer(opf)]
        if not order:
            raise ValueError("EPUB spine is empty")
        chapters = []
        for idref in order:
            href = hrefs.get(idref)
            if href is None:
                raise ValueError(f"EPUB spine idref {idref!r} not in manifest")
            path = posixpath.normpath(posixpath.join(base, href))
            doc = _read(zf, path)
            dom = parse(doc)
            chapters.append(
                "".join(
                    dom.inner_text(h, strip_tags=DEFAULT_STRIP_TAGS)
                    for h in dom.children()
                )
            )
    return "\n\n".join(chapters), len(chapters)


def epub_extract(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
):
    """Book text per row: map-only Arrow batches; ``on_error="skip"``
    drops unrecognized/malformed payloads."""
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
            keep, texts, chaps = [], [], []
            for i, p in zip(ids, payloads):
                try:
                    text, n = _malformed_as_valueerror(epub_text, p, "EPUB")
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                keep.append(i)
                texts.append(text)
                chaps.append(n)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(texts, type=pa.string()),
                    pa.array(chaps, type=pa.int64()),
                ],
                names=[id_col, "text", "n_chapters"],
            )

    return df.select(id_col, payload_col).mapInArrow(
        fn, f"{id_col} long, text string, n_chapters long"
    )


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def epub_bytes(chapters: list[list[str]], opf_dir: str = "OEBPS") -> bytes:
    """A VALID minimal EPUB: mimetype (stored, first), container.xml,
    OPF with manifest+spine, one XHTML per chapter (heading + one
    ``<p>`` per paragraph, with boilerplate nav/script the kernel must
    strip). Fixture text must avoid entities (the kernel's inner_text
    does not decode them, by reference parity)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"), "application/epub+zip",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container version="1.0"><rootfiles>'
            f'<rootfile full-path="{opf_dir}/content.opf" media-type='
            '"application/oebps-package+xml"/></rootfiles></container>',
        )
        items, spine = [], []
        for k, pars in enumerate(chapters, 1):
            name = f"ch{k}.xhtml"
            items.append(
                f'<item id="c{k}" href="{name}" '
                'media-type="application/xhtml+xml"/>'
            )
            spine.append(f'<itemref idref="c{k}"/>')
            body = "".join(f"<p>{p}</p>" for p in pars)
            zf.writestr(
                f"{opf_dir}/{name}",
                "<html><head><style>p{margin:0}</style></head><body>"
                f"<nav>site chrome to strip</nav>{body}"
                "<script>var x=1;</script></body></html>",
            )
        zf.writestr(
            f"{opf_dir}/content.opf",
            '<?xml version="1.0"?><package><manifest>'
            + "".join(items)
            + "</manifest><spine>"
            + "".join(spine)
            + "</spine></package>",
        )
    return buf.getvalue()


def synth_epub_media(spark, n_rows: int = 30, seed: int = 29):
    """Deterministic EPUB table keyed by id: 1 + id%3 chapters, each
    with 2 + id%2 paragraphs of closed-form text ``para {seed+id}-{c}-{k} ``
    — the kernel concatenates paragraph raw text with no separators,
    so chapter text is the plain concatenation and the DuckDB oracle
    is a string expression."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        nch = 1 + i % 3
        npar = 2 + i % 2
        return epub_bytes(
            [
                [f"para {seed + i}-{c}-{k} " for k in range(npar)]
                for c in range(nch)
            ]
        )

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
