"""WARC (ISO 28500) web-archive source — the Common Crawl shape.

Reads .warc / .warc.gz files into a DataFrame of records and feeds
HTML response bodies straight into the extraction kernel, so the
engine can point at real crawl data with no external dependencies:
the record grammar (version line + named headers + Content-Length
block + CRLF CRLF) and the per-record-gzip-member convention are both
implemented on stdlib ``zlib`` alone.

Scale shape (100 TB of crawl):
- ``spark.read.format("binaryFile")`` distributes WHOLE archives —
  one task per .warc.gz (Common Crawl shards are ~1 GB, the standard
  unit of parallelism for crawl processing);
- record iteration + HTTP split + charset decode run inside one
  row-expanding mapInArrow (map-only, no shuffle);
- malformed records follow the media ops' posture: ``on_error="skip"``
  drops the record, never the archive.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz
    convention: one member per record)."""
    out = bytearray()
    while data:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        data = d.unused_data
    return bytes(out)


def iter_warc_records(data: bytes):
    """Yield (headers: dict[str, str] lower-cased, block: bytes) per
    WARC record. Accepts plain or gzipped input. Raises ValueError on
    malformed framing."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        eol = data.find(b"\n", pos)
        if eol < 0 or not data[pos:eol].strip().startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at byte {pos}")
        pos = eol + 1
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol].rstrip(b"\r")
            pos = eol + 1
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"bad WARC Content-Length: {exc}") from exc
        block = data[pos : pos + length]
        if len(block) != length:
            raise ValueError("truncated WARC record block")
        pos += length
        yield headers, block


def split_http_response(block: bytes):
    """(status: int, headers: dict lower-cased, body: bytes) from an
    HTTP response block (msgtype=response payloads)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        body_at = sep + 2
    else:
        body_at = sep + 4
    if sep < 0:
        raise ValueError("HTTP block without header terminator")
    head = block[:sep].split(b"\n")
    status_line = head[0].rstrip(b"\r").split(None, 2)
    if len(status_line) < 2 or not status_line[0].startswith(b"HTTP/"):
        raise ValueError(f"malformed HTTP status line {head[0]!r}")
    status = int(status_line[1])
    headers: dict[str, str] = {}
    for line in head[1:]:
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
    return status, headers, block[body_at:]


def warc_bytes(records, gzip_members: bool = False) -> bytes:
    """Serialize records as a WARC file — writer counterpart of
    :func:`iter_warc_records` for tests. Each record: (warc_type,
    target_uri, block_bytes). ``gzip_members=True`` writes the
    .warc.gz one-member-per-record convention."""
    out = bytearray()
    for i, (wtype, uri, block) in enumerate(records):
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{i:012d}>\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
            + (
                "Content-Type: application/http;msgtype=response\r\n"
                if wtype == "response"
                else "Content-Type: application/octet-stream\r\n"
            )
            + f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        rec = head + block + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def http_response_block(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Build an HTTP response block for tests."""
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def read_warc(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
) -> DataFrame:
    """DataFrame of WARC records: (warc_file, record_idx, warc_type,
    target_uri, http_status, content_type, body). HTTP response
    records are split into status/headers/body; other record types
    carry their raw block as ``body`` with null status.

    ``on_error``: "skip" (default — a malformed record or archive is
    dropped, the crawl-scale posture) or "raise"."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip'")
    raw = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            files, idxs, types, uris, statuses, ctypes, bodies = (
                [], [], [], [], [], [], []
            )
            for p, c in zip(paths, contents):
                try:
                    records = list(iter_warc_records(bytes(c)))
                except ValueError:
                    if on_error == "raise":
                        raise
                    continue
                for i, (hdrs, block) in enumerate(records):
                    wtype = hdrs.get("warc-type", "")
                    status = ctype = None
                    body = block
                    if wtype == "response" and "msgtype=response" in hdrs.get(
                        "content-type", ""
                    ):
                        try:
                            status, hh, body = split_http_response(block)
                            ctype = hh.get("content-type")
                        except ValueError:
                            if on_error == "raise":
                                raise
                            continue
                    files.append(p)
                    idxs.append(i)
                    types.append(wtype)
                    uris.append(hdrs.get("warc-target-uri"))
                    statuses.append(status)
                    ctypes.append(ctype)
                    bodies.append(body)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(files, type=pa.string()),
                    pa.array(idxs, type=pa.int32()),
                    pa.array(types, type=pa.string()),
                    pa.array(uris, type=pa.string()),
                    pa.array(statuses, type=pa.int32()),
                    pa.array(ctypes, type=pa.string()),
                    pa.array(bodies, type=pa.binary()),
                ],
                names=[
                    "warc_file", "record_idx", "warc_type", "target_uri",
                    "http_status", "content_type", "body",
                ],
            )

    return raw.mapInArrow(
        fn,
        "warc_file string, record_idx int, warc_type string, "
        "target_uri string, http_status int, content_type string, "
        "body binary",
    )


def extract_warc_html(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
) -> DataFrame:
    """End-to-end crawl extraction: WARC records -> 200-status HTML
    responses -> charset-decoded text -> the tl extraction kernel.
    Returns (warc_file, record_idx, target_uri, extracted_text,
    spans). The kernel stage is the SAME Arrow-batch operator the
    transcript pipeline uses — map-only, no shuffle."""
    from pyspark.sql import functions as F

    from tl_spark.functions.extract import extract_main_content

    recs = read_warc(spark, path, on_error=on_error)
    html = recs.filter(
        (F.col("http_status") == 200)
        & F.col("content_type").contains("text/html")
    ).withColumn(
        # charset decode: trust UTF-8 with replacement — the kernel is
        # byte-span-exact over whatever string it is given
        "text",
        F.decode(F.col("body"), "UTF-8"),
    )
    out = extract_main_content(
        html,
        text_col="text",
        passthrough=["warc_file", "record_idx", "target_uri"],
    )
    return out


def extract_warc_pdf(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
) -> DataFrame:
    """Crawl-side PDF extraction: WARC records -> 200-status
    ``application/pdf`` responses -> the from-scratch ISO 32000
    text/layout kernel (operators/pdf.py). Returns one row per PDF
    record: (warc_file, record_idx, target_uri, text, n_pages,
    nchars) with pages joined by newline — document grain, so
    :mod:`jobs.crawl_job` can union it with HTML-extracted text and
    run the shared cap/dedup/quality gates. Map-only, zero shuffle,
    same scaling shape as the HTML path."""
    from pyspark.sql import functions as F

    from tl_spark.operators.pdf import pdf_text_concat

    recs = read_warc(spark, path, on_error=on_error)
    pdfs = recs.filter(
        (F.col("http_status") == 200)
        & F.col("content_type").contains("application/pdf")
    ).select("warc_file", "record_idx", "target_uri", "body")
    return pdf_text_concat(
        pdfs,
        payload_col="body",
        passthrough=("warc_file", "record_idx", "target_uri"),
        on_error=on_error,
    )


def extract_warc_media(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
) -> DataFrame:
    """Crawl-side media metadata: WARC records -> 200-status non-HTML
    payloads -> the unified magic-byte media router
    (operators/media_info.py). One row per RECOGNIZED payload:
    (warc_file, record_idx, target_uri, kind, container, width,
    height, duration_ms, sample_rate, channels, bitrate_kbps,
    n_samples, clean). Dispatch is by payload magic, not Content-Type
    (crawl headers lie); unrecognized payloads follow ``on_error``
    (default "skip" — the crawl posture). Map-only, zero shuffle, the
    same scaling shape as the HTML and PDF legs."""
    from pyspark.sql import functions as F

    from tl_spark.operators.media_info import media_stream_info

    recs = read_warc(spark, path, on_error=on_error)
    cand = recs.filter(
        (F.col("http_status") == 200)
        & ~F.col("content_type").contains("text/html")
        & ~F.col("content_type").contains("application/pdf")
    ).select("warc_file", "record_idx", "target_uri", "body")
    return media_stream_info(
        cand,
        payload_col="body",
        id_col="record_idx",
        passthrough=("warc_file", "target_uri"),
        on_error=on_error,
    )
