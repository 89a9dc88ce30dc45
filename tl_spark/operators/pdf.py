"""PDF text + layout extraction (ISO 32000-1), from scratch, stdlib only.

Fills the north rule's "PDF/layout parse" slot: the extraction pipeline
must parse PDF documents, not just HTML. No PDF library exists in this
container, so this is a from-scratch implementation of the public
ISO 32000-1 spec (the PDF 1.7 standard), in the same spirit as the
repo's from-scratch media codecs (multimodal.py, jpeg.py):

- ``_Lexer`` / ``_FastLexer``: tokenizers for the PDF object syntax —
  the byte-level reference scanner and a token-identical compiled-regex
  fast path (hypothesis-differential-pinned) used for both content and
  object parsing (numbers,
  names with ``#xx`` escapes, literal strings with the full escape
  table + balanced parens, hex strings, arrays, dicts, comments,
  keywords).
- ``PdfDocument``: startxref chain walk — classic xref tables, xref
  *streams* (/W fields, /Index, PNG predictors), hybrid /XRefStm,
  incremental updates via /Prev (first-seen wins, so the newest
  generation shadows older ones), compressed objects in /ObjStm object
  streams — plus a lenient whole-file ``N G obj`` scan fallback for
  damaged xrefs. Lazy object resolution with a cache.
- stream filters: FlateDecode (stdlib zlib; PNG predictors 10-15 and
  TIFF predictor 2), LZWDecode (MSB packing, EarlyChange),
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode, applied as cascades.
- fonts: simple fonts (WinAnsiEncoding / MacRomanEncoding /
  /Differences via a compact AGL glyph-name map, /Widths + /FirstChar)
  and composite Type0 / Identity-H CID fonts (/W, /DW); /ToUnicode
  CMaps (codespacerange, bfchar, bfrange incl. array form) take
  precedence for code→unicode.
- content interpreter: the full text state machine — Tm/Tlm, Td, TD,
  T*, TL, Tc, Tw, Tz, Ts, Tf, Tj, ', ", TJ (kern-aware), nested q/Q +
  cm CTM, BT/ET — producing positioned text chunks in device space.
  Inline images (BI..ID..EI) are skipped safely.
- layout assembly ("layout parse"): chunks are re-ordered by device
  position (rows by descending y with a size-relative tolerance, then
  ascending x), merged without a separator when they abut (TJ kern
  splits), and separated by a space when a genuine word gap appears;
  rows join with newlines. Out-of-draw-order content streams therefore
  reconstruct reading order. ``columns="auto"`` adds recursive X-Y-cut
  whitespace-gutter segmentation (multi-column pages read each column
  fully before the next); ``pdf_doc_info``/``pdf_info`` expose
  document metadata. Adversarial input is bounded everywhere
  (mutation-fuzzed: predictor/CID/LZW bombs clamped, every failure a
  ValueError, the lexer always advances).

Spark side: map-only ``mapInArrow`` batch ops mirroring
multimodal.py's plumbing — payload bytes cross the Arrow boundary
once, zero shuffle, so the op scales linearly with executors at the
10^12-row tier. ``synth_pdf_media`` builds real PDFs (four structural
variants: classic xref / Flate / xref-stream+ObjStm / incremental
update with filter cascades) from the documents table so extraction is
oracle-checkable end-to-end: the generator wraps text by a
SQL-expressible rule (8 words per line, 5 lines per page), so DuckDB
can reproduce the expected page text exactly (queries.PDF_EXTRACT_SQL).

Reference parity note: the reference (y21/tl) is HTML-only; this
module has no reference analog and is driven by the north rule +
ISO 32000 directly.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

__all__ = [
    "PdfDocument",
    "extract_pdf_pages",
    "extract_pdf_pages_with_spans",
    "pdf_bytes",
    "pdf_doc_info",
    "pdf_info",
    "pdf_links",
    "pdf_outlinks",
    "pdf_text_concat",
    "pdf_text_pages",
    "synth_pdf_media",
    "wrap_lines",
]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_REGULAR = bytes(c for c in range(256) if c not in _WS and c not in _DELIM)


class _Name(str):
    """A PDF name object (distinct from a decoded string)."""


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"

    def __eq__(self, other):
        return isinstance(other, _Ref) and (self.num, self.gen) == (
            other.num,
            other.gen,
        )

    def __hash__(self):
        return hash((self.num, self.gen))


class _Kw(str):
    """A bare keyword token (operators, obj/endobj/stream/true/...)."""


_ARR_OPEN = object()
_ARR_CLOSE = object()
_DICT_OPEN = object()
_DICT_CLOSE = object()

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)$")


class _Lexer:
    """Tokenizer over PDF object syntax. ``next()`` returns python
    values (int/float/bytes/_Name/_Kw) or the bracket sentinels."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos
        self._push: list = []

    def pushback(self, tok) -> None:
        self._push.append(tok)

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        p = self.pos
        while p < n:
            c = buf[p]
            if c in _WS:
                p += 1
            elif c == 0x25:  # '%' comment to EOL
                while p < n and buf[p] not in b"\r\n":
                    p += 1
            else:
                break
        self.pos = p

    def next(self):
        if self._push:
            return self._push.pop()
        self._skip_ws()
        buf, n = self.buf, len(self.buf)
        p = self.pos
        if p >= n:
            return None
        c = buf[p]
        if c == 0x5B:  # [
            self.pos = p + 1
            return _ARR_OPEN
        if c == 0x5D:  # ]
            self.pos = p + 1
            return _ARR_CLOSE
        if c == 0x3C:  # < : dict or hex string
            if p + 1 < n and buf[p + 1] == 0x3C:
                self.pos = p + 2
                return _DICT_OPEN
            return self._hex_string(p + 1)
        if c == 0x3E:  # >
            if p + 1 < n and buf[p + 1] == 0x3E:
                self.pos = p + 2
                return _DICT_CLOSE
            self.pos = p + 1  # stray '>' — be lenient
            return self.next()
        if c == 0x28:  # (
            return self._literal_string(p + 1)
        if c == 0x2F:  # /
            return self._name(p + 1)
        if c == 0x7B or c == 0x7D:  # { } (PostScript funcs) — keywords
            self.pos = p + 1
            return _Kw(chr(c))
        # regular-character run: number or keyword
        q = p
        while q < n and buf[q] in _REGULAR:
            q += 1
        if q == p:
            # stray delimiter with no opening partner (e.g. a lone
            # ')'): skip it — the lexer must ALWAYS advance, or every
            # junk-skipping caller loops forever
            self.pos = p + 1
            return self.next()
        word = buf[p:q]
        self.pos = q
        if _NUM_RE.match(word):
            if b"." in word:
                return float(word)
            return int(word)
        return _Kw(word.decode("latin-1"))

    def _hex_string(self, p: int) -> bytes:
        buf, n = self.buf, len(self.buf)
        digits = []
        while p < n:
            c = buf[p]
            if c == 0x3E:  # >
                p += 1
                break
            if c in _WS:
                p += 1
                continue
            digits.append(chr(c))
            p += 1
        self.pos = p
        if len(digits) % 2:
            digits.append("0")
        try:
            return bytes.fromhex("".join(digits))
        except ValueError:
            raise ValueError("bad hex string")

    def _literal_string(self, p: int) -> bytes:
        buf, n = self.buf, len(self.buf)
        out = bytearray()
        depth = 1
        while p < n:
            c = buf[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= n:
                    break
                e = buf[p]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    val = 0
                    k = 0
                    while k < 3 and p < n and 0x30 <= buf[p] <= 0x37:
                        val = val * 8 + (buf[p] - 0x30)
                        p += 1
                        k += 1
                    out.append(val & 0xFF)
                elif e == 0x0D:  # line continuation \CR[LF]
                    p += 1
                    if p < n and buf[p] == 0x0A:
                        p += 1
                elif e == 0x0A:
                    p += 1
                else:  # unknown escape: drop backslash
                    out.append(e)
                    p += 1
                continue
            if c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    p += 1
                    break
                out.append(c)
            elif c == 0x0D:  # raw EOL inside string → \n (CRLF collapses)
                out.append(0x0A)
                if p + 1 < n and buf[p + 1] == 0x0A:
                    p += 1
            else:
                out.append(c)
            p += 1
        self.pos = p
        return bytes(out)

    def _name(self, p: int) -> _Name:
        buf, n = self.buf, len(self.buf)
        out = bytearray()
        while p < n and buf[p] in _REGULAR:
            c = buf[p]
            if c == 0x23 and p + 2 < n:  # '#xx'
                try:
                    out.append(int(buf[p + 1 : p + 3], 16))
                    p += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            p += 1
        self.pos = p
        return _Name(out.decode("latin-1"))


_PARSE_MAX_DEPTH = 200  # crafted [[[[… must ValueError, not RecursionError


def _parse_value(lx: _Lexer, tok=None, _depth: int = 0):
    """Parse one PDF object starting at ``tok`` (or the next token).
    ``int int R`` sequences become :class:`_Ref` via lookahead."""
    if _depth > _PARSE_MAX_DEPTH:
        raise ValueError("object nesting too deep")
    if tok is None:
        tok = lx.next()
    if tok is None:
        raise ValueError("unexpected end of data")
    if tok is _ARR_OPEN:
        arr = []
        while True:
            t = lx.next()
            if t is _ARR_CLOSE:
                return arr
            if t is None:
                raise ValueError("unterminated array")
            arr.append(_parse_value(lx, t, _depth + 1))
    if tok is _DICT_OPEN:
        d = {}
        while True:
            t = lx.next()
            if t is _DICT_CLOSE:
                return d
            if t is None:
                raise ValueError("unterminated dict")
            if not isinstance(t, _Name):
                # lenient: skip junk key
                continue
            d[str(t)] = _parse_value(lx, None, _depth + 1)
        return d
    if isinstance(tok, _Kw):
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return None
        return tok
    if isinstance(tok, int) and not isinstance(tok, bool):
        # lookahead for "int int R"
        t2 = lx.next()
        if isinstance(t2, int) and not isinstance(t2, bool):
            t3 = lx.next()
            if isinstance(t3, _Kw) and t3 == "R":
                return _Ref(tok, t2)
            if t3 is not None:
                lx.pushback(t3)
        if t2 is not None:
            lx.pushback(t2)
        return tok
    return tok


# ---------------------------------------------------------------------------
# Stream filters
# ---------------------------------------------------------------------------


def _png_predict(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Undo PNG row predictors (filter byte per row, filters 0-4)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    # adversarial /Columns: a row can never exceed the data itself
    if rowlen > max(0, len(data) - 1):
        rowlen = max(0, len(data) - 1)
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos : pos + rowlen])
        if len(row) < rowlen:
            row.extend(b"\x00" * (rowlen - len(row)))
        pos += rowlen
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG predictor filter {ft}")
        out.extend(row)
        prev = row
        if pos >= n:
            break
    return bytes(out)


def _apply_predictor(data: bytes, parms: dict) -> bytes:
    pred = parms.get("Predictor", 1)
    if pred in (None, 1):
        return data
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if pred == 2:  # TIFF horizontal differencing (8-bit only here)
        if bpc != 8:
            raise ValueError("TIFF predictor with bpc != 8 unsupported")
        rowlen = min(columns * colors, max(1, len(data)))
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(colors, rowlen):
                out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
        return bytes(out)
    if pred >= 10:
        return _png_predict(data, colors, bpc, columns)
    raise ValueError(f"unknown predictor {pred}")


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode: 9→12-bit MSB-first codes, 256=clear, 257=EOD,
    EarlyChange (default 1) bumps the code width one entry early."""
    base = [bytes([i]) for i in range(256)]
    table = base + [b"", b""]
    width = 9
    prev = None
    acc = 0
    nbits = 0
    out = bytearray()
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = base + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad LZW start code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(out) > 256 * 1024 * 1024:
                raise ValueError("LZW output exceeds decode cap")
            if len(table) >= (1 << width) - early and width < 12:
                width += 1
    return bytes(out)


def _a85_decode(data: bytes) -> bytes:
    from tl_spark.kernel import native_crypt

    out = native_crypt.a85_decode(data)
    if out is not None:
        return out
    # fast path: stdlib a85decode (C); our scanner remains the
    # reference for inputs it rejects (odd whitespace, partial tails)
    try:
        end = data.index(b"~>")
        import base64

        return base64.a85decode(data[:end].translate(None, delete=_WS))
    except Exception:
        pass
    return _a85_decode_slow(data)


def _a85_decode_slow(data: bytes) -> bytes:
    out = bytearray()
    group: list[int] = []
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x7E:  # '~>' terminator
            break
        if c == 0x7A and not group:  # 'z' == four zero bytes
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not (0x21 <= c <= 0x75):
            raise ValueError("bad ascii85 char")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        k = len(group)
        if k == 1:
            raise ValueError("bad ascii85 tail")
        v = 0
        for g in group + [84] * (5 - k):
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _ahx_decode(data: bytes) -> bytes:
    digits = []
    for c in data:
        if c in _WS:
            continue
        if c == 0x3E:  # '>'
            break
        digits.append(chr(c))
    if len(digits) % 2:
        digits.append("0")
    return bytes.fromhex("".join(digits))


def _rl_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out += data[i : i + l + 1]
            i += l + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - l)
                i += 1
    return bytes(out)


# Hard output cap for every decompressing filter: a small crafted
# stream (zlib bomb / LZW bomb) from an untrusted crawl must not be
# able to expand to multi-GB and OOM an executor before on_error can
# catch it. 256 MB is far above any legitimate PDF content stream.
_MAX_DECODE_BYTES = 256 * 1024 * 1024


def _flate_decode(data: bytes) -> bytes:
    """Incremental zlib inflate with a hard output cap (decompression
    bombs raise ValueError instead of exhausting executor memory)."""
    d = zlib.decompressobj()
    out = []
    total = 0
    chunk = data
    try:
        while True:
            piece = d.decompress(chunk, 8 * 1024 * 1024)
            total += len(piece)
            if total > _MAX_DECODE_BYTES:
                raise ValueError("flate output exceeds decode cap")
            out.append(piece)
            chunk = d.unconsumed_tail
            if not chunk:
                break
    except zlib.error as exc:
        raise ValueError(f"bad flate stream: {exc}") from exc
    return b"".join(out)


def _apply_filters(raw: bytes, filters, parms) -> bytes:
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms):
        p = p if isinstance(p, dict) else {}
        name = str(f)
        if name in ("FlateDecode", "Fl"):
            data = _flate_decode(data)
            data = _apply_predictor(data, p)
        elif name in ("LZWDecode", "LZW"):
            data = _lzw_decode(data, p.get("EarlyChange", 1))
            data = _apply_predictor(data, p)
        elif name in ("ASCIIHexDecode", "AHx"):
            data = _ahx_decode(data)
        elif name in ("ASCII85Decode", "A85"):
            data = _a85_decode(data)
        elif name in ("RunLengthDecode", "RL"):
            data = _rl_decode(data)
        elif name in ("DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode"):
            # image codecs: passthrough (not needed for text extraction)
            return data
        elif name == "Crypt":
            raise ValueError("encrypted streams not supported")
        else:
            raise ValueError(f"unknown filter {name}")
    return data


class _Stream:
    __slots__ = ("dict", "raw", "_doc", "_data", "_cryptinfo")

    def __init__(
        self, d: dict, raw: bytes, doc: "PdfDocument", cryptinfo=None
    ):
        self.dict = d
        self.raw = raw
        self._doc = doc
        self._data: bytes | None = None
        # (handler, objnum, gen) when this stream's bytes are encrypted
        self._cryptinfo = cryptinfo

    @property
    def data(self) -> bytes:
        if self._data is None:
            doc = self._doc
            raw = self.raw
            if self._cryptinfo is not None:
                h, num, gen = self._cryptinfo
                raw = h.decrypt_stream(raw, num, gen)
            self._data = _apply_filters(
                raw,
                doc.resolve(self.dict.get("Filter")),
                doc.resolve(self.dict.get("DecodeParms")),
            )
        return self._data


# ---------------------------------------------------------------------------
# Document / xref
# ---------------------------------------------------------------------------

_OBJ_SCAN_RE = re.compile(rb"(\d{1,10})\s+(\d{1,5})\s+obj\b")


class PdfDocument:
    """Parsed PDF file: xref chain + lazy object store + page tree."""

    def __init__(self, buf: bytes):
        if not buf.startswith(b"%PDF"):
            # leniency: allow junk before header (spec permits up to 1k)
            idx = buf.find(b"%PDF")
            if idx < 0 or idx > 1024:
                raise ValueError("not a PDF")
            buf = buf[idx:]
        self.buf = buf
        self.trailer: dict = {}
        # objnum -> ('o', offset) | ('c', objstm_num, idx)
        self._xref: dict[int, tuple] = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._font_cache: dict[int, "_Font"] = {}
        # object numbers currently being resolved — breaks the mutual
        # recursion get() -> _load_objstm() -> get() on crafted circular
        # ObjStm references (ValueError, not RecursionError)
        self._inflight: set[int] = set()
        self._crypt = None  # set by _setup_encryption after xref load
        self._crypt_skip: set[int] = set()
        try:
            self._load_xref_chain()
        except Exception:
            self._xref.clear()
            self.trailer = {}
        if not self._xref or "Root" not in self.trailer:
            self._scan_fallback()
        enc = self.trailer.get("Encrypt")
        if enc is not None:
            self._setup_encryption(enc)
        if "Root" not in self.trailer:
            raise ValueError("no /Root catalog found")

    def _setup_encryption(self, enc) -> None:
        """ISO 32000 §7.6 standard security handler (pdf_crypt): the
        empty user/owner password opens most 'protected' crawl PDFs;
        a genuinely locked or unsupported scheme stays a ValueError."""
        from tl_spark.operators.pdf_crypt import StandardSecurityHandler

        if isinstance(enc, _Ref):
            # never decrypt the /Encrypt dictionary's own strings
            self._crypt_skip.add(enc.num)
        enc_d = self.resolve(enc)
        if not isinstance(enc_d, dict):
            raise ValueError("bad /Encrypt dictionary")
        id0 = b""
        ids = self.resolve(self.trailer.get("ID"))
        if isinstance(ids, list) and ids:
            i0 = self.resolve(ids[0])
            if isinstance(i0, bytes):
                id0 = i0
        self._crypt = StandardSecurityHandler(enc_d, id0, self.resolve)
        # objects parsed before the handler existed still hold
        # ciphertext strings/streams — re-parse on demand
        self._cache.clear()
        self._objstm_cache.clear()
        self._font_cache.clear()

    # -- xref parsing -----------------------------------------------------

    def _load_xref_chain(self) -> None:
        tail = self.buf[-2048:]
        idx = tail.rfind(b"startxref")
        if idx < 0:
            raise ValueError("no startxref")
        lx = _FastLexer(tail, idx + len(b"startxref"))
        off = lx.next()
        if not isinstance(off, int):
            raise ValueError("bad startxref")
        seen = set()
        while off is not None and off not in seen and 0 <= off < len(self.buf):
            seen.add(off)
            off = self._load_xref_section(off)

    def _load_xref_section(self, off: int):
        lx = _FastLexer(self.buf, off)
        tok = lx.next()
        if isinstance(tok, _Kw) and tok == "xref":
            return self._load_classic_xref(lx)
        # else: xref stream — "N G obj <<...>> stream"
        if not isinstance(tok, int):
            raise ValueError("bad xref section")
        stream = self._parse_indirect_at(off)[1]
        if not isinstance(stream, _Stream):
            raise ValueError("xref offset does not point at a stream")
        self._load_xref_stream(stream)
        for k, v in stream.dict.items():
            self.trailer.setdefault(k, v)
        return stream.dict.get("Prev")

    def _load_classic_xref(self, lx: _Lexer):
        while True:
            tok = lx.next()
            if isinstance(tok, _Kw) and tok == "trailer":
                break
            if not isinstance(tok, int):
                raise ValueError("bad xref subsection")
            start = tok
            cnt = lx.next()
            if not isinstance(cnt, int):
                raise ValueError("bad xref count")
            for i in range(cnt):
                f1 = lx.next()
                f2 = lx.next()
                ty = lx.next()
                if not isinstance(f1, int) or not isinstance(f2, int):
                    raise ValueError("bad xref entry")
                num = start + i
                if isinstance(ty, _Kw) and ty == "n" and num not in self._xref:
                    self._xref[num] = ("o", f1)
        trailer = _parse_value(lx)
        if not isinstance(trailer, dict):
            raise ValueError("bad trailer")
        # hybrid-reference: /XRefStm supplements the classic table and
        # wins over /Prev for the entries it carries
        xstm = trailer.get("XRefStm")
        if isinstance(xstm, int):
            try:
                stream = self._parse_indirect_at(xstm)[1]
                if isinstance(stream, _Stream):
                    self._load_xref_stream(stream)
            except Exception:
                pass
        for k, v in trailer.items():
            self.trailer.setdefault(k, v)
        return trailer.get("Prev")

    def _load_xref_stream(self, stream: _Stream) -> None:
        d = stream.dict
        w = [int(x) for x in d.get("W", [])]
        if len(w) < 3:
            raise ValueError("bad /W")
        size = int(self.resolve(d.get("Size", 0)))
        index = d.get("Index", [0, size])
        data = stream.data
        rowlen = sum(w)
        pos = 0
        for k in range(0, len(index) - 1, 2):
            start, cnt = int(index[k]), int(index[k + 1])
            for i in range(cnt):
                if pos + rowlen > len(data):
                    return
                row = data[pos : pos + rowlen]
                pos += rowlen
                o = 0
                fields = []
                for width in w:
                    v = int.from_bytes(row[o : o + width], "big") if width else None
                    o += width
                    fields.append(v)
                ty = fields[0] if w[0] else 1
                num = start + i
                if num in self._xref:
                    continue
                if ty == 1:
                    self._xref[num] = ("o", fields[1])
                elif ty == 2:
                    self._xref[num] = ("c", fields[1], fields[2])
                # type 0 (free): skip

    def _scan_fallback(self) -> None:
        """Rebuild the xref by scanning for ``N G obj`` (last wins —
        incremental updates append the newest generation last), then
        index any /ObjStm streams found so compressed objects are
        recoverable too."""
        for m in _OBJ_SCAN_RE.finditer(self.buf):
            self._xref[int(m.group(1))] = ("o", m.start())
        for num in sorted(self._xref):
            try:
                obj = self.get(num)
            except Exception:
                continue
            if (
                isinstance(obj, _Stream)
                and str(obj.dict.get("Type", "")) == "ObjStm"
            ):
                try:
                    members = self._load_objstm(num)
                except Exception:
                    continue
                for idx, (onum, _) in enumerate(members):
                    if onum not in self._xref:
                        self._xref[onum] = ("c", num, idx)
        if "Root" not in self.trailer:
            # newest trailer dict with /Root (keep /Info etc. as
            # well), else any /Type /Catalog
            for m in re.finditer(rb"trailer", self.buf):
                try:
                    t = _parse_value(_FastLexer(self.buf, m.end()))
                    if isinstance(t, dict) and "Root" in t:
                        for k, v in t.items():
                            if k != "Prev":
                                self.trailer[k] = v
                except Exception:
                    continue
        if "Root" not in self.trailer:
            for num in sorted(self._xref):
                try:
                    obj = self.get(num)
                except Exception:
                    continue
                d = obj.dict if isinstance(obj, _Stream) else obj
                if not isinstance(d, dict):
                    continue
                ty = str(d.get("Type", ""))
                if ty == "Catalog":
                    self.trailer["Root"] = _Ref(num, 0)
                    break
                # an orphaned xref stream still names the catalog
                if ty == "XRef" and isinstance(d.get("Root"), _Ref):
                    self.trailer["Root"] = d["Root"]
                    break

    # -- object access ----------------------------------------------------

    def _parse_indirect_at(self, off: int) -> tuple[int, object]:
        lx = _FastLexer(self.buf, off)
        num = lx.next()
        gen = lx.next()
        kw = lx.next()
        if not (isinstance(num, int) and isinstance(gen, int)) or not (
            isinstance(kw, _Kw) and kw == "obj"
        ):
            raise ValueError(f"no indirect object at {off}")
        val = _parse_value(lx)
        tok = lx.next()
        if isinstance(tok, _Kw) and tok == "stream":
            if not isinstance(val, dict):
                raise ValueError("stream without dict")
            p = lx.pos
            if self.buf[p : p + 2] == b"\r\n":
                p += 2
            elif p < len(self.buf) and self.buf[p : p + 1] in (b"\n", b"\r"):
                p += 1
            length = self.resolve(val.get("Length"))
            raw = None
            if isinstance(length, int) and length >= 0:
                cand = self.buf[p : p + length]
                after = self.buf[p + length : p + length + 20]
                if b"endstream" in after or after.strip().startswith(b"endstream"):
                    raw = cand
            if raw is None:  # lenient: find endstream ourselves
                end = self.buf.find(b"endstream", p)
                if end < 0:
                    raise ValueError("unterminated stream")
                raw = self.buf[p:end]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
            crypt = None
            if self._crypt is not None and num not in self._crypt_skip:
                val = self._crypt.decrypt_object(val, num, gen)
                t = str(val.get("Type", ""))
                # xref streams are never encrypted; /Metadata follows
                # the EncryptMetadata flag
                if t != "XRef" and (
                    t != "Metadata" or self._crypt.encrypt_metadata
                ):
                    crypt = (self._crypt, num, gen)
            return num, _Stream(val, raw, self, crypt)
        if self._crypt is not None and num not in self._crypt_skip:
            val = self._crypt.decrypt_object(val, num, gen)
        return num, val

    def _load_objstm(self, stm_num: int) -> list:
        objs = self._objstm_cache.get(stm_num)
        if objs is not None:
            return objs
        stream = self.get(stm_num)
        if not isinstance(stream, _Stream):
            raise ValueError("object stream missing")
        data = stream.data
        n = int(self.resolve(stream.dict.get("N", 0)))
        first = int(self.resolve(stream.dict.get("First", 0)))
        hdr = _FastLexer(data, 0)
        pairs = []
        for _ in range(n):
            onum = hdr.next()
            ooff = hdr.next()
            if not (isinstance(onum, int) and isinstance(ooff, int)):
                raise ValueError("bad objstm header")
            pairs.append((onum, ooff))
        objs = []
        for onum, ooff in pairs:
            objs.append((onum, _parse_value(_FastLexer(data, first + ooff))))
        self._objstm_cache[stm_num] = objs
        return objs

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self._xref.get(num)
        if ent is None:
            self._cache[num] = None
            return None
        if num in self._inflight:
            raise ValueError("circular object reference")
        self._inflight.add(num)
        try:
            return self._get_uncached(num, ent)
        finally:
            self._inflight.discard(num)

    def _get_uncached(self, num: int, ent: tuple):
        if ent[0] == "o":
            got_num, val = self._parse_indirect_at(ent[1])
            if got_num != num:
                # xref off-by-a-little: rescan lazily
                m = None
                for mm in _OBJ_SCAN_RE.finditer(self.buf):
                    if int(mm.group(1)) == num:
                        m = mm
                if m is None:
                    raise ValueError(f"object {num} not found")
                _, val = self._parse_indirect_at(m.start())
        else:
            _, stm_num, idx = ent
            objs = self._load_objstm(stm_num)
            val = None
            if 0 <= idx < len(objs) and objs[idx][0] == num:
                val = objs[idx][1]
            else:
                for onum, oval in objs:
                    if onum == num:
                        val = oval
                        break
        self._cache[num] = val
        return val

    def resolve(self, val):
        seen = 0
        while isinstance(val, _Ref):
            val = self.get(val.num)
            seen += 1
            if seen > 32:
                raise ValueError("reference loop")
        return val

    # -- page tree --------------------------------------------------------

    _INHERIT = ("Resources", "MediaBox", "CropBox", "Rotate")

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict):
            raise ValueError("bad catalog")
        out: list[dict] = []
        node = self.resolve(root.get("Pages"))
        if node is None:
            return out
        self._walk_pages(node, {}, out, set())
        return out

    def _walk_pages(
        self, node, inherited: dict, out: list, seen: set, depth: int = 0
    ) -> None:
        if depth > 256:  # crafted deep Kids chain: ValueError, not RecursionError
            raise ValueError("page tree too deep")
        node = self.resolve(node)
        if not isinstance(node, dict):
            return
        nid = id(node)
        if nid in seen or len(out) > 100_000:
            return
        seen.add(nid)
        inh = dict(inherited)
        for k in self._INHERIT:
            if k in node:
                inh[k] = node[k]
        if str(node.get("Type", "")) == "Page" or (
            "Kids" not in node and ("Contents" in node or "MediaBox" in inh)
        ):
            page = dict(inh)
            page.update(node)
            out.append(page)
            return
        kids = self.resolve(node.get("Kids", []))
        if isinstance(kids, list):
            for kid in kids:
                self._walk_pages(kid, inh, out, seen, depth + 1)

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        if isinstance(c, _Stream):
            return c.data
        if not isinstance(c, list):
            return b""
        parts = []
        for part in c:
            part = self.resolve(part)
            if isinstance(part, _Stream):
                parts.append(part.data)
        return b"\n".join(parts)


# ---------------------------------------------------------------------------
# Fonts
# ---------------------------------------------------------------------------

# WinAnsiEncoding differences vs Latin-1 (the 0x80-0x9F window)
_WINANSI_DIFF = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

# compact AGL subset: the names a /Differences array realistically uses
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "zero": "0", "one": "1",
    "two": "2", "three": "3", "four": "4", "five": "5", "six": "6",
    "seven": "7", "eight": "8", "nine": "9", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "Euro": "€",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "ntilde": "ñ", "Adieresis": "Ä",
    "Odieresis": "Ö", "Udieresis": "Ü", "germandbls": "ß",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™",
}
for _c in range(ord("A"), ord("Z") + 1):
    _AGL[chr(_c)] = chr(_c)
for _c in range(ord("a"), ord("z") + 1):
    _AGL[chr(_c)] = chr(_c)


def _glyph_to_unicode(name: str) -> str:
    g = _AGL.get(name)
    if g is not None:
        return g
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            pass
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            pass
    return "�"


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap: bfchar + bfrange (both dst forms)."""
    lx = _FastLexer(data)
    out: dict[int, str] = {}

    def code_of(b: bytes) -> int:
        return int.from_bytes(b, "big") if b else 0

    def uni_of(b: bytes) -> str:
        try:
            return b.decode("utf-16-be", "surrogatepass")
        except Exception:
            return "�"

    while True:
        tok = lx.next()
        if tok is None:
            break
        if not isinstance(tok, _Kw):
            continue
        if tok == "beginbfchar":
            while True:
                src = lx.next()
                if src is None or (isinstance(src, _Kw) and src == "endbfchar"):
                    break
                dst = lx.next()
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    out[code_of(src)] = uni_of(dst)
        elif tok == "beginbfrange":
            while True:
                lo = lx.next()
                if lo is None or (isinstance(lo, _Kw) and lo == "endbfrange"):
                    break
                hi = lx.next()
                dst = _parse_value(lx)
                if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                    continue
                lo_i, hi_i = code_of(lo), code_of(hi)
                if hi_i - lo_i > 0x10000:
                    continue
                if isinstance(dst, list):
                    for i, d in enumerate(dst):
                        if isinstance(d, bytes):
                            out[lo_i + i] = uni_of(d)
                elif isinstance(dst, bytes):
                    base = code_of(dst)
                    blen = max(len(dst), 1)
                    for i in range(hi_i - lo_i + 1):
                        out[lo_i + i] = uni_of(
                            (base + i).to_bytes(blen, "big")
                        )
    return out


class _Font:
    """code→(unicode, width/1000) decoder for one /Font resource."""

    def __init__(self, doc: PdfDocument, d: dict):
        d = doc.resolve(d)
        d = d if isinstance(d, dict) else {}
        self.code_bytes = 1
        self.tounicode: dict[int, str] = {}
        self.widths: dict[int, float] = {}
        self.default_width = 500.0
        self.encoding: list[str] | None = None
        tu = doc.resolve(d.get("ToUnicode"))
        if isinstance(tu, _Stream):
            try:
                self.tounicode = _parse_tounicode(tu.data)
            except Exception:
                self.tounicode = {}
        subtype = str(d.get("Subtype", ""))
        if subtype == "Type0":
            self.code_bytes = 2
            desc = doc.resolve(d.get("DescendantFonts"))
            df = doc.resolve(desc[0]) if isinstance(desc, list) and desc else {}
            df = df if isinstance(df, dict) else {}
            self.default_width = float(doc.resolve(df.get("DW", 1000)))
            w = doc.resolve(df.get("W"))
            if isinstance(w, list):
                self._parse_cid_widths(doc, w)
        else:
            base = [chr(i) for i in range(256)]  # Latin-1-ish baseline
            enc = doc.resolve(d.get("Encoding"))
            enc_name = str(enc) if isinstance(enc, (str, _Name)) else ""
            enc_dict = enc if isinstance(enc, dict) else {}
            if enc_dict:
                enc_name = str(enc_dict.get("BaseEncoding", enc_name or ""))
            if enc_name == "WinAnsiEncoding" or not enc_name:
                for c, u in _WINANSI_DIFF.items():
                    base[c] = chr(u)
            diffs = doc.resolve(enc_dict.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    if isinstance(item, (int, float)) and not isinstance(item, bool):
                        code = int(item)
                    elif isinstance(item, _Name):
                        if 0 <= code < 256:
                            base[code] = _glyph_to_unicode(str(item))
                        code += 1
            self.encoding = base
            first = doc.resolve(d.get("FirstChar"))
            warr = doc.resolve(d.get("Widths"))
            if isinstance(first, int) and isinstance(warr, list):
                for i, wv in enumerate(warr):
                    wv = doc.resolve(wv)
                    if isinstance(wv, (int, float)):
                        self.widths[first + i] = float(wv)
            fdesc = doc.resolve(d.get("FontDescriptor"))
            if isinstance(fdesc, dict):
                mw = doc.resolve(fdesc.get("MissingWidth"))
                if isinstance(mw, (int, float)):
                    self.default_width = float(mw)
                # Symbolic subset fonts with no /Encoding and no
                # /ToUnicode: the embedded font program is the ONLY
                # code→unicode source (PDF 32000-1 §9.6.6.4). Decode
                # through its cmap+post (TrueType) or
                # charset+Encoding+strings (CFF) tables — the
                # dominant real-world-crawl case the kernel used to
                # mis-decode as WinAnsi. A malformed program raises
                # ValueError (kernel contract): the font is this
                # text's only decode source, so failing fast beats
                # emitting garbage.
                flags = doc.resolve(fdesc.get("Flags"))
                if (
                    d.get("Encoding") is None
                    and not self.tounicode
                    and isinstance(flags, int)
                    and flags & 4
                ):
                    ff = doc.resolve(fdesc.get("FontFile2"))
                    if not isinstance(ff, _Stream):
                        ff = doc.resolve(fdesc.get("FontFile3"))
                    if isinstance(ff, _Stream):
                        from tl_spark.operators.fontprog import (
                            fontfile_code_map,
                        )

                        for c, u in fontfile_code_map(ff.data).items():
                            if 0 <= c < 256:
                                base[c] = u

        self._finalize_tables()

    def _finalize_tables(self) -> None:
        """Precompute whole-string decode tables (exact, just faster):
        a 256-entry unicode+width table for 1-byte fonts, and an
        identity flag for Type0 fonts whose ToUnicode maps every code
        to its own UTF-16 unit (the Identity-H + identity-CMap case)."""
        if self.code_bytes == 1:
            enc = self.encoding or [chr(i) for i in range(256)]
            tu = self.tounicode
            self._uni256 = [
                (tu.get(c) if tu.get(c) is not None else enc[c])
                for c in range(256)
            ]
            w = self.widths
            dw = self.default_width
            self._w256 = [w.get(c, dw) for c in range(256)]
            self._identity2 = False
        else:
            self._uni256 = None
            self._w256 = None
            self._identity2 = bool(self.tounicode) and all(
                len(v) == 1 and ord(v) == k or
                (len(v) == 1 and 0xD800 <= ord(v) <= 0xDFFF and ord(v) == k)
                for k, v in self.tounicode.items()
            )

    def _parse_cid_widths(self, doc: PdfDocument, w: list) -> None:
        i = 0
        n = len(w)
        while i < n:
            c = doc.resolve(w[i])
            if not isinstance(c, (int, float)):
                break
            if i + 1 < n and isinstance(doc.resolve(w[i + 1]), list):
                arr = doc.resolve(w[i + 1])
                for k, wv in enumerate(arr):
                    wv = doc.resolve(wv)
                    if isinstance(wv, (int, float)):
                        self.widths[int(c) + k] = float(wv)
                i += 2
            elif i + 2 < n:
                c2 = doc.resolve(w[i + 1])
                wv = doc.resolve(w[i + 2])
                if isinstance(c2, (int, float)) and isinstance(wv, (int, float)):
                    lo, hi = int(c), int(c2)
                    if 0 <= hi - lo <= 0xFFFF:  # CIDs are 16-bit
                        for code in range(lo, hi + 1):
                            self.widths[code] = float(wv)
                i += 3
            else:
                break

    def iter_codes(self, raw: bytes):
        if self.code_bytes == 1:
            yield from raw
        else:
            for i in range(0, len(raw) - 1, 2):
                yield (raw[i] << 8) | raw[i + 1]

    def to_unicode(self, code: int) -> str:
        u = self.tounicode.get(code)
        if u is not None:
            return u
        if self.encoding is not None and 0 <= code < 256:
            return self.encoding[code]
        try:
            return chr(code)
        except ValueError:
            return "�"

    def width(self, code: int) -> float:
        return self.widths.get(code, self.default_width)


# ---------------------------------------------------------------------------
# Content interpreter + layout assembly
# ---------------------------------------------------------------------------

_RUN_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*"  # fold ws+comment skip in
    rb"(<<|>>|[\[\]{}]"  # dict/array/proc brackets
    rb"|<[^>]*>?"  # hex string (no '>' inside by construction)
    rb"|[()]"  # string delims (literal handled by scanner)
    rb"|/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*"  # name
    rb"|[^\x00\t\n\x0c\r ()<>\[\]{}/%]+"  # number-or-keyword run
    rb"|.|$)",  # stray byte: skip; $: EOF
    re.S,
)


class _FastLexer(_Lexer):
    """Drop-in lexer for CONTENT streams: one compiled-regex match per
    token instead of byte-at-a-time scanning. Token-for-token
    identical to :class:`_Lexer` (the classifier mirrors its branch
    order); literal strings and names with ``#`` escapes delegate to
    the byte-exact scanners."""

    def next(self):
        if self._push:
            return self._push.pop()
        buf = self.buf
        match = _RUN_RE.match
        pos = self.pos
        while True:
            m = match(buf, pos)
            tok = m.group(1)
            pos = m.end()
            if not tok:
                self.pos = pos
                return None
            c = tok[0]
            self.pos = pos
            if c == 0x3C:  # '<'
                if tok == b"<<":
                    return _DICT_OPEN
                digits = bytes(
                    d for d in tok[1:] if d not in _WS and d != 0x3E
                )
                if len(digits) % 2:
                    digits += b"0"
                try:
                    return bytes.fromhex(digits.decode("ascii"))
                except (ValueError, UnicodeDecodeError):
                    raise ValueError("bad hex string")
            if c == 0x28:  # '(' literal string via the exact scanner
                return self._literal_string(pos)
            if c == 0x2F:  # name
                if b"#" in tok:
                    return self._name(self.pos - len(tok) + 1)
                return _Name(tok[1:].decode("latin-1"))
            if c == 0x3E:  # '>>' closes a dict; a stray '>' is skipped
                if tok == b">>":
                    return _DICT_CLOSE
                continue
            if c == 0x5B:
                return _ARR_OPEN
            if c == 0x5D:
                return _ARR_CLOSE
            if c == 0x7B or c == 0x7D:
                return _Kw(chr(c))
            if c == 0x29:  # stray ')' — always advance
                continue
            if _NUM_RE.match(tok):
                if b"." in tok:
                    return float(tok)
                return int(tok)
            return _Kw(tok.decode("latin-1"))


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m, n):
    a, b, c, d, e, f = m
    A, B, C, D, E, F = n
    return (
        a * A + b * C,
        a * B + b * D,
        c * A + d * C,
        c * B + d * D,
        e * A + f * C + E,
        e * B + f * D + F,
    )


class _Chunk:
    __slots__ = ("x0", "y", "x1", "size", "text")

    def __init__(self, x0, y, x1, size, text):
        self.x0, self.y, self.x1, self.size, self.text = x0, y, x1, size, text


class _Interp:
    """Execute one page's content stream, emitting positioned chunks."""

    def __init__(self, doc: PdfDocument, resources: dict):
        self.doc = doc
        res = doc.resolve(resources)
        res = res if isinstance(res, dict) else {}
        fr = doc.resolve(res.get("Font"))
        self.font_res = fr if isinstance(fr, dict) else {}
        self._font_cache: dict[str, _Font] = {}
        self.chunks: list[_Chunk] = []

    def _font(self, name: str) -> _Font:
        f = self._font_cache.get(name)
        if f is None:
            fd = self.font_res.get(name)
            rd = self.doc.resolve(fd) if fd is not None else {}
            # decoders are doc-scoped: ToUnicode/Widths parse once per
            # document, not once per page. The cache holds rd in the
            # VALUE: keying by a bare id() let a freed dict's recycled
            # address alias a LATER font dict (a page whose Tf named a
            # missing resource cached the default font under a
            # short-lived {}; the real font dict parsed afterwards
            # could land on the same address and silently inherit it —
            # found by the whole-document differential fuzz, r7).
            key = id(rd)
            ent = self.doc._font_cache.get(key)
            if ent is not None and ent[0] is rd:
                f = ent[1]
            else:
                f = _Font(self.doc, rd)
                self.doc._font_cache[key] = (rd, f)
            self._font_cache[name] = f
        return f

    def run(self, content: bytes) -> list[_Chunk]:
        # native leg (bit-equal chunks; silent fallback on any anomaly
        # so error semantics stay Python-exact — see kernel/native_pdf)
        from tl_spark.kernel import native_pdf

        nat = native_pdf.run_native(self, content)
        if nat is not None:
            self.chunks.extend(_Chunk(*t) for t in nat)
            return self.chunks
        return self._run_py(content)

    def _run_py(self, content: bytes) -> list[_Chunk]:
        lx = _FastLexer(content)
        stack: list = []
        ctm = _ID
        gs_stack: list = []
        # text state
        tm = tlm = _ID
        tf: _Font | None = None
        tfs = 0.0
        tc = tw = ts = 0.0
        tl = 0.0
        th = 1.0
        in_text = False

        def num(v, default=0.0):
            return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else default

        def show(s: bytes):
            nonlocal tm
            if tf is None or not isinstance(s, bytes):
                return
            trm = _mat_mul(_mat_mul((tfs * th, 0.0, 0.0, tfs, 0.0, ts), tm), ctm)
            x0, y0 = trm[4], trm[5]
            size_dev = abs(trm[3]) or abs(trm[1]) or tfs or 1.0
            if tf.code_bytes == 1:
                # table-driven whole-string decode (exact semantics)
                text = "".join(map(tf._uni256.__getitem__, s))
                disp = (
                    sum(map(tf._w256.__getitem__, s)) / 1000.0 * tfs
                    + len(s) * tc
                    + (s.count(32) * tw if tw else 0.0)
                ) * th
            else:
                if len(s) % 2:
                    s = s[:-1]  # dangling byte in a 2-byte code string
                n2 = len(s) // 2
                if tf._identity2:
                    text = s.decode("utf-16-be", "surrogatepass")
                else:
                    text = "".join(
                        tf.to_unicode((s[i] << 8) | s[i + 1])
                        for i in range(0, len(s), 2)
                    )
                if tf.widths:
                    wsum = sum(
                        tf.width((s[i] << 8) | s[i + 1])
                        for i in range(0, len(s), 2)
                    )
                else:
                    wsum = n2 * tf.default_width
                disp = (wsum / 1000.0 * tfs + n2 * tc) * th
            tm = _mat_mul((1.0, 0.0, 0.0, 1.0, disp, 0.0), tm)
            trm2 = _mat_mul(_mat_mul((tfs * th, 0.0, 0.0, tfs, 0.0, ts), tm), ctm)
            text = _fix_surrogates(text)
            if text:
                self.chunks.append(_Chunk(x0, y0, trm2[4], size_dev, text))

        while True:
            tok = lx.next()
            if tok is None:
                break
            if tok is _ARR_OPEN or tok is _DICT_OPEN:
                stack.append(_parse_value(lx, tok))
                continue
            if not isinstance(tok, _Kw):
                stack.append(tok)
                continue
            op = str(tok)
            try:
                if op == "BT":
                    tm = tlm = _ID
                    in_text = True
                elif op == "ET":
                    in_text = False
                elif op == "Tf" and len(stack) >= 2:
                    tfs = num(stack[-1])
                    fname = stack[-2]
                    if isinstance(fname, _Name):
                        tf = self._font(str(fname))
                elif op == "Td" and len(stack) >= 2:
                    tlm = _mat_mul(
                        (1.0, 0.0, 0.0, 1.0, num(stack[-2]), num(stack[-1])), tlm
                    )
                    tm = tlm
                elif op == "TD" and len(stack) >= 2:
                    tl = -num(stack[-1])
                    tlm = _mat_mul(
                        (1.0, 0.0, 0.0, 1.0, num(stack[-2]), num(stack[-1])), tlm
                    )
                    tm = tlm
                elif op == "Tm" and len(stack) >= 6:
                    tm = tlm = tuple(num(v) for v in stack[-6:])
                elif op == "T*":
                    tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -tl), tlm)
                    tm = tlm
                elif op == "TL" and stack:
                    tl = num(stack[-1])
                elif op == "Tc" and stack:
                    tc = num(stack[-1])
                elif op == "Tw" and stack:
                    tw = num(stack[-1])
                elif op == "Tz" and stack:
                    th = num(stack[-1], 100.0) / 100.0
                elif op == "Ts" and stack:
                    ts = num(stack[-1])
                elif op == "Tj" and stack:
                    show(stack[-1])
                elif op == "'" and stack:
                    tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -tl), tlm)
                    tm = tlm
                    show(stack[-1])
                elif op == '"' and len(stack) >= 3:
                    tw = num(stack[-3])
                    tc = num(stack[-2])
                    tlm = _mat_mul((1.0, 0.0, 0.0, 1.0, 0.0, -tl), tlm)
                    tm = tlm
                    show(stack[-1])
                elif op == "TJ" and stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, bytes):
                            show(el)
                        elif isinstance(el, (int, float)):
                            t = -float(el) / 1000.0 * tfs * th
                            tm = _mat_mul((1.0, 0.0, 0.0, 1.0, t, 0.0), tm)
                elif op == "cm" and len(stack) >= 6:
                    ctm = _mat_mul(tuple(num(v) for v in stack[-6:]), ctm)
                elif op == "q":
                    gs_stack.append(ctm)
                elif op == "Q":
                    if gs_stack:
                        ctm = gs_stack.pop()
                elif op == "BI":
                    # inline image: skip to 'EI' bounded by whitespace
                    pos = lx.buf.find(b"EI", lx.pos)
                    while pos > 0 and lx.buf[pos - 1 : pos] not in (
                        b" ", b"\n", b"\r", b"\t", b"\x00",
                    ):
                        pos = lx.buf.find(b"EI", pos + 2)
                    lx.pos = len(lx.buf) if pos < 0 else pos + 2
                # all other operators: no text effect
            finally:
                stack.clear()
        return self.chunks


def _fix_surrogates(s: str) -> str:
    """Recombine surrogate pairs that ToUnicode emitted as separate
    UTF-16 code units (the Identity-H + identity-CMap case)."""
    if not any(0xD800 <= ord(ch) <= 0xDFFF for ch in s):
        return s
    try:
        return s.encode("utf-16", "surrogatepass").decode("utf-16")
    except Exception:
        return "".join(
            ch if not 0xD800 <= ord(ch) <= 0xDFFF else "�" for ch in s
        )


# layout constants: fixed so extraction is deterministic
_ROW_TOL_FRAC = 0.4  # same-row if |Δy| <= max(1, 0.4*size)
_GAP_FRAC = 0.13  # insert ' ' when gap >= 0.13*size (≈ half a space)
_COL_GUTTER_FRAC = 1.0  # min vertical gutter width, × median size
_BAND_GAP_FRAC = 1.8  # min horizontal band gap, × median size
_XYCUT_MAX_DEPTH = 8


def _proj_gaps(intervals: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Maximal uncovered gaps strictly inside the union of intervals."""
    ivs = sorted(intervals)
    merged: list[list[float]] = []
    for a, b in ivs:
        if merged and a <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    return [
        (m1[1], m2[0]) for m1, m2 in zip(merged, merged[1:]) if m2[0] > m1[1]
    ]


def _n_rows(chunks: list[_Chunk]) -> int:
    ys = sorted(c.y for c in chunks)
    n = 1 if ys else 0
    for a, b in zip(ys, ys[1:]):
        if b - a > 1.0:
            n += 1
    return n


def _xycut(chunks: list[_Chunk], depth: int = 0) -> list[list[_Chunk]]:
    """Recursive X-Y cut (Nagy's classic page-segmentation algorithm,
    public knowledge): split on the widest whitespace gutter —
    vertical (columns, needs ≥2 text rows per side) or horizontal
    (bands) — and recurse. Leaves are returned in reading order:
    top band before bottom, left column before right."""
    if len(chunks) <= 1 or depth >= _XYCUT_MAX_DEPTH:
        return [chunks]
    sizes = sorted(c.size for c in chunks)
    med = sizes[len(sizes) // 2] or 1.0
    best: tuple[float, str, float] | None = None
    for a, b in _proj_gaps([(c.x0, c.x1) for c in chunks]):
        w = b - a
        if w >= _COL_GUTTER_FRAC * med and (best is None or w > best[0]):
            left = [c for c in chunks if c.x1 <= a + 1e-9]
            right = [c for c in chunks if c.x0 >= b - 1e-9]
            if _n_rows(left) >= 2 and _n_rows(right) >= 2:
                best = (w, "x", (a + b) / 2.0)
    for a, b in _proj_gaps(
        [(c.y - 0.25 * c.size, c.y + 0.75 * c.size) for c in chunks]
    ):
        w = b - a
        if w >= _BAND_GAP_FRAC * med and (best is None or w > best[0]):
            best = (w, "y", (a + b) / 2.0)
    if best is None:
        return [chunks]
    _, axis, cut = best
    if axis == "x":
        first = [c for c in chunks if (c.x0 + c.x1) / 2.0 < cut]
        second = [c for c in chunks if (c.x0 + c.x1) / 2.0 >= cut]
    else:  # top band first (device y grows upward)
        first = [c for c in chunks if c.y > cut]
        second = [c for c in chunks if c.y <= cut]
    if not first or not second:
        return [chunks]
    return _xycut(first, depth + 1) + _xycut(second, depth + 1)


def _assemble(chunks: list[_Chunk], columns: str = "off") -> str:
    """Re-order positioned chunks into reading order. ``columns="off"``
    (default): single-block row assembly — rows by descending y with a
    size-relative tolerance, left-to-right inside a row; abutting
    chunks merge, word gaps become single spaces. ``columns="auto"``:
    recursive X-Y cut first, so multi-column pages read each column
    fully before the next; single-column pages produce identical
    output either way (the cut finds no qualifying gutter)."""
    if not chunks:
        return ""
    if columns == "auto":
        blocks = _xycut(chunks)
        if len(blocks) > 1:
            return "\n".join(
                t for t in (_assemble(b, "off") for b in blocks) if t
            )
    chunks = sorted(chunks, key=lambda c: (-c.y, c.x0))
    rows: list[list[_Chunk]] = []
    cur: list[_Chunk] = [chunks[0]]
    cur_y = chunks[0].y
    for c in chunks[1:]:
        tol = max(1.0, _ROW_TOL_FRAC * max(c.size, cur[-1].size))
        if abs(c.y - cur_y) <= tol:
            cur.append(c)
        else:
            rows.append(cur)
            cur = [c]
            cur_y = c.y
    rows.append(cur)
    lines = []
    for row in rows:
        row.sort(key=lambda c: c.x0)
        buf: list[str] = [row[0].text]
        prev = row[0]
        for c in row[1:]:
            gap = c.x0 - prev.x1
            if gap >= _GAP_FRAC * max(c.size, prev.size):
                buf.append(" ")
            buf.append(c.text)
            prev = c
        lines.append("".join(buf))
    return "\n".join(lines)


def _assemble_spans(
    chunks: list[_Chunk], columns: str = "off"
) -> list[tuple[int, int, float, float]]:
    """Line spans for :func:`_assemble`'s output: one
    ``(start, end, x, y)`` per emitted line, where ``[start, end)``
    are char offsets into the page text (so
    ``text[start:end]`` == the line) and ``(x, y)`` is the line's
    device position. Derived from the same assembly, so the offsets
    are exact by construction."""
    if not chunks:
        return []
    if columns == "auto":
        blocks = _xycut(chunks)
        if len(blocks) > 1:
            spans: list[tuple[int, int, float, float]] = []
            off = 0
            for b in blocks:
                text = _assemble(b, "off")
                if not text:
                    continue
                for st, en, x, y in _assemble_spans(b, "off"):
                    spans.append((st + off, en + off, x, y))
                off += len(text) + 1  # the joining newline
            return spans
    text = _assemble(chunks, "off")
    if not text:
        return []
    # re-derive rows exactly as _assemble does
    cs = sorted(chunks, key=lambda c: (-c.y, c.x0))
    rows: list[list[_Chunk]] = []
    cur = [cs[0]]
    cur_y = cs[0].y
    for c in cs[1:]:
        tol = max(1.0, _ROW_TOL_FRAC * max(c.size, cur[-1].size))
        if abs(c.y - cur_y) <= tol:
            cur.append(c)
        else:
            rows.append(cur)
            cur = [c]
            cur_y = c.y
    rows.append(cur)
    spans = []
    off = 0
    lines = text.split("\n")
    for i, row in enumerate(rows):
        line = lines[i]
        row.sort(key=lambda c: c.x0)
        spans.append((off, off + len(line), row[0].x0, row[0].y))
        off += len(line) + 1
    return spans


def _doc_chunks(doc: "PdfDocument") -> list[list[_Chunk]]:
    """Per-page chunk lists for a whole document. Fast path: gather
    every page's decoded content + interpreter, then ONE batched native
    call per run of pages sharing a /Font dict
    (kernel/native_pdf.run_native_pages) — the per-call FFI fixed cost
    dominates short pages. Error semantics are pinned to the
    sequential per-page path bit-for-bit: if gathering raises anywhere
    (content decode, resource resolution), the whole document is
    replayed strictly sequentially from scratch so the SAME exception
    surfaces in the same page order; a batch bail falls back per page
    in order for the same reason."""
    try:
        pages_ci = [
            (doc.page_content(p), _Interp(doc, p.get("Resources", {})))
            for p in doc.pages()
        ]
    except Exception:
        pages_ci = None
    if pages_ci is not None:
        from tl_spark.kernel import native_pdf

        contents = [c for c, _ in pages_ci]
        interps = [i for _, i in pages_ci]
        nat = native_pdf.run_native_pages(interps, contents)
        out = []
        for k, (content, interp) in enumerate(pages_ci):
            res = nat[k] if nat is not None else None
            if res is not None:
                interp.chunks.extend(_Chunk(*t) for t in res)
                out.append(interp.chunks)
            else:
                out.append(interp.run(content))
        return out
    # sequential replay: reproduces the exact per-page error order
    out = []
    for page in doc.pages():
        content = doc.page_content(page)
        out.append(_Interp(doc, page.get("Resources", {})).run(content))
    return out


def _chunks_for(data: bytes) -> list[list[_Chunk]]:
    """Per-page chunks for a document. Fast path: the whole-document
    native leg (kernel/native_pdf.doc_chunks — xref, objects, filters,
    page tree AND interpretation in one native pass, fonts
    materialized Python-side from native closures). On ANY anomaly it
    returns None and the pure-Python PdfDocument path replays the
    whole document, reproducing the exact Python error/leniency
    semantics; on success the chunks are bit-equal (pinned by the
    whole-doc differential fuzz in tests/test_native_pdf.py)."""
    from tl_spark.kernel import native_pdf

    pages = native_pdf.doc_chunks(data)
    if pages is not None:
        return [[_Chunk(*t) for t in page] for page in pages]
    return _doc_chunks(PdfDocument(data))


def extract_pdf_pages(data: bytes, columns: str = "off") -> list[str]:
    """Kernel entry: PDF bytes → list of per-page extracted text.
    ``columns="auto"`` enables X-Y-cut column segmentation."""
    return [_assemble(chunks, columns) for chunks in _chunks_for(data)]


def extract_pdf_pages_with_spans(
    data: bytes, columns: str = "off"
) -> list[tuple[str, list[tuple[int, int, float, float]]]]:
    """Like :func:`extract_pdf_pages` but each page also carries its
    per-line ``(start, end, x, y)`` spans — char offsets into the page
    text plus device position, the PDF analog of the HTML kernel's
    text + byte-span contract."""
    return [
        (_assemble(chunks, columns), _assemble_spans(chunks, columns))
        for chunks in _chunks_for(data)
    ]


# ---------------------------------------------------------------------------
# Deterministic PDF generator (test/oracle harness)
# ---------------------------------------------------------------------------
#
# Wraps a document's text by a SQL-expressible rule — 8 words per line,
# 5 lines per page — and renders it through four structural variants
# chosen by doc_id % 4, so every parser path above is exercised by the
# driver oracle:
#   0: classic xref, raw content, absolute Tm, ROTATED draw order
#      (layout assembly must re-sort by y)
#   1: classic xref, Flate content, TL + ' (quote) relative line ops
#   2: xref STREAM (+Predictor 12) + ObjStm-packed objects, Flate
#      content wrapped in q/cm/Q (CTM exercised), hex strings
#   3: incremental update (newest Info shadows via /Prev chain),
#      [ASCII85 + Flate] cascade content, AHx ToUnicode, TJ kern splits
#   4: variant 1 ENCRYPTED with the standard security handler, RC4
#      V2/R3, empty user password (pdf_crypt.encrypt_pdf)
#   5: variant 3 ENCRYPTED with AES-128-CBC crypt filters (V4/R4
#      AESV2), empty user password — decryption + filter cascade
# Pure-ASCII text uses a simple /WinAnsiEncoding Type1 font; anything
# else uses Type0 / Identity-H with a block-compacted identity
# ToUnicode CMap (UTF-16 code units as 2-byte CIDs, surrogates pair up
# on extraction).

WORDS_PER_LINE = 8
LINES_PER_PAGE = 5
_FONT_SIZE = 11
_LEADING = 14
_X0 = 72
_Y0 = 760


def wrap_lines(text: str, words_per_line: int = WORDS_PER_LINE) -> list[str]:
    ws = [w for w in text.split(" ") if w]
    return [
        " ".join(ws[i : i + words_per_line])
        for i in range(0, len(ws), words_per_line)
    ]


def _lit(b: bytes) -> bytes:
    out = bytearray(b"(")
    for c in b:
        if c in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([c])
        elif c == 13:
            out += b"\\r"
        elif c == 10:
            out += b"\\n"
        else:
            out.append(c)
    out += b")"
    return bytes(out)


def _hexs(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


def _a85_encode(b: bytes) -> bytes:
    out = []
    for i in range(0, len(b), 4):
        g = b[i : i + 4]
        pad = 4 - len(g)
        v = int.from_bytes(g + b"\x00" * pad, "big")
        cs = []
        for _ in range(5):
            cs.append(v % 85)
            v //= 85
        s = bytes(c + 33 for c in reversed(cs))
        out.append(s[: 5 - pad] if pad else s)
    return b"".join(out) + b"~>"


def _enc_line(line: str, codec) -> bytes:
    """``codec``: True = Type0 UTF-16BE, False = latin-1 simple font,
    dict = subset-font char→byte-code map."""
    if isinstance(codec, dict):
        return bytes(codec[ch] for ch in line)
    if codec:
        return line.encode("utf-16-be", "surrogatepass")
    return line.encode("latin-1")


def _tounicode_cmap(text: str) -> bytes:
    units = sorted({u for ch in text for u in _u16_units(ch)})
    blocks = sorted({u >> 8 for u in units})
    ranges = [
        "<%02x00> <%02xff> <%02x00>" % (b, b, b) for b in blocks
    ]
    body = ["/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap"]
    body.append("/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def")
    body.append("/CMapName /SynthUni def\n/CMapType 2 def")
    body.append("1 begincodespacerange\n<0000> <ffff>\nendcodespacerange")
    for i in range(0, len(ranges), 100):
        chunk = ranges[i : i + 100]
        body.append("%d beginbfrange" % len(chunk))
        body.extend(chunk)
        body.append("endbfrange")
    body.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    return "\n".join(body).encode("latin-1")


def _u16_units(ch: str) -> list[int]:
    enc = ch.encode("utf-16-be", "surrogatepass")
    return [(enc[i] << 8) | enc[i + 1] for i in range(0, len(enc), 2)]


def _content_ops(page_lines: list[str], variant: int, codec, rot: int) -> bytes:
    n = len(page_lines)
    S = _hexs if variant == 2 else _lit
    ops = [b"q 1 0 0 1 20 -10 cm"] if variant == 2 else []
    ops.append(b"BT /F1 %d Tf" % _FONT_SIZE)
    if variant == 1:
        ops.append(b"%d TL 1 0 0 1 %d %d Tm" % (_LEADING, _X0, _Y0 + _LEADING))
        for line in page_lines:
            ops.append(S(_enc_line(line, codec)) + b" '")
    else:
        xoff, yoff = (20, -10) if variant == 2 else (0, 0)
        start = rot % n if n else 0
        for k in range(n):
            i = (k + start) % n
            y = _Y0 - _LEADING * i
            pos = b"1 0 0 1 %d %d Tm " % (_X0 - xoff, y - yoff)
            enc = _enc_line(page_lines[i], codec)
            if variant == 3 and len(page_lines[i]) > 1:
                mid = len(page_lines[i]) // 2
                a = _enc_line(page_lines[i][:mid], codec)
                b = _enc_line(page_lines[i][mid:], codec)
                ops.append(pos + b"[ " + S(a) + b" -15 " + S(b) + b" ] TJ")
            else:
                ops.append(pos + S(enc) + b" Tj")
    ops.append(b"ET")
    if variant == 2:
        ops.append(b"Q")
    return b"\n".join(ops)


def _enc_units(line: str, codec) -> int:
    """Number of font code units the interpreter will advance over:
    bytes for the simple latin-1 and subset fonts, UTF-16 code units
    for Type0 Identity-H. Every synth font resolves to the 500/1000
    default width, so drawn line width is exactly 0.5 * size * units."""
    if codec is True:
        return len(line.encode("utf-16-be", "surrogatepass")) // 2
    return len(line)


def _content_ops_twocol(page_lines: list[str], codec, rot: int) -> bytes:
    """Two-column page layout with a CLOSED reading-order rule: lines
    are assigned sequentially — first ceil(n/2) down the left column,
    the rest down the right (pages under 4 lines stay single-column so
    both sides of a cut always have >= 2 text rows). The right column
    starts one guaranteed gutter (2 * font size >= _COL_GUTTER_FRAC *
    median size) past the widest left line, computable exactly because
    the synth fonts carry only the 500/1000 default width. Draw order
    is deliberately scrambled (right column first, then left, both
    rotated by ``rot``), so only X-Y-cut segmentation — not content
    order, not plain row assembly — recovers the sequential text."""
    n = len(page_lines)
    n_left = n if n < 4 else (n + 1) // 2
    left = page_lines[:n_left]
    right = page_lines[n_left:]
    max_left_w = max((0.5 * _FONT_SIZE * _enc_units(l, codec) for l in left),
                     default=0.0)
    xr = int(_X0 + max_left_w + 2 * _FONT_SIZE) + 1
    placed: list[tuple[int, int, str]] = []
    for i, line in enumerate(right):
        placed.append((xr, _Y0 - _LEADING * i, line))
    for i, line in enumerate(left):
        placed.append((_X0, _Y0 - _LEADING * i, line))
    if placed:
        r = rot % len(placed)
        placed = placed[r:] + placed[:r]
    ops = [b"BT /F1 %d Tf" % _FONT_SIZE]
    for x, y, line in placed:
        ops.append(
            b"1 0 0 1 %d %d Tm " % (x, y) + _lit(_enc_line(line, codec)) + b" Tj"
        )
    ops.append(b"ET")
    return b"\n".join(ops)


def _stream_body(num: int, extra: dict[str, bytes], data: bytes) -> bytes:
    items = b"".join(b"/%s %s " % (k.encode(), v) for k, v in extra.items())
    return (
        b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (num, items, len(data))
        + data
        + b"\nendstream\nendobj\n"
    )


def _plain_body(num: int, src: bytes) -> bytes:
    return b"%d 0 obj\n%s\nendobj\n" % (num, src)


def _emit_classic(
    bodies: dict[int, bytes], root: int, info: int | None = None
) -> tuple[bytes, int]:
    buf = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(buf)
        buf += bodies[num]
    xref_off = len(buf)
    size = max(bodies) + 1
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for num in range(1, size):
        buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    info_part = b" /Info %d 0 R" % info if info else b""
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (size, root, info_part, xref_off)
    )
    return bytes(buf), xref_off


def _emit_xrefstream(
    direct: dict[int, bytes], packed: dict[int, bytes], root: int
) -> bytes:
    """Emit with an ObjStm holding ``packed`` sources and an xref
    stream (W [1 4 2], Flate + PNG Up predictor)."""
    objstm_num = max(list(direct) + list(packed)) + 1
    xref_num = objstm_num + 1
    pnums = sorted(packed)
    header = " ".join("%d %d" % (n, off) for n, off in _objstm_offsets(packed, pnums))
    header_b = (header + "\n").encode()
    payload = header_b + b"".join(packed[n] + b"\n" for n in pnums)
    objstm_data = zlib.compress(payload)
    bodies = dict(direct)
    bodies[objstm_num] = _stream_body(
        objstm_num,
        {
            "Type": b"/ObjStm",
            "N": b"%d" % len(pnums),
            "First": b"%d" % len(header_b),
            "Filter": b"/FlateDecode",
        },
        objstm_data,
    )
    buf = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(buf)
        buf += bodies[num]
    xref_off = len(buf)
    size = xref_num + 1
    rows = [b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")]
    for num in range(1, size):
        if num in offsets:
            rows.append(b"\x01" + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big"))
        elif num in packed:
            rows.append(
                b"\x02"
                + objstm_num.to_bytes(4, "big")
                + pnums.index(num).to_bytes(2, "big")
            )
        elif num == xref_num:
            rows.append(b"\x01" + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big"))
        else:
            rows.append(b"\x00" + (0).to_bytes(4, "big") + (0).to_bytes(2, "big"))
    enc = bytearray()
    prev = b"\x00" * 7
    for r in rows:
        enc.append(2)  # PNG Up filter
        enc += bytes((r[i] - prev[i]) & 0xFF for i in range(7))
        prev = r
    xdata = zlib.compress(bytes(enc))
    xbody = _stream_body(
        xref_num,
        {
            "Type": b"/XRef",
            "Size": b"%d" % size,
            "W": b"[1 4 2]",
            "Root": b"%d 0 R" % root,
            "Filter": b"/FlateDecode",
            "DecodeParms": b"<< /Predictor 12 /Columns 7 >>",
        },
        xdata,
    )
    buf += xbody
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(buf)


def _objstm_offsets(packed: dict[int, bytes], pnums: list[int]):
    off = 0
    for n in pnums:
        yield n, off
        off += len(packed[n]) + 1


def pdf_bytes(
    text: str,
    variant: int = 0,
    *,
    lines_per_page: int = LINES_PER_PAGE,
    words_per_line: int = WORDS_PER_LINE,
    rot: int = 1,
    layout: str = "single",
    font: str = "auto",
) -> bytes:
    """Render ``text`` to a real PDF (see the variant table above).
    Returns a single-empty-page PDF when the text has no words.
    ``layout="twocol"`` swaps the page content for the two-column
    builder (:func:`_content_ops_twocol`) — file structure, filters
    and fonts still follow ``variant``. ``font``: "auto" picks the
    WinAnsi Type1 / Type0 Identity-H pair by text content;
    "subset-ttf" / "subset-cff" embed a REAL symbolic subset font
    program (no /Encoding, no /ToUnicode — text decodes only through
    the embedded cmap+post / charset+Encoding tables, like wild
    crawled PDFs; see operators/fontprog.py)."""
    variant %= 4
    lines = wrap_lines(text, words_per_line)
    pages = [
        lines[i : i + lines_per_page]
        for i in range(0, len(lines), lines_per_page)
    ] or [[]]
    subset = font in ("subset-ttf", "subset-cff")
    if subset:
        # empty text still embeds a one-glyph font (never drawn)
        chars = sorted({ch for ln in lines for ch in ln}) or [" "]
        if len(chars) > 224:
            raise ValueError("subset font: more than 224 distinct chars")
        codec: dict | bool = {ch: 0x20 + i for i, ch in enumerate(chars)}
        t0 = False
    else:
        t0 = not text.isascii()
        codec = t0

    # object numbers: 1 Catalog, 2 Pages, 3 Font, (4 desc, 5 ToUnicode
    # stream if Type0 / FontFile stream if subset), then per-page
    # Page + content pairs
    font_objs: dict[int, bytes] = {}
    next_num = 4
    tounicode_stream = None
    fontfile_stream = None
    if subset:
        from tl_spark.operators.fontprog import (
            build_subset_cff,
            build_subset_ttf,
        )

        desc_num, ff_num = 4, 5
        next_num = 6
        if font == "subset-ttf":
            prog = build_subset_ttf(codec)
            sub, ff_key = b"/TrueType", b"FontFile2"
            ff_extra = {"Length1": b"%d" % len(prog)}
        else:
            prog = build_subset_cff(codec)
            sub, ff_key = b"/Type1", b"FontFile3"
            ff_extra = {"Subtype": b"/Type1C"}
        font_objs[3] = _plain_body(
            3,
            b"<< /Type /Font /Subtype %s /BaseFont /TLSYNF+Synth "
            b"/FontDescriptor %d 0 R >>" % (sub, desc_num),
        )
        font_objs[desc_num] = _plain_body(
            desc_num,
            b"<< /Type /FontDescriptor /FontName /TLSYNF+Synth "
            b"/Flags 4 /ItalicAngle 0 /Ascent 800 /Descent -200 "
            b"/CapHeight 700 /StemV 80 /FontBBox [0 -200 1000 800] "
            b"/%s %d 0 R >>" % (ff_key, ff_num),
        )
        ff_extra["Filter"] = b"/FlateDecode"
        fontfile_stream = _stream_body(
            ff_num, ff_extra, zlib.compress(prog)
        )
    elif t0:
        desc_num, tu_num = 4, 5
        next_num = 6
        font_objs[3] = _plain_body(
            3,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthUni "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tu_num),
        )
        font_objs[desc_num] = _plain_body(
            desc_num,
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthUni "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 500 >>",
        )
        cmap = _tounicode_cmap(text)
        if variant == 3:
            tounicode_stream = _stream_body(
                tu_num,
                {"Filter": b"/ASCIIHexDecode"},
                cmap.hex().encode() + b">",
            )
        else:
            tounicode_stream = _stream_body(
                tu_num, {"Filter": b"/FlateDecode"}, zlib.compress(cmap)
            )
    else:
        font_objs[3] = _plain_body(
            3,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>",
        )

    page_nums = []
    page_objs: dict[int, bytes] = {}
    content_streams: dict[int, bytes] = {}
    for p, page_lines in enumerate(pages):
        pg_num = next_num
        ct_num = next_num + 1
        next_num += 2
        page_nums.append(pg_num)
        page_objs[pg_num] = _plain_body(
            pg_num,
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % ct_num,
        )
        if layout == "twocol":
            ops = _content_ops_twocol(page_lines, codec, rot + p)
        else:
            ops = _content_ops(page_lines, variant, codec, rot + p)
        if variant == 0:
            content_streams[ct_num] = _stream_body(ct_num, {}, ops)
        elif variant == 3:
            data = _a85_encode(zlib.compress(ops))
            content_streams[ct_num] = _stream_body(
                ct_num,
                {"Filter": b"[/ASCII85Decode /FlateDecode]"},
                data,
            )
        else:
            content_streams[ct_num] = _stream_body(
                ct_num, {"Filter": b"/FlateDecode"}, zlib.compress(ops)
            )

    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    # Resources + MediaBox live on the Pages NODE → inheritance is
    # exercised on every extraction
    pages_body = _plain_body(
        2,
        b"<< /Type /Pages /Kids [%s] /Count %d "
        b"/MediaBox [0 0 612 792] /Resources << /Font << /F1 3 0 R >> >> >>"
        % (kids, len(page_nums)),
    )
    cat_body = _plain_body(1, b"<< /Type /Catalog /Pages 2 0 R >>")

    if variant == 2:
        direct = dict(content_streams)
        if tounicode_stream is not None:
            direct[5] = tounicode_stream
        if fontfile_stream is not None:
            direct[5] = fontfile_stream
        packed = {1: cat_body, 2: pages_body}
        for num, body in font_objs.items():
            if num != 5:
                packed[num] = body
        packed.update(page_objs)
        # ObjStm members carry bare object sources, not obj wrappers
        packed = {
            n: b.split(b" obj\n", 1)[1].rsplit(b"\nendobj", 1)[0]
            for n, b in packed.items()
        }
        return _emit_xrefstream(direct, packed, root=1)

    bodies = {1: cat_body, 2: pages_body}
    bodies.update(font_objs)
    if tounicode_stream is not None:
        bodies[5] = tounicode_stream
    if fontfile_stream is not None:
        bodies[5] = fontfile_stream
    bodies.update(page_objs)
    bodies.update(content_streams)
    info_num = next_num
    bodies[info_num] = _plain_body(info_num, b"<< /Producer (tl_spark synth v1) >>")
    out, xref_off = _emit_classic(bodies, root=1, info=info_num)
    if variant == 3:
        # incremental update: replace Info, chain via /Prev
        upd = bytearray(out)
        new_info_off = len(upd)
        upd += _plain_body(info_num, b"<< /Producer (tl_spark synth v2) >>")
        new_xref = len(upd)
        upd += b"xref\n%d 1\n%010d 00000 n \n" % (info_num, new_info_off)
        upd += (
            b"trailer\n<< /Size %d /Root 1 0 R /Prev %d /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (info_num + 1, xref_off, info_num, new_xref)
        )
        return bytes(upd)
    return out


# ---------------------------------------------------------------------------
# Spark ops (map-only, Arrow-batched — multimodal.py plumbing)
# ---------------------------------------------------------------------------

PDF_MEDIA_SCHEMA = "doc_id long, payload binary"
PDF_PAGES_SCHEMA = "doc_id long, page_no int, text string, nchars int"


N_PDF_VARIANTS = 9
# variant -> (encryption method, structural base variant)
_ENCRYPTED_VARIANTS = {4: ("rc4", 1), 5: ("aes128", 3), 8: ("aes256", 2)}
# variant -> (embedded font kind, structural base variant): real
# symbolic subset font programs with no /Encoding and no /ToUnicode,
# so the driver oracle also exercises the embedded-font decode chain
# (fontprog.py) end-to-end — 7 additionally packs the font alongside
# an ObjStm/xref-stream structure.
_SUBSET_FONT_VARIANTS = {6: ("subset-ttf", 1), 7: ("subset-cff", 2)}


def _variant_of(doc_id) -> int:
    if isinstance(doc_id, int):
        return doc_id % N_PDF_VARIANTS
    h = hashlib.md5(str(doc_id).encode()).digest()
    return h[0] % N_PDF_VARIANTS


def pdf_bytes_variant(
    text: str,
    variant: int,
    rot: int = 1,
    layout: str = "single",
    lines_per_page: int = LINES_PER_PAGE,
) -> bytes:
    """The full 9-variant generator: 0-3 structural (:func:`pdf_bytes`),
    4/5/8 re-encrypted through the standard security handler with the
    empty user password (pdf_crypt.encrypt_pdf — RC4 V2/R3, AES-128
    V4/R4 crypt filters, AES-256 V5/R6 with the Algorithm 2.B hardened
    hash; variant 8 layers encryption over the xref-stream+ObjStm
    structure), 6/7 embedded symbolic subset fonts (real TrueType /
    bare-CFF programs, no /Encoding, no /ToUnicode) — so the driver
    oracle exercises every decryption family and the embedded-font
    decode chain end-to-end."""
    variant %= N_PDF_VARIANTS
    if variant < 4:
        return pdf_bytes(
            text, variant, rot=rot, layout=layout,
            lines_per_page=lines_per_page,
        )
    if variant in _SUBSET_FONT_VARIANTS:
        fkind, base = _SUBSET_FONT_VARIANTS[variant]
        return pdf_bytes(
            text, base, rot=rot, layout=layout,
            lines_per_page=lines_per_page, font=fkind,
        )
    from tl_spark.operators.pdf_crypt import encrypt_pdf

    method, base = _ENCRYPTED_VARIANTS[variant]
    return encrypt_pdf(
        pdf_bytes(
            text, base, rot=rot, layout=layout,
            lines_per_page=lines_per_page,
        ),
        method,
    )


def synth_pdf_media(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    layout: str = "single",
    lines_per_page: int = LINES_PER_PAGE,
) -> DataFrame:
    """(doc_id, text) → (doc_id, payload): real PDFs, variant by
    doc_id % 9 (4 structural + RC4/AES-128/AES-256 encrypted
    re-emissions + 2 embedded-subset-font variants). Map-only;
    payloads never leave the partition."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            texts = b.column(b.schema.get_field_index(text_col)).to_pylist()
            payloads = [
                pdf_bytes_variant(
                    t or "",
                    _variant_of(i),
                    rot=(i if isinstance(i, int) else 1) % 7 + 1,
                    layout=layout,
                    lines_per_page=lines_per_page,
                )
                for i, t in zip(ids, texts)
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["doc_id", "payload"],
            )

    return df.mapInArrow(fn, PDF_MEDIA_SCHEMA)


_SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("x", pa.float64()),
            ("y", pa.float64()),
        ]
    )
)

PDF_PAGES_SPANS_SCHEMA = (
    "doc_id long, page_no int, text string, nchars int, "
    "spans array<struct<start:int,end:int,x:double,y:double>>"
)


def pdf_text_pages(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "raise",
    columns: str = "off",
    emit_spans: bool = False,
) -> DataFrame:
    """(doc_id, payload) → (doc_id, page_no, text, nchars[, spans]):
    one row per non-empty page, layout-ordered text. ``on_error``:
    "raise" fails the task on a malformed PDF, "skip" drops that
    document. ``columns="auto"`` enables X-Y-cut column segmentation.
    ``emit_spans=True`` adds per-line (start, end, x, y) spans — char
    offsets into the page text plus device position, the PDF analog
    of the HTML kernel's text + byte-span contract."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    fn = _text_pages_fn(id_col, payload_col, on_error, columns, emit_spans)
    schema = PDF_PAGES_SPANS_SCHEMA if emit_spans else PDF_PAGES_SCHEMA
    return df.mapInArrow(fn, schema)


def _text_pages_fn(id_col, payload_col, on_error, columns, emit_spans):
    """Arrow-iterator body of :func:`pdf_text_pages` (module-level so
    tests can drive the skip/raise contract in-process)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            payloads = b.column(b.schema.get_field_index(payload_col)).to_pylist()
            o_id, o_pg, o_tx, o_n, o_sp = [], [], [], [], []
            for i, p in zip(ids, payloads):
                try:
                    raw = bytes(p) if p is not None else b""
                    if emit_spans:
                        pages = extract_pdf_pages_with_spans(raw, columns)
                    else:
                        pages = [
                            (t, None) for t in extract_pdf_pages(raw, columns)
                        ]
                except ValueError:
                    # the audited malformed-input surface is ValueError
                    # (16k-trial fuzz); anything else is a kernel bug or
                    # resource failure and must fail the task, not be
                    # silently skipped as "malformed input"
                    if on_error == "raise":
                        raise
                    continue
                for pg, (text, spans) in enumerate(pages):
                    if not text:
                        continue
                    o_id.append(i)
                    o_pg.append(pg)
                    o_tx.append(text)
                    o_n.append(len(text))
                    if emit_spans:
                        o_sp.append(
                            [
                                {"start": st, "end": en, "x": x, "y": y}
                                for st, en, x, y in spans
                            ]
                        )
            arrays = [
                pa.array(o_id, type=pa.int64()),
                pa.array(o_pg, type=pa.int32()),
                pa.array(o_tx, type=pa.string()),
                pa.array(o_n, type=pa.int32()),
            ]
            names = ["doc_id", "page_no", "text", "nchars"]
            if emit_spans:
                arrays.append(pa.array(o_sp, type=_SPAN_TYPE))
                names.append("spans")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return fn


def pdf_text_concat(
    df: DataFrame,
    payload_col: str = "payload",
    passthrough: tuple[str, ...] = ("doc_id",),
    on_error: str = "raise",
    page_sep: str = "\n",
    columns: str = "off",
) -> DataFrame:
    """(passthrough..., payload) → one row per document: all non-empty
    pages layout-extracted and joined by ``page_sep``. Same map-only
    shape as :func:`pdf_text_pages` but keeps document grain, so a
    crawl pipeline can union PDF text with HTML-extracted text without
    a per-page groupBy shuffle. ``passthrough`` columns are carried
    with their input types."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    passthrough = tuple(passthrough)
    out_schema = (
        ", ".join(
            f"{df.schema[c].name} {df.schema[c].dataType.simpleString()}"
            for c in passthrough
        )
        + ", text string, n_pages int, nchars int"
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            keep = [
                b.column(b.schema.get_field_index(c)).to_pylist()
                for c in passthrough
            ]
            payloads = b.column(b.schema.get_field_index(payload_col)).to_pylist()
            o_keep: list[list] = [[] for _ in passthrough]
            o_tx, o_np, o_n = [], [], []
            for row_i, p in enumerate(payloads):
                try:
                    pages = [
                        t
                        for t in extract_pdf_pages(
                            bytes(p) if p is not None else b"", columns
                        )
                        if t
                    ]
                except ValueError:
                    # the audited malformed-input surface is ValueError
                    # (16k-trial fuzz); anything else is a kernel bug or
                    # resource failure and must fail the task, not be
                    # silently skipped as "malformed input"
                    if on_error == "raise":
                        raise
                    continue
                text = page_sep.join(pages)
                for k, col in enumerate(keep):
                    o_keep[k].append(col[row_i])
                o_tx.append(text)
                o_np.append(len(pages))
                o_n.append(len(text))
            keep_arrays = [
                pa.array(vals, type=b.schema.field(b.schema.get_field_index(c)).type)
                for vals, c in zip(o_keep, passthrough)
            ]
            yield pa.RecordBatch.from_arrays(
                keep_arrays
                + [
                    pa.array(o_tx, type=pa.string()),
                    pa.array(o_np, type=pa.int32()),
                    pa.array(o_n, type=pa.int32()),
                ],
                names=list(passthrough) + ["text", "n_pages", "nchars"],
            )

    return df.mapInArrow(fn, out_schema)


PDF_INFO_SCHEMA = (
    "doc_id long, version string, n_pages int, producer string, "
    "title string, author string, n_objects int, has_objstm boolean, "
    "encrypted boolean, error string"
)


def _info_str(doc: "PdfDocument", d: dict | None, key: str) -> str | None:
    if not isinstance(d, dict):
        return None
    v = doc.resolve(d.get(key))
    if isinstance(v, bytes):
        # PDF text strings: UTF-16BE with BOM, else PDFDocEncoding
        # (Latin-1-compatible for the printable range)
        if v[:2] in (b"\xfe\xff",):
            try:
                return v[2:].decode("utf-16-be", "replace")
            except Exception:
                return None
        return v.decode("latin-1")
    return None


def _xmp_meta(doc: "PdfDocument") -> dict:
    """dc:title / dc:creator from the catalog's XMP /Metadata stream
    (the XML packet many producers write instead of — or alongside —
    the Info dict). Regex-scoped to the two Dublin Core fields the
    pipeline uses; entity-unescaped."""
    try:
        root = doc.resolve(doc.trailer.get("Root"))
        md = doc.resolve(root.get("Metadata")) if isinstance(root, dict) else None
        if not isinstance(md, _Stream):
            return {}
        xml = md.data.decode("utf-8", "replace")
    except ValueError:
        return {}
    import html

    out = {}
    for field, key in (("title", "title"), ("creator", "author")):
        # bound the rdf:li search to the dc element's own content, so a
        # dc:title with no rdf:li (e.g. an empty Alt) can't lazily match
        # a later element's rdf:li (creator text mis-assigned as title)
        el = re.search(rf"<dc:{field}>(.*?)</dc:{field}>", xml, re.S)
        if not el:
            continue
        m = re.search(r"<rdf:li[^>]*>(.*?)</rdf:li>", el.group(1), re.S)
        if m:
            out[key] = html.unescape(m.group(1).strip())
    return out


def pdf_doc_info(data: bytes) -> dict:
    """Document-level PDF metadata: header version, page count, Info
    dictionary strings (XMP dc:title/dc:creator as fallback),
    object-store shape. Raises on non-PDF input (wrap with on_error
    at the Spark layer)."""
    doc = PdfDocument(data)
    m = re.match(rb"%PDF-(\d+\.\d+)", doc.buf)
    info = doc.resolve(doc.trailer.get("Info"))
    xmp = _xmp_meta(doc)
    title = _info_str(doc, info, "Title")
    author = _info_str(doc, info, "Author")
    return {
        "version": m.group(1).decode() if m else None,
        "n_pages": len(doc.pages()),
        "producer": _info_str(doc, info, "Producer"),
        "title": title if title is not None else xmp.get("title"),
        "author": author if author is not None else xmp.get("author"),
        "n_objects": len(doc._xref),
        "has_objstm": any(e[0] == "c" for e in doc._xref.values()),
        "encrypted": doc._crypt is not None,
    }


def pdf_info(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(doc_id, payload) → per-document PDF metadata. Map-only;
    malformed payloads yield an ``error`` row under
    ``on_error="skip"`` (kept, with nulls) or fail under "raise"."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            payloads = b.column(b.schema.get_field_index(payload_col)).to_pylist()
            rows = {k: [] for k in (
                "doc_id", "version", "n_pages", "producer", "title",
                "author", "n_objects", "has_objstm", "encrypted", "error",
            )}
            for i, p in zip(ids, payloads):
                try:
                    meta = pdf_doc_info(bytes(p) if p is not None else b"")
                    err = None
                except ValueError as e:
                    if on_error == "raise":
                        raise
                    meta = {}
                    err = str(e)[:200]
                rows["doc_id"].append(i)
                rows["version"].append(meta.get("version"))
                rows["n_pages"].append(meta.get("n_pages"))
                rows["producer"].append(meta.get("producer"))
                rows["title"].append(meta.get("title"))
                rows["author"].append(meta.get("author"))
                rows["n_objects"].append(meta.get("n_objects"))
                rows["has_objstm"].append(meta.get("has_objstm"))
                rows["encrypted"].append(meta.get("encrypted"))
                rows["error"].append(err)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows["doc_id"], type=pa.int64()),
                    pa.array(rows["version"], type=pa.string()),
                    pa.array(rows["n_pages"], type=pa.int32()),
                    pa.array(rows["producer"], type=pa.string()),
                    pa.array(rows["title"], type=pa.string()),
                    pa.array(rows["author"], type=pa.string()),
                    pa.array(rows["n_objects"], type=pa.int32()),
                    pa.array(rows["has_objstm"], type=pa.bool_()),
                    pa.array(rows["encrypted"], type=pa.bool_()),
                    pa.array(rows["error"], type=pa.string()),
                ],
                names=list(rows),
            )

    return df.mapInArrow(fn, PDF_INFO_SCHEMA)


def pdf_links(data: bytes) -> list[tuple[int, str]]:
    """Outlinks: (page_no, uri) for every link annotation (/Annots →
    /Subtype /Link → /A /S /URI). The crawl-frontier complement of
    text extraction — real crawlers expand PDF outlinks exactly like
    HTML hrefs. Nested /Next action chains are followed; non-URI
    actions (GoTo etc.) are ignored."""
    doc = PdfDocument(data)
    out: list[tuple[int, str]] = []
    for pg, page in enumerate(doc.pages()):
        annots = doc.resolve(page.get("Annots"))
        if not isinstance(annots, list):
            continue
        for a in annots:
            a = doc.resolve(a)
            if not isinstance(a, dict) or str(a.get("Subtype", "")) != "Link":
                continue
            action = doc.resolve(a.get("A"))
            hops = 0
            while isinstance(action, dict) and hops < 8:
                if str(action.get("S", "")) == "URI":
                    uri = doc.resolve(action.get("URI"))
                    if isinstance(uri, bytes):
                        out.append((pg, uri.decode("latin-1")))
                action = doc.resolve(action.get("Next"))
                hops += 1
    return out


PDF_LINKS_SCHEMA = "doc_id long, page_no int, uri string"


def pdf_outlinks(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(doc_id, payload) → one row per link annotation. Map-only."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(b.schema.get_field_index(id_col)).to_pylist()
            payloads = b.column(b.schema.get_field_index(payload_col)).to_pylist()
            o_id, o_pg, o_uri = [], [], []
            for i, p in zip(ids, payloads):
                try:
                    links = pdf_links(bytes(p) if p is not None else b"")
                except ValueError:
                    # the audited malformed-input surface is ValueError
                    # (16k-trial fuzz); anything else is a kernel bug or
                    # resource failure and must fail the task, not be
                    # silently skipped as "malformed input"
                    if on_error == "raise":
                        raise
                    continue
                for pg, uri in links:
                    o_id.append(i)
                    o_pg.append(pg)
                    o_uri.append(uri)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_pg, type=pa.int32()),
                    pa.array(o_uri, type=pa.string()),
                ],
                names=["doc_id", "page_no", "uri"],
            )

    return df.mapInArrow(fn, PDF_LINKS_SCHEMA)
