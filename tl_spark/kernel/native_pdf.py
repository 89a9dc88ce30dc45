"""ctypes bridge for the native PDF content-stream interpreter.

The optional cdylib (native/tl_native/src/pdf.rs, std-only Rust)
implements the SAME text-state machine as
:class:`tl_spark.operators.pdf._Interp` — token-for-token lexing and
IEEE-identical matrix math, so emitted chunks are bit-equal. The
Python interpreter stays the source of truth and the always-available
fallback: the native side returns a non-zero status on ANY anomaly
(lex/parse error, depth/output cap, unserialized font) and the caller
re-runs the pure-Python path, which raises the precise ValueError the
kernel contract documents. Equivalence is pinned by
tests/test_native_pdf.py (8-variant golden corpus + differential
mutation fuzz).

Font protocol: fonts are materialized lazily on the Python side (they
can raise ValueError, e.g. a malformed embedded font program — that
must happen in Python so the error surface is unchanged). The blob
sent to the native side carries the page's /Font resource names plus
every font materialized so far; when the native run executes a ``Tf``
naming a resource it doesn't have yet it returns ``status=1`` +
the name, the caller materializes exactly that font and retries.
Serialized font entries are cached per document.

Shipping model mirrors tl_spark/kernel/native.py (same .so; loads are
independent so a stale library without the PDF symbols just disables
this leg).
"""

from __future__ import annotations

import ctypes
import os
import struct

_LIB = None
_TRIED = False

_SO_NAMES = ("_tl_native.so", "libtl_native.so")

_OFFS_1B = struct.pack("<257I", *range(257))

# the default font (built from an empty font dict) holds no document
# state — one process-wide instance + its serialized entry
_DEFAULT_FONT = None
_DEFAULT_SER = None

_D = ctypes.POINTER(ctypes.c_double)


class _TlPdfOut(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int64),
        ("n_chunks", ctypes.c_int64),
        ("x0", _D),
        ("y", _D),
        ("x1", _D),
        ("size", _D),
        ("text_data", ctypes.c_void_p),
        ("text_len", ctypes.c_int64),
        ("text_offs", ctypes.POINTER(ctypes.c_int64)),
        ("need_font", ctypes.c_void_p),
        ("need_font_len", ctypes.c_int64),
        ("x0_cap", ctypes.c_int64),
        ("y_cap", ctypes.c_int64),
        ("x1_cap", ctypes.c_int64),
        ("size_cap", ctypes.c_int64),
        ("text_cap", ctypes.c_int64),
        ("offs_cap", ctypes.c_int64),
        ("nf_cap", ctypes.c_int64),
    ]


class _TlPdfPagesOut(ctypes.Structure):
    _fields_ = [
        ("base", _TlPdfOut),
        ("page_offs", ctypes.POINTER(ctypes.c_int64)),
        ("n_pages", ctypes.c_int64),
        ("page_offs_cap", ctypes.c_int64),
    ]


def load():
    """The loaded cdylib with PDF symbols, or None. Cached; never raises."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TL_SPARK_NATIVE", "1") == "0":
        return None
    if os.environ.get("TL_SPARK_NATIVE_PDF", "1") == "0":
        return None
    candidates = []
    env_path = os.environ.get("TL_SPARK_NATIVE_LIB")
    if env_path:
        candidates.append(env_path)
    here = os.path.dirname(os.path.abspath(__file__))
    candidates += [os.path.join(here, n) for n in _SO_NAMES]
    for path in candidates:
        if not os.path.isfile(path):
            continue
        try:
            lib = ctypes.CDLL(path)
            lib.tl_pdf_interp.restype = ctypes.POINTER(_TlPdfOut)
            lib.tl_pdf_interp.argtypes = [
                ctypes.c_char_p,  # content
                ctypes.c_int64,
                ctypes.c_char_p,  # font blob
                ctypes.c_int64,
            ]
            lib.tl_pdf_free.restype = None
            lib.tl_pdf_free.argtypes = [ctypes.POINTER(_TlPdfOut)]
            # batched per-document entry (newer .so only; absence just
            # disables the batch fast path, never the per-page leg)
            try:
                lib.tl_pdf_interp_pages.restype = ctypes.POINTER(
                    _TlPdfPagesOut
                )
                lib.tl_pdf_interp_pages.argtypes = [
                    ctypes.c_char_p,  # concatenated content
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),  # page offsets
                    ctypes.c_int64,  # n_pages
                    ctypes.c_char_p,  # font blob
                    ctypes.c_int64,
                ]
                lib.tl_pdf_pages_free.restype = None
                lib.tl_pdf_pages_free.argtypes = [
                    ctypes.POINTER(_TlPdfPagesOut)
                ]
                lib._tl_has_pages = True
            except AttributeError:
                lib._tl_has_pages = False
            _LIB = lib
            break
        except (OSError, AttributeError):
            continue
    return _LIB


def _ser_font(f) -> bytes:
    """One font entry (sans name) in the pdf.rs ``parse_font_blob``
    wire format. Unicode goes over as UTF-8 with surrogatepass (WTF-8)
    because ToUnicode values may hold lone UTF-16 units."""
    import numpy as np

    p = [struct.pack("<B", f.code_bytes)]
    if f.code_bytes == 1:
        # the common case: every entry is one ASCII-ish char — join +
        # vectorized offsets instead of 256 struct.pack calls
        buf = "".join(f._uni256).encode("utf-8", "surrogatepass")
        if len(buf) == 256:  # all single-byte: offsets are 0..256
            offs = _OFFS_1B
        else:
            lens = np.fromiter(
                (
                    len(s.encode("utf-8", "surrogatepass"))
                    if (len(s) != 1 or s > "\x7f")
                    else 1
                    for s in f._uni256
                ),
                dtype=np.uint32,
                count=256,
            )
            offs = np.zeros(257, dtype=np.uint32)
            np.cumsum(lens, out=offs[1:])
            offs = offs.tobytes()
        p.append(offs)
        p.append(struct.pack("<I", len(buf)))
        p.append(buf)
        p.append(np.asarray(f._w256, dtype=np.float64).tobytes())
    else:
        p.append(struct.pack("<B", 1 if f._identity2 else 0))
        p.append(struct.pack("<d", float(f.default_width)))
        # only 2-byte codes are reachable; drop out-of-range keys
        wit = sorted(
            (c, float(v)) for c, v in f.widths.items() if 0 <= c <= 0xFFFF
        )
        p.append(struct.pack("<I", len(wit)))
        for c, v in wit:
            p.append(struct.pack("<Id", c, v))
        tus = sorted(
            (c, u) for c, u in f.tounicode.items() if 0 <= c <= 0xFFFF
        )
        p.append(struct.pack("<I", len(tus)))
        if tus:
            p.append(struct.pack("<%dI" % len(tus), *[c for c, _ in tus]))
        bufs = []
        offs = [0]
        for _, u in tus:
            b = u.encode("utf-8", "surrogatepass")
            bufs.append(b)
            offs.append(offs[-1] + len(b))
        buf = b"".join(bufs)
        p.append(struct.pack("<%dI" % (len(tus) + 1), *offs))
        p.append(struct.pack("<I", len(buf)))
        p.append(buf)
    return b"".join(p)


def _font_blob(interp) -> bytes:
    """Resource-name table + every font materialized so far (plus the
    default font under ""). Cached per (document, /Font resource dict,
    set of materialized names): pages of one document normally share a
    resource dict, so after the first page's NeedFont round-trips the
    blob is reused byte-for-byte — and the per-page ``_Interp`` picks
    up fonts materialized by EARLIER pages through the doc-level name
    map, avoiding a retry per page."""
    doc = interp.doc
    global _DEFAULT_FONT, _DEFAULT_SER
    try:
        ser_cache = doc._native_pdf_ser
    except AttributeError:
        ser_cache = doc._native_pdf_ser = {}
        doc._native_pdf_blob = {}
    default = _DEFAULT_FONT
    if default is None:
        from tl_spark.operators.pdf import _Font

        default = _DEFAULT_FONT = _Font(doc, {})
        _DEFAULT_SER = _ser_font(default)
    ser_cache.setdefault(id(default), (default, _DEFAULT_SER))

    # fold doc-level materializations for this resource dict back into
    # the page interp (same name → same resolved font dict → same font)
    res_key = id(interp.font_res)
    known = doc._native_pdf_blob.get(res_key)
    if known is not None and known[0] is interp.font_res:
        for nm, f in known[1].items():
            interp._font_cache.setdefault(nm, f)
        if known[2] is not None and len(known[1]) == len(interp._font_cache):
            return known[2]

    fonts = dict(interp._font_cache)
    parts = []
    names = list(interp.font_res.keys())
    parts.append(struct.pack("<I", len(names)))
    for nm in names:
        b = nm.encode("utf-8")
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    fonts[""] = default
    parts.append(struct.pack("<I", len(fonts)))
    for nm, f in fonts.items():
        b = nm.encode("utf-8")
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
        ent = ser_cache.get(id(f))
        # key by id(f) with f held in the value so ids can't be reused
        if ent is None or ent[0] is not f:
            ent = ser_cache[id(f)] = (f, _ser_font(f))
        parts.append(ent[1])
    blob = b"".join(parts)
    doc._native_pdf_blob[res_key] = (
        interp.font_res,
        dict(interp._font_cache),
        blob,
    )
    return blob


def run_native_pages(interps, contents):
    """Batched per-document native interpretation: ONE FFI call per run
    of consecutive pages sharing a /Font resource dict (each page still
    starts from a fresh interpreter state — bit-equal to per-page
    calls). Amortizes the call + font-blob-parse fixed cost that
    dominates short pages. Returns a per-page list of chunk-tuple
    lists, with None for pages the caller must run through the
    per-page path, or None when the batched leg is unavailable."""
    lib = load()
    if lib is None or not getattr(lib, "_tl_has_pages", False):
        return None
    n = len(interps)
    results: list = [None] * n
    i = 0
    while i < n:
        fr = interps[i].font_res
        j = i + 1
        while j < n and (
            interps[j].font_res is fr or (not interps[j].font_res and not fr)
        ):
            j += 1
        if all(isinstance(c, bytes) for c in contents[i:j]):
            results[i:j] = _run_group(lib, interps[i], contents[i:j])
        i = j
    return results


def _run_group(lib, interp, contents):
    npages = len(contents)
    cat = b"".join(contents)
    offs = (ctypes.c_int64 * (npages + 1))()
    acc = 0
    for k, c in enumerate(contents):
        offs[k] = acc
        acc += len(c)
    offs[npages] = acc
    bail = [None] * npages
    # each retry materializes exactly one missing font (same protocol
    # as run_native; the blob cache makes retried pages cheap)
    for _ in range(len(interp.font_res) + 2):
        blob = _font_blob(interp)
        out = lib.tl_pdf_interp_pages(cat, acc, offs, npages, blob, len(blob))
        if not out:
            return bail
        try:
            o = out.contents
            b = o.base
            if b.status == 2:
                return bail
            if b.status == 1:
                name = (
                    ctypes.string_at(b.need_font, b.need_font_len).decode(
                        "utf-8"
                    )
                    if b.need_font_len
                    else ""
                )
                # may raise ValueError — identical to the Python
                # path's Tf-time error surface
                interp._font(name)
                if name not in interp._font_cache:
                    return bail
                continue
            nc = b.n_chunks
            poffs = o.page_offs[: npages + 1]
            if nc == 0:
                return [[] for _ in range(npages)]
            toffs = b.text_offs[: nc + 1]
            tbuf = (
                ctypes.string_at(b.text_data, b.text_len)
                if b.text_len
                else b""
            )
            x0 = b.x0[:nc]
            y = b.y[:nc]
            x1 = b.x1[:nc]
            size = b.size[:nc]
            return [
                [
                    (
                        x0[m],
                        y[m],
                        x1[m],
                        size[m],
                        tbuf[toffs[m] : toffs[m + 1]].decode("utf-8"),
                    )
                    for m in range(poffs[k], poffs[k + 1])
                ]
                for k in range(npages)
            ]
        finally:
            lib.tl_pdf_pages_free(out)
    return bail


def run_native(interp, content: bytes):
    """Run one content stream natively. Returns a list of
    ``(x0, y, x1, size, text)`` tuples bit-equal to the Python
    interpreter's chunks, or None when the caller must fall back."""
    lib = load()
    if lib is None or not isinstance(content, bytes):
        return None
    # each retry materializes exactly one missing font
    for _ in range(len(interp.font_res) + 2):
        blob = _font_blob(interp)
        out = lib.tl_pdf_interp(content, len(content), blob, len(blob))
        if not out:
            return None
        try:
            o = out.contents
            if o.status == 2:
                return None
            if o.status == 1:
                name = (
                    ctypes.string_at(o.need_font, o.need_font_len).decode(
                        "utf-8"
                    )
                    if o.need_font_len
                    else ""
                )
                # may raise ValueError (e.g. malformed embedded font
                # program) — identical to the Python path's Tf-time
                # error surface
                interp._font(name)
                if name not in interp._font_cache:
                    return None  # defensive: avoid a retry livelock
                continue
            n = o.n_chunks
            if n == 0:
                return []
            offs = o.text_offs[: n + 1]
            tbuf = ctypes.string_at(o.text_data, o.text_len) if o.text_len else b""
            x0 = o.x0[:n]
            y = o.y[:n]
            x1 = o.x1[:n]
            size = o.size[:n]
            return [
                (
                    x0[i],
                    y[i],
                    x1[i],
                    size[i],
                    tbuf[offs[i] : offs[i + 1]].decode("utf-8"),
                )
                for i in range(n)
            ]
        finally:
            lib.tl_pdf_free(out)
    return None


# ---------------------------------------------------------------------------
# Whole-document native leg (native/tl_native/src/doc.rs)
# ---------------------------------------------------------------------------
#
# tl_pdf_doc_parse ports the object/xref layer (PdfDocument, _Stream,
# filters, page tree) and returns ONE blob: per-page decoded content +
# per-page /Font tables + font CLOSURES (the unresolved root value plus
# every transitively referenced object, streams pre-decoded). Fonts are
# then materialized HERE in Python (_Font can raise ValueError — that
# error surface must stay Python-side) and shipped back through the
# existing tl_pdf_interp_pages wire format. Any anomaly — native bail,
# font-build failure, NeedFont — makes doc_chunks return None and the
# caller re-runs the WHOLE document through the pure-Python path, so
# error semantics (message, page order) are Python-exact by
# construction. Success is byte-equal by the whole-doc differential
# fuzz in tests/test_native_pdf.py.


class _TlBytesOut(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int64),
        ("data", ctypes.c_void_p),
        ("len", ctypes.c_int64),
        ("cap", ctypes.c_int64),
    ]


def _load_doc_symbols(lib) -> bool:
    try:
        lib.tl_pdf_doc_parse.restype = ctypes.POINTER(_TlBytesOut)
        lib.tl_pdf_doc_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tl_bytes_free.restype = None
        lib.tl_bytes_free.argtypes = [ctypes.POINTER(_TlBytesOut)]
        return True
    except AttributeError:
        return False


# closure bytes -> (font, serialized entry) | ValueError instance
_CLOSURE_FONTS: dict = {}
_CLOSURE_FONTS_CAP = 4096


class _ClosureDoc:
    """Shim `doc` for _Font built from a native closure: resolve()
    follows refs through the closure's object store with the same
    32-hop cap as PdfDocument.resolve."""

    __slots__ = ("_store",)

    def __init__(self, store: dict):
        self._store = store

    def resolve(self, val):
        from tl_spark.operators.pdf import _Ref

        seen = 0
        while isinstance(val, _Ref):
            val = self._store.get(val.num)
            seen += 1
            if seen > 32:
                raise ValueError("reference loop")
        return val


def _deser_value(b: bytes, o: int):
    """One serialized value (doc.rs ser_value tags) -> (python value,
    new offset). Raises ValueError on a malformed blob."""
    from tl_spark.operators.pdf import _Kw, _Name, _Ref, _Stream

    tag = b[o]
    o += 1
    if tag == 0:
        return None, o
    if tag == 1:
        return bool(b[o]), o + 1
    if tag == 2:
        return int.from_bytes(b[o : o + 8], "little", signed=True), o + 8
    if tag == 3:
        return struct.unpack_from("<d", b, o)[0], o + 8
    if tag in (4, 5, 10):
        (n,) = struct.unpack_from("<I", b, o)
        o += 4
        raw = bytes(b[o : o + n])
        o += n
        if tag == 4:
            return raw, o
        if tag == 5:
            return _Name(raw.decode("latin-1")), o
        return _Kw(raw.decode("latin-1")), o
    if tag == 6:
        (n,) = struct.unpack_from("<I", b, o)
        o += 4
        arr = []
        for _ in range(n):
            v, o = _deser_value(b, o)
            arr.append(v)
        return arr, o
    if tag == 7:
        (n,) = struct.unpack_from("<I", b, o)
        o += 4
        d = {}
        for _ in range(n):
            (kl,) = struct.unpack_from("<I", b, o)
            o += 4
            k = bytes(b[o : o + kl]).decode("latin-1")
            o += kl
            v, o = _deser_value(b, o)
            d[k] = v
        return d, o
    if tag == 8:
        num = int.from_bytes(b[o : o + 8], "little", signed=True)
        gen = int.from_bytes(b[o + 8 : o + 16], "little", signed=True)
        return _Ref(num, gen), o + 16
    if tag in (9, 11):
        d, o = _deser_value(b, o)
        if not isinstance(d, dict):
            raise ValueError("bad closure stream dict")
        if tag == 9:
            (n,) = struct.unpack_from("<I", b, o)
            o += 4
            data = bytes(b[o : o + n])
            o += n
            s = _Stream(d, b"", None, None)
            s._data = data
            return s, o
        s = _err_stream_cls()(d, b"", None, None)
        return s, o
    if tag == 12:
        return _SENTINEL, o
    raise ValueError(f"bad closure tag {tag}")


_SENTINEL = object()
_ErrStream = None  # created lazily (subclasses pdf._Stream)


def _err_stream_cls():
    global _ErrStream
    if _ErrStream is None:
        from tl_spark.operators.pdf import _Stream

        class _ES(_Stream):
            @property
            def data(self):
                # the native side could not decode this stream; the
                # Python path raises here too (and _Font's ToUnicode
                # try/except swallows it exactly the same way)
                raise ValueError("stream decode failed")

        _ErrStream = _ES
    return _ErrStream


def _closure_font(closure: bytes):
    """Materialize (font, serialized-entry) for one closure, cached
    process-wide by closure bytes. Returns a ValueError instance when
    the build failed (→ caller bails to the pure-Python path)."""
    ent = _CLOSURE_FONTS.get(closure)
    if ent is not None:
        return ent
    from tl_spark.operators.pdf import _Font

    try:
        o = 0
        (n_store,) = struct.unpack_from("<I", closure, o)
        o += 4
        store = {}
        for _ in range(n_store):
            num = int.from_bytes(
                closure[o : o + 8], "little", signed=True
            )
            o += 8
            v, o = _deser_value(closure, o)
            store[num] = v
        root, o = _deser_value(closure, o)
        shim = _ClosureDoc(store)
        font = _Font(shim, root)
        ent = (font, _ser_font(font))
    except ValueError as exc:
        ent = exc
    if len(_CLOSURE_FONTS) >= _CLOSURE_FONTS_CAP:
        _CLOSURE_FONTS.clear()
    _CLOSURE_FONTS[closure] = ent
    return ent


def _pages_ffi(lib, cat: bytes, offs, npages: int, blob: bytes):
    """One tl_pdf_interp_pages call. Returns ("ok", per-page lists) /
    ("needfont", name) / ("bail", None)."""
    out = lib.tl_pdf_interp_pages(cat, len(cat), offs, npages, blob, len(blob))
    if not out:
        return ("bail", None)
    try:
        o = out.contents
        b = o.base
        if b.status == 2:
            return ("bail", None)
        if b.status == 1:
            name = (
                ctypes.string_at(b.need_font, b.need_font_len).decode("utf-8")
                if b.need_font_len
                else ""
            )
            return ("needfont", name)
        nc = b.n_chunks
        poffs = o.page_offs[: npages + 1]
        if nc == 0:
            return ("ok", [[] for _ in range(npages)])
        toffs = b.text_offs[: nc + 1]
        tbuf = ctypes.string_at(b.text_data, b.text_len) if b.text_len else b""
        x0 = b.x0[:nc]
        y = b.y[:nc]
        x1 = b.x1[:nc]
        size = b.size[:nc]
        return (
            "ok",
            [
                [
                    (
                        x0[m],
                        y[m],
                        x1[m],
                        size[m],
                        tbuf[toffs[m] : toffs[m + 1]].decode("utf-8"),
                    )
                    for m in range(poffs[k], poffs[k + 1])
                ]
                for k in range(npages)
            ],
        )
    finally:
        lib.tl_pdf_pages_free(out)


def doc_chunks(data: bytes):
    """Whole-document native fast path: one tl_pdf_doc_parse call plus
    one tl_pdf_interp_pages call per font group. Returns per-page chunk
    tuple lists, or None — the caller must then run the pure-Python
    path (PdfDocument + _doc_chunks), which reproduces the exact
    Python error/leniency semantics."""
    lib = load()
    if (
        lib is None
        or not isinstance(data, bytes)
        or not getattr(lib, "_tl_has_pages", False)
        or os.environ.get("TL_SPARK_NATIVE_PDF_DOC", "1") == "0"
    ):
        return None
    if not getattr(lib, "_tl_doc_checked", False):
        lib._tl_has_doc = _load_doc_symbols(lib)
        lib._tl_doc_checked = True
    if not lib._tl_has_doc:
        return None
    out = lib.tl_pdf_doc_parse(data, len(data))
    if not out:
        return None
    try:
        o = out.contents
        if o.status != 0:
            return None
        blob = ctypes.string_at(o.data, o.len) if o.len else b""
    finally:
        lib.tl_bytes_free(out)
    try:
        return _doc_chunks_from_blob(lib, blob)
    except (ValueError, struct.error, IndexError):
        # malformed blob: impossible by construction, but never let the
        # fast path change the error surface — fall back
        return None


def _doc_chunks_from_blob(lib, blob: bytes):
    if blob[:4] != b"TLPD":
        return None
    o = 4
    (ver,) = struct.unpack_from("<I", blob, o)
    o += 4
    if ver != 1:
        return None
    (n_pages,) = struct.unpack_from("<I", blob, o)
    o += 4
    page_group = []
    contents = []
    for _ in range(n_pages):
        gid, clen = struct.unpack_from("<II", blob, o)
        o += 8
        page_group.append(gid)
        contents.append(blob[o : o + clen])
        o += clen
    (n_groups,) = struct.unpack_from("<I", blob, o)
    o += 4
    group_tables = []
    for _ in range(n_groups):
        (n_entries,) = struct.unpack_from("<I", blob, o)
        o += 4
        table = []
        for _ in range(n_entries):
            (nl,) = struct.unpack_from("<I", blob, o)
            o += 4
            name = blob[o : o + nl].decode("latin-1")
            o += nl
            (cidx,) = struct.unpack_from("<I", blob, o)
            o += 4
            table.append((name, cidx))
        group_tables.append(table)
    (n_closures,) = struct.unpack_from("<I", blob, o)
    o += 4
    closures = []
    for _ in range(n_closures):
        (cl,) = struct.unpack_from("<I", blob, o)
        o += 4
        closures.append(blob[o : o + cl])
        o += cl
    if n_pages == 0:
        return []
    # materialize fonts per group; any ValueError → bail (the Python
    # path materializes lazily at Tf — replaying the whole doc there
    # reproduces its exact error-or-success behavior)
    global _DEFAULT_FONT, _DEFAULT_SER
    if _DEFAULT_FONT is None:
        from tl_spark.operators.pdf import _Font

        _DEFAULT_FONT = _Font(_ClosureDoc({}), {})
        _DEFAULT_SER = _ser_font(_DEFAULT_FONT)
    group_blobs = []
    for table in group_tables:
        fonts = []
        ok = True
        for name, cidx in table:
            if cidx >= len(closures):
                return None
            ent = _closure_font(closures[cidx])
            if isinstance(ent, ValueError):
                ok = False
                break
            fonts.append((name, ent[1]))
        if not ok:
            return None
        parts = [struct.pack("<I", len(table))]
        for name, _ in table:
            nb = name.encode("utf-8")
            parts.append(struct.pack("<I", len(nb)))
            parts.append(nb)
        parts.append(struct.pack("<I", len(fonts) + 1))
        nb = b""
        parts.append(struct.pack("<I", len(nb)))
        parts.append(nb)
        parts.append(_DEFAULT_SER)
        for name, ser in fonts:
            nb = name.encode("utf-8")
            parts.append(struct.pack("<I", len(nb)))
            parts.append(nb)
            parts.append(ser)
        group_blobs.append(b"".join(parts))
    # one interp call per group
    results: list = [None] * n_pages
    for gid in range(n_groups):
        idxs = [i for i in range(n_pages) if page_group[i] == gid]
        if not idxs:
            continue
        cat = b"".join(contents[i] for i in idxs)
        offs = (ctypes.c_int64 * (len(idxs) + 1))()
        acc = 0
        for k, i in enumerate(idxs):
            offs[k] = acc
            acc += len(contents[i])
        offs[len(idxs)] = acc
        status, pages = _pages_ffi(lib, cat, offs, len(idxs), group_blobs[gid])
        if status != "ok":
            return None
        for k, i in enumerate(idxs):
            results[i] = pages[k]
    return results
