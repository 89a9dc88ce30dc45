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
