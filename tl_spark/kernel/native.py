"""ctypes loader + zero-copy Arrow bridge for the native scan kernel.

The optional cdylib (native/tl_native, std-only Rust) implements the
SAME byte machine as :func:`tl_spark.kernel.htmlparse.extract_scan`;
the Python scanner stays the source of truth and the always-available
fallback. Equivalence is pinned by tests/test_native_kernel.py (golden
corpus + hypothesis fuzz + batch-level Arrow comparison).

Shipping model (SCALING.md "native kernel" probe):
- local / same-FS clusters: ``tl_spark/kernel/_tl_native.so`` sits next
  to this module (built by tools/build_native.sh, committed) and loads
  directly.
- ``--py-files`` zip deployments: ctypes cannot dlopen from a zip, so
  the loader falls back to pure Python silently (set
  ``TL_SPARK_NATIVE_LIB=/path/on/executors.so`` after shipping the
  library via ``--files`` / an image to re-enable it).
- ``TL_SPARK_NATIVE=0`` disables the native path outright.
"""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False

_SO_NAMES = ("_tl_native.so", "libtl_native.so")


class _TlBatchOut(ctypes.Structure):
    _fields_ = [
        ("n_docs", ctypes.c_int64),
        ("text_ptr", ctypes.c_void_p),
        ("text_len", ctypes.c_int64),
        ("text_cap", ctypes.c_int64),
        ("text_offs", ctypes.c_void_p),
        ("text_offs_cap", ctypes.c_int64),
        ("span_starts", ctypes.c_void_p),
        ("span_ends", ctypes.c_void_p),
        ("spans_len", ctypes.c_int64),
        ("starts_cap", ctypes.c_int64),
        ("ends_cap", ctypes.c_int64),
        ("span_offs", ctypes.c_void_p),
        ("span_offs_cap", ctypes.c_int64),
        ("n_nodes", ctypes.c_void_p),
        ("n_nodes_cap", ctypes.c_int64),
        ("version", ctypes.c_void_p),
        ("version_cap", ctypes.c_int64),
    ]


def load():
    """The loaded cdylib, or None. Cached; never raises."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TL_SPARK_NATIVE", "1") == "0":
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
            lib.tl_extract_batch.restype = ctypes.POINTER(_TlBatchOut)
            lib.tl_extract_batch.argtypes = [
                ctypes.c_void_p,  # data
                ctypes.c_void_p,  # offs (int32)
                ctypes.c_int64,   # base
                ctypes.c_int64,   # n_docs
                ctypes.c_void_p,  # strip_data
                ctypes.c_void_p,  # strip_offs (int64)
                ctypes.c_int64,   # n_strips
            ]
            lib.tl_batch_free.restype = None
            lib.tl_batch_free.argtypes = [ctypes.POINTER(_TlBatchOut)]
            _LIB = lib
            break
        except OSError:
            continue
    return _LIB


class _BatchHolder:
    """Keeps the native output alive while Arrow buffers reference it;
    frees exactly once when the last referencing array drops."""

    __slots__ = ("_lib", "_ptr")

    def __init__(self, lib, ptr):
        self._lib = lib
        self._ptr = ptr

    def __del__(self):  # pragma: no cover - interpreter-shutdown safe
        try:
            self._lib.tl_batch_free(self._ptr)
        except Exception:
            pass


def _pack_strips(strip_tags):
    data = b"".join(strip_tags)
    offs = [0]
    for t in strip_tags:
        offs.append(offs[-1] + len(t))
    return (
        ctypes.create_string_buffer(data, max(len(data), 1)),
        (ctypes.c_int64 * len(offs))(*offs),
        len(strip_tags),
    )


def extract_batch_arrays(col, strip_tags):
    """Run the native kernel over a pyarrow StringArray; returns
    (text_arr, spans_arr, n_nodes_arr, version_arr) as Arrow arrays —
    all large outputs zero-copy over the native buffers — or None when
    the native path is unavailable/ineligible (caller falls back to the
    Python scanner).
    """
    import pyarrow as pa

    lib = load()
    if lib is None:
        return None
    if col.null_count != 0 or not pa.types.is_string(col.type):
        return None
    n = len(col)
    bufs = col.buffers()
    if n == 0:
        return None
    data_addr = bufs[2].address if bufs[2] is not None else 0
    offs_addr = bufs[1].address
    sdata, soffs, n_strips = _pack_strips(sorted(strip_tags))
    out = lib.tl_extract_batch(
        data_addr,
        offs_addr,
        col.offset,
        n,
        ctypes.addressof(sdata),
        ctypes.addressof(soffs),
        n_strips,
    )
    if not out:
        return None
    holder = _BatchHolder(lib, out)
    o = out.contents

    def fbuf(addr, size):
        return pa.foreign_buffer(addr, size, base=holder)

    text_arr = pa.Array.from_buffers(
        pa.utf8(),
        n,
        [None, fbuf(o.text_offs, 4 * (n + 1)), fbuf(o.text_ptr or 0, o.text_len)],
    )
    m = o.spans_len
    starts = pa.Array.from_buffers(
        pa.int32(), m, [None, fbuf(o.span_starts or 0, 4 * m)]
    )
    ends = pa.Array.from_buffers(
        pa.int32(), m, [None, fbuf(o.span_ends or 0, 4 * m)]
    )
    span_offs = pa.Array.from_buffers(
        pa.int32(), n + 1, [None, fbuf(o.span_offs, 4 * (n + 1))]
    )
    spans_arr = pa.ListArray.from_arrays(
        span_offs,
        pa.StructArray.from_arrays([starts, ends], names=["start", "end"]),
    )
    n_nodes_arr = pa.Array.from_buffers(
        pa.int32(), n, [None, fbuf(o.n_nodes, 4 * n)]
    )
    # vectorized version column (the r7 ctypes-pointer list comp cost
    # ~1 us/row — measurable at 50M rows/round)
    import numpy as np

    varr = np.frombuffer(
        (ctypes.c_byte * n).from_address(o.version), dtype=np.int8
    )
    mask = varr == 5
    if not mask.any():
        version_arr = pa.nulls(n, type=pa.string())
    else:
        v_offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(mask.astype(np.int32) * 5, out=v_offs[1:])
        validity = pa.py_buffer(
            np.packbits(mask, bitorder="little").tobytes()
        )
        version_arr = pa.Array.from_buffers(
            pa.utf8(),
            n,
            [
                validity,
                pa.py_buffer(v_offs.tobytes()),
                pa.py_buffer(b"HTML5" * int(mask.sum())),
            ],
        )
    return text_arr, spans_arr, n_nodes_arr, version_arr
