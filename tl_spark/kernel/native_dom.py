"""ctypes bridge for the native DOM kernel (native/tl_native/src/dom.rs).

Covers the DOM-route operators that previously ran pure-Python per
document: selector extraction (document- and subtree-scoped), id/class
lookups (scan + tracked), whole-document ``outer_html``, and the
node-arena explosion. The Python kernel (htmlparse.py / selector.py)
stays the semantic source of truth and the always-available fallback;
equivalence is pinned by tests/test_native_dom.py (golden corpus +
fuzz, byte-level).

The quirky selector GRAMMAR is not duplicated in Rust: the Python
parser (kernel/selector.py) compiles the AST once on the driver and
ships it as a compact prefix encoding inside the params blob.
"""

from __future__ import annotations

import ctypes
import struct

from tl_spark.kernel.native import load as _load_lib

OP_QS_EXTRACT = 1
OP_QS_SCOPED = 2
OP_BY_ID = 3
OP_BY_ID_TRACKED = 4
OP_BY_CLASS = 5
OP_BY_CLASS_TRACKED = 6
OP_DOC_OUTER_HTML = 7

MODES = {"inner_text": 0, "inner_html": 1, "outer_html": 2, "raw": 3}

_SEL_TAGS = {
    "tag": 0x01,
    "id": 0x02,
    "class": 0x03,
    "all": 0x04,
    "and": 0x05,
    "or": 0x06,
    "desc": 0x07,
    "parent": 0x08,
    "attr": 0x09,
    "attr_eq": 0x0A,
    "attr_ws": 0x0B,
    "attr_sw": 0x0C,
    "attr_ew": 0x0D,
    "attr_sub": 0x0E,
}


def encode_selector(ast) -> bytes:
    """Prefix-encode a kernel/selector.py AST for the native matcher."""
    out = bytearray()

    def emit(node):
        op = node[0]
        out.append(_SEL_TAGS[op])
        if op in ("and", "or", "desc", "parent"):
            emit(node[1])
            emit(node[2])
        elif op == "all":
            pass
        elif op in ("tag", "id", "class", "attr"):
            _emit_str(node[1])
        else:  # valued attribute forms
            _emit_str(node[1])
            _emit_str(node[2])

    def _emit_str(b: bytes):
        if len(b) > 0xFFFF:
            raise ValueError("selector component too long")
        out.extend(struct.pack("<H", len(b)))
        out.extend(b)

    emit(ast)
    return bytes(out)


def encode_params(
    op: int,
    mode: str = "inner_text",
    key: bytes = b"",
    sel_ast=None,
    scope_ast=None,
) -> bytes:
    blob = bytearray([op, MODES[mode]])
    blob += struct.pack("<H", len(key))
    blob += key
    for ast in (sel_ast, scope_ast):
        enc = encode_selector(ast) if ast is not None else b""
        blob += struct.pack("<I", len(enc))
        blob += enc
    return bytes(blob)


class _TlQueryOut(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("doc_idx", ctypes.c_void_p),
        ("node_idx", ctypes.c_void_p),
        ("scope_idx", ctypes.c_void_p),
        ("start", ctypes.c_void_p),
        ("end", ctypes.c_void_p),
        ("text_data", ctypes.c_void_p),
        ("text_len", ctypes.c_int64),
        ("text_offs", ctypes.c_void_p),
        ("doc_cap", ctypes.c_int64),
        ("node_cap", ctypes.c_int64),
        ("scope_cap", ctypes.c_int64),
        ("start_cap", ctypes.c_int64),
        ("end_cap", ctypes.c_int64),
        ("text_cap", ctypes.c_int64),
        ("offs_cap", ctypes.c_int64),
    ]


class _TlNodesOut(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("doc_idx", ctypes.c_void_p),
        ("node_idx", ctypes.c_void_p),
        ("kind", ctypes.c_void_p),
        ("parent", ctypes.c_void_p),
        ("n_children", ctypes.c_void_p),
        ("start", ctypes.c_void_p),
        ("end", ctypes.c_void_p),
        ("name_data", ctypes.c_void_p),
        ("name_len", ctypes.c_int64),
        ("name_offs", ctypes.c_void_p),
        ("n_attrs_total", ctypes.c_int64),
        ("attr_offs", ctypes.c_void_p),
        ("key_data", ctypes.c_void_p),
        ("key_len", ctypes.c_int64),
        ("key_offs", ctypes.c_void_p),
        ("val_data", ctypes.c_void_p),
        ("val_len", ctypes.c_int64),
        ("val_offs", ctypes.c_void_p),
        ("val_present", ctypes.c_void_p),
        ("doc_cap", ctypes.c_int64),
        ("node_cap", ctypes.c_int64),
        ("kind_cap", ctypes.c_int64),
        ("parent_cap", ctypes.c_int64),
        ("nkids_cap", ctypes.c_int64),
        ("start_cap", ctypes.c_int64),
        ("end_cap", ctypes.c_int64),
        ("name_cap", ctypes.c_int64),
        ("name_offs_cap", ctypes.c_int64),
        ("attr_offs_cap", ctypes.c_int64),
        ("key_cap", ctypes.c_int64),
        ("key_offs_cap", ctypes.c_int64),
        ("val_cap", ctypes.c_int64),
        ("val_offs_cap", ctypes.c_int64),
        ("present_cap", ctypes.c_int64),
    ]


_DOM_LIB = None
_DOM_TRIED = False


def load_dom():
    """The cdylib with DOM entry points configured, or None (older .so
    without the symbols, or native disabled)."""
    global _DOM_LIB, _DOM_TRIED
    if _DOM_TRIED:
        return _DOM_LIB
    _DOM_TRIED = True
    lib = _load_lib()
    if lib is None:
        return None
    try:
        lib.tl_dom_query_batch.restype = ctypes.POINTER(_TlQueryOut)
        lib.tl_dom_query_batch.argtypes = [
            ctypes.c_void_p,  # data
            ctypes.c_void_p,  # offs
            ctypes.c_int64,   # base
            ctypes.c_int64,   # n_docs
            ctypes.c_char_p,  # params
            ctypes.c_int64,   # params_len
        ]
        lib.tl_query_free.restype = None
        lib.tl_query_free.argtypes = [ctypes.POINTER(_TlQueryOut)]
        lib.tl_parse_nodes_batch.restype = ctypes.POINTER(_TlNodesOut)
        lib.tl_parse_nodes_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.tl_nodes_free.restype = None
        lib.tl_nodes_free.argtypes = [ctypes.POINTER(_TlNodesOut)]
    except AttributeError:
        return None
    _DOM_LIB = lib
    return _DOM_LIB


def _col_buffers(col):
    """(data_addr, offs_addr, offset, n) for an eligible StringArray,
    else None."""
    import pyarrow as pa

    if col.null_count != 0 or not pa.types.is_string(col.type):
        return None
    n = len(col)
    if n == 0:
        return None
    bufs = col.buffers()
    data_addr = bufs[2].address if bufs[2] is not None else 0
    return data_addr, bufs[1].address, col.offset, n


class _FreeOnDel:
    __slots__ = ("_fn", "_ptr")

    def __init__(self, fn, ptr):
        self._fn = fn
        self._ptr = ptr

    def __del__(self):  # pragma: no cover - interpreter-shutdown safe
        try:
            self._fn(self._ptr)
        except Exception:
            pass


def dom_query_batch(col, params: bytes):
    """Run a DOM query op over a pyarrow StringArray.

    Returns (doc_idx, node_idx, scope_idx, start, end, text_arr) where
    the first five are numpy int32 arrays (copied — tiny) and text_arr
    is a zero-copy Arrow string array over the native buffer; or None
    when the native path is unavailable/ineligible.
    """
    import numpy as np
    import pyarrow as pa

    lib = load_dom()
    if lib is None:
        return None
    info = _col_buffers(col)
    if info is None:
        return None
    data_addr, offs_addr, offset, n = info
    out = lib.tl_dom_query_batch(
        data_addr, offs_addr, offset, n, params, len(params)
    )
    if not out:
        return None
    holder = _FreeOnDel(lib.tl_query_free, out)
    o = out.contents
    m = int(o.n_rows)

    def ivec(addr):
        if m == 0:
            return np.empty(0, np.int32)
        return np.frombuffer(
            (ctypes.c_byte * (4 * m)).from_address(addr), dtype=np.int32
        ).copy()

    doc_idx = ivec(o.doc_idx)
    node_idx = ivec(o.node_idx)
    scope_idx = ivec(o.scope_idx)
    start = ivec(o.start)
    end = ivec(o.end)
    text_arr = pa.Array.from_buffers(
        pa.utf8(),
        m,
        [
            None,
            pa.foreign_buffer(o.text_offs, 4 * (m + 1), base=holder),
            pa.foreign_buffer(o.text_data or 0, o.text_len, base=holder),
        ],
    )
    return doc_idx, node_idx, scope_idx, start, end, text_arr


def parse_nodes_batch(col):
    """Run the node-arena explosion over a pyarrow StringArray.

    Returns a dict of columns (numpy for fixed-width — copied, tiny
    per-row metadata; Arrow zero-copy for the three string payloads
    plus the attrs list offsets), or None when unavailable/ineligible.
    """
    import numpy as np
    import pyarrow as pa

    lib = load_dom()
    if lib is None:
        return None
    info = _col_buffers(col)
    if info is None:
        return None
    data_addr, offs_addr, offset, n = info
    out = lib.tl_parse_nodes_batch(data_addr, offs_addr, offset, n)
    if not out:
        return None
    holder = _FreeOnDel(lib.tl_nodes_free, out)
    o = out.contents
    m = int(o.n_rows)
    na = int(o.n_attrs_total)

    def ivec(addr, count):
        if count == 0:
            return np.empty(0, np.int32)
        return np.frombuffer(
            (ctypes.c_byte * (4 * count)).from_address(addr), dtype=np.int32
        ).copy()

    def bvec(addr, count):
        if count == 0:
            return np.empty(0, np.uint8)
        return np.frombuffer(
            (ctypes.c_byte * count).from_address(addr), dtype=np.uint8
        ).copy()

    def str_arr(count, offs_addr_, data_addr_, data_len):
        return pa.Array.from_buffers(
            pa.utf8(),
            count,
            [
                None,
                pa.foreign_buffer(offs_addr_, 4 * (count + 1), base=holder),
                pa.foreign_buffer(data_addr_ or 0, data_len, base=holder),
            ],
        )

    return {
        "doc_idx": ivec(o.doc_idx, m),
        "node_idx": ivec(o.node_idx, m),
        "kind": ivec(o.kind, m),
        "parent": ivec(o.parent, m),
        "n_children": ivec(o.n_children, m),
        "start": ivec(o.start, m),
        "end": ivec(o.end, m),
        "name": str_arr(m, o.name_offs, o.name_data, o.name_len),
        "attr_offs": ivec(o.attr_offs, m + 1),
        "key": str_arr(na, o.key_offs, o.key_data, o.key_len),
        "value": str_arr(na, o.val_offs, o.val_data, o.val_len),
        "val_present": bvec(o.val_present, na),
        "n_rows": m,
        "n_attrs": na,
    }
