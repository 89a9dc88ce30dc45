"""ctypes bridge for the native entropy decoders
(native/tl_native/src/entropy.rs): GIF/TIFF LZW and the JPEG Huffman
scan machine.

The Python decoders (operators/multimodal.py, operators/jpeg.py) stay
the semantic source of truth and the always-available fallback. The
native legs return a nonzero status on ANY anomaly and the caller
falls back, so the precise Python ValueError semantics (and the
``on_error="skip"`` policy built on them) are preserved by
construction. Bit/coefficient-exactness on the success path is pinned
by tests/test_native_entropy.py.
"""

from __future__ import annotations

import ctypes
import struct

from tl_spark.kernel.native import load as _load_lib

_LIB = None
_TRIED = False


def load_entropy():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    lib = _load_lib()
    if lib is None:
        return None
    try:
        lib.tl_lzw_gif.restype = ctypes.c_int32
        lib.tl_lzw_gif.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.tl_lzw_tiff.restype = ctypes.c_int32
        lib.tl_lzw_tiff.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.tl_jpeg_scan.restype = ctypes.c_int32
        lib.tl_jpeg_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
    except AttributeError:
        return None
    _LIB = lib
    return _LIB


def lzw_gif(data: bytes, min_code_size: int, n_pixels: int):
    """Native GIF LZW decode to a uint8 array, or None (fallback)."""
    import numpy as np

    lib = load_entropy()
    if lib is None:
        return None
    out = np.empty(n_pixels, dtype=np.uint8)
    st = lib.tl_lzw_gif(
        data, len(data), min_code_size, n_pixels,
        out.ctypes.data if n_pixels else None,
    )
    return out if st == 0 else None


def lzw_tiff(data: bytes, need: int):
    """Native TIFF LZW decode to bytes, or None (fallback)."""
    import numpy as np

    lib = load_entropy()
    if lib is None:
        return None
    out = np.empty(need, dtype=np.uint8)
    st = lib.tl_lzw_tiff(
        data, len(data), need, out.ctypes.data if need else None
    )
    return out.tobytes() if st == 0 else None


def _huff_spec_from_decode_map(dec: dict) -> tuple[bytes, bytes]:
    """Reconstruct the canonical (bits[16], vals) DHT spec from the
    Python {(length, code): sym} decode map (canonical per T.81 C.2,
    so sorting by (length, code) recovers emission order)."""
    bits = [0] * 16
    vals = bytearray()
    for (length, _code), sym in sorted(dec.items()):
        bits[length - 1] += 1
        vals.append(sym)
    return bytes(bits), bytes(vals)


def _pack_huff(dec) -> bytes:
    if dec is None:
        return b"\x00"
    bits, vals = _huff_spec_from_decode_map(dec)
    return b"\x01" + bits + struct.pack("<H", len(vals)) + vals


def jpeg_scan(
    payload: bytes,
    data_at: int,
    scan_comps,
    band,
    approx,
    ri: int,
    grid,
    coefs,
    progressive: bool,
) -> bool:
    """Run one scan natively, mutating ``coefs`` in place. Returns True
    on success; False -> caller must run the Python ``_decode_scan``.
    The touched coefficient arrays are snapshotted first and restored
    on failure, so a mid-stream native abort leaves pristine state for
    the Python path (essential for progressive REFINE scans, which
    read-modify existing coefficients)."""
    lib = load_entropy()
    if lib is None:
        return False
    ss, se = band
    ah, al = approx
    mcus_x, mcus_y = grid
    if not (0 <= ss <= 63 and 0 <= se <= 63 and 0 <= ah <= 15 and 0 <= al <= 15):
        return False
    blob = bytearray(
        [1 if progressive else 0, ss, se, ah, al]
    )
    blob += struct.pack("<IIIII", ri, mcus_x, mcus_y, data_at, len(scan_comps))
    ptrs = (ctypes.c_void_p * len(scan_comps))()
    for k, (ci, c, dct, act) in enumerate(scan_comps):
        arr = coefs[ci]
        if (
            arr.dtype.str not in ("<i4", "=i4")
            or not arr.flags["C_CONTIGUOUS"]
            or arr.ndim != 3
            or arr.shape[2] != 64
        ):
            return False
        rows, cols = arr.shape[0], arr.shape[1]
        blob += struct.pack(
            "<IIIIII",
            c["h"], c["v"], c.get("_bw", 0), c.get("_bh", 0), cols, rows,
        )
        blob += _pack_huff(dct)
        blob += _pack_huff(act)
        ptrs[k] = arr.ctypes.data
    backups = {ci: coefs[ci].copy() for ci, _c, _d, _a in scan_comps}
    st = lib.tl_jpeg_scan(
        payload, len(payload), bytes(blob), len(blob), ptrs
    )
    if st != 0:
        for ci, saved in backups.items():
            coefs[ci][...] = saved
        return False
    return True


def _register_bpe(lib):
    if getattr(lib, "_tl_bpe_ready", False):
        return True
    try:
        lib.tl_bpe_apply.restype = ctypes.c_int64
    except AttributeError:
        return False
    lib.tl_bpe_apply.argtypes = [
        ctypes.c_void_p,  # syms
        ctypes.c_int64,   # n_syms
        ctypes.c_void_p,  # word_offs
        ctypes.c_int64,   # n_words
        ctypes.c_void_p,  # keys
        ctypes.c_void_p,  # ranks
        ctypes.c_void_p,  # prods
        ctypes.c_int64,   # n_pairs
        ctypes.c_void_p,  # out_syms
        ctypes.c_void_p,  # out_offs
    ]
    lib._tl_bpe_ready = True
    return True


def bpe_apply(syms, word_offs, keys, ranks, prods):
    """Native exact-greedy BPE apply over the id-encoded word stream
    (see operators/bpe.py::_BatchBpe for the encoding). Returns
    (out_syms, out_offs) numpy int64 arrays, or None (fallback)."""
    import numpy as np

    lib = load_entropy()
    if lib is None or not _register_bpe(lib):
        return None
    syms = np.ascontiguousarray(syms, np.int64)
    word_offs = np.ascontiguousarray(word_offs, np.int64)
    n_words = len(word_offs) - 1
    out_syms = np.empty(max(len(syms), 1), np.int64)
    out_offs = np.empty(n_words + 1, np.int64)
    total = lib.tl_bpe_apply(
        syms.ctypes.data if len(syms) else None,
        len(syms),
        word_offs.ctypes.data,
        n_words,
        keys.ctypes.data if len(keys) else None,
        ranks.ctypes.data if len(ranks) else None,
        prods.ctypes.data if len(prods) else None,
        len(keys),
        out_syms.ctypes.data,
        out_offs.ctypes.data,
    )
    if total < 0:
        return None
    return out_syms[:total], out_offs


def bpe_available() -> bool:
    lib = load_entropy()
    return lib is not None and _register_bpe(lib)
