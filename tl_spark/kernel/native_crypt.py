"""ctypes bridge for native RC4 / AES-CBC decrypt (crypt.rs).

The Python implementations in tl_spark/operators/pdf_crypt.py stay the
source of truth and the always-available fallback; both ciphers are
exact bit-for-bit transforms, so equivalence is pinned by differential
tests (tests/test_native_pdf.py) plus published AES vectors. Loading
mirrors tl_spark/kernel/native.py."""

from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False

_SO_NAMES = ("_tl_native.so", "libtl_native.so")


class _TlBytesOut(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int64),
        ("data", ctypes.c_void_p),
        ("len", ctypes.c_int64),
        ("cap", ctypes.c_int64),
    ]


def load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TL_SPARK_NATIVE", "1") == "0":
        return None
    if os.environ.get("TL_SPARK_NATIVE_CRYPT", "1") == "0":
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
            lib.tl_rc4.restype = ctypes.POINTER(_TlBytesOut)
            lib.tl_rc4.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_int64,
            ]
            lib.tl_aes_cbc_decrypt.restype = ctypes.POINTER(_TlBytesOut)
            lib.tl_aes_cbc_decrypt.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_int64,
            ]
            lib.tl_a85_decode.restype = ctypes.POINTER(_TlBytesOut)
            lib.tl_a85_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            try:
                lib.tl_r56_hash.restype = ctypes.POINTER(_TlBytesOut)
                lib.tl_r56_hash.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_char_p, ctypes.c_int64,
                    ctypes.c_int64,
                ]
                lib._tl_has_r56 = True
            except AttributeError:
                lib._tl_has_r56 = False
            lib.tl_bytes_free.restype = None
            lib.tl_bytes_free.argtypes = [ctypes.POINTER(_TlBytesOut)]
            _LIB = lib
            break
        except (OSError, AttributeError):
            continue
    return _LIB


def _take(lib, out) -> bytes | None:
    if not out:
        return None
    try:
        o = out.contents
        if o.status != 0:
            return None
        return ctypes.string_at(o.data, o.len) if o.len else b""
    finally:
        lib.tl_bytes_free(out)


def a85_decode(data: bytes) -> bytes | None:
    """Native ASCII85 decode, or None (caller falls back to Python,
    which raises the exact documented error on malformed input)."""
    lib = load()
    if lib is None:
        return None
    return _take(lib, lib.tl_a85_decode(data, len(data)))


def rc4(key: bytes, data: bytes) -> bytes | None:
    """Native RC4, or None (caller falls back to Python)."""
    lib = load()
    if lib is None or not key:
        return None
    return _take(lib, lib.tl_rc4(key, len(key), data, len(data)))


def aes_cbc_decrypt_raw(key: bytes, iv: bytes, ct: bytes) -> bytes | None:
    """Native AES-CBC decrypt WITHOUT unpad, or None. The caller
    applies the lenient PKCS#7 strip (and raises on unaligned input
    via its own fallback path)."""
    lib = load()
    if (
        lib is None
        or len(iv) != 16
        or len(ct) % 16
        or len(key) not in (16, 24, 32)
    ):
        return None
    return _take(lib, lib.tl_aes_cbc_decrypt(key, len(key), iv, ct, len(ct)))


def r56_hash(pwd: bytes, salt: bytes, udata: bytes, r: int) -> bytes | None:
    """ISO 32000-2 R5/R6 key-derivation hash (Algorithm 2.B for R6),
    native leg — None → caller falls back to the pure-Python loop."""
    lib = load()
    if lib is None or not getattr(lib, "_tl_has_r56", False):
        return None
    out = lib.tl_r56_hash(
        pwd, len(pwd), salt, len(salt), udata, len(udata), int(r)
    )
    return _take(lib, out)
