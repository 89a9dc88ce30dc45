"""ctypes bridge for the native FLAC decoder (flac.rs).

The pure-Python decoder in tl_spark/operators/flac.py stays the source
of truth and the always-available fallback: the native leg returns
status != 0 on ANY anomaly (malformed stream, CRC/MD5 mismatch,
arithmetic leaving i64) and the caller replays Python, which either
produces the identical samples or raises the contract ValueError —
error semantics are Python-exact by construction, sample equality is
pinned by the differential battery (tests/test_native_flac.py).
Loading mirrors tl_spark/kernel/native.py; kill switch
TL_SPARK_NATIVE_FLAC=0."""

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
    if os.environ.get("TL_SPARK_NATIVE_FLAC", "1") == "0":
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
            lib.tl_flac_decode.restype = ctypes.POINTER(_TlBytesOut)
            lib.tl_flac_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.tl_bytes_free.restype = None
            lib.tl_bytes_free.argtypes = [ctypes.POINTER(_TlBytesOut)]
            _LIB = lib
            break
        except (OSError, AttributeError):
            continue
    return _LIB


def decode(payload: bytes, verify_md5: bool):
    """(samples int16 ndarray (n, channels), sample_rate) via the
    native leg, or None when the leg is unavailable or bailed (the
    caller must replay the pure-Python decoder)."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    out = lib.tl_flac_decode(payload, len(payload), 1 if verify_md5 else 0)
    if not out:
        return None
    try:
        o = out.contents
        if o.status != 0 or o.len < 16:
            return None
        buf = ctypes.string_at(o.data, o.len)
    finally:
        lib.tl_bytes_free(out)
    sample_rate = int.from_bytes(buf[0:4], "little")
    channels = int.from_bytes(buf[4:8], "little")
    n = int.from_bytes(buf[8:16], "little")
    if channels <= 0 or len(buf) != 16 + n * channels * 2:
        return None
    samples = np.frombuffer(buf, dtype="<i2", offset=16).reshape(
        n, channels
    ).copy()
    return samples, sample_rate
