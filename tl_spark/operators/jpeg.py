"""Baseline sequential JPEG codec (ITU-T T.81), pure numpy + stdlib.

Decoder: SOI/APP*/COM/DQT/DHT/SOF0/DRI/SOS marker parse, canonical
Huffman entropy decode with 0xFF00 unstuffing and RSTn handling, DC
prediction, dezigzag, dequantize, orthonormal-matrix IDCT, integer-
ratio chroma upsample, JFIF YCbCr->RGB. Encoder: the exact inverse
pipeline with the standard Annex-K quantization/Huffman tables and a
libjpeg-style quality scale. Baseline 8-bit only — progressive
(SOF2), arithmetic coding, and 12-bit precision raise ValueError.

Correctness strategy (tests/test_jpeg.py):
- the entropy layer (Huffman + DC diff + zigzag + byte stuffing) is
  LOSSLESS: decoder-recovered quantized coefficients are compared
  bit-exactly against the encoder's, including across restart
  markers;
- the IDCT is compared against an independently-written direct
  cosine-sum reference;
- hand-built single-block streams decode to analytically known
  pixels; end-to-end round-trips are PSNR-bounded (lossy transform,
  exact bounds don't exist).

Scale note: per-block Python loops run only inside Arrow batches of
media payloads (mapInArrow); clips are media-sized. The hot corpus
path (HTML extraction) never touches this module.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan: position in scan order -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 base quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _build_huffman(bits: list[int], values: list[int]):
    """Canonical Huffman per T.81 C.2: returns (decode_map, encode_map)
    where decode_map is {(length, code): symbol} and encode_map is
    {symbol: (length, code)}."""
    decode, encode = {}, {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[idx]
            decode[(length, code)] = sym
            encode[sym] = (length, code)
            idx += 1
            code += 1
        code <<= 1
    return decode, encode


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; surfaces RSTn markers via ``marker``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt
                    # markers are handled by the caller; pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:  # EOI or next segment: pad
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return out

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.12 EXTEND: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _parse_jpeg_structure(payload: bytes):
    """Marker walk shared by the coefficient and pixel decoders."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization not supported")
                tab = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                ).astype(np.int32)
                if len(tab) != 64:
                    raise ValueError("short DQT")
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = tab
                qt[tq] = nat
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                nvals = sum(bits)
                vals = list(body[o + 17 : o + 17 + nvals])
                dec, _ = _build_huffman(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                o += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline sequential only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            mapping = {}
            for i in range(ns):
                cid, tables = struct.unpack_from(">BB", body, 1 + 2 * i)
                mapping[cid] = (tables >> 4, tables & 0x0F)
            scan = {"mapping": mapping, "data_at": pos + 2 + seglen}
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    return qt, huff_dc, huff_ac, frame, restart_interval, scan


def jpeg_decode_coefficients(payload: bytes):
    """Decode through the LOSSLESS layers only: returns
    (frame, per-component quantized-coefficient arrays of shape
    (blocks_v, blocks_h, 64) in natural order). This is the entropy-
    exactness surface the tests pin bit-for-bit."""
    qt, huff_dc, huff_ac, frame, ri, scan = _parse_jpeg_structure(payload)
    # MJPEG convention (OpenDML): streams may omit DHT entirely, in
    # which case the Annex-K typical tables apply. Fill only MISSING
    # slots 0/1 — present tables always win.
    for th, (d, a) in ((0, (DC_LUMA, AC_LUMA)), (1, (DC_CHROMA, AC_CHROMA))):
        if th not in huff_dc:
            huff_dc[th] = _build_huffman(*d)[0]
        if th not in huff_ac:
            huff_ac[th] = _build_huffman(*a)[0]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    coefs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in comps
    ]
    reader = _BitReader(payload, scan["data_at"])
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                reader.restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan["mapping"][c["id"]]
                dct, act = huff_dc.get(td), huff_ac.get(ta)
                if dct is None or act is None:
                    raise ValueError(
                        f"JPEG scan references missing Huffman table "
                        f"dc={td} ac={ta}"
                    )
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        s = reader.huff(dct)
                        diff = _extend(reader.bits(s), s)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[ZIGZAG[k]] = _extend(reader.bits(sz), sz)
                            k += 1
                        coefs[ci][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = blk
            mcu_count += 1
    return frame, coefs, qt


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Full decode to (h, w, 3) uint8 RGB (grayscale replicated)."""
    frame, coefs, qt = jpeg_decode_coefficients(payload)
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError(f"missing quantization table {c['tq']}")
        arr = coefs[ci].astype(np.float64) * q.astype(np.float64)
        bv, bh, _ = arr.shape
        blocks = arr.reshape(bv, bh, 8, 8)
        # IDCT all blocks at once: f = C.T @ F @ C
        pix = np.einsum("ki,yxkl,lj->yxij", _C, blocks, _C)
        plane = (
            pix.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8) + 128.0
        )
        # integer-ratio upsample to full resolution
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[: frame["h"], : frame["w"]])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s per spec


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def jpeg_bytes(
    rgb: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
    _coef_sink: list | None = None,
) -> bytes:
    """Baseline JFIF encoder — writer counterpart of
    :func:`jpeg_decode`. ``subsample``: "444" or "420".
    ``_coef_sink``: tests pass a list to capture the encoder's
    quantized coefficient arrays for bit-exact entropy-layer
    comparison."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("jpeg_bytes expects (h, w, 3) RGB")
    h, w, _ = rgb.shape
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    if subsample == "444":
        sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    elif subsample == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]

        def halve(p: np.ndarray) -> np.ndarray:
            # box mean over 2x2, with edge replication for odd dims
            pe = np.pad(
                p,
                ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                mode="edge",
            )
            return (
                pe[0::2, 0::2] + pe[1::2, 0::2] + pe[0::2, 1::2]
                + pe[1::2, 1::2]
            ) / 4.0

        planes = [y, halve(cb), halve(cr)]
    else:
        raise ValueError("subsample must be '444' or '420'")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [_quality_scale(QT_LUMA, quality),
           _quality_scale(QT_CHROMA, quality)]
    comp_q = [0, 1, 1]
    all_coefs = []
    for ci, plane in enumerate(planes):
        sh, sv = sampling[ci]
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        bv, bh = ph // 8, pw // 8
        blocks = padded.reshape(bv, 8, bh, 8).transpose(0, 2, 1, 3)
        fdct = np.einsum("ik,yxkl,jl->yxij", _C, blocks, _C)
        q = qts[comp_q[ci]].reshape(8, 8).astype(np.float64)
        quant = np.round(fdct / q).astype(np.int32)
        all_coefs.append(quant.reshape(bv, bh, 64))
    if _coef_sink is not None:
        _coef_sink.extend(all_coefs)

    # Huffman tables (encode maps)
    _, enc_dc_l = _build_huffman(*DC_LUMA)
    _, enc_ac_l = _build_huffman(*AC_LUMA)
    _, enc_dc_c = _build_huffman(*DC_CHROMA)
    _, enc_ac_c = _build_huffman(*AC_CHROMA)
    enc_tables = [(enc_dc_l, enc_ac_l), (enc_dc_c, enc_ac_c),
                  (enc_dc_c, enc_ac_c)]

    def magnitude(v: int) -> tuple[int, int]:
        s = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci in range(len(planes)):
                sh, sv = sampling[ci]
                enc_dc, enc_ac = enc_tables[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = all_coefs[ci][my * sv + by, mx * sh + bx]
                        zz = blk[ZIGZAG]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s, bits = magnitude(diff)
                        ln, code = enc_dc[s]
                        writer.put(code, ln)
                        if s:
                            writer.put(bits, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = enc_ac[0xF0]  # ZRL
                                writer.put(code, ln)
                                run -= 16
                            s, bits = magnitude(v)
                            ln, code = enc_ac[(run << 4) | s]
                            writer.put(code, ln)
                            writer.put(bits, s)
                            run = 0
                        if run:
                            ln, code = enc_ac[0x00]  # EOB
                            writer.put(code, ln)
            mcu_count += 1
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qts):
        out += seg(0xDB, bytes([tq]) + bytes(q[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, comp_q[ci]])
    out += seg(0xC0, sof)
    for tc, th, (bits, vals) in (
        (0, 0, DC_LUMA), (1, 0, AC_LUMA), (0, 1, DC_CHROMA), (1, 1, AC_CHROMA)
    ):
        out += seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci in range(3):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
