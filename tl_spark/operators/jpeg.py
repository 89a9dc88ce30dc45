"""JPEG codec (ITU-T T.81), pure numpy + stdlib: baseline sequential
(SOF0) AND progressive (SOF2).

Decoder: SOI/APP*/COM/DQT/DHT/SOF0/SOF2/DRI/SOS marker walk over any
number of scans; canonical Huffman entropy decode with 0xFF00
unstuffing and RSTn handling; for progressive streams the full G.2
machinery — spectral selection, successive approximation (DC
first/refine, AC first/refine with correction bits), EOB runs, ZRL —
then DC prediction, dezigzag, dequantize, orthonormal-matrix IDCT,
integer-ratio chroma upsample, JFIF YCbCr->RGB. Encoders: baseline
(`jpeg_bytes`, Annex-K tables, libjpeg-style quality scale, restart
markers) and progressive (`jpeg_bytes_progressive`, libjpeg-style
scan script) sharing the same quantization front half — so the two
encodings of an image are coefficient-identical, which the tests pin.
Arithmetic coding, 12-bit precision, and lossless/hierarchical frames
raise ValueError.

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


# Progressive AC scans need the EOBn (n=1..14) run symbols, which the
# Annex-K tables cannot host (their 16-bit bucket is full: exactly one
# spare code, the reserved all-ones). Use a flat custom table instead:
# every (run, size) symbol for run 0-15, size 0-10 — 176 symbols, all
# at 8 bits (Kraft 176/256, canonically valid; size over optimality).
_AC_PROG_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]
AC_PROG = ([0] * 7 + [176] + [0] * 8, _AC_PROG_SYMS)
AC_LUMA_PROG = AC_PROG
AC_CHROMA_PROG = AC_PROG


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
            if code >= (1 << length):
                raise ValueError("Huffman table overflows its code space")
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


def _find_scan_end(payload: bytes, pos: int) -> int:
    """Position of the first real marker (not stuffing, not RSTn)
    after entropy-coded data starting at ``pos``."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _decode_scan(
    payload: bytes,
    data_at: int,
    scan_comps: list,
    band: tuple[int, int],
    approx: tuple[int, int],
    ri: int,
    grid: tuple[int, int],
    coefs: list[np.ndarray],
    progressive: bool,
):
    """Decode one scan's entropy data into ``coefs`` (T.81 F.2 for
    baseline, G.2 for progressive DC/AC first/refine scans).
    ``scan_comps``: [(comp_index, comp, dc_table, ac_table)];
    ``band``=(Ss,Se); ``approx``=(Ah,Al); ``grid``=(mcus_x, mcus_y).
    """
    ss, se = band
    ah, al = approx
    mcus_x, mcus_y = grid
    reader = _BitReader(payload, data_at)
    preds = [0] * len(scan_comps)
    eobrun = 0
    interleaved = len(scan_comps) > 1

    def decode_block(blk: np.ndarray, si: int, dct, act):
        nonlocal eobrun
        if not progressive:
            s = reader.huff(dct)
            preds[si] += _extend(reader.bits(s), s)
            blk[0] = preds[si]
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
            return
        if ss == 0 and ah == 0:  # DC first
            s = reader.huff(dct)
            preds[si] += _extend(reader.bits(s), s)
            blk[0] = preds[si] << al
            return
        if ss == 0:  # DC refine: one raw bit per block
            if reader.bits(1):
                blk[0] = int(blk[0]) | (1 << al)
            return
        if ah == 0:  # AC first (spectral band, with EOB runs)
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = reader.huff(act)
                r, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.bits(r)
                    return
                k += r
                if k > se:
                    raise ValueError("JPEG AC band overflow")
                blk[ZIGZAG[k]] = _extend(reader.bits(sz), sz) << al
                k += 1
            return
        # AC refine (T.81 G.2, the correction-bit algorithm)
        p1, m1 = 1 << al, -(1 << al)

        def correct(pos: int):
            v = int(blk[pos])
            if v and reader.bits(1) and (v & p1) == 0:
                blk[pos] = v + (p1 if v >= 0 else m1)
            return v != 0

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.huff(act)
                r, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    newval = 0  # ZRL: skip 16 zero-history slots
                else:
                    if sz != 1:
                        raise ValueError("bad AC-refine size")
                    newval = p1 if reader.bits(1) else m1
                while k <= se:
                    if not correct(int(ZIGZAG[k])):
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[ZIGZAG[k]] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                correct(int(ZIGZAG[k]))
                k += 1
            eobrun -= 1

    def restart():
        nonlocal eobrun
        reader.restart()
        for i in range(len(preds)):
            preds[i] = 0
        eobrun = 0

    unit = 0
    if interleaved:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and unit and unit % ri == 0:
                    restart()
                for si, (ci, c, dct, act) in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            y, x = my * c["v"] + by, mx * c["h"] + bx
                            decode_block(coefs[ci][y, x], si, dct, act)
                unit += 1
    else:
        # non-interleaved: the MCU is one block; the scan covers only
        # ceil(comp_dim/8) blocks, not the padded MCU grid (T.81 A.2.2)
        ci, c, dct, act = scan_comps[0]
        bw, bh_ = c["_bw"], c["_bh"]
        for y in range(bh_):
            for x in range(bw):
                if ri and unit and unit % ri == 0:
                    restart()
                decode_block(coefs[ci][y, x], 0, dct, act)
                unit += 1


def jpeg_decode_coefficients(payload: bytes):
    """Decode through the LOSSLESS layers only: returns
    (frame, per-component quantized-coefficient arrays of shape
    (blocks_v, blocks_h, 64) in natural order). Handles baseline
    (SOF0, one interleaved scan) and progressive (SOF2, multiple
    spectral-selection / successive-approximation scans). This is the
    entropy-exactness surface the tests pin bit-for-bit."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    coefs = None
    grid = None
    saw_scan = False
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
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
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            grid = (-(-w // (8 * hmax)), -(-h // (8 * vmax)))
            for c in comps:
                # non-interleaved scan extent (T.81 A.2.2):
                # ceil(ceil(dim * sampling / max_sampling) / 8)
                cw = -(-(w * c["h"]) // hmax)
                ch_ = -(-(h * c["v"]) // vmax)
                c["_bw"] = -(-cw // 8)
                c["_bh"] = -(-ch_ // 8)
            coefs = [
                np.zeros((grid[1] * c["v"], grid[0] * c["h"], 64), np.int32)
                for c in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline sequential and progressive only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None or coefs is None:
                raise ValueError("JPEG SOS before SOF")
            # MJPEG convention (OpenDML): streams may omit DHT
            # entirely, in which case the Annex-K typical tables
            # apply. Fill only MISSING slots 0/1 — present tables win.
            for th, (d, a) in (
                (0, (DC_LUMA, AC_LUMA)), (1, (DC_CHROMA, AC_CHROMA))
            ):
                if th not in huff_dc:
                    huff_dc[th] = _build_huffman(*d)[0]
                if th not in huff_ac:
                    huff_ac[th] = _build_huffman(*a)[0]
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = struct.unpack_from(">BB", body, 1 + 2 * i)
                td, ta = tables >> 4, tables & 0x0F
                matches = [
                    (ci, c) for ci, c in enumerate(frame["comps"])
                    if c["id"] == cid
                ]
                if not matches:
                    raise ValueError(f"SOS references unknown comp {cid}")
                ci, c = matches[0]
                dct, act = huff_dc.get(td), huff_ac.get(ta)
                if dct is None or act is None:
                    raise ValueError(
                        f"JPEG scan references missing Huffman table "
                        f"dc={td} ac={ta}"
                    )
                scan_comps.append((ci, c, dct, act))
            ss_, se_, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            data_at = pos + 2 + seglen
            # native Huffman scan machine (tl_jpeg_scan,
            # coefficient-exact, snapshot/restore on failure); the
            # Python _decode_scan stays source of truth + fallback
            from tl_spark.kernel import native_entropy

            if not native_entropy.jpeg_scan(
                payload, data_at, scan_comps,
                (ss_, se_), (ahal >> 4, ahal & 0x0F),
                restart_interval, grid, coefs, progressive,
            ):
                _decode_scan(
                    payload, data_at, scan_comps,
                    (ss_, se_), (ahal >> 4, ahal & 0x0F),
                    restart_interval, grid, coefs, progressive,
                )
            saw_scan = True
            pos = _find_scan_end(payload, data_at)
            continue
        pos += 2 + seglen
    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF0/SOS")
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


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 magnitude category + amplitude bits for a signed value."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _quantized_coefficients(rgb: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: color transform, subsample, FDCT,
    quantize. Returns (h, w, sampling, qts, comp_q, all_coefs,
    mcus_x, mcus_y)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("jpeg encoder expects (h, w, 3) RGB")
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
    return h, w, sampling, qts, comp_q, all_coefs, mcus_x, mcus_y


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _header_segments(
    h: int, w: int, sampling, qts, comp_q, sof_marker: int,
    ac_tables=(AC_LUMA, AC_CHROMA),
) -> bytes:
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qts):
        out += _seg(0xDB, bytes([tq]) + bytes(q[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, comp_q[ci]])
    out += _seg(sof_marker, sof)
    for tc, th, (bits, vals) in (
        (0, 0, DC_LUMA), (1, 0, ac_tables[0]),
        (0, 1, DC_CHROMA), (1, 1, ac_tables[1]),
    ):
        out += _seg(
            0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )
    return bytes(out)


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
    h, w, sampling, qts, comp_q, all_coefs, mcus_x, mcus_y = (
        _quantized_coefficients(rgb, quality, subsample)
    )
    if _coef_sink is not None:
        _coef_sink.extend(all_coefs)

    # Huffman tables (encode maps)
    _, enc_dc_l = _build_huffman(*DC_LUMA)
    _, enc_ac_l = _build_huffman(*AC_LUMA)
    _, enc_dc_c = _build_huffman(*DC_CHROMA)
    _, enc_ac_c = _build_huffman(*AC_CHROMA)
    enc_tables = [(enc_dc_l, enc_ac_l), (enc_dc_c, enc_ac_c),
                  (enc_dc_c, enc_ac_c)]
    magnitude = _magnitude

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
            for ci in range(3):
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

    out = bytearray(
        _header_segments(h, w, sampling, qts, comp_q, 0xC0)
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci in range(3):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_bytes_progressive(
    rgb: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    _coef_sink: list | None = None,
) -> bytes:
    """Progressive (SOF2) JFIF encoder using a libjpeg-style scan
    script: interleaved DC first (Al=1) + DC refine, per-component
    spectral-selection AC first scans at Al 1-2, and AC successive-
    approximation refinement scans down to Al=0 — so the decoder's
    EOB-run, ZRL, and correction-bit paths are all exercised. The
    quantized coefficients are identical to :func:`jpeg_bytes` at the
    same quality/subsample (same front half), which is exactly what
    the entropy-exactness test pins. AC scan encoders mirror the
    decoder's position walk, emitting bits in precisely the order
    T.81 G.2 consumes them."""
    h, w, sampling, qts, comp_q, all_coefs, mcus_x, mcus_y = (
        _quantized_coefficients(rgb, quality, subsample)
    )
    if _coef_sink is not None:
        _coef_sink.extend(all_coefs)
    _, enc_dc_l = _build_huffman(*DC_LUMA)
    _, enc_ac_l = _build_huffman(*AC_LUMA_PROG)
    _, enc_dc_c = _build_huffman(*DC_CHROMA)
    _, enc_ac_c = _build_huffman(*AC_CHROMA_PROG)
    enc_dc = [enc_dc_l, enc_dc_c, enc_dc_c]
    enc_ac = [enc_ac_l, enc_ac_c, enc_ac_c]

    def comp_blocks(ci):
        """Non-interleaved block extent for component ci."""
        sh, sv = sampling[ci]
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        bw = -(-(-(-(w * sh) // hmax)) // 8)
        bh_ = -(-(-(-(h * sv) // vmax)) // 8)
        return bw, bh_

    def scan_dc_first(wtr, al):
        preds = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(3):
                    sh, sv = sampling[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(
                                all_coefs[ci][my * sv + by, mx * sh + bx][0]
                            ) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            s, bits = _magnitude(diff)
                            ln, code = enc_dc[ci][s]
                            wtr.put(code, ln)
                            if s:
                                wtr.put(bits, s)

    def scan_dc_refine(wtr, al):
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(3):
                    sh, sv = sampling[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(
                                all_coefs[ci][my * sv + by, mx * sh + bx][0]
                            )
                            wtr.put((v >> al) & 1, 1)

    def scan_ac_first(wtr, ci, ss, se, al):
        table = enc_ac[ci]
        bw, bh_ = comp_blocks(ci)
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            while eobrun > 0:
                r = min(eobrun.bit_length() - 1, 14)
                chunk = min(eobrun, (1 << (r + 1)) - 1)
                r = chunk.bit_length() - 1
                ln, code = table[r << 4]
                wtr.put(code, ln)
                if r:
                    wtr.put(chunk - (1 << r), r)
                eobrun -= chunk

        for y in range(bh_):
            for x in range(bw):
                blk = all_coefs[ci][y, x]
                zz = blk[ZIGZAG]
                vals = []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    av = (v if v >= 0 else -v) >> al
                    vals.append(av if v >= 0 else -av)
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                flush_eobrun()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i, v in enumerate(vals):
                    if i > last_nz:
                        eobrun += 1  # trailing zeros -> EOB for block
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = table[0xF0]  # ZRL
                        wtr.put(code, ln)
                        run -= 16
                    s, bits = _magnitude(v)
                    ln, code = table[(run << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(bits, s)
                    run = 0

        flush_eobrun()

    def scan_ac_refine(wtr, ci, ss, se, ah, al):
        """Mirrors the decoder's G.2 position walk exactly: per block,
        emit new-coefficient symbols with zero-HISTORY runs, reading
        order for correction bits identical to the decoder's inner
        loop; blocks end with EOB(run=1) + remaining correction bits
        (no cross-block EOB runs — spec-valid and decoder-exact)."""
        table = enc_ac[ci]
        bw, bh_ = comp_blocks(ci)
        for by in range(bh_):
            for bx in range(bw):
                blk = all_coefs[ci][by, bx]
                zz = [int(blk[ZIGZAG[k]]) for k in range(64)]

                def hist(k):  # nonzero-history at this approximation?
                    v = zz[k]
                    return ((v if v >= 0 else -v) >> (al + 1)) != 0

                def newly(k):
                    v = zz[k]
                    return ((v if v >= 0 else -v) >> al) == 1

                def corr_bit(k):
                    v = zz[k]
                    return ((v if v >= 0 else -v) >> al) & 1

                k = ss
                while k <= se:
                    # find next newly-significant coefficient
                    j = k
                    r = 0
                    nxt = None
                    while j <= se:
                        if not hist(j) and newly(j):
                            nxt = j
                            break
                        if not hist(j):
                            r += 1
                        j += 1
                    if nxt is None:
                        # EOB + correction bits for the rest of band
                        ln, code = table[0x00]
                        wtr.put(code, ln)
                        while k <= se:
                            if hist(k):
                                wtr.put(corr_bit(k), 1)
                            k += 1
                        break
                    while r > 15:
                        ln, code = table[0xF0]  # ZRL: 16 zero-history
                        wtr.put(code, ln)
                        zeros = 0
                        while zeros < 16:
                            if hist(k):
                                wtr.put(corr_bit(k), 1)
                            else:
                                zeros += 1
                            k += 1
                        r -= 16
                    ln, code = table[(r << 4) | 1]
                    wtr.put(code, ln)
                    wtr.put(1 if zz[nxt] >= 0 else 0, 1)
                    while k < nxt:
                        if hist(k):
                            wtr.put(corr_bit(k), 1)
                        k += 1
                    k = nxt + 1

    # libjpeg-style default scan script
    script = [
        ("dc_first", None, 0, 0, 0, 1),
        ("ac_first", 0, 1, 5, 0, 2),
        ("ac_first", 2, 1, 63, 0, 1),
        ("ac_first", 1, 1, 63, 0, 1),
        ("ac_first", 0, 6, 63, 0, 2),
        ("ac_refine", 0, 1, 63, 2, 1),
        ("dc_refine", None, 0, 0, 1, 0),
        ("ac_refine", 2, 1, 63, 1, 0),
        ("ac_refine", 1, 1, 63, 1, 0),
        ("ac_refine", 0, 1, 63, 1, 0),
    ]
    out = bytearray(
        _header_segments(
            h, w, sampling, qts, comp_q, 0xC2,
            ac_tables=(AC_LUMA_PROG, AC_CHROMA_PROG),
        )
    )
    for kind, ci, ss, se, ah, al in script:
        if kind in ("dc_first", "dc_refine"):
            sos = bytes([3])
            for c in range(3):
                sos += bytes([c + 1, (0x00 if c == 0 else 0x10)])
            sos += bytes([ss, se, (ah << 4) | al])
        else:
            ta = 0x00 if ci == 0 else 0x01
            sos = bytes([1, ci + 1, ta]) + bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        wtr = _BitWriter()
        if kind == "dc_first":
            scan_dc_first(wtr, al)
        elif kind == "dc_refine":
            scan_dc_refine(wtr, al)
        elif kind == "ac_first":
            scan_ac_first(wtr, ci, ss, se, al)
        else:
            scan_ac_refine(wtr, ci, ss, se, ah, al)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
