"""FLAC: a from-scratch, pure-Python lossless audio codec leg.

Unlike the perceptual codecs (MP3 Layer III / AAC), whose spec is
dominated by large tabulated constants that cannot be safely re-typed
without a reference codec to check against (operators/mp3.py module
docstring), FLAC is an *algorithmic* format — rice-coded linear
prediction over PCM, per the public FLAC format spec (now RFC 9639;
the on-disk format is unchanged since 2001). Every constant it needs
is tiny and structural (CRC polynomials 0x07/0x8005, the four fixed
predictors, the UTF-8-style frame-number coding), so a full REAL
decoder is implementable and *verifiable* in this container:

- **Lossless round-trip ground truth**: the module also carries a
  from-scratch encoder (the fixture writer, mirroring the repo's
  synth-encoder methodology used for JPEG/GIF/ADPCM). Decoding an
  encoded stream must recover the input PCM *bit-exactly* — for every
  subframe type (constant / verbatim / fixed 0-4 / LPC), every stereo
  decorrelation (independent / left-side / right-side / mid-side),
  rice and rice2 residual coding incl. escape partitions, multiple
  partition orders, and wasted-bits shifts. The test battery sweeps
  that full grid.
- **Three independent integrity layers pin the bit layout**: CRC-8
  over each frame header, CRC-16 over each whole frame, and the
  STREAMINFO MD5 of the *decoded* sample stream (computed with
  hashlib, an implementation this module does not own). A decoder
  that mis-reads any field fails at least one of them; the mutation
  fuzz battery flips/truncates bytes and asserts every corruption
  surfaces as ValueError, never as silently-wrong samples that pass
  the MD5.

What this buys the pipeline: `audio_features` /
`audio_spectral_features` / `audio_stream_info` gain a REAL
compressed-audio path (FLAC is the standard archival/distribution
format for speech + music corpora), and the media router gains real
FLAC metadata. MP3/AAC *sample* decode remains the documented honest
stub (mp3.py) — the rationale there is table safety, not effort.

Reference parity note: the reference engine (an HTML parsing library,
/root/reference) has no audio surface; this module is
LLM-training-data pipeline scope (SURVEY.md §6), not reference parity.

Scale posture: used inside map-only `mapInArrow` operators, one
payload at a time, zero shuffle; adversarial input is bounded — every
read goes through a bit-reader that raises ValueError on overrun, the
total-samples/blocksize fields are sanity-capped, and any structural
anomaly raises ValueError (the kernel-wide malformed-input contract).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "flac_stream_info",
    "flac_decode",
    "flac_bytes",
    "synth_flac_media",
]

# ---------------------------------------------------------------------------
# CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005 init 0,
# both MSB-first / non-reflected)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> list[int]:
    t = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t.append(c)
    return t


def _make_crc16_table() -> list[int]:
    t = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t.append(c)
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16[((c >> 8) ^ b) & 0xFF]
    return c


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over a bytes buffer; every overrun raises
    ValueError (the malformed-input contract)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8  # bit position

    def read(self, n: int) -> int:
        p = self.pos
        end = p + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream overrun")
        self.pos = end
        first = p >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        shift = (last << 3) - end
        return (chunk >> shift) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit."""
        data, p = self.data, self.pos
        total = len(data) * 8
        n = 0
        while True:
            if p >= total:
                raise ValueError("FLAC bitstream overrun in unary code")
            byte = data[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            n += lead
            p += lead + 1
            self.pos = p
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("unaligned FLAC frame boundary")
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        if self.nbits:
            raise ValueError("unaligned FLAC writer")
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Shared tables / helpers
# ---------------------------------------------------------------------------

# frame-header sample-rate codes 1-11 (0 = "from STREAMINFO",
# 12-14 = explicit field follows, 15 = invalid)
_SR_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_BPS_TO_CODE = {v: k for k, v in _BPS_CODES.items()}

# fixed-predictor coefficients, order 0-4 (public spec §fixed predictors)
_FIXED_COEFS = [
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]

_MAX_BLOCK = 65535
_MAX_TOTAL_SAMPLES = 1 << 36
# decode-side memory bound for streams whose STREAMINFO claims an
# unknown (zero) total: constant subframes make ~40-bit frames that
# each claim up to 65535 samples, a ~10^4 amplification a crafted
# payload could use as a memory bomb without this cap
_MAX_UNKNOWN_TOTAL = 1 << 26


def _utf8_code(value: int) -> bytes:
    """FLAC's UTF-8-style variable-length coded number (frame/sample
    index; up to 36 bits, 1-7 bytes)."""
    if value < 0x80:
        return bytes([value])
    out = []
    nbytes = 2
    while nbytes <= 7:
        payload_bits = 6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0)
        # lead byte carries (7 - nbytes) bits for nbytes<=6, 0 for 7
        if value < (1 << payload_bits):
            break
        nbytes += 1
    if nbytes > 7:
        raise ValueError("coded number out of range")
    conts = [(value >> (6 * k)) & 0x3F for k in range(nbytes - 1)]
    lead_val = value >> (6 * (nbytes - 1))
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_mask | lead_val)
    out.extend(0x80 | c for c in reversed(conts))
    return bytes(out)


def _read_utf8_code(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad FLAC coded number")
    value = b0 & (0xFF >> (nbytes + 1)) if nbytes < 7 else 0
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded-number continuation")
        value = (value << 6) | (c & 0x3F)
    return value


# ---------------------------------------------------------------------------
# STREAMINFO / metadata layer
# ---------------------------------------------------------------------------


def _parse_streaminfo(payload: bytes) -> tuple[dict, int]:
    """Parse the metadata-block chain; return (streaminfo dict,
    first-frame byte offset)."""
    if len(payload) < 4 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    last = False
    first = True
    while not last:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata block header")
        head = payload[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated FLAC metadata block")
        if first:
            if btype != 0 or size != 34:
                raise ValueError("first FLAC metadata block must be STREAMINFO")
            bits = int.from_bytes(body, "big")  # 272 bits
            info = {
                "min_block": (bits >> 256) & 0xFFFF,
                "max_block": (bits >> 240) & 0xFFFF,
                "min_frame": (bits >> 216) & 0xFFFFFF,
                "max_frame": (bits >> 192) & 0xFFFFFF,
                "sample_rate": (bits >> 172) & 0xFFFFF,
                "channels": ((bits >> 169) & 0x7) + 1,
                "bps": ((bits >> 164) & 0x1F) + 1,
                "total_samples": (bits >> 128) & ((1 << 36) - 1),
                "md5": body[18:34],
            }
            if info["sample_rate"] == 0:
                raise ValueError("FLAC STREAMINFO sample rate is zero")
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        first = False
        pos += 4 + size
    if info is None:
        raise ValueError("FLAC stream has no metadata blocks")
    return info, pos


def flac_stream_info(payload: bytes) -> dict:
    """REAL header-only FLAC metadata (no frame decode): sample rate,
    channels, bits per sample, total samples, exact duration. Raises
    ValueError for malformed payloads."""
    info, _ = _parse_streaminfo(bytes(payload))
    n = info["total_samples"]
    sr = info["sample_rate"]
    return {
        "container": "flac",
        "sample_rate": sr,
        "channels": info["channels"],
        "bps": info["bps"],
        "n_samples": n,
        "duration_ms": round(n * 1000 / sr),
    }


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _decode_residual(br: _BitReader, block: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 + method  # rice parameter width: 4 (rice) or 5 (rice2)
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    # the split must be exact and the first partition (which holds
    # block/nparts - order samples) must not go negative
    if block % nparts or (block >> porder) < order:
        raise ValueError("bad FLAC rice partition order")
    out: list[int] = []
    for part in range(nparts):
        n = (block >> porder) - (order if part == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                for _ in range(n):
                    out.append(br.read_signed(raw))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(br: _BitReader, block: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * block
    elif ftype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(block)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        if order > block:
            raise ValueError("FLAC fixed order exceeds block size")
        samples = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, block, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(resid):
            base = i + order
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[base - 1 - j]
            samples.append(r + pred)
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 31) + 1
        if order > block:
            raise ValueError("FLAC LPC order exceeds block size")
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, block, order)
        for i, r in enumerate(resid):
            base = i + order
            acc = 0
            for j in range(order):
                acc += coefs[j] * samples[base - 1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(
    br: _BitReader, info: dict
) -> tuple[list[list[int]], int]:
    """Decode one frame starting at the reader's (byte-aligned)
    position; returns (per-channel sample lists, sample_rate)."""
    start = br.byte_pos()
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("bad FLAC frame sync")
    if br.read(1):
        raise ValueError("bad FLAC frame reserved bit")
    br.read(1)  # blocking strategy (coded number disambiguates)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("bad FLAC frame reserved bit")
    _read_utf8_code(br)  # frame/sample number (ordering not re-derived)
    if bs_code == 0:
        raise ValueError("reserved FLAC block size code")
    elif bs_code == 1:
        block = 192
    elif bs_code <= 5:
        block = 576 << (bs_code - 2)
    elif bs_code == 6:
        block = br.read(8) + 1
    elif bs_code == 7:
        block = br.read(16) + 1
    else:
        block = 256 << (bs_code - 8)
    if sr_code == 0:
        sr = info["sample_rate"]
    elif sr_code in _SR_CODES:
        sr = _SR_CODES[sr_code]
    elif sr_code == 12:
        sr = br.read(8) * 1000
    elif sr_code == 13:
        sr = br.read(16)
    elif sr_code == 14:
        sr = br.read(16) * 10
    else:
        raise ValueError("invalid FLAC sample rate code")
    if bps_code == 0:
        bps = info["bps"]
    elif bps_code in _BPS_CODES:
        bps = _BPS_CODES[bps_code]
    else:
        raise ValueError("reserved FLAC sample size code")
    # CRC-8 covers the header bytes before the CRC byte; the header is
    # byte-aligned by construction (14+1+1+4+4+4+3+1 = 32 bits + whole
    # bytes for coded number / explicit fields)
    if br.pos & 7:
        raise ValueError("unaligned FLAC frame header")
    expect = _crc8(br.data[start : br.pos >> 3])
    got = br.read(8)
    if got != expect:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    if ch_code <= 7:
        nch = ch_code + 1
        side = None
    elif ch_code <= 10:
        nch = 2
        side = ("left_side", "right_side", "mid_side")[ch_code - 8]
    else:
        raise ValueError("reserved FLAC channel assignment")
    if nch != info["channels"]:
        raise ValueError("FLAC frame channel count mismatch")
    chans = []
    for c in range(nch):
        ch_bps = bps
        if side == "left_side" and c == 1:
            ch_bps += 1
        elif side == "right_side" and c == 0:
            ch_bps += 1
        elif side == "mid_side" and c == 1:
            ch_bps += 1
        chans.append(_decode_subframe(br, block, ch_bps))
    br.align()
    body_end = br.byte_pos()
    expect16 = _crc16(br.data[start:body_end])
    got16 = br.read(16)
    if got16 != expect16:
        raise ValueError("FLAC frame CRC-16 mismatch")
    # undo inter-channel decorrelation
    if side == "left_side":
        left, s = chans
        chans = [left, [l - x for l, x in zip(left, s)]]
    elif side == "right_side":
        s, right = chans
        chans = [[r + x for r, x in zip(right, s)], right]
    elif side == "mid_side":
        mid, s = chans
        left, right = [], []
        for m, x in zip(mid, s):
            m2 = (m << 1) | (x & 1)
            left.append((m2 + x) >> 1)
            right.append((m2 - x) >> 1)
        chans = [left, right]
    return chans, sr


def flac_decode(
    payload: bytes, verify_md5: bool = True
) -> tuple[np.ndarray, int]:
    """FULL real FLAC decode: every subframe type (constant / verbatim
    / fixed 0-4 / LPC 1-32), rice + rice2 residuals incl. escape
    partitions, wasted bits, and all four channel assignments.

    Returns ``(samples, sample_rate)`` with samples as an int16
    ndarray of shape (n, channels) — 8/24-bit streams are scaled to
    the top 16 bits, matching the WAV decoder's contract
    (multimodal._parse_wav). Integrity: per-frame CRC-8 + CRC-16
    always verified; the STREAMINFO MD5 of the decoded stream is
    verified too (``verify_md5=False`` skips it, e.g. for streams
    whose writer left it zeroed). Any anomaly raises ValueError.

    A native leg (native/tl_native/src/flac.rs) handles the happy
    path when the cdylib is present; it bails to this pure-Python
    implementation on ANY anomaly, so error semantics stay
    Python-exact by construction (the doc.rs bail-rule pattern).
    Kill switch: TL_SPARK_NATIVE_FLAC=0."""
    payload = bytes(payload)
    from tl_spark.kernel import native_flac

    got = native_flac.decode(payload, verify_md5)
    if got is not None:
        return got
    info, pos = _parse_streaminfo(payload)
    nch = info["channels"]
    bps = info["bps"]
    total = info["total_samples"]
    if total > _MAX_TOTAL_SAMPLES:
        raise ValueError("FLAC total_samples out of range")
    br = _BitReader(payload, pos)
    out: list[list[int]] = [[] for _ in range(nch)]
    n_decoded = 0
    bound = total if total else _MAX_UNKNOWN_TOTAL
    while br.pos < len(payload) * 8:
        chans, _ = _decode_frame(br, info)
        for c in range(nch):
            out[c].extend(chans[c])
        n_decoded += len(chans[0])
        if n_decoded > bound:
            raise ValueError("FLAC stream exceeds total-samples bound")
    if total and n_decoded != total:
        raise ValueError(
            f"FLAC decoded {n_decoded} samples, STREAMINFO says {total}"
        )
    samples = np.array(out, dtype=np.int64).T.reshape(-1, nch)
    limit = 1 << (bps - 1)
    if samples.size and (samples.max() >= limit or samples.min() < -limit):
        raise ValueError("FLAC sample out of range for declared bps")
    if verify_md5 and info["md5"] != b"\x00" * 16:
        width = (bps + 7) // 8
        md5 = hashlib.md5(_pack_pcm(samples, width)).digest()
        if md5 != info["md5"]:
            raise ValueError("FLAC STREAMINFO MD5 mismatch")
    # normalize to the int16 contract shared with _parse_wav
    if bps == 16:
        pcm16 = samples.astype(np.int16)
    elif bps < 16:
        pcm16 = (samples << (16 - bps)).astype(np.int16)
    else:
        pcm16 = (samples >> (bps - 16)).astype(np.int16)
    return pcm16, info["sample_rate"]


def _pack_pcm(samples: np.ndarray, width: int) -> bytes:
    """Interleaved little-endian signed PCM at byte width 1/2/3/4 (the
    layout the STREAMINFO MD5 is computed over)."""
    flat = samples.reshape(-1).astype(np.int64)
    if width == 1:
        return flat.astype(np.int8).tobytes()
    if width == 2:
        return flat.astype("<i2").tobytes()
    if width == 4:
        return flat.astype("<i4").tobytes()
    if width == 3:
        u = (flat & 0xFFFFFF).astype(np.uint32)
        b = np.empty((len(flat), 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        return b.tobytes()
    raise ValueError(f"unsupported PCM width {width}")


# ---------------------------------------------------------------------------
# Encoder (fixture writer / round-trip ground truth)
# ---------------------------------------------------------------------------


def _best_rice_param(resid: list[int], pbits: int) -> tuple[int, int]:
    """(param, encoded bits) minimizing the rice cost for one
    partition (closed-form: cost(p) = n*(p+1) + sum(u >> p))."""
    # zigzag: positive r -> 2r, negative -> -2r-1
    us = [(-2 * r - 1) if r < 0 else 2 * r for r in resid]
    n = len(us)
    if not us:
        return (0, 0)
    best = (0, n + sum(us))
    maxp = (1 << pbits) - 2
    for p in range(maxp + 1):
        cost = n * (p + 1) + sum(u >> p for u in us)
        if p == 0 or cost < best[1]:
            best = (p, cost)
        if n and max(us) >> p == 0:
            break  # larger params only add bits
    return best


def _write_residual(
    bw: _BitWriter,
    resid: list[int],
    block: int,
    order: int,
    porder: int,
    rice2: bool,
    escape_raw: int | None,
) -> None:
    pbits = 5 if rice2 else 4
    # a short final block may not divide into 2^porder partitions —
    # clamp to the largest valid order for this block
    while porder and (block % (1 << porder) or (block >> porder) < order):
        porder -= 1
    bw.write(1 if rice2 else 0, 2)
    bw.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for part in range(nparts):
        n = (block >> porder) - (order if part == 0 else 0)
        chunk = resid[idx : idx + n]
        idx += n
        if escape_raw is not None:
            lo = -(1 << (escape_raw - 1)) if escape_raw else 0
            hi = (1 << (escape_raw - 1)) - 1 if escape_raw else 0
            if any(r < lo or r > hi for r in chunk):
                raise ValueError("residual exceeds escape_raw width")
            bw.write((1 << pbits) - 1, pbits)
            bw.write(escape_raw, 5)
            if escape_raw:
                for r in chunk:
                    bw.write(r, escape_raw)
            continue
        param, _ = _best_rice_param(chunk, pbits)
        bw.write(param, pbits)
        for r in chunk:
            u = (-2 * r - 1) if r < 0 else 2 * r
            bw.write_unary(u >> param)
            bw.write(u, param)


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    out = []
    for i in range(order, len(samples)):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * samples[i - 1 - j]
        out.append(samples[i] - pred)
    return out


def _lpc_coefs(samples: list[int], order: int, precision: int = 12):
    """Quantized LPC coefficients via autocorrelation +
    Levinson-Durbin (the textbook method; public)."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n <= order:
        raise ValueError("block too short for LPC order")
    ac = [float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)]
    if ac[0] == 0.0:
        raise ValueError("silent block: use constant/fixed instead")
    err = ac[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= lpc[j] * ac[i - j]
        k = acc / err
        lpc_new = lpc[:]
        lpc_new[i] = k
        for j in range(i):
            lpc_new[j] = lpc[j] - k * lpc[i - 1 - j]
        lpc = lpc_new
        err *= 1 - k * k
        if err <= 0:
            break
    cmax = max(abs(c) for c in lpc) or 1.0
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(15, shift))
    q = [int(round(c * (1 << shift))) for c in lpc]
    lim = (1 << (precision - 1)) - 1
    q = [max(-lim - 1, min(lim, c)) for c in q]
    return q, shift, precision


def _lpc_residual(
    samples: list[int], coefs: list[int], shift: int
) -> list[int]:
    order = len(coefs)
    out = []
    for i in range(order, len(samples)):
        acc = 0
        for j in range(order):
            acc += coefs[j] * samples[i - 1 - j]
        out.append(samples[i] - (acc >> shift))
    return out


def _write_subframe(
    bw: _BitWriter,
    samples: list[int],
    bps: int,
    strategy: str,
    porder: int,
    rice2: bool,
    escape_raw: int | None,
    wasted: int,
) -> None:
    if wasted:
        if any(s & ((1 << wasted) - 1) for s in samples):
            raise ValueError("samples not divisible for wasted-bits test")
        samples = [s >> wasted for s in samples]
    eff = bps - wasted
    block = len(samples)
    if strategy.startswith("lpc") and (
        int(strategy[3:] or 8) >= block or not any(samples)
    ):
        strategy = "auto"  # short/silent block: adapt like real encoders

    def header(ftype: int) -> None:
        bw.write(0, 1)
        bw.write(ftype, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if strategy == "auto":
        if all(s == samples[0] for s in samples):
            strategy = "constant"
        else:
            best, best_cost = 0, None
            for o in range(min(4, block - 1) + 1):
                cost = sum(
                    2 * abs(r) + 1 for r in _fixed_residual(samples, o)
                )
                if best_cost is None or cost < best_cost:
                    best, best_cost = o, cost
            strategy = f"fixed{best}"
    if strategy == "constant":
        header(0)
        bw.write(samples[0], eff)
        return
    if strategy == "verbatim":
        header(1)
        for s in samples:
            bw.write(s, eff)
        return
    if strategy.startswith("fixed"):
        order = int(strategy[5:])
        if order > 4 or order > block:
            raise ValueError(f"bad fixed order {order}")
        header(8 + order)
        for s in samples[:order]:
            bw.write(s, eff)
        resid = _fixed_residual(samples, order)
        _write_residual(bw, resid, block, order, porder, rice2, escape_raw)
        return
    if strategy.startswith("lpc"):
        order = int(strategy[3:] or 8)
        if not 1 <= order <= 32 or order >= block:
            raise ValueError(f"bad LPC order {order}")
        coefs, shift, precision = _lpc_coefs(samples, order)
        header(32 | (order - 1))
        for s in samples[:order]:
            bw.write(s, eff)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, precision)
        resid = _lpc_residual(samples, coefs, shift)
        _write_residual(bw, resid, block, order, porder, rice2, escape_raw)
        return
    raise ValueError(f"unknown subframe strategy {strategy!r}")


def flac_bytes(
    samples,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    channel_mode: str = "auto",
    strategy: str = "auto",
    rice_partition_order: int = 0,
    rice2: bool = False,
    escape_raw: int | None = None,
    wasted_bits: int = 0,
    write_md5: bool = True,
) -> bytes:
    """Serialize PCM to a VALID FLAC stream (the fixture writer; see
    module docstring for the round-trip-ground-truth methodology).

    ``samples``: int array of shape (n,) or (n, channels), values in
    the signed ``bps``-bit range. ``channel_mode``: auto / indep /
    left_side / right_side / mid_side. ``strategy``: auto / constant /
    verbatim / fixed0-4 / lpcN. ``escape_raw``: force every rice
    partition to the escaped raw-bits form at the given width (test
    coverage for the escape path)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, nch = arr.shape
    if not 1 <= nch <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if bps not in _BPS_TO_CODE:
        raise ValueError("encoder supports bps in {8,12,16,20,24,32}")
    limit = 1 << (bps - 1)
    if arr.size and (arr.max() >= limit or arr.min() < -limit):
        raise ValueError("sample out of range for bps")
    if not 1 <= block_size <= _MAX_BLOCK:
        raise ValueError("bad block size")
    if channel_mode == "auto":
        channel_mode = "left_side" if nch == 2 else "indep"
    if channel_mode != "indep" and nch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    frames = bytearray()
    frame_sizes = []
    for fno, start in enumerate(range(0, n, block_size)):
        blk = arr[start : start + block_size]
        block = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        if block == 192:
            bs_code, bs_extra = 1, None
        elif block in (576, 1152, 2304, 4608):
            bs_code, bs_extra = 2 + (576, 1152, 2304, 4608).index(block), None
        elif block & (block - 1) == 0 and 256 <= block <= 32768:
            bs_code, bs_extra = 8 + (block // 256).bit_length() - 1, None
        elif block <= 256:
            bs_code, bs_extra = 6, block - 1
        else:
            bs_code, bs_extra = 7, block - 1
        bw.write(bs_code, 4)
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if channel_mode == "indep":
            bw.write(nch - 1, 4)
        else:
            bw.write(
                8 + ("left_side", "right_side", "mid_side").index(channel_mode),
                4,
            )
        bw.write(_BPS_TO_CODE[bps], 3)
        bw.write(0, 1)
        for b in _utf8_code(fno):
            bw.write(b, 8)
        if bs_code == 6:
            bw.write(bs_extra, 8)
        elif bs_code == 7:
            bw.write(bs_extra, 16)
        header = bw.getvalue()
        bw2 = _BitWriter()
        if channel_mode == "indep":
            chan_data = [(list(blk[:, c]), bps) for c in range(nch)]
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if channel_mode == "left_side":
                chan_data = [(left, bps), (side, bps + 1)]
            elif channel_mode == "right_side":
                chan_data = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                chan_data = [(mid, bps), (side, bps + 1)]
        for ch, ch_bps in chan_data:
            _write_subframe(
                bw2,
                [int(v) for v in ch],
                ch_bps,
                strategy,
                rice_partition_order,
                rice2,
                escape_raw,
                wasted_bits,
            )
        bw2.align()
        body = header + bytes([_crc8(header)]) + bw2.getvalue()
        body += _crc16(body).to_bytes(2, "big")
        frames += body
        frame_sizes.append(len(body))

    md5 = (
        hashlib.md5(_pack_pcm(arr, (bps + 7) // 8)).digest()
        if write_md5
        else b"\x00" * 16
    )
    si = bytearray()
    # nominal block size in both slots (fixed-blocksize stream; the
    # spec exempts the final short block from min/max)
    si += struct.pack(">HH", block_size, block_size)
    min_f = min(frame_sizes) if frame_sizes else 0
    max_f = max(frame_sizes) if frame_sizes else 0
    si += min_f.to_bytes(3, "big") + max_f.to_bytes(3, "big")
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += md5
    if len(si) != 34:
        raise AssertionError("STREAMINFO must be 34 bytes")
    return b"fLaC" + b"\x80\x00\x00\x22" + bytes(si) + bytes(frames)


# ---------------------------------------------------------------------------
# Spark-side synthesis (fixture table)
# ---------------------------------------------------------------------------


def synth_pcm(i: int, n: int = 3000, channels: int = 2) -> np.ndarray:
    """Deterministic 16-bit test PCM: a quantized two-tone ramp keyed
    by ``i`` (smooth enough that fixed/LPC prediction wins, non-trivial
    enough that every residual path is exercised)."""
    t = np.arange(n, dtype=np.float64)
    f1 = 0.01 + (i % 7) * 0.003
    f2 = 0.023 + (i % 5) * 0.005
    base = 9000 * np.sin(2 * np.pi * f1 * t) + 4000 * np.sin(
        2 * np.pi * f2 * t + i
    )
    out = np.empty((n, channels), dtype=np.int64)
    for c in range(channels):
        out[:, c] = np.round(base / (1.0 + 0.25 * c)).astype(np.int64)
    return out


def synth_flac_media(spark, n_rows: int = 30, seed: int = 7):
    """Deterministic REAL-FLAC table keyed by id: sample count
    2003 + id%5*499 (chosen so n*1000/sr never lands on a half-integer
    — Python banker's round vs DuckDB half-away would diverge there),
    sample rate by id%3, mono when id%2, rotating channel modes —
    closed-form metadata for the suite oracle
    (duration_ms = round(n*1000/sr))."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        n = 2003 + (i % 5) * 499
        ch = 1 if i % 2 else 2
        mode = (
            "indep"
            if ch == 1
            else ("left_side", "right_side", "mid_side")[i % 3]
        )
        return flac_bytes(
            synth_pcm(seed + i, n, ch),
            sample_rate=(44100, 48000, 32000)[i % 3],
            block_size=1152,
            channel_mode=mode,
        )

    def fn(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([_payload(int(i)) for i in ids], type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    return spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
