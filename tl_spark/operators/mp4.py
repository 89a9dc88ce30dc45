"""ISO BMFF (MP4/MOV) + RIFF/AVI container layer: REAL box parsing.

Like the MPEG-audio frame layer (operators/mp3.py), this is the honest
scope for modern video in this environment: the CONTAINER metadata —
brand, exact duration from mvhd/mdhd timescales, per-track handler and
sample-entry codec fourccs, tkhd 16.16 display dimensions, stts sample
counts — parses for real from the public ISO 14496-12 box grammar
(pure struct arithmetic, no tabulated codec constants), while
bitstream decode of H.264/H.265/AAC stays the documented honest stub
(multimodal.py's codec-stub contract). Duration/resolution/codec are
exactly the gates a corpus-scale video curation pipeline filters on
before any decode happens.

Reference parity note: the reference engine is an HTML parsing library
with no media surface — this module belongs to the LLM-training-data
pipeline scope (SURVEY.md §6), not reference parity.
"""

from __future__ import annotations

import struct
from typing import Iterator

__all__ = [
    "mp4_stream_info",
    "mp4_bytes",
    "synth_mp4_media",
    "video_stream_info",
]

_CONTAINERS = (b"moov", b"trak", b"mdia", b"minf", b"stbl")
_MAX_BOXES = 100_000  # crafted deep/many-box payloads must not spin


def _boxes(payload: bytes, pos: int, end: int, budget: list):
    """Yield (type, body_start, body_end) for the boxes in a range.
    Follows §4.2: size==1 → 64-bit largesize, size==0 → to end."""
    while pos + 8 <= end:
        budget[0] -= 1
        if budget[0] <= 0:
            raise ValueError("box-count cap exceeded")
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"bad box size for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _fullbox(payload: bytes, body: int) -> tuple[int, int]:
    """(version, start-after-version/flags)."""
    if body + 4 > len(payload):
        raise ValueError("truncated full box")
    return payload[body], body + 4


def _parse_mvhd(payload: bytes, body: int, end: int):
    ver, p = _fullbox(payload, body)
    if ver == 1:
        if p + 28 > end:
            raise ValueError("truncated mvhd")
        timescale, duration = struct.unpack_from(">IQ", payload, p + 16)
    else:
        if p + 20 > end:
            raise ValueError("truncated mvhd")
        timescale, duration = struct.unpack_from(">II", payload, p + 8)
    return timescale, duration


def _parse_mdhd(payload: bytes, body: int, end: int):
    ver, p = _fullbox(payload, body)
    if ver == 1:
        if p + 28 > end:
            raise ValueError("truncated mdhd")
        timescale, duration = struct.unpack_from(">IQ", payload, p + 16)
    else:
        if p + 16 > end:
            raise ValueError("truncated mdhd")
        timescale, duration = struct.unpack_from(">II", payload, p + 8)
    return timescale, duration


def _parse_tkhd(payload: bytes, body: int, end: int):
    ver, p = _fullbox(payload, body)
    skip = 32 if ver == 1 else 20  # ids+times, to before reserved block
    # layout after times: reserved(8) layer(2) altgroup(2) volume(2)
    # reserved(2) matrix(36) width(4) height(4) — 16.16 fixed point
    q = p + skip + 8 + 2 + 2 + 2 + 2 + 36
    if q + 8 > end:
        raise ValueError("truncated tkhd")
    w, h = struct.unpack_from(">II", payload, q)
    return w >> 16, h >> 16


def _parse_stts_samples(payload: bytes, body: int, end: int) -> int:
    _, p = _fullbox(payload, body)
    if p + 4 > end:
        raise ValueError("truncated stts")
    (n,) = struct.unpack_from(">I", payload, p)
    if n > 1_000_000 or p + 4 + 8 * n > end:
        raise ValueError("bad stts entry count")
    total = 0
    for k in range(n):
        cnt, _delta = struct.unpack_from(">II", payload, p + 4 + 8 * k)
        total += cnt
    return total


class _ExpGolomb:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb codes (ITU-T
    H.264 §9.1 — the coding is a short formula, not a table)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        p, end = self.pos, self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("SPS bitstream overrun")
        self.pos = end
        first, last = p >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        return (chunk >> ((last << 3) - end)) & ((1 << n) - 1)

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)


def _sps_dims(nal: bytes) -> tuple[int, int]:
    """REAL coded dimensions from an H.264 sequence parameter set
    (ITU-T H.264 §7.3.2.1): emulation-prevention removal, Exp-Golomb
    walk to pic_width_in_mbs / pic_height_in_map_units, frame cropping
    applied with the chroma-format crop units. Raises ValueError for
    anything that isn't a parseable SPS."""
    if not nal or nal[0] & 0x1F != 7:
        raise ValueError("not an SPS NAL")
    # strip emulation-prevention bytes: 00 00 03 -> 00 00
    rbsp = nal[1:].replace(b"\x00\x00\x03", b"\x00\x00")
    g = _ExpGolomb(rbsp)
    profile_idc = g.u(8)
    g.u(8)  # constraint flags + reserved
    g.u(8)  # level_idc
    g.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # 4:2:0 default for non-high profiles
    separate_planes = 0
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        chroma_format_idc = g.ue()
        if chroma_format_idc == 3:
            separate_planes = g.u(1)
        g.ue()  # bit_depth_luma_minus8
        g.ue()  # bit_depth_chroma_minus8
        g.u(1)  # qpprime_y_zero_transform_bypass
        if g.u(1):  # seq_scaling_matrix_present
            raise ValueError("SPS scaling matrices unsupported")
    g.ue()  # log2_max_frame_num_minus4
    poc_type = g.ue()
    if poc_type == 0:
        g.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        g.u(1)  # delta_pic_order_always_zero
        g.se()  # offset_for_non_ref_pic
        g.se()  # offset_for_top_to_bottom_field
        for _ in range(g.ue()):
            g.se()
    g.ue()  # max_num_ref_frames
    g.u(1)  # gaps_in_frame_num_value_allowed
    w_mbs = g.ue() + 1
    h_units = g.ue() + 1
    frame_mbs_only = g.u(1)
    if not frame_mbs_only:
        g.u(1)  # mb_adaptive_frame_field
    g.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if g.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = g.ue(), g.ue(), g.ue(), g.ue()
    if chroma_format_idc == 0 or separate_planes:
        unit_x, unit_y = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        unit_x, unit_y = sub_w, sub_h * (2 - frame_mbs_only)
    width = w_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * h_units * 16 - unit_y * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ValueError("SPS crop exceeds coded size")
    return width, height


def _avcc_sps_dims(payload: bytes, body: int, end: int) -> tuple[int, int]:
    """Dims from the first SPS inside an avcC
    (AVCDecoderConfigurationRecord, ISO 14496-15 §5.3.3.1)."""
    if body + 6 > end or payload[body] != 1:
        raise ValueError("bad avcC record")
    n_sps = payload[body + 5] & 0x1F
    p = body + 6
    if n_sps < 1 or p + 2 > end:
        raise ValueError("avcC has no SPS")
    (ln,) = struct.unpack_from(">H", payload, p)
    # bound by the avcC box END, not the whole payload: a corrupt
    # length field must not read dims out of sibling boxes' bytes
    if p + 2 + ln > end:
        raise ValueError("truncated avcC SPS")
    nal = payload[p + 2 : p + 2 + ln]
    return _sps_dims(nal)


def mp4_stream_info(payload: bytes) -> dict:
    """Parse an ISO BMFF payload's container metadata. Raises
    ValueError for anything that is not a well-formed BMFF tree (the
    kernel-wide malformed-input contract).

    Fields: container, brand, duration_ms (mvhd), n_tracks, has_video,
    has_audio, video_codec / audio_codec (first sample-entry fourcc
    per handler), width, height (tkhd of the first video track),
    n_samples (stts total of the first video track), clean."""
    if not isinstance(payload, (bytes, bytearray)) or len(payload) < 16:
        raise ValueError("not an ISO BMFF payload")
    payload = bytes(payload)
    budget = [_MAX_BOXES]
    brand = ""
    mvhd = None
    tracks = []
    saw_moov = False

    def walk(pos: int, end: int, path: tuple):
        nonlocal brand, mvhd, saw_moov
        for btype, body, bend in _boxes(payload, pos, end, budget):
            if btype == b"ftyp" and not path:
                if body + 4 <= bend:
                    brand = payload[body : body + 4].decode(
                        "latin-1"
                    ).strip()
            elif btype == b"moov" and not path:
                saw_moov = True
                walk(body, bend, path + (b"moov",))
            elif btype == b"mvhd" and path == (b"moov",):
                mvhd = _parse_mvhd(payload, body, bend)
            elif btype == b"trak" and path == (b"moov",):
                tracks.append(
                    {"handler": "", "codec": "", "w": 0, "h": 0,
                     "coded_w": 0, "coded_h": 0,
                     "mdhd": None, "n_samples": 0}
                )
                walk(body, bend, path + (b"trak",))
            elif btype == b"tkhd" and path[-1:] == (b"trak",):
                w, h = _parse_tkhd(payload, body, bend)
                tracks[-1]["w"], tracks[-1]["h"] = w, h
            elif btype == b"mdia" and path[-1:] == (b"trak",):
                walk(body, bend, path + (b"mdia",))
            elif btype == b"mdhd" and path[-1:] == (b"mdia",):
                tracks[-1]["mdhd"] = _parse_mdhd(payload, body, bend)
            elif btype == b"hdlr" and path[-1:] == (b"mdia",):
                _, p = _fullbox(payload, body)
                if p + 8 <= bend:
                    tracks[-1]["handler"] = payload[p + 4 : p + 8].decode(
                        "latin-1"
                    )
            elif btype == b"minf" and path[-1:] == (b"mdia",):
                walk(body, bend, path + (b"minf",))
            elif btype == b"stbl" and path[-1:] == (b"minf",):
                walk(body, bend, path + (b"stbl",))
            elif btype == b"stsd" and path[-1:] == (b"stbl",):
                _, p = _fullbox(payload, body)
                if p + 4 <= bend:
                    (n,) = struct.unpack_from(">I", payload, p)
                    if n >= 1 and p + 12 <= bend:
                        codec = payload[p + 8 : p + 12].decode("latin-1")
                        tracks[-1]["codec"] = codec
                        if codec in ("avc1", "avc3"):
                            (esize,) = struct.unpack_from(">I", payload, p + 4)
                            entry_end = min(p + 4 + esize, bend)
                            # children follow the 86-byte
                            # VisualSampleEntry (8 header + 78 fields)
                            kids = p + 4 + 86
                            if kids < entry_end:
                                for kt, kb, ke in _boxes(
                                    payload, kids, entry_end, budget
                                ):
                                    if kt == b"avcC":
                                        cw, ch = _avcc_sps_dims(
                                            payload, kb, ke
                                        )
                                        tracks[-1]["coded_w"] = cw
                                        tracks[-1]["coded_h"] = ch
                                        break
            elif btype == b"stts" and path[-1:] == (b"stbl",):
                tracks[-1]["n_samples"] = _parse_stts_samples(
                    payload, body, bend
                )

    walk(0, len(payload), ())
    if not saw_moov:
        raise ValueError("no moov box (not an MP4 movie)")
    duration_ms = 0
    clean = mvhd is not None
    if mvhd is not None:
        timescale, duration = mvhd
        if timescale:
            duration_ms = round(duration * 1000 / timescale)
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    audio = next((t for t in tracks if t["handler"] == "soun"), None)
    return {
        "container": "mp4",
        "brand": brand,
        "duration_ms": duration_ms,
        "n_tracks": len(tracks),
        "has_video": video is not None,
        "has_audio": audio is not None,
        "video_codec": video["codec"] if video else "",
        "audio_codec": audio["codec"] if audio else "",
        "width": video["w"] if video else 0,
        "height": video["h"] if video else 0,
        # REAL coded dims from the H.264 SPS inside avcC (0 when the
        # track carries no parseable avcC) — tkhd width/height above
        # are the 16.16 DISPLAY dims, which real-world files disagree
        # on; curation gates should prefer the coded dims when present
        "coded_width": video["coded_w"] if video else 0,
        "coded_height": video["coded_h"] if video else 0,
        "n_samples": video["n_samples"] if video else 0,
        "clean": clean,
    }


def _avi_stream_info(payload: bytes) -> dict:
    """Container metadata for RIFF/AVI via the avih main header
    (microseconds/frame, total frames, dimensions) — no frame decode."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def find_avih(pos: int, end: int, depth: int = 0):
        if depth > 16:
            return None
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if pos + 8 + size > end:
                raise ValueError(f"truncated AVI chunk {cid!r}")
            if cid == b"LIST":
                got = find_avih(pos + 12, pos + 8 + size, depth + 1)
                if got is not None:
                    return got
            elif cid == b"avih" and size >= 40:
                return pos + 8
            pos += 8 + size + (size & 1)
        return None

    at = find_avih(12, len(payload))
    if at is None:
        raise ValueError("no avih header")
    us_per_frame, _, _, _flags, total_frames = struct.unpack_from(
        "<IIIII", payload, at
    )
    w, h = struct.unpack_from("<II", payload, at + 32)
    duration_ms = round(total_frames * us_per_frame / 1000)
    return {
        "container": "avi",
        "brand": "",
        "duration_ms": duration_ms,
        "n_tracks": 1,
        "has_video": True,
        "has_audio": False,
        "video_codec": "",
        "audio_codec": "",
        "width": w,
        "height": h,
        "coded_width": 0,
        "coded_height": 0,
        "n_samples": total_frames,
        "clean": True,
    }


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, ver: int, body: bytes) -> bytes:
    return _box(btype, bytes([ver, 0, 0, 0]) + body)


class _SpsWriter:
    def __init__(self):
        self.acc, self.nbits, self.buf = 0, 0, bytearray()

    def u(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def ue(self, v: int):
        k = v + 1
        self.u(k, 2 * k.bit_length() - 1)


def sps_bytes(width: int, height: int, level_idc: int = 30) -> bytes:
    """A VALID baseline-profile H.264 SPS NAL for the given coded
    dimensions (crop fields express non-multiples-of-16; 4:2:0 crop
    units need even dims), with emulation-prevention bytes inserted."""
    if width % 2 or height % 2:
        raise ValueError("SPS writer needs even dimensions")
    w_mbs = (width + 15) // 16
    h_units = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // 2
    crop_b = (h_units * 16 - height) // 2
    g = _SpsWriter()
    g.u(66, 8)  # profile_idc: baseline (no chroma/scaling fields)
    g.u(0, 8)   # constraint flags + reserved
    g.u(level_idc, 8)
    g.ue(0)     # seq_parameter_set_id
    g.ue(0)     # log2_max_frame_num_minus4
    g.ue(0)     # pic_order_cnt_type -> log2_max_poc_lsb follows
    g.ue(0)
    g.ue(1)     # max_num_ref_frames
    g.u(0, 1)   # gaps_in_frame_num_value_allowed
    g.ue(w_mbs - 1)
    g.ue(h_units - 1)
    g.u(1, 1)   # frame_mbs_only
    g.u(1, 1)   # direct_8x8_inference
    if crop_r or crop_b:
        g.u(1, 1)
        g.ue(0)
        g.ue(crop_r)
        g.ue(0)
        g.ue(crop_b)
    else:
        g.u(0, 1)
    g.u(0, 1)   # vui_parameters_present
    g.u(1, 1)   # rbsp_stop_one_bit
    if g.nbits:
        g.u(0, 8 - g.nbits)
    # emulation prevention: 00 00 0x (x<=3) -> 00 00 03 0x
    rbsp = bytes(g.buf)
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return b"\x67" + bytes(out)


def avcc_bytes(sps: bytes) -> bytes:
    """An AVCDecoderConfigurationRecord wrapping one SPS + a minimal
    PPS (ISO 14496-15 §5.3.3.1)."""
    pps = b"\x68\xce\x38\x80"
    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps))
        + sps
        + bytes([1])
        + struct.pack(">H", len(pps))
        + pps
    )


def mp4_bytes(
    duration_units: int,
    timescale: int = 1000,
    width: int = 640,
    height: int = 360,
    n_samples: int = 0,
    video_codec: bytes = b"avc1",
    audio: bool = False,
    version1: bool = False,
    avcc_dims: tuple | None = None,
    seed: int = 0,
) -> bytes:
    """Serialize a VALID minimal ISO BMFF movie (ftyp + moov with one
    video track, optional audio track, + an mdat of deterministic
    filler — never decoded; see module docstring). ``avcc_dims=(w,h)``
    emits a real VisualSampleEntry carrying an avcC with a real SPS at
    those coded dimensions (the :func:`_sps_dims` test surface)."""
    ver = 1 if version1 else 0
    tfmt = ">IQ" if version1 else ">II"
    pad = (16 if version1 else 8)

    def times(dur):
        if version1:
            return bytes(pad) + struct.pack(">IQ", timescale, dur)
        return bytes(pad) + struct.pack(">II", timescale, dur)

    mvhd = _full(
        b"mvhd",
        ver,
        times(duration_units)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + bytes(10)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 3),  # next track id
    )
    del tfmt

    def trak(handler: bytes, codec: bytes, w: int, h: int, samples: int):
        # tkhd v0: ctime(4) mtime(4) id(4) rsvd(4) duration(4);
        # v1: 8/8/4/4/8 — then rsvd(8) layer/altgroup/volume/rsvd(2x4)
        # matrix(36) width(4) height(4), dimensions 16.16 fixed
        if version1:
            head = (
                bytes(16)
                + struct.pack(">I", 1)
                + bytes(4)
                + struct.pack(">Q", duration_units)
            )
        else:
            head = (
                bytes(8)
                + struct.pack(">I", 1)
                + bytes(4)
                + struct.pack(">I", duration_units)
            )
        tkhd = _full(
            b"tkhd",
            ver,
            head
            + bytes(8)  # reserved
            + struct.pack(">HHHH", 0, 0, 0 if handler == b"vide" else 0x0100, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _full(b"mdhd", ver, times(duration_units) + struct.pack(">HH", 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, bytes(4) + handler + bytes(12) + b"\x00")
        stts_entries = (
            struct.pack(">III", 1, samples, 1) if samples else struct.pack(">I", 0)
        )
        stts = _full(b"stts", 0, stts_entries)
        if handler == b"vide" and avcc_dims is not None:
            cw, ch = avcc_dims
            vse = (
                bytes(6)
                + struct.pack(">H", 1)  # data_reference_index
                + bytes(16)
                + struct.pack(">HH", cw, ch)
                + struct.pack(">II", 0x00480000, 0x00480000)
                + bytes(4)
                + struct.pack(">H", 1)  # frame_count
                + bytes(32)  # compressorname
                + struct.pack(">Hh", 24, -1)
            )
            entry = _box(codec, vse + _box(b"avcC", avcc_bytes(sps_bytes(cw, ch))))
        else:
            entry = _box(codec, bytes(70))  # opaque sample entry body
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd + stts)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    body = mvhd + trak(b"vide", video_codec, width, height, n_samples)
    if audio:
        body += trak(b"soun", b"mp4a", 0, 0, 0)
    moov = _box(b"moov", body)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", bytes((seed + i) % 251 for i in range(64)))
    return ftyp + moov + mdat


def synth_mp4_media(spark, n_rows: int = 40, seed: int = 42):
    """Deterministic REAL-MP4 table with closed-form ground truth:
    duration_ms = round((500 + id*37) * 1000 / timescale) where
    timescale = 600 + (id%3)*400; width/height/samples/tracks are
    simple id functions — all SQL-expressible."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        return mp4_bytes(
            duration_units=500 + i * 37,
            timescale=600 + (i % 3) * 400,
            width=320 + (i % 4) * 160,
            height=180 + (i % 4) * 90,
            n_samples=24 + i % 7,
            video_codec=b"avc1" if i % 2 == 0 else b"hvc1",
            audio=i % 3 == 0,
            version1=i % 5 == 0,
            seed=seed + i,
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


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

_INFO_SCHEMA = (
    "media_id long, container string, brand string, duration_ms long, "
    "n_tracks long, has_video boolean, has_audio boolean, "
    "video_codec string, audio_codec string, width long, height long, "
    "coded_width long, coded_height long, n_samples long, clean boolean"
)

_COLS = (
    "container", "brand", "duration_ms", "n_tracks", "has_video",
    "has_audio", "video_codec", "audio_codec", "width", "height",
    "coded_width", "coded_height", "n_samples", "clean",
)


def video_stream_info(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
):
    """Container metadata for video payloads — REAL for ISO BMFF
    (MP4/MOV box tree) and RIFF/AVI (avih header). Map-only Arrow
    batches; duration/resolution/codec are the pre-decode curation
    gates. ``on_error="skip"`` drops undecodable payloads."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
    )

    _check_on_error(on_error)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            rows = {k: [] for k in ("media_id",) + _COLS}
            for i, p in zip(ids, payloads):
                try:
                    if p and p[:4] == b"RIFF":
                        info = _malformed_as_valueerror(
                            _avi_stream_info, p, "AVI"
                        )
                    elif p and p[:4] == b"\x1aE\xdf\xa3":
                        from tl_spark.operators.ebml import mkv_stream_info

                        mi = _malformed_as_valueerror(
                            mkv_stream_info, p, "Matroska"
                        )
                        info = {
                            "container": mi["container"],
                            "brand": "",
                            "duration_ms": mi["duration_ms"],
                            "n_tracks": mi["n_tracks"],
                            "has_video": mi["has_video"],
                            "has_audio": mi["has_audio"],
                            "video_codec": mi["video_codec"],
                            "audio_codec": mi["audio_codec"],
                            "width": mi["width"],
                            "height": mi["height"],
                            "coded_width": 0,
                            "coded_height": 0,
                            "n_samples": 0,
                            "clean": True,
                        }
                    else:
                        info = _malformed_as_valueerror(
                            mp4_stream_info, p, "MP4"
                        )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                rows["media_id"].append(i)
                for k in _COLS:
                    rows[k].append(info[k])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows["media_id"], type=pa.int64()),
                    pa.array(rows["container"], type=pa.string()),
                    pa.array(rows["brand"], type=pa.string()),
                    pa.array(rows["duration_ms"], type=pa.int64()),
                    pa.array(rows["n_tracks"], type=pa.int64()),
                    pa.array(rows["has_video"], type=pa.bool_()),
                    pa.array(rows["has_audio"], type=pa.bool_()),
                    pa.array(rows["video_codec"], type=pa.string()),
                    pa.array(rows["audio_codec"], type=pa.string()),
                    pa.array(rows["width"], type=pa.int64()),
                    pa.array(rows["height"], type=pa.int64()),
                    pa.array(rows["coded_width"], type=pa.int64()),
                    pa.array(rows["coded_height"], type=pa.int64()),
                    pa.array(rows["n_samples"], type=pa.int64()),
                    pa.array(rows["clean"], type=pa.bool_()),
                ],
                names=["media_id"] + list(_COLS),
            )

    return df.select(id_col, payload_col).mapInArrow(fn, _INFO_SCHEMA)
