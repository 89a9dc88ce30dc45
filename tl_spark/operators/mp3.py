"""MPEG audio (MP3) frame layer: REAL container/frame parsing.

What is real here — and what stays an honest stub:

- REAL: the MPEG-1/2/2.5 Layer I/II/III frame-header layer (ISO 11172-3
  / 13818-3 §2.4.1.3): sync scan, version/layer/bitrate/sample-rate
  tables, frame-length arithmetic (4-byte slots for Layer I, 1-byte
  otherwise), ID3v2 (syncsafe size + footer flag) and ID3v1 envelopes,
  and the Xing/Info VBR frame-count header. From these a full frame
  walk recovers the metadata a 100-TB curation pipeline actually
  filters on: exact duration, frame count, mean bitrate, VBR-ness,
  sample rate, channels. All of it is closed-form over the header
  tables, so the synthetic generator's ground truth is SQL-expressible
  and the suite pins the walk against an exact DuckDB oracle.
- STUB: Layer III SAMPLE decode (requantization + Huffman + IMDCT +
  polyphase synthesis). The spec's Huffman tables, scalefactor-band
  tables and the synthesis window are large tabulated constants; this
  environment has no codec to check a re-typed table against, and a
  silently wrong table would emit plausible-but-wrong audio — worse
  than failing fast. ``audio_features``/``audio_spectral_features``
  therefore still raise NotImplementedError for MP3 payloads
  (multimodal.py's documented honest-codec-stub contract), while
  :func:`audio_stream_info` gives the real metadata path.

Reference parity note: the reference engine (an HTML parsing library)
has no audio surface at all — this module is part of the
LLM-training-data pipeline scope (SURVEY.md §6), not reference parity.
"""

from __future__ import annotations

import struct
from typing import Iterator

__all__ = [
    "mp3_stream_info",
    "mp3_frame_bytes",
    "synth_mp3_media",
    "audio_stream_info",
]

# bitrate tables in kbps, index 1..14 (0 = "free format", 15 = bad)
_BR_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_BR_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384]
_BR_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BR_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256]
_BR_V2_L23 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

# sample-rate tables by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_SR_V1 = [44100, 48000, 32000]
_SR_V2 = [22050, 24000, 16000]
_SR_V25 = [11025, 12000, 8000]


def _header_fields(h: int):
    """Decode one 32-bit frame header. Returns None for anything a
    strict walker rejects (bad sync, reserved version/layer, bad
    bitrate/sample-rate index, free-format bitrate)."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 3  # 0=reserved, 1=III, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3  # 0 stereo, 1 joint, 2 dual, 3 mono
    layer = 4 - layer_bits  # 1, 2, 3
    if ver_bits == 3:
        sr = _SR_V1[sr_idx]
        br = (_BR_V1_L1, _BR_V1_L2, _BR_V1_L3)[layer - 1][br_idx]
        spf = (384, 1152, 1152)[layer - 1]
        version = 1.0
    else:
        sr = (_SR_V25 if ver_bits == 0 else _SR_V2)[sr_idx]
        br = (_BR_V2_L1, _BR_V2_L23, _BR_V2_L23)[layer - 1][br_idx]
        spf = (384, 1152, 576)[layer - 1]
        version = 2.5 if ver_bits == 0 else 2.0
    if layer == 1:
        flen = (12000 * br // sr + padding) * 4
    else:
        flen = spf // 8 * 1000 * br // sr + padding
    if flen <= 4:
        return None
    return {
        "version": version,
        "layer": layer,
        "bitrate_kbps": br,
        "sample_rate": sr,
        "samples_per_frame": spf,
        "frame_len": flen,
        "channels": 1 if mode == 3 else 2,
        "mode": mode,
        "crc": ((h >> 16) & 1) == 0,  # protection bit 0 = CRC present
    }


def _skip_id3v2(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe size + header,
    + footer when flagged), else 0."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        return 0
    flags = payload[5]
    size = 0
    for b in payload[6:10]:
        if b & 0x80:
            return 0  # not syncsafe: treat as no tag
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


def _xing_frames(payload: bytes, start: int, f: dict) -> int | None:
    """Frame count from a Xing/Info (or VBRI) header in the frame at
    ``start``, or None."""
    if f["version"] == 1.0:
        off = 17 if f["channels"] == 1 else 32
    else:
        off = 9 if f["channels"] == 1 else 17
    p = start + 4 + off
    if payload[p : p + 4] in (b"Xing", b"Info"):
        flags_at = p + 4
        if len(payload) >= flags_at + 8:
            (flags,) = struct.unpack_from(">I", payload, flags_at)
            if flags & 0x1:
                (n,) = struct.unpack_from(">I", payload, flags_at + 4)
                return n
        return None
    q = start + 4 + 32
    if payload[q : q + 4] == b"VBRI" and len(payload) >= q + 18:
        (n,) = struct.unpack_from(">I", payload, q + 14)
        return n
    return None


def mp3_stream_info(payload: bytes, max_scan: int = 65536) -> dict:
    """Walk the frame chain of an MPEG audio payload and return its
    container metadata. Raises ValueError when no valid frame chain is
    found (the kernel-wide malformed-input contract).

    Fields: version, layer, sample_rate, channels, n_frames,
    duration_ms (exact: sum of samples/rate over parsed frames; the
    Xing/Info frame count wins for VBR files whose chain we fully
    trust), bitrate_kbps (mean over parsed frames, rounded), vbr,
    clean (False when the walk stopped before the end of the data).
    """
    if not isinstance(payload, (bytes, bytearray)):
        raise ValueError("not an MPEG audio payload")
    payload = bytes(payload)
    pos = _skip_id3v2(payload)
    end = len(payload)
    # ID3v1 trailer: fixed 128-byte "TAG" block
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    # find the first valid header within max_scan bytes
    first = None
    scan_end = min(end - 4, pos + max_scan)
    p = pos
    while p <= scan_end:
        q = payload.find(b"\xff", p, scan_end + 1)
        if q < 0:
            break
        if q + 4 <= end:
            (h,) = struct.unpack_from(">I", payload, q)
            f = _header_fields(h)
            # demand a SECOND consistent frame (or exact EOF) so a
            # stray 0xFFEx inside junk can't fake a stream
            if f is not None:
                nxt = q + f["frame_len"]
                ok = nxt == end or nxt + 4 <= end and (
                    _header_fields(struct.unpack_from(">I", payload, nxt)[0])
                    is not None
                )
                if ok:
                    first = (q, f)
                    break
        p = q + 1
    if first is None:
        raise ValueError("no MPEG audio frame chain found")
    start, f0 = first
    xing = _xing_frames(payload, start, f0)
    n_frames = 0
    samples = 0
    br_sum = 0
    br_set: set[int] = set()
    sr = f0["sample_rate"]
    pos = start
    clean = True
    while pos + 4 <= end:
        (h,) = struct.unpack_from(">I", payload, pos)
        f = _header_fields(h)
        if f is None or f["sample_rate"] != sr or f["version"] != f0["version"]:
            clean = False
            break
        if pos + f["frame_len"] > end:
            clean = False  # truncated final frame
            break
        n_frames += 1
        samples += f["samples_per_frame"]
        br_sum += f["bitrate_kbps"]
        br_set.add(f["bitrate_kbps"])
        pos += f["frame_len"]
        if n_frames > 4_000_000:
            clean = False  # bomb guard: ~31 h of audio
            break
    if pos != end:
        clean = False
    if n_frames == 0:
        raise ValueError("no MPEG audio frame chain found")
    # the Xing/Info count is authoritative when the walk was clean and
    # the counts disagree (some writers pad the last frame); an
    # obviously-wrong count (> walked frames on a clean walk) is kept
    # only when the walk was dirty
    eff_frames = n_frames
    if xing is not None and not clean and xing > 0:
        eff_frames = xing
    duration_ms = round(
        eff_frames * f0["samples_per_frame"] * 1000 / sr
    )
    return {
        "container": "mp3",
        "version": f0["version"],
        "layer": f0["layer"],
        "sample_rate": sr,
        "channels": f0["channels"],
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "bitrate_kbps": round(br_sum / n_frames),
        "vbr": len(br_set) > 1,
        "clean": clean,
    }


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------

_BR_IDX_V1_L3 = {br: i for i, br in enumerate(_BR_V1_L3)}
_SR_IDX_V1 = {sr: i for i, sr in enumerate(_SR_V1)}


def mp3_frame_bytes(
    n_frames: int,
    bitrates: list[int] | int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    seed: int = 0,
    id3v2_size: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Serialize a VALID MPEG-1 Layer III frame chain (headers exact,
    payload bytes deterministic filler — never decoded; see module
    docstring). ``bitrates`` may be a list cycled per-frame (VBR)."""
    if sample_rate not in _SR_IDX_V1:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    brs = bitrates if isinstance(bitrates, list) else [bitrates]
    out = bytearray()
    if id3v2_size:
        body = bytes((seed + i) % 251 for i in range(id3v2_size))
        out += b"ID3\x04\x00\x00"
        s = id3v2_size
        out += bytes(
            [(s >> 21) & 0x7F, (s >> 14) & 0x7F, (s >> 7) & 0x7F, s & 0x7F]
        )
        out += body
    for k in range(n_frames):
        br = brs[k % len(brs)]
        bi = _BR_IDX_V1_L3.get(br)
        if not bi:
            raise ValueError(f"unsupported Layer III bitrate {br}")
        si = _SR_IDX_V1[sample_rate]
        mode = 3 if channels == 1 else 0
        h = (
            (0x7FF << 21)
            | (3 << 19)  # MPEG-1
            | (1 << 17)  # Layer III
            | (1 << 16)  # no CRC
            | (bi << 12)
            | (si << 10)
            | (0 << 9)  # no padding (length stays closed-form)
            | (mode << 6)
        )
        flen = 144000 * br // sample_rate
        body_len = flen - 4
        body = bytes((seed * 31 + k * 7 + i) % 253 for i in range(body_len))
        out += h.to_bytes(4, "big") + body
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def synth_mp3_media(spark, n_rows: int = 40, seed: int = 42):
    """Deterministic REAL-MP3 table: id picks frame count, bitrate mix
    (every 3rd id is VBR), sample rate, channels and envelopes, so
    :func:`audio_stream_info` has an exactly SQL-expressible oracle:
    frames = 20 + id%11, duration_ms = round(frames*1152*1000/sr)."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        frames = 20 + i % 11
        sr = (44100, 48000, 32000)[i % 3]
        brs = [64, 128, 192] if i % 3 == 0 else [128]
        return mp3_frame_bytes(
            frames,
            bitrates=brs,
            sample_rate=sr,
            channels=1 if i % 2 else 2,
            seed=seed + i,
            id3v2_size=(i % 4) * 37,
            id3v1=i % 5 == 0,
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
    "media_id long, container string, duration_ms long, sample_rate long, "
    "channels long, bitrate_kbps long, n_frames long, vbr boolean, "
    "clean boolean"
)


def audio_stream_info(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> "DataFrame":  # noqa: F821 - DataFrame for doc purposes
    """Container metadata for audio payloads — REAL for RIFF/WAV
    (PCM16 / G.711 / IMA ADPCM, via the multimodal WAV decoder) and
    MPEG audio (frame walk; samples never decoded). Map-only Arrow
    batches; the duration gate is the #1 audio curation filter at
    corpus scale. ``on_error="skip"`` drops undecodable payloads."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
        _parse_wav,
    )

    _check_on_error(on_error)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            rows = {
                k: []
                for k in (
                    "media_id",
                    "container",
                    "duration_ms",
                    "sample_rate",
                    "channels",
                    "bitrate_kbps",
                    "n_frames",
                    "vbr",
                    "clean",
                )
            }
            for i, p in zip(ids, payloads):
                try:
                    if p and p[:4] == b"RIFF":
                        samples, rate = _malformed_as_valueerror(
                            _parse_wav, p, "WAV"
                        )
                        n = len(samples)
                        info = {
                            "container": "wav",
                            "duration_ms": round(n * 1000 / rate) if rate else 0,
                            "sample_rate": rate,
                            "channels": samples.shape[1] if n else 0,
                            "bitrate_kbps": round(
                                rate * samples.shape[1] * 16 / 1000
                            )
                            if n
                            else 0,
                            "n_frames": n,
                            "vbr": False,
                            "clean": True,
                        }
                    elif p and p[:4] == b"fLaC":
                        from tl_spark.operators.flac import flac_stream_info

                        fi = _malformed_as_valueerror(
                            flac_stream_info, p, "FLAC"
                        )
                        n, sr = fi["n_samples"], fi["sample_rate"]
                        info = {
                            "container": "flac",
                            "duration_ms": fi["duration_ms"],
                            "sample_rate": sr,
                            "channels": fi["channels"],
                            # real mean stream bitrate (not SQL-closed-
                            # form: depends on compressed size)
                            "bitrate_kbps": round(
                                len(p) * 8 * sr / (n * 1000)
                            )
                            if n
                            else 0,
                            "n_frames": n,
                            # lossless: the CBR/VBR distinction doesn't
                            # apply; report False like WAV
                            "vbr": False,
                            "clean": True,
                        }
                    elif p and p[:4] == b"OggS":
                        from tl_spark.operators.ogg import ogg_stream_info

                        oi = _malformed_as_valueerror(
                            ogg_stream_info, p, "Ogg"
                        )
                        info = {
                            "container": "ogg",
                            "duration_ms": oi["duration_ms"],
                            "sample_rate": oi["sample_rate"],
                            "channels": oi["channels"],
                            "bitrate_kbps": oi["bitrate_kbps"],
                            "n_frames": oi["n_samples"],
                            "vbr": False,
                            "clean": oi["clean"],
                        }
                    elif (
                        p
                        and len(p) >= (_o := _skip_id3v2(bytes(p))) + 2
                        and p[_o] == 0xFF
                        and p[_o + 1] & 0xF0 == 0xF0
                        and p[_o + 1] & 0x06 == 0
                    ):
                        # ADTS sync (possibly ID3v2-wrapped) with layer
                        # bits 00 (reserved in MP1/2/3): AAC, not MP3
                        from tl_spark.operators.aac import aac_stream_info

                        info = _malformed_as_valueerror(
                            aac_stream_info, p, "ADTS"
                        )
                    else:
                        info = _malformed_as_valueerror(
                            mp3_stream_info, p, "MPEG audio"
                        )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                rows["media_id"].append(i)
                for k in (
                    "container",
                    "duration_ms",
                    "sample_rate",
                    "channels",
                    "bitrate_kbps",
                    "n_frames",
                    "vbr",
                    "clean",
                ):
                    rows[k].append(info[k])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(rows["media_id"], type=pa.int64()),
                    pa.array(rows["container"], type=pa.string()),
                    pa.array(rows["duration_ms"], type=pa.int64()),
                    pa.array(rows["sample_rate"], type=pa.int64()),
                    pa.array(rows["channels"], type=pa.int64()),
                    pa.array(rows["bitrate_kbps"], type=pa.int64()),
                    pa.array(rows["n_frames"], type=pa.int64()),
                    pa.array(rows["vbr"], type=pa.bool_()),
                    pa.array(rows["clean"], type=pa.bool_()),
                ],
                names=list(rows.keys()),
            )

    return df.select(id_col, payload_col).mapInArrow(fn, _INFO_SCHEMA)
