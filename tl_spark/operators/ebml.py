"""EBML / Matroska / WebM container layer: REAL structural parsing of
the modern-video container family (the Matroska spec and its WebM
profile are public; EBML itself is RFC 8794).

- REAL: EBML variable-length integers (ids keep the marker bit,
  sizes strip it, all-ones = unknown size), the EBML header DocType
  (matroska / webm), Segment > Info (TimestampScale, Duration) and
  Segment > Tracks > TrackEntry trees (track type, codec id, video
  PixelWidth/PixelHeight, audio SamplingFrequency/Channels). From
  these the operator recovers what a 100-TB video curation pipeline
  filters on: container dialect, duration, per-track codec ids,
  coded dimensions, audio rate/channels.
- STUB: codec payloads inside Clusters (VP8/VP9/AV1/H.264 frames,
  Vorbis/Opus packets) are never decoded — the honest-codec posture
  (multimodal.py); Clusters are skipped structurally.

Reference parity note: no media surface in the reference; this is
LLM-training-data pipeline scope (SURVEY.md §6)."""

from __future__ import annotations

import struct

__all__ = ["mkv_stream_info", "mkv_bytes", "synth_mkv_media"]

# element ids (Matroska spec / RFC 8794); ids are written WITH the
# length-marker bit, as they appear on the wire
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQUENCY = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675

_MAX_DEPTH = 16


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos). Ids keep the marker bit (matching the wire
    constants above); sizes strip it. All-ones size -> -1 (unknown)."""
    if pos >= len(data):
        raise ValueError("EBML vint overrun")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML vint lead byte 0")
    length = 9 - b0.bit_length()  # leading zeros + 1
    if pos + length > len(data):
        raise ValueError("EBML vint overrun")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length
    value = raw & ~(1 << (7 * length))
    if value == (1 << (7 * length)) - 1:
        return -1, pos + length  # unknown size
    return value, pos + length


def _uint(body: bytes) -> int:
    if len(body) > 8:
        raise ValueError("EBML uint too wide")
    return int.from_bytes(body, "big")


def _float(body: bytes) -> float:
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    if len(body) == 0:
        return 0.0
    raise ValueError("EBML float must be 0/4/8 bytes")


def _walk(data: bytes, pos: int, end: int, depth: int = 0):
    """Yield (id, body_start, body_end) for the children of one master
    element; unknown-size masters extend to ``end``."""
    if depth > _MAX_DEPTH:
        raise ValueError("EBML nesting too deep")
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        body_end = end if size < 0 else pos + size
        if body_end > end:
            raise ValueError("EBML element overruns its parent")
        yield eid, pos, body_end
        pos = body_end


def mkv_stream_info(payload: bytes) -> dict:
    """REAL Matroska/WebM metadata: doctype, duration, track list
    (type, codec id, dims / rate+channels). Raises ValueError for
    malformed payloads (kernel-wide contract)."""
    payload = bytes(payload)
    pos = 0
    doctype = ""
    segment = None
    for eid, start, end in _walk(payload, 0, len(payload)):
        if eid == _EBML:
            for cid, cs, ce in _walk(payload, start, end, 1):
                if cid == _DOCTYPE:
                    doctype = payload[cs:ce].split(b"\x00")[0].decode(
                        "ascii", "replace"
                    )
        elif eid == _SEGMENT:
            segment = (start, end)
            break
    if segment is None:
        raise ValueError("no Matroska Segment element")
    if doctype not in ("matroska", "webm"):
        raise ValueError(f"unsupported EBML doctype {doctype!r}")
    scale = 1_000_000  # default: timestamps in ms
    duration_ticks = 0.0
    tracks: list[dict] = []
    for eid, start, end in _walk(payload, *segment, 1):
        if eid == _INFO:
            for cid, cs, ce in _walk(payload, start, end, 2):
                if cid == _TIMESTAMP_SCALE:
                    scale = _uint(payload[cs:ce])
                elif cid == _DURATION:
                    duration_ticks = _float(payload[cs:ce])
        elif eid == _TRACKS:
            for cid, cs, ce in _walk(payload, start, end, 2):
                if cid != _TRACK_ENTRY:
                    continue
                t = {
                    "type": 0, "codec_id": "", "width": 0, "height": 0,
                    "sample_rate": 0, "channels": 0,
                }
                for tid, ts, te in _walk(payload, cs, ce, 3):
                    if tid == _TRACK_TYPE:
                        t["type"] = _uint(payload[ts:te])
                    elif tid == _CODEC_ID:
                        t["codec_id"] = payload[ts:te].decode(
                            "ascii", "replace"
                        )
                    elif tid == _VIDEO:
                        for vid, vs, ve in _walk(payload, ts, te, 4):
                            if vid == _PIXEL_WIDTH:
                                t["width"] = _uint(payload[vs:ve])
                            elif vid == _PIXEL_HEIGHT:
                                t["height"] = _uint(payload[vs:ve])
                    elif tid == _AUDIO:
                        for aid, as_, ae in _walk(payload, ts, te, 4):
                            if aid == _SAMPLING_FREQUENCY:
                                t["sample_rate"] = round(
                                    _float(payload[as_:ae])
                                )
                            elif aid == _CHANNELS:
                                t["channels"] = _uint(payload[as_:ae])
                tracks.append(t)
        elif eid == _CLUSTER:
            pass  # codec payloads: honest stub, structurally skipped
    if not tracks:
        raise ValueError("Matroska stream has no tracks")
    video = next((t for t in tracks if t["type"] == 1), None)
    audio = next((t for t in tracks if t["type"] == 2), None)
    return {
        "container": doctype,
        "duration_ms": round(duration_ticks * scale / 1_000_000),
        "n_tracks": len(tracks),
        "has_video": video is not None,
        "has_audio": audio is not None,
        "video_codec": video["codec_id"] if video else "",
        "audio_codec": audio["codec_id"] if audio else "",
        "width": video["width"] if video else 0,
        "height": video["height"] if video else 0,
        "sample_rate": audio["sample_rate"] if audio else 0,
        "channels": audio["channels"] if audio else 0,
    }


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def _vint_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _vint_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return (n | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def mkv_bytes(
    doctype: str = "webm",
    duration_ms: int = 10000,
    timestamp_scale: int = 1_000_000,
    video: tuple | None = ("V_VP9", 1280, 720),
    audio: tuple | None = ("A_OPUS", 48000, 2),
    n_clusters: int = 2,
    seed: int = 0,
) -> bytes:
    """Serialize a VALID Matroska/WebM skeleton: real EBML framing,
    real Info/Tracks metadata, Cluster bodies as deterministic filler
    (never decoded — honest-stub posture)."""
    head = _el(
        _EBML,
        _el_uint(0x4286, 1)          # EBMLVersion
        + _el_uint(0x42F7, 1)        # EBMLReadVersion
        + _el_uint(0x42F2, 4)        # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)        # EBMLMaxSizeLength
        + _el(_DOCTYPE, doctype.encode())
        + _el_uint(0x4287, 4)        # DocTypeVersion
        + _el_uint(0x4285, 2),       # DocTypeReadVersion
    )
    ticks = duration_ms * 1_000_000 / timestamp_scale
    info = _el(
        _INFO,
        _el_uint(_TIMESTAMP_SCALE, timestamp_scale)
        + _el(_DURATION, struct.pack(">d", ticks)),
    )
    entries = b""
    tnum = 1
    if video is not None:
        codec, w, h = video
        entries += _el(
            _TRACK_ENTRY,
            _el_uint(_TRACK_NUMBER, tnum)
            + _el_uint(_TRACK_TYPE, 1)
            + _el(_CODEC_ID, codec.encode())
            + _el(_VIDEO, _el_uint(_PIXEL_WIDTH, w) + _el_uint(_PIXEL_HEIGHT, h)),
        )
        tnum += 1
    if audio is not None:
        codec, sr, ch = audio
        entries += _el(
            _TRACK_ENTRY,
            _el_uint(_TRACK_NUMBER, tnum)
            + _el_uint(_TRACK_TYPE, 2)
            + _el(_CODEC_ID, codec.encode())
            + _el(
                _AUDIO,
                _el(_SAMPLING_FREQUENCY, struct.pack(">f", float(sr)))
                + _el_uint(_CHANNELS, ch),
            ),
        )
    if not entries:
        raise ValueError("need at least one track")
    tracks = _el(_TRACKS, entries)
    clusters = b"".join(
        _el(
            _CLUSTER,
            _el_uint(0xE7, k * 1000)  # Timestamp
            + bytes((seed * 19 + k * 5 + i) % 247 for i in range(40 + k * 13)),
        )
        for k in range(n_clusters)
    )
    return head + _el(_SEGMENT, info + tracks + clusters)


def synth_mkv_media(spark, n_rows: int = 30, seed: int = 3):
    """Deterministic REAL-WebM/MKV table keyed by id — closed-form
    oracle: doctype webm when id%2==0 else matroska; duration_ms =
    3000 + id%11*700; video 640+id%4*320 x 360+id%4*180 (VP9/VP8 by
    id%3) except every 7th id is audio-only Opus."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        doctype = "webm" if i % 2 == 0 else "matroska"
        dur = 3000 + (i % 11) * 700
        if i % 7 == 0:
            video = None
        else:
            video = (
                ("V_VP9", "V_VP8", "V_MPEG4/ISO/AVC")[i % 3],
                640 + (i % 4) * 320,
                360 + (i % 4) * 180,
            )
        audio = ("A_OPUS", 48000, 1 + i % 2)
        return mkv_bytes(
            doctype, dur, video=video, audio=audio, seed=seed + i,
            n_clusters=1 + i % 3,
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
