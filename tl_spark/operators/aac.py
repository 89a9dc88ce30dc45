"""AAC/ADTS frame layer: REAL container/frame parsing (ISO 14496-3
§1.A ADTS / 13818-7), the same real-metadata/honest-stub split as the
MP3 layer (operators/mp3.py):

- REAL: the ADTS frame walk — sync scan with a mandatory consistent
  SECOND frame, fixed+variable header fields (MPEG version bit, audio
  object profile, sampling-frequency index, channel configuration,
  13-bit frame length, raw-data-block count, optional CRC), exact
  duration (1024 samples per raw data block), mean bitrate, VBR-ness.
  All closed-form over the header fields, so the synthetic writer's
  ground truth is SQL-expressible and the suite pins the walk against
  an exact DuckDB oracle.
- STUB: AAC sample decode (Huffman codebooks, scalefactors, TNS, the
  MDCT window tables) stays an honest NotImplementedError for exactly
  the reason MP3 Layer III does — large tabulated constants with no
  reference codec in this container to check a re-typing against.

Reference parity note: the reference engine (an HTML parsing library)
has no audio surface; this is LLM-training-data pipeline scope
(SURVEY.md §6)."""

from __future__ import annotations

import struct

__all__ = ["aac_stream_info", "aac_adts_bytes", "synth_aac_media"]

# sampling_frequency_index (ISO 14496-3 table 1.18); 13-15 invalid in ADTS
_SF_TABLE = [
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
]
_SF_INDEX = {sr: i for i, sr in enumerate(_SF_TABLE)}
_PROFILES = ("main", "lc", "ssr", "ltp")


def _adts_header(payload: bytes, pos: int) -> dict | None:
    """Decode one ADTS header at ``pos``; None when it isn't one."""
    if pos + 7 > len(payload):
        return None
    b = payload[pos : pos + 7]
    if b[0] != 0xFF or b[1] & 0xF0 != 0xF0:
        return None
    if b[1] & 0x06 != 0:  # layer must be 00
        return None
    mpeg2 = (b[1] >> 3) & 1
    protection_absent = b[1] & 1
    profile = (b[2] >> 6) & 3
    sf_idx = (b[2] >> 2) & 0xF
    if sf_idx >= len(_SF_TABLE):
        return None
    channel_cfg = ((b[2] & 1) << 2) | ((b[3] >> 6) & 3)
    frame_len = ((b[3] & 3) << 11) | (b[4] << 3) | ((b[5] >> 5) & 7)
    n_blocks = (b[6] & 3) + 1
    header_len = 7 if protection_absent else 9
    if frame_len < header_len:
        return None
    return {
        "mpeg_version": 2 if mpeg2 else 4,
        "profile": _PROFILES[profile],
        "sample_rate": _SF_TABLE[sf_idx],
        "channels": channel_cfg,  # 0 = carried in-band (PCE); 1-7 direct
        "frame_len": frame_len,
        "n_blocks": n_blocks,
        "crc": not protection_absent,
    }


def aac_stream_info(payload: bytes, max_scan: int = 65536) -> dict:
    """Walk an ADTS frame chain and return container metadata: exact
    duration (n_blocks x 1024 samples per frame), frame count, mean
    bitrate, profile, VBR-ness, clean flag. Raises ValueError when no
    consistent chain is found (the kernel-wide malformed-input
    contract)."""
    if not isinstance(payload, (bytes, bytearray)):
        raise ValueError("not an ADTS payload")
    payload = bytes(payload)
    from tl_spark.operators.mp3 import _skip_id3v2

    start0 = _skip_id3v2(payload)  # ID3v2-wrapped ADTS occurs in the wild
    end = len(payload)
    if end - start0 >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    first = None
    scan_end = min(end - 7, start0 + max_scan)
    p = start0
    while p <= scan_end:
        q = payload.find(b"\xff", p, scan_end + 1)
        if q < 0:
            break
        f = _adts_header(payload, q)
        if f is not None:
            nxt = q + f["frame_len"]
            # demand a consistent SECOND frame (or exact EOF) so a
            # stray 0xFFFx inside junk can't fake a stream
            ok = nxt == end or (
                (g := _adts_header(payload, nxt)) is not None
                and g["sample_rate"] == f["sample_rate"]
            )
            if ok:
                first = (q, f)
                break
        p = q + 1
    if first is None:
        raise ValueError("no ADTS frame chain found")
    start, f0 = first
    sr = f0["sample_rate"]
    pos = start
    n_frames = samples = byte_sum = 0
    fl_set: set[int] = set()
    clean = True
    while pos + 7 <= end:
        f = _adts_header(payload, pos)
        if (
            f is None
            or f["sample_rate"] != sr
            or f["channels"] != f0["channels"]
        ):
            clean = False
            break
        if pos + f["frame_len"] > end:
            clean = False  # truncated final frame
            break
        n_frames += 1
        samples += f["n_blocks"] * 1024
        byte_sum += f["frame_len"]
        fl_set.add(f["frame_len"])
        pos += f["frame_len"]
        if n_frames > 4_000_000:
            clean = False  # bomb guard
            break
    if pos != end:
        clean = False
    if n_frames == 0:
        raise ValueError("no ADTS frame chain found")
    duration_ms = round(samples * 1000 / sr)
    dur_s = samples / sr
    return {
        "container": "aac",
        "mpeg_version": f0["mpeg_version"],
        "profile": f0["profile"],
        "sample_rate": sr,
        "channels": f0["channels"],
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "bitrate_kbps": round(byte_sum * 8 / dur_s / 1000) if dur_s else 0,
        "vbr": len(fl_set) > 1,
        "clean": clean,
    }


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def aac_adts_bytes(
    n_frames: int,
    frame_body: int | list[int] = 200,
    sample_rate: int = 44100,
    channels: int = 2,
    profile: int = 1,
    mpeg2: bool = False,
    crc: bool = False,
    id3v2_size: int = 0,
    id3v1: bool = False,
    seed: int = 0,
) -> bytes:
    """Serialize a VALID ADTS frame chain (headers exact, payload
    bytes deterministic filler — never decoded, same posture as
    mp3_frame_bytes). ``frame_body`` is the raw-data byte count per
    frame, a list cycles per-frame (VBR-shaped)."""
    if sample_rate not in _SF_INDEX:
        raise ValueError(f"unsupported AAC sample rate {sample_rate}")
    if not 0 <= channels <= 7:
        raise ValueError("ADTS channel configuration is 0-7")
    bodies = frame_body if isinstance(frame_body, list) else [frame_body]
    out = bytearray()
    if id3v2_size:
        s = id3v2_size
        out += b"ID3\x04\x00\x00" + bytes(
            [(s >> 21) & 0x7F, (s >> 14) & 0x7F, (s >> 7) & 0x7F, s & 0x7F]
        )
        out += bytes((seed + i) % 251 for i in range(id3v2_size))
    hlen = 9 if crc else 7
    for k in range(n_frames):
        body_len = bodies[k % len(bodies)]
        flen = hlen + body_len
        if flen >= 1 << 13:
            raise ValueError("ADTS frame too long")
        sf = _SF_INDEX[sample_rate]
        b = bytearray(7)
        b[0] = 0xFF
        b[1] = 0xF0 | ((1 if mpeg2 else 0) << 3) | (0 if crc else 1)
        b[2] = (profile << 6) | (sf << 2) | ((channels >> 2) & 1)
        b[3] = ((channels & 3) << 6) | ((flen >> 11) & 3)
        b[4] = (flen >> 3) & 0xFF
        b[5] = ((flen & 7) << 5) | 0x1F  # buffer fullness high bits
        b[6] = 0xFC | 0  # fullness low | (blocks-1)=0
        out += b
        if crc:
            out += struct.pack(">H", (seed + k) & 0xFFFF)
        out += bytes((seed * 17 + k * 11 + i) % 251 for i in range(body_len))
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def synth_aac_media(spark, n_rows: int = 30, seed: int = 5):
    """Deterministic REAL-ADTS table keyed by id — closed-form oracle:
    frames = 15 + id%9, sr by id%3 (48000/44100/32000), channels
    1 + id%2, every 4th id VBR-shaped, every 5th id CRC-protected."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        return aac_adts_bytes(
            15 + i % 9,
            frame_body=[150, 260, 210] if i % 4 == 0 else 200,
            sample_rate=(48000, 44100, 32000)[i % 3],
            channels=1 + i % 2,
            crc=i % 5 == 0,
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
