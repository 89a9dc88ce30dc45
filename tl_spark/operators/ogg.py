"""Ogg container layer: REAL page walk + codec identification headers
(RFC 3533 framing; Vorbis I / Opus (RFC 7845) ident headers).

- REAL: page framing (capture pattern, lacing/segment tables,
  continuation flags, BOS/EOS), per-page CRC-32 verification (the Ogg
  polynomial 0x04C11DB7, init 0, no reflection — distinct from zlib's
  reflected CRC-32, so hashlib/zlib can't be reused and the table is
  derived from the polynomial here), the first packet's codec ident
  (Vorbis: channels/rate/nominal bitrate; Opus: channels/pre-skip/
  input rate), and exact duration from the final granule position
  (Vorbis granules count PCM samples at the stream rate; Opus
  granules count 48 kHz samples minus pre-skip, per RFC 7845 §4).
- STUB: sample decode for both codecs stays an honest
  NotImplementedError elsewhere (multimodal.py posture) — Vorbis
  floor/residue codebooks and Opus's SILK/CELT are exactly the
  table-bound codec class this container can't verify a re-typing of.

Reference parity note: no audio surface in the reference; this is
LLM-training-data pipeline scope (SURVEY.md §6)."""

from __future__ import annotations

import struct

__all__ = ["ogg_stream_info", "ogg_bytes", "synth_ogg_media"]


def _make_ogg_crc_table() -> list[int]:
    t = []
    for b in range(256):
        c = b << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if c & 0x80000000 else (c << 1) & 0xFFFFFFFF
        t.append(c)
    return t


_CRC = _make_ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ _CRC[((c >> 24) ^ b) & 0xFF]
    return c


def _parse_page(payload: bytes, pos: int) -> dict:
    """One Ogg page at ``pos`` (must be byte-exact; raises ValueError)."""
    if payload[pos : pos + 4] != b"OggS":
        raise ValueError("bad Ogg capture pattern")
    if pos + 27 > len(payload):
        raise ValueError("truncated Ogg page header")
    version = payload[pos + 4]
    if version != 0:
        raise ValueError(f"unsupported Ogg version {version}")
    htype = payload[pos + 5]
    (granule,) = struct.unpack_from("<q", payload, pos + 6)
    (serial, seq, crc) = struct.unpack_from("<III", payload, pos + 14)
    nsegs = payload[pos + 26]
    table = payload[pos + 27 : pos + 27 + nsegs]
    if len(table) != nsegs:
        raise ValueError("truncated Ogg segment table")
    body_len = sum(table)
    body_start = pos + 27 + nsegs
    body = payload[body_start : body_start + body_len]
    if len(body) != body_len:
        raise ValueError("truncated Ogg page body")
    page_end = body_start + body_len
    # CRC is computed over the whole page with the CRC field zeroed
    check = bytearray(payload[pos:page_end])
    check[22:26] = b"\x00\x00\x00\x00"
    if _ogg_crc(bytes(check)) != crc:
        raise ValueError("Ogg page CRC mismatch")
    return {
        "htype": htype,
        "granule": granule,
        "serial": serial,
        "seq": seq,
        "body": body,
        "end": page_end,
        "table": table,
    }


def ogg_stream_info(payload: bytes) -> dict:
    """Walk all pages of the FIRST logical stream (its BOS serial),
    verify every page CRC, identify the codec from the first packet,
    and compute the exact duration from the final granule position.
    Raises ValueError for malformed payloads."""
    payload = bytes(payload)
    if payload[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    first = _parse_page(payload, 0)
    if not first["htype"] & 0x02:
        raise ValueError("first Ogg page is not BOS")
    serial = first["serial"]
    ident = first["body"]
    if ident[:7] == b"\x01vorbis":
        if len(ident) < 30:
            raise ValueError("truncated Vorbis ident header")
        (version,) = struct.unpack_from("<I", ident, 7)
        if version != 0:
            raise ValueError("unsupported Vorbis version")
        channels = ident[11]
        (rate,) = struct.unpack_from("<I", ident, 12)
        (br_max, br_nom, br_min) = struct.unpack_from("<iii", ident, 16)
        codec = "vorbis"
        gran_rate = rate
        pre_skip = 0
        nominal_kbps = round(br_nom / 1000) if br_nom > 0 else 0
    elif ident[:8] == b"OpusHead":
        if len(ident) < 19:
            raise ValueError("truncated Opus ident header")
        channels = ident[9]
        (pre_skip,) = struct.unpack_from("<H", ident, 10)
        (rate,) = struct.unpack_from("<I", ident, 12)
        codec = "opus"
        gran_rate = 48000  # Opus granules are always 48 kHz (RFC 7845)
        nominal_kbps = 0
    elif ident[:5] == b"\x7fFLAC":
        codec = "flac"
        channels = rate = 0
        gran_rate = pre_skip = nominal_kbps = 0
    else:
        raise ValueError("unrecognized Ogg codec ident")
    if channels == 0 and codec != "flac":
        raise ValueError("zero channels in Ogg ident header")
    if rate == 0 and codec == "vorbis":
        raise ValueError("zero sample rate in Vorbis ident header")
    pos = first["end"]
    last_granule = first["granule"]
    n_pages = 1
    saw_eos = False
    clean = True
    while pos < len(payload):
        page = _parse_page(payload, pos)
        if page["serial"] == serial:
            n_pages += 1
            if page["granule"] >= 0:
                last_granule = page["granule"]
            if page["htype"] & 0x04:
                saw_eos = True
                # multiplexed trailing streams may follow; we only
                # track the first logical stream
        pos = page["end"]
        if n_pages > 1_000_000:
            raise ValueError("Ogg page bomb")
    if not saw_eos:
        clean = False
    if codec == "opus":
        n_samples = max(0, last_granule - pre_skip)
        sr_out = rate  # the ORIGINAL input rate, informational
        duration_ms = round(n_samples * 1000 / 48000)
    elif codec == "vorbis":
        n_samples = max(0, last_granule)
        sr_out = rate
        duration_ms = round(n_samples * 1000 / gran_rate)
    else:  # flac-in-ogg: granule counts samples; rate unknown here
        n_samples = max(0, last_granule)
        sr_out = 0
        duration_ms = 0
    return {
        "container": "ogg",
        "codec": codec,
        "sample_rate": sr_out,
        "channels": channels,
        "n_samples": n_samples,
        "n_pages": n_pages,
        "duration_ms": duration_ms,
        "bitrate_kbps": nominal_kbps,
        "clean": clean,
    }


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def _page(
    serial: int, seq: int, granule: int, packets: list[bytes], htype: int
) -> bytes:
    table = bytearray()
    body = bytearray()
    for pk in packets:
        n = len(pk)
        while True:
            seg = min(n, 255)
            table.append(seg)
            n -= seg
            if seg < 255:
                break
            if n == 0:
                table.append(0)
                break
        body += pk
    if len(table) > 255:
        raise ValueError("too many segments for one page")
    head = b"OggS" + bytes([0, htype]) + struct.pack(
        "<qIII", granule, serial, seq, 0
    ) + bytes([len(table)]) + bytes(table)
    page = bytearray(head + body)
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def ogg_bytes(
    codec: str,
    n_samples: int,
    sample_rate: int = 48000,
    channels: int = 2,
    n_data_pages: int = 4,
    pre_skip: int = 312,
    nominal_bps: int = 96000,
    serial: int = 0x5F1A9,
    seed: int = 0,
) -> bytes:
    """Serialize a VALID Ogg stream (real framing, real CRCs, real
    ident header, correct granule progression); packet payload bytes
    are deterministic filler — never decoded (honest-stub posture)."""
    pages = []
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", sample_rate)
            + struct.pack("<iii", -1, nominal_bps, -1)
            + bytes([0xB8])  # blocksizes 2^8 / 2^11
            + b"\x01"
        )
        final_granule = n_samples
    elif codec == "opus":
        ident = (
            b"OpusHead"
            + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + struct.pack("<h", 0)
            + bytes([0])
        )
        final_granule = n_samples + pre_skip  # granules are 48 kHz
    else:
        raise ValueError(f"unsupported writer codec {codec!r}")
    pages.append(_page(serial, 0, 0, [ident], 0x02))  # BOS, granule 0
    step = final_granule // n_data_pages if n_data_pages else 0
    for k in range(n_data_pages):
        gran = final_granule if k == n_data_pages - 1 else (k + 1) * step
        body = bytes((seed * 13 + k * 7 + i) % 249 for i in range(60 + k * 17))
        htype = 0x04 if k == n_data_pages - 1 else 0x00  # EOS on last
        pages.append(_page(serial, k + 1, gran, [body], htype))
    return b"".join(pages)


def synth_ogg_media(spark, n_rows: int = 30, seed: int = 9):
    """Deterministic REAL-Ogg table keyed by id — closed-form oracle:
    even ids are Vorbis (duration = n*1000/sr), odd ids are Opus
    (granule-rate 48 kHz, pre-skip 312); n = 9600 + id%7*480."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        n = 9600 + (i % 7) * 480
        if i % 2 == 0:
            return ogg_bytes(
                "vorbis",
                n,
                sample_rate=(48000, 44100, 32000)[i % 3],
                channels=1 + i % 2 + (i % 3 == 0),
                seed=seed + i,
            )
        return ogg_bytes(
            "opus", n, sample_rate=48000, channels=1 + i % 3, seed=seed + i
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
