"""Unified media metadata router: one map-only operator that gives
every crawl payload its typed curation metadata, dispatched by MAGIC
BYTES (crawl Content-Type headers lie; the payload does not).

- images (PNG/GIF/BMP/JPEG/TIFF/PPM): HEADER-ONLY dimensions — no
  raster decode, so a dims/aspect gate costs a few hundred bytes of
  reads per document instead of a full decode (the real decoders in
  operators/multimodal.py remain the feature-extraction path)
- audio: RIFF/WAV (real sample headers), MPEG frame walk
  (operators/mp3.py), ADTS/AAC frame walk (operators/aac.py —
  told apart from MP3 by the reserved layer bits), FLAC STREAMINFO
  (operators/flac.py), Ogg page walk with CRC verification +
  Vorbis/Opus ident headers (operators/ogg.py)
- video: ISO BMFF box tree incl. H.264-SPS coded dims
  (operators/mp4.py), RIFF/AVI avih, EBML/Matroska/WebM tree
  (operators/ebml.py)

This replaces the hash-based ``attach_media_meta`` stand-in wherever
REAL metadata is wanted: `media_stream_info` emits one uniform row
(kind, container, width, height, duration_ms, sample_rate, channels,
bitrate_kbps, n_samples, clean) per payload it recognizes, with the
standard on_error skip/raise posture for everything else.
"""

from __future__ import annotations

import struct
from typing import Iterator

__all__ = [
    "image_header_info",
    "media_payload_info",
    "media_stream_info",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _jpeg_dims(payload: bytes) -> tuple[int, int]:
    """Marker walk to the first SOF segment (C0-CF minus C4/C8/CC):
    header-only, no entropy decode."""
    n = len(payload)
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1  # fill bytes / desync: scan forward
            continue
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seg,) = struct.unpack_from(">H", payload, i + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                break
            h, w = struct.unpack_from(">HH", payload, i + 5)
            return w, h
        i += 2 + seg
    raise ValueError("no JPEG SOF header found")


def _tiff_dims(payload: bytes) -> tuple[int, int]:
    """First-IFD ImageWidth/ImageLength (tags 256/257), header-only."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF header")
    (ifd,) = struct.unpack_from(e + "I", payload, 4)
    if ifd + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (cnt,) = struct.unpack_from(e + "H", payload, ifd)
    if cnt > 4096 or ifd + 2 + cnt * 12 > len(payload):
        raise ValueError("bad TIFF IFD")
    w = h = None
    for k in range(cnt):
        at = ifd + 2 + k * 12
        tag, typ = struct.unpack_from(e + "HH", payload, at)
        if tag in (256, 257):
            if typ == 3:  # SHORT
                (v,) = struct.unpack_from(e + "H", payload, at + 8)
            else:  # LONG (or anything 4-byte-inline)
                (v,) = struct.unpack_from(e + "I", payload, at + 8)
            if tag == 256:
                w = v
            else:
                h = v
    if w is None or h is None:
        raise ValueError("TIFF IFD lacks dimensions")
    return w, h


def _ppm_dims(payload: bytes) -> tuple[int, int]:
    i, n, vals = 2, len(payload), []
    while len(vals) < 2 and i < n:
        c = payload[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            j = payload.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif ord("0") <= c <= ord("9"):
            j = i
            while j < n and ord("0") <= payload[j] <= ord("9"):
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            raise ValueError("not a P6 ppm header")
    if len(vals) < 2:
        raise ValueError("not a P6 ppm header")
    return vals[0], vals[1]


def image_header_info(payload: bytes) -> dict | None:
    """(container, width, height) from header bytes only, or None when
    the payload is not a recognized image format. Malformed payloads
    of a RECOGNIZED format raise ValueError."""
    if not payload:
        return None
    if payload[:8] == _PNG_SIG:
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG header")
        w, h = struct.unpack_from(">II", payload, 16)
        return {"container": "png", "width": w, "height": h}
    if payload[:4] == b"GIF8":
        if len(payload) < 10:
            raise ValueError("truncated GIF header")
        w, h = struct.unpack_from("<HH", payload, 6)
        return {"container": "gif", "width": w, "height": h}
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("truncated BMP header")
        w, h = struct.unpack_from("<ii", payload, 18)
        return {"container": "bmp", "width": abs(w), "height": abs(h)}
    if payload[:2] == b"\xff\xd8":
        w, h = _jpeg_dims(payload)
        return {"container": "jpeg", "width": w, "height": h}
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        w, h = _tiff_dims(payload)
        return {"container": "tiff", "width": w, "height": h}
    if payload[:2] == b"P6":
        w, h = _ppm_dims(payload)
        return {"container": "ppm", "width": w, "height": h}
    return None


_ROW_KEYS = (
    "kind", "container", "width", "height", "duration_ms",
    "sample_rate", "channels", "bitrate_kbps", "n_samples", "clean",
)


def media_payload_info(payload: bytes) -> dict:
    """Route one payload by magic bytes to its real metadata parser.
    Raises ValueError for unrecognized or malformed payloads."""
    base = {k: 0 for k in _ROW_KEYS}
    base["kind"] = base["container"] = ""
    base["clean"] = True
    img = image_header_info(payload)
    if img is not None:
        base.update(img)
        base["kind"] = "image"
        return base
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from tl_spark.operators.multimodal import _parse_wav

        samples, rate = _parse_wav(bytes(payload))
        n = len(samples)
        base.update(
            kind="audio",
            container="wav",
            duration_ms=round(n * 1000 / rate) if rate else 0,
            sample_rate=rate,
            channels=samples.shape[1] if n else 0,
            bitrate_kbps=round(rate * samples.shape[1] * 16 / 1000) if n else 0,
            n_samples=n,
        )
        return base
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from tl_spark.operators.mp4 import _avi_stream_info

        info = _avi_stream_info(bytes(payload))
        base.update(
            kind="video",
            container="avi",
            width=info["width"],
            height=info["height"],
            duration_ms=info["duration_ms"],
            n_samples=info["n_samples"],
            clean=info["clean"],
        )
        return base
    # ISO BMFF: the first box is ftyp/styp/moov in practice
    if len(payload) >= 12 and payload[4:8] in (b"ftyp", b"styp", b"moov"):
        from tl_spark.operators.mp4 import mp4_stream_info

        info = mp4_stream_info(bytes(payload))
        base.update(
            kind="video" if info["has_video"] else "audio",
            container="mp4",
            width=info["width"],
            height=info["height"],
            duration_ms=info["duration_ms"],
            n_samples=info["n_samples"],
            clean=info["clean"],
        )
        return base
    if payload[:4] == b"fLaC":
        from tl_spark.operators.flac import flac_stream_info

        fi = flac_stream_info(bytes(payload))
        n, sr = fi["n_samples"], fi["sample_rate"]
        base.update(
            kind="audio",
            container="flac",
            duration_ms=fi["duration_ms"],
            sample_rate=sr,
            channels=fi["channels"],
            bitrate_kbps=round(len(payload) * 8 * sr / (n * 1000)) if n else 0,
            n_samples=n,
        )
        return base
    if payload[:4] == b"OggS":
        from tl_spark.operators.ogg import ogg_stream_info

        info = ogg_stream_info(bytes(payload))
        base.update(
            kind="audio",
            container="ogg",
            duration_ms=info["duration_ms"],
            sample_rate=info["sample_rate"],
            channels=info["channels"],
            bitrate_kbps=info["bitrate_kbps"],
            n_samples=info["n_samples"],
            clean=info["clean"],
        )
        return base
    if payload[:4] == b"\x1aE\xdf\xa3":  # EBML: Matroska / WebM
        from tl_spark.operators.ebml import mkv_stream_info

        info = mkv_stream_info(bytes(payload))
        base.update(
            kind="video" if info["has_video"] else "audio",
            container=info["container"],
            width=info["width"],
            height=info["height"],
            duration_ms=info["duration_ms"],
            sample_rate=info["sample_rate"],
            channels=info["channels"],
        )
        return base
    # MPEG audio: ID3 envelope or raw frame sync. An ADTS/AAC header
    # shares the 0xFFEx sync but has layer bits 00 (reserved in
    # MP1/2/3), which is exactly how the two are told apart.
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and payload[1] & 0xE0 == 0xE0
    ):
        from tl_spark.operators.mp3 import _skip_id3v2

        off = _skip_id3v2(bytes(payload))
        if (
            len(payload) >= off + 2
            and payload[off] == 0xFF
            and payload[off + 1] & 0xF0 == 0xF0
            and payload[off + 1] & 0x06 == 0
        ):
            from tl_spark.operators.aac import aac_stream_info

            info = aac_stream_info(bytes(payload))
            base.update(
                kind="audio",
                container="aac",
                duration_ms=info["duration_ms"],
                sample_rate=info["sample_rate"],
                channels=info["channels"],
                bitrate_kbps=info["bitrate_kbps"],
                n_samples=info["n_frames"],
                clean=info["clean"],
            )
            return base
        from tl_spark.operators.mp3 import mp3_stream_info

        info = mp3_stream_info(bytes(payload))
        base.update(
            kind="audio",
            container="mp3",
            duration_ms=info["duration_ms"],
            sample_rate=info["sample_rate"],
            channels=info["channels"],
            bitrate_kbps=info["bitrate_kbps"],
            n_samples=info["n_frames"],
            clean=info["clean"],
        )
        return base
    raise ValueError("unrecognized media payload")


_INFO_SCHEMA_PREFIX = (
    "kind string, container string, width long, height long, "
    "duration_ms long, sample_rate long, channels long, "
    "bitrate_kbps long, n_samples long, clean boolean"
)


def media_stream_info(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    passthrough: tuple = (),
    on_error: str = "raise",
):
    """The unified metadata operator: one row per recognized payload
    with (kind, container, width, height, duration_ms, sample_rate,
    channels, bitrate_kbps, n_samples, clean). Map-only Arrow batches;
    ``on_error="skip"`` drops unrecognized/malformed payloads (the
    crawl posture), ``"raise"`` fails the task (the test posture)."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
    )

    _check_on_error(on_error)
    keep = [id_col, *passthrough]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column(payload_col).to_pylist()
            idx = []
            rows = {k: [] for k in _ROW_KEYS}
            for j, p in enumerate(payloads):
                try:
                    info = _malformed_as_valueerror(
                        media_payload_info, p, "media"
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                idx.append(j)
                for k in _ROW_KEYS:
                    rows[k].append(info[k])
            # Arrow take keeps the passthrough columns' exact types
            # (an inferred-from-pylist type would break the declared
            # schema on an all-skipped batch)
            take = pa.array(idx, type=pa.int32())
            arrays = [batch.column(c).take(take) for c in keep]
            arrays += [
                pa.array(rows["kind"], type=pa.string()),
                pa.array(rows["container"], type=pa.string()),
                pa.array(rows["width"], type=pa.int64()),
                pa.array(rows["height"], type=pa.int64()),
                pa.array(rows["duration_ms"], type=pa.int64()),
                pa.array(rows["sample_rate"], type=pa.int64()),
                pa.array(rows["channels"], type=pa.int64()),
                pa.array(rows["bitrate_kbps"], type=pa.int64()),
                pa.array(rows["n_samples"], type=pa.int64()),
                pa.array(rows["clean"], type=pa.bool_()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=keep + list(_ROW_KEYS)
            )

    src = df.select(*keep, payload_col)
    fields = ", ".join(
        f"{c} {t}"
        for c, t in zip(
            keep,
            [dict(src.dtypes)[c] for c in keep],
        )
    )
    return src.mapInArrow(fn, f"{fields}, {_INFO_SCHEMA_PREFIX}")


# ---------------------------------------------------------------------------
# doc_id-keyed synthesis (driver-oracle harness)
# ---------------------------------------------------------------------------


def png_bytes(w: int, h: int) -> bytes:
    """A fully valid minimal PNG: IHDR + one zlib IDAT of a zeroed
    8-bit RGB raster + IEND, all CRCs real."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raster = (b"\x00" + b"\x00" * (3 * w)) * h
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster, 6))
        + chunk(b"IEND", b"")
    )


def gif_header_bytes(w: int, h: int) -> bytes:
    """GIF89a logical-screen descriptor + trailer (header-complete;
    the full-image GIF path lives in multimodal.synth_gif_media)."""
    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x00, 0, 0) + b"\x3b"


def bmp_bytes(w: int, h: int) -> bytes:
    """A fully valid 24-bpp bottom-up BMP with a zeroed raster."""
    row = (3 * w + 3) // 4 * 4
    raster = b"\x00" * (row * h)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + raster


_FLAC_FIX_N = 2400  # samples per fixture stream (constant on purpose)


def flac_fixture_payload(ch: int, sample_rate: int) -> bytes:
    """The doc-keyed FLAC fixture: FIXED sample count + seed with
    VERBATIM subframes, so the encoded byte length is a constant per
    channel count (verbatim size is content-independent) — which makes
    the router's real mean-bitrate field a closed form of (ch, sr)."""
    from tl_spark.operators.flac import flac_bytes, synth_pcm

    return flac_bytes(
        synth_pcm(17, _FLAC_FIX_N, ch),
        sample_rate,
        block_size=1152,
        channel_mode="indep",
        strategy="verbatim",
    )


def flac_fixture_lens() -> tuple[int, int]:
    """(mono_len, stereo_len) of the fixture payloads — the constants
    the DuckDB oracle's bitrate arithmetic embeds."""
    return (
        len(flac_fixture_payload(1, 44100)),
        len(flac_fixture_payload(2, 44100)),
    )


def synth_media_for_docs(df, id_col: str = "doc_id"):
    """doc_id-keyed REAL media payloads in EIGHT container variants
    (doc_id % 8 → png / gif / bmp / mp3 / mp4 / flac / ogg-vorbis /
    webm) whose metadata is a closed form over doc_id — the
    driver-oracle harness for :func:`media_stream_info`
    (queries.media_info_docs):

    - images: width = 16 + doc_id%101, height = 16 + doc_id%67
    - mp3 (CBR 128): frames = 20 + doc_id%11, sample rate by doc_id%3
      (44100/48000/32000), mono when doc_id is odd
    - mp4: duration units = 500 + (doc_id%97)*37 at timescale
      600 + (doc_id%3)*400; 320+(doc_id%4)*160 × 180+(doc_id%4)*90;
      24 + doc_id%7 samples
    - flac: 2400 samples verbatim (see :func:`flac_fixture_payload`),
      sr by doc_id%3, stereo when doc_id%16==5 (mono at %16==13 —
      doc_id%8==5 pins the lower moduli, so the split keys on %16)
    - ogg: Vorbis ident + granule chain, n = 9600 + doc_id%7*480
      (no n*1000/sr half-integer in the reachable set — checked),
      sr by doc_id%3, channels 1 + (doc_id%5==0), nominal 96 kbps
    - webm: duration_ms = 3000 + doc_id%11*700, VP9
      640+(doc_id%4)*320 × 360+(doc_id%4)*180, Opus 48 kHz stereo
    """
    import pyarrow as pa

    from tl_spark.operators.ebml import mkv_bytes
    from tl_spark.operators.mp3 import mp3_frame_bytes
    from tl_spark.operators.mp4 import mp4_bytes
    from tl_spark.operators.ogg import ogg_bytes

    def _payload(i: int) -> bytes:
        v = i % 8
        if v <= 2:
            w, h = 16 + i % 101, 16 + i % 67
            return (png_bytes, gif_header_bytes, bmp_bytes)[v](w, h)
        if v == 3:
            return mp3_frame_bytes(
                20 + i % 11,
                bitrates=128,
                sample_rate=(44100, 48000, 32000)[i % 3],
                channels=1 if i % 2 else 2,
                seed=i,
            )
        if v == 4:
            return mp4_bytes(
                duration_units=500 + (i % 97) * 37,
                timescale=600 + (i % 3) * 400,
                width=320 + (i % 4) * 160,
                height=180 + (i % 4) * 90,
                n_samples=24 + i % 7,
                seed=i,
            )
        if v == 5:
            # NB: v==5 forces doc_id odd (and doc_id%4==1), so the
            # channel split must key on a modulus that still varies
            # within this residue class: doc_id%16 is 5 or 13 here
            return flac_fixture_payload(
                2 if i % 16 == 5 else 1, (44100, 48000, 32000)[i % 3]
            )
        if v == 6:
            return ogg_bytes(
                "vorbis",
                9600 + (i % 7) * 480,
                sample_rate=(44100, 48000, 32000)[i % 3],
                channels=1 + (i % 5 == 0),
                seed=i,
            )
        return mkv_bytes(
            "webm",
            3000 + (i % 11) * 700,
            video=("V_VP9", 640 + (i % 4) * 320, 360 + (i % 4) * 180),
            audio=("A_OPUS", 48000, 2),
            seed=i,
        )

    def fn(batches):
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(
                        [_payload(int(i)) for i in ids], type=pa.binary()
                    ),
                ],
                names=[id_col, "payload"],
            )

    return df.select(id_col).mapInArrow(fn, f"{id_col} long, payload binary")
