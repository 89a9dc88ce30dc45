"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (per the build brief): image/audio/video travel as ``binary``
columns with a typed metadata struct. All Spark-side plumbing — schema,
partition-preserving mapInArrow, batch shapes, deterministic
feature/frame outputs — is REAL and tested. Decoding has three tiers:

- real decoders, no codec library: binary PPM (P6), uncompressed
  24-bpp BMP, and — since round 4 — GIF87a/89a with full LZW
  decompression and interlacing, 8-bit PNG (all five color types,
  Adam7, stdlib zlib inflate + numpy unfiltering), JPEG both baseline
  and progressive (tl_spark.operators.jpeg: Huffman entropy decode,
  restart markers, SOF2 successive approximation, 4:2:0/4:4:4, matrix
  IDCT), baseline TIFF (II/MM, strips, none/LZW/Deflate/PackBits, predictor 2), RIFF/WAV in
  PCM16, G.711 A-law/mu-law, and IMA ADPCM, and RIFF/AVI video
  (MJPEG + uncompressed DIB) (``_parse_ppm`` / ``_parse_bmp`` /
  ``_parse_gif`` / ``_parse_png`` / ``jpeg_decode`` / ``_parse_tiff``
  / ``_parse_wav`` / ``_parse_avi_frames``; each ground-truth tested
  via its ``synth_*_media`` generator) — genuine decode paths, not
  stubs;
- ``decode_stub="error"``  -> NotImplementedError for the REMAINING
  formats (progressive JPEG, MP3/AAC, video codecs: the honest
  default — those need codec libraries this container lacks; plug
  one into ``_decode_image``/_audio);
- ``decode_stub="fake"``   -> a deterministic fake decoder: payload
  bytes are hashed into a pseudo pixel/sample buffer, so downstream
  shapes, dtypes, batching, and reductions are exercised end-to-end
  with reproducible values.

Scale notes: payload bytes cross the Arrow boundary once; the ops are
map-only (no shuffle); frame sampling emits one row per kept frame via
RecordBatch expansion (list-free — avoids giant list columns in the
shuffle if a downstream groupBy follows).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, "
    "sample_rate int, duration_ms int"
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic typed metadata derived from the payload header
    bytes (stand-in for container parsing; real parsers slot in here).
    """
    h = F.xxhash64(F.col(payload_col))
    return df.withColumn(
        "media",
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                F.pmod(h, F.lit(3)).cast("int") + 1,
            ).alias("media_type"),
            (F.pmod(h, F.lit(1024)) + 16).cast("int").alias("width"),
            (F.pmod(h, F.lit(768)) + 16).cast("int").alias("height"),
            (F.pmod(h, F.lit(120)) + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(h, F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
        ),
    )


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-decode: stretch a sha256 stream over n bytes."""
    if payload is None:
        payload = b""
    out = np.empty(n, dtype=np.uint8)
    pos = 0
    counter = 0
    while pos < n:
        block = hashlib.sha256(payload + counter.to_bytes(4, "little")).digest()
        take = min(32, n - pos)
        out[pos:pos + take] = np.frombuffer(block[:take], dtype=np.uint8)
        pos += take
        counter += 1
    return out


def _parse_ppm(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6, maxval 255): pure numpy, no
    codec library. Returns an (h, w, 3) uint8 array. Raises ValueError
    on malformed input (truncated raster, unsupported maxval)."""
    # PPM headers may carry '#' comment lines between tokens (spec-
    # valid). Parse tokenwise — whitespace separates tokens, '#' skips
    # to end-of-line — instead of a rigid regex that rejected
    # commented headers (and a naive digit-regex would read digits
    # INSIDE comments as header fields).
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm header")
    i, n, vals = 2, len(payload), []
    while len(vals) < 3 and i < n:
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
    if len(vals) < 3 or i >= n or payload[i] not in b" \t\r\n":
        raise ValueError("not a P6 ppm header")
    i += 1  # exactly ONE whitespace byte separates maxval from raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval} (only 255)")
    need = w * h * 3
    raster = payload[i : i + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: {len(raster)} of {need} bytes")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bpp Windows BMP
    (BITMAPINFOHEADER, BI_RGB): pure struct/numpy, no codec library.
    Handles bottom-up (positive height) and top-down (negative height)
    rasters and 4-byte row padding. Returns (h, w, 3) uint8 RGB.
    Raises ValueError on malformed/unsupported input."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: bpp={bpp} compression={compression} "
            "(only uncompressed 24-bpp BI_RGB)"
        )
    if w <= 0 or h_raw == 0 or planes != 1:
        raise ValueError("malformed BMP dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    raster = payload[data_off : data_off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: {len(raster)} of {need} bytes")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]  # bottom-up storage
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW decode (variable-width codes, LSB-first bit
    packing, CLEAR/EOI codes, 12-bit cap) — pure Python/numpy from the
    public GIF89a specification. Returns uint8 palette indices.
    Native kernel fast path (tl_lzw_gif, byte-exact, fuzz-pinned);
    this Python machine stays the source of truth and the fallback —
    any native anomaly re-runs here so the exact ValueError surfaces."""
    from tl_spark.kernel import native_entropy

    native = native_entropy.lzw_gif(data, min_code_size, n_pixels)
    if native is not None:
        return native
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0
    # bit reader state
    bitbuf = 0
    nbits = 0
    di = 0
    n = len(data)

    def reset_dict():
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, width = reset_dict()
    prev: bytes | None = None
    while pos < n_pixels:
        while nbits < width:
            if di >= n:
                raise ValueError("truncated LZW stream")
            bitbuf |= data[di] << nbits
            nbits += 8
            di += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table, width = reset_dict()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW code {code}")
        take = min(len(entry), n_pixels - pos)
        out[pos : pos + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        pos += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if pos < n_pixels:
        raise ValueError(f"LZW underrun: {pos} of {n_pixels} pixels")
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _parse_gif_frames(payload: bytes, max_frames: int | None = None):
    """REAL decoder for GIF87a/89a ANIMATIONS: logical screen, color
    tables, graphic-control extensions (transparency + disposal 1/2/3),
    LZW decompression, interlace reordering, and frame composition —
    pure Python/numpy from the public specification. Yields each frame
    as a full-screen (sh, sw, 3) uint8 RGB snapshot. Raises ValueError
    on malformed input."""
    import struct

    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 7))
        gct = np.frombuffer(payload[pos : pos + size], dtype=np.uint8)
        if len(gct) != size:
            raise ValueError("truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += size
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    n_frames = 0
    transparent_idx = -1
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if n_frames == 0:
                raise ValueError("GIF contains no image data")
            return
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            subs = []
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated extension")
                ln = payload[pos]
                pos += 1
                if ln == 0:
                    break
                subs.append(payload[pos : pos + ln])
                pos += ln
            if label == 0xF9 and subs and len(subs[0]) >= 4:
                gpacked = subs[0][0]
                disposal = (gpacked >> 2) & 7
                transparent_idx = subs[0][3] if gpacked & 1 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            size = 3 * (2 << (ipacked & 7))
            ct = np.frombuffer(payload[pos : pos + size], dtype=np.uint8)
            if len(ct) != size:
                raise ValueError("truncated local color table")
            ct = ct.reshape(-1, 3)
            pos += size
        if ct is None:
            raise ValueError("GIF image has no color table")
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("malformed GIF frame geometry")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated image data")
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(payload[pos : pos + ln])
            pos += ln
        idx = _lzw_decode(b"".join(chunks), min_code_size, w * h)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("palette index out of range")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder the 4 passes
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                ordered[start:h:step] = rows[src : src + n_rows]
                src += n_rows
            rows = ordered
        region = screen[top : top + h, left : left + w]
        # disposal 3 (restore-to-previous): buffer the pre-draw region
        # so it can be put back after the frame is shown
        prev_region = region.copy() if disposal == 3 else None
        frame_rgb = ct[rows]
        if transparent_idx >= 0:
            opaque = rows != transparent_idx
            region[opaque] = frame_rgb[opaque]
        else:
            region[...] = frame_rgb
        yield screen.copy()
        n_frames += 1
        if max_frames is not None and n_frames >= max_frames:
            return
        # disposal AFTER the frame is shown: 2 = restore the frame's
        # region to background (zeros); 3 = restore the region to its
        # pre-frame pixels; 0/1 = leave in place
        if disposal == 2:
            region[...] = 0
        elif disposal == 3:
            region[...] = prev_region
        transparent_idx = -1
        disposal = 0
    raise ValueError("truncated GIF: no trailer")


def _parse_gif(payload: bytes) -> np.ndarray:
    """First frame of :func:`_parse_gif_frames` (the still-image API
    used by :func:`image_features`/:func:`resize_images`)."""
    return next(_parse_gif_frames(payload, max_frames=1))


def _lzw_encode(indices: bytes, mcs: int, compress: bool = True) -> bytes:
    """GIF-flavor LZW encoder (test/writer counterpart of
    :func:`_lzw_decode`). Width bookkeeping tracks the DECODER's table
    size (which runs one code behind the encoder's dictionary — the
    decoder learns entry n while processing code n+1), so every code
    is written at exactly the width the decoder reads it with.
    ``compress=False`` emits literal codes only (the classic
    "uncompressed GIF" mode) through the same bookkeeping."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = mcs + 1

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1  # encoder's next dictionary slot
    dec_size = eoi + 1   # decoder's table length (lags by one code)
    n_data_codes = 0

    emit(clear)

    def post_emit_data_code():
        # decoder state after it processes the code just emitted: it
        # appends an entry for every data code EXCEPT the first after
        # a clear, then grows its read width when the table fills
        nonlocal dec_size, width, n_data_codes
        n_data_codes += 1
        if n_data_codes >= 2 and dec_size < 4096:
            dec_size += 1
            if dec_size == (1 << width) and width < 12:
                width += 1

    w = b""
    for i in range(len(indices)):
        k = indices[i : i + 1]
        if not w:
            w = k  # first byte after the clear
            continue
        wk = w + k
        if compress and wk in table:
            w = wk
            continue
        emit(table[w])
        post_emit_data_code()
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        w = k
    if w:
        emit(table[w])
        post_emit_data_code()
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def gif_bytes(
    indices: np.ndarray,
    palette: np.ndarray,
    interlaced: bool = False,
    compress: bool = True,
) -> bytes:
    """Serialize an (h, w) uint8 index raster + (n, 3) palette as a
    GIF89a (writer counterpart of :func:`_parse_gif`; used by
    :func:`synth_gif_media` and tests)."""
    import struct

    h, w = indices.shape
    n_colors = len(palette)
    k = max(1, (n_colors - 1).bit_length())  # table size = 2^k
    pal = np.zeros((1 << k, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    mcs = max(2, k)
    rows = indices
    if interlaced:
        rows = np.concatenate(
            [indices[start::step] for start, step in _GIF_INTERLACE_PASSES]
        )
    data = _lzw_encode(rows.astype(np.uint8).tobytes(), mcs, compress)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((k - 1) << 4) | (k - 1), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0)
    out.append(mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def gif_animation_bytes(
    frames,
    palette: np.ndarray,
    gce=None,
    compress: bool = True,
) -> bytes:
    """Serialize a list of (h, w) uint8 full-screen index rasters as an
    animated GIF89a. ``gce`` (optional, per frame) is a list of
    (disposal, transparent_idx_or_None) tuples emitted as
    graphic-control extensions — the writer counterpart of
    :func:`_parse_gif_frames`'s composition semantics."""
    import struct

    h, w = frames[0].shape
    n_colors = len(palette)
    k = max(1, (n_colors - 1).bit_length())
    pal = np.zeros((1 << k, 3), dtype=np.uint8)
    pal[:n_colors] = palette
    mcs = max(2, k)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((k - 1) << 4) | (k - 1), 0, 0)
    out += pal.tobytes()
    for fi, frame in enumerate(frames):
        if gce is not None and gce[fi] is not None:
            disposal, tidx = gce[fi]
            gpacked = (disposal & 7) << 2 | (1 if tidx is not None else 0)
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, gpacked, 0,
                (tidx if tidx is not None else 0), 0,
            )
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(mcs)
        data = _lzw_encode(frame.astype(np.uint8).tobytes(), mcs, compress)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def synth_animated_gif_media(
    spark,
    n_rows: int = 20,
    width: int = 16,
    height: int = 12,
    n_frames: int = 12,
    n_colors: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-animation table: each payload is an animated
    GIF89a with ``n_frames`` seeded full-screen frames (disposal 1, no
    transparency — every decoded snapshot equals its own raster), so
    :func:`sample_frames`'s real GIF path has exact ground truth."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads = []
            for i in ids:
                rng = np.random.default_rng(seed * 1000003 + int(i))
                palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
                frames = [
                    rng.integers(0, n_colors, size=(height, width), dtype=np.uint8)
                    for _ in range(n_frames)
                ]
                payloads.append(
                    gif_animation_bytes(
                        frames, palette, gce=[(1, None)] * n_frames
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def synth_gif_media(
    spark,
    n_rows: int = 50,
    width: int = 16,
    height: int = 12,
    n_colors: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-image table with GIF89a payloads (alternating
    interlaced/progressive and compressed/uncompressed LZW to exercise
    all four producer shapes); same ground-truth-equality contract as
    :func:`synth_ppm_media` / :func:`synth_bmp_media`."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads = []
            for i in ids:
                rng = np.random.default_rng(seed * 1000003 + int(i))
                palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
                idx = rng.integers(0, n_colors, size=(height, width), dtype=np.uint8)
                payloads.append(
                    gif_bytes(
                        idx,
                        palette,
                        interlaced=bool(int(i) % 2),
                        compress=bool((int(i) // 2) % 2),
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def _malformed_as_valueerror(fn, payload: bytes, fmt: str) -> np.ndarray:
    """Untrusted-payload boundary: a decoder tripping over crafted
    bytes may surface struct.error / IndexError / zlib.error / ... —
    normalize ALL of it to ValueError so the on_error policy (which
    correctly catches only ValueError/NotImplementedError) can never
    be bypassed by a malformed payload at corpus scale."""
    try:
        return fn(payload)
    except (ValueError, NotImplementedError):
        raise
    except Exception as exc:  # noqa: BLE001 — the decode boundary
        raise ValueError(f"malformed {fmt} payload: {exc!r}") from exc


def _decode_image(payload: bytes, width: int, height: int, stub: str) -> np.ndarray:
    # codec-free formats decode FOR REAL regardless of the stub mode:
    # P6/PPM is header + raw RGB, uncompressed 24-bpp BMP is header +
    # padded BGR rows — both parseable with struct/numpy alone. The
    # metadata (width, height) args are ignored for them — the header
    # is authoritative. Grayscale = integer channel mean (uint8).
    decoder = None
    if payload and payload[:2] == b"P6":
        decoder, fmt = _parse_ppm, "PPM"
    elif payload and payload[:2] == b"BM":
        decoder, fmt = _parse_bmp, "BMP"
    elif payload and payload[:4] == b"GIF8":
        decoder, fmt = _parse_gif, "GIF"
    elif payload and payload[:8] == _PNG_SIG:
        decoder, fmt = _parse_png, "PNG"
    elif payload and payload[:2] == b"\xff\xd8":
        from tl_spark.operators.jpeg import jpeg_decode

        decoder, fmt = jpeg_decode, "JPEG"
    elif payload and payload[:4] in (b"II*\x00", b"MM\x00*"):
        decoder, fmt = _parse_tiff, "TIFF"
    if decoder is not None:
        rgb = _malformed_as_valueerror(decoder, payload, fmt)
        return (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    if stub == "fake":
        return _fake_decode(payload, width * height).reshape(height, width)
    raise NotImplementedError(
        "this image format needs a codec library this container "
        "lacks — P6/PPM, 24-bpp BMP, GIF, PNG, baseline/progressive "
        "JPEG, and TIFF payloads decode for real, pass "
        "decode_stub='fake' for the deterministic test decoder, or "
        "plug a real codec in here"
    )


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
    on_error: str = "raise",
) -> DataFrame:
    """Per-image feature extraction: decode -> 16-bin histogram +
    mean/std, vectorized per Arrow batch.

    ``on_error``: "raise" (default — a malformed payload fails the
    task, the right default for tests/small jobs) or "skip" (drop the
    row — the 100-TB posture, where one corrupt payload must not kill
    a million-task job; count dropped rows by anti-joining the output
    against the input ids)."""
    _check_on_error(on_error)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column("media").to_pylist()
            keep, hists, means, stds = [], [], [], []
            for i, p, m in zip(ids, payloads, metas):
                try:
                    img = _decode_image(
                        p, m["width"], m["height"], decode_stub
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                hist = np.bincount(img.ravel() >> 4, minlength=16)
                keep.append(i)
                hists.append([int(x) for x in hist])
                means.append(float(img.mean()) if img.size else 0.0)
                stds.append(float(img.std()) if img.size else 0.0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(hists, type=pa.list_(pa.int64())),
                    pa.array(means, type=pa.float64()),
                    pa.array(stds, type=pa.float64()),
                ],
                names=[id_col, "hist16", "mean_px", "std_px"],
            )

    narrowed = df.select(id_col, payload_col, "media")
    return narrowed.mapInArrow(
        fn, f"{id_col} long, hist16 array<long>, mean_px double, std_px double"
    )


def _parse_avi_frames(payload: bytes, max_frames: int | None = None):
    """REAL decoder for RIFF/AVI video: yields (h, w, 3) uint8 RGB
    frames from the first 'vids' stream. Codec-free path for 'DIB '
    (uncompressed 24-bpp BGR bottom-up rasters) and a real MJPEG path
    via :mod:`tl_spark.operators.jpeg` (per-frame baseline JPEG,
    missing-DHT streams fall back to the Annex-K tables per the
    OpenDML convention). Raises ValueError on malformed containers or
    unsupported codecs."""
    import struct

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")

    def chunks(pos: int, end: int):
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if pos + 8 + size > end:
                raise ValueError(f"truncated AVI chunk {cid!r}")
            yield cid, pos + 8, size
            pos += 8 + size + (size & 1)

    vids_stream = None  # (stream_index, handler, strf BITMAPINFOHEADER)
    movi = None
    stream_idx = 0

    def scan_hdrl(pos: int, end: int):
        nonlocal vids_stream, stream_idx
        for cid, at, size in chunks(pos, end):
            if cid == b"LIST" and payload[at : at + 4] == b"strl":
                fcc_type = handler = strf = None
                for c2, a2, s2 in chunks(at + 4, at + size):
                    if c2 == b"strh":
                        fcc_type = payload[a2 : a2 + 4]
                        handler = payload[a2 + 4 : a2 + 8]
                    elif c2 == b"strf":
                        strf = payload[a2 : a2 + s2]
                if fcc_type == b"vids" and vids_stream is None:
                    vids_stream = (stream_idx, handler, strf)
                stream_idx += 1

    for cid, at, size in chunks(12, len(payload)):
        if cid == b"LIST":
            subtype = payload[at : at + 4]
            if subtype == b"hdrl":
                scan_hdrl(at + 4, at + size)
            elif subtype == b"movi":
                movi = (at + 4, at + size)
    if vids_stream is None or movi is None:
        raise ValueError("AVI missing vids stream or movi list")
    sidx, handler, strf = vids_stream
    tag = f"{sidx:02d}".encode()
    handler = (handler or b"").upper()
    is_mjpg = handler == b"MJPG"
    if not is_mjpg and handler not in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "):
        raise ValueError(f"unsupported AVI codec {handler!r}")
    if not is_mjpg:
        if strf is None or len(strf) < 40:
            raise ValueError("AVI DIB stream missing strf header")
        w, h_raw = struct.unpack_from("<ii", strf, 4)
        bpp = struct.unpack_from("<H", strf, 14)[0]
        comp = struct.unpack_from("<I", strf, 16)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(
                f"unsupported AVI DIB: bpp={bpp} compression={comp}"
            )
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        stride = (w * 3 + 3) & ~3
    n = 0
    for cid, at, size in chunks(*movi):
        if cid[:2] != tag or cid[2:4] not in (b"db", b"dc"):
            continue
        body = payload[at : at + size]
        if is_mjpg:
            from tl_spark.operators.jpeg import jpeg_decode

            yield jpeg_decode(body)
        else:
            need = stride * h
            if len(body) < need:
                raise ValueError("truncated AVI DIB frame")
            rows = np.frombuffer(body[:need], np.uint8).reshape(h, stride)
            bgr = rows[:, : w * 3].reshape(h, w, 3)
            if not top_down:
                bgr = bgr[::-1]
            yield bgr[:, :, ::-1].copy()
        n += 1
        if max_frames is not None and n >= max_frames:
            return


def avi_bytes(
    frames,
    codec: str = "MJPG",
    fps: int = 10,
    quality: int = 85,
    strip_dht: bool = False,
) -> bytes:
    """Serialize (h, w, 3) uint8 RGB frames as a RIFF/AVI container —
    writer counterpart of :func:`_parse_avi_frames` for tests.
    ``codec``: "MJPG" (per-frame baseline JPEG; ``strip_dht=True``
    drops the DHT segments to exercise the Annex-K fallback) or
    "DIB " (uncompressed 24-bpp bottom-up BGR)."""
    import struct

    frames = [np.asarray(f, np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape

    def enc(f: np.ndarray) -> bytes:
        if codec == "MJPG":
            from tl_spark.operators.jpeg import jpeg_bytes

            data = jpeg_bytes(f, quality=quality, subsample="420")
            if strip_dht:
                out, pos = bytearray(data[:2]), 2
                while pos + 4 <= len(data):
                    if data[pos + 1] == 0xD9:
                        out += data[pos:]
                        break
                    (ln,) = struct.unpack_from(">H", data, pos + 2)
                    if data[pos + 1] != 0xC4:
                        out += data[pos : pos + 2 + ln]
                    if data[pos + 1] == 0xDA:
                        out += data[pos + 2 + ln :]
                        break
                    pos += 2 + ln
                data = bytes(out)
            return data
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = f[:, :, ::-1].reshape(h, w * 3)
        return rows[::-1].tobytes()

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    handler = b"MJPG" if codec == "MJPG" else b"DIB "
    strh = (
        b"vids" + handler
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, fps, 0, len(frames), 0,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    comp = 0 if codec != "MJPG" else struct.unpack("<I", b"MJPG")[0]
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, comp, h * w * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    tag = b"00dc" if codec == "MJPG" else b"00db"
    movi = lst(b"movi", b"".join(chunk(tag, enc(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_avi_media(
    spark,
    n_rows: int = 12,
    n_frames: int = 6,
    width: int = 32,
    height: int = 24,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-video table with RIFF/AVI payloads — even
    ids are lossless 'DIB ' streams, odd ids MJPG (every third MJPG
    with DHT stripped to exercise the Annex-K fallback). Tests decode
    the same payloads locally and demand exact frame-mean equality
    with the Spark-side :func:`sample_frames` output."""

    def _payload(i: int) -> bytes:
        yy, xx = np.mgrid[0:height, 0:width]
        frames = [
            (128 + 90 * np.sin(xx / (4 + i % 3) + k) * np.cos(yy / 4))
            .clip(0, 255)
            .astype(np.uint8)[..., None]
            .repeat(3, 2)
            for k in range(n_frames)
        ]
        if i % 2 == 0:
            return avi_bytes(frames, codec="DIB ")
        return avi_bytes(
            frames, codec="MJPG", quality=85, strip_dht=(i % 3 == 0)
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(
                        [_payload(int(i)) for i in ids], type=pa.binary()
                    ),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def sample_frames(
    df: DataFrame,
    every_k: int = 10,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
    on_error: str = "raise",
) -> DataFrame:
    """Frame sampling for video payloads: one OUTPUT ROW per kept frame
    (row-expanding mapInArrow — batch cardinality legitimately changes).
    ``on_error="skip"`` drops undecodable payloads instead of failing
    the task (the corpus-scale posture)."""
    _check_on_error(on_error)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column("media").to_pylist()
            out_ids, out_frame_idx, out_mean = [], [], []
            for i, p, m in zip(ids, payloads, metas):
                is_avi = (
                    p and len(p) >= 12
                    and p[:4] == b"RIFF" and p[8:12] == b"AVI "
                )
                if (p and p[:4] == b"GIF8") or is_avi:
                    # REAL animation/video path: the payload header is
                    # authoritative (same principle as _decode_image) —
                    # every every_k-th decoded frame's grayscale mean.
                    # Rows buffer per payload so a decode failure
                    # mid-stream drops the WHOLE payload under "skip"
                    # (no partial clips in the output).
                    def _decode_rows(pp):
                        decoded = []
                        frames = (
                            _parse_avi_frames(pp) if is_avi
                            else _parse_gif_frames(pp)
                        )
                        for fidx, frame in enumerate(frames):
                            if fidx % every_k:
                                continue
                            gray = (
                                frame.astype(np.uint16).sum(axis=2) // 3
                            ).astype(np.uint8)
                            decoded.append((fidx, float(gray.mean())))
                        return decoded

                    try:
                        rows = _malformed_as_valueerror(
                            _decode_rows, p, "AVI" if is_avi else "GIF"
                        )
                    except (ValueError, NotImplementedError):
                        if on_error == "raise":
                            raise
                        continue
                    for fidx, mean in rows:
                        out_ids.append(i)
                        out_frame_idx.append(fidx)
                        out_mean.append(mean)
                    continue
                if m["media_type"] != "video":
                    continue
                for fidx in range(0, m["n_frames"], every_k):
                    if decode_stub == "fake":
                        frame = _fake_decode(
                            (p or b"") + fidx.to_bytes(4, "little"), 256
                        )
                        out_mean.append(float(frame.mean()))
                    elif on_error == "skip":
                        break
                    else:
                        raise NotImplementedError(
                            "video frame decode requires a codec; use "
                            "decode_stub='fake' in this container"
                        )
                    out_ids.append(i)
                    out_frame_idx.append(fidx)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=pa.int64()),
                    pa.array(out_frame_idx, type=pa.int32()),
                    pa.array(out_mean, type=pa.float64()),
                ],
                names=[id_col, "frame_idx", "frame_mean"],
            )

    narrowed = df.select(id_col, payload_col, "media")
    return narrowed.mapInArrow(
        fn, f"{id_col} long, frame_idx int, frame_mean double"
    )


def synth_media(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic binary-payload table for tests (payload bytes are
    JVM-side: unhex of repeated xxhash64 hex)."""
    df = spark.range(n_rows).select(
        F.col("id").alias("media_id"),
        F.unhex(
            F.concat(
                *[
                    F.lpad(
                        F.hex(F.abs(F.xxhash64("id", F.lit(seed + i)))), 16, "0"
                    )
                    for i in range(8)
                ]
            )
        ).alias("payload"),
    )
    return attach_media_meta(df)


def synth_ppm_media(
    spark,
    n_rows: int = 50,
    width: int = 16,
    height: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-image table: each payload is a valid binary
    PPM (P6) whose raster comes from a per-id seeded generator, so the
    decode path in :func:`image_features` runs end-to-end on genuine
    pixels with exactly reproducible ground truth (the test recomputes
    the same rasters locally and demands equality)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        header = f"P6\n{width} {height}\n255\n".encode()
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads = []
            for i in ids:
                rng = np.random.default_rng(seed * 1000003 + int(i))
                raster = rng.integers(
                    0, 256, size=(height, width, 3), dtype=np.uint8
                )
                payloads.append(header + raster.tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def bmp_bytes(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed 24-bpp
    BMP (BITMAPINFOHEADER, BI_RGB) — the writer counterpart of
    :func:`_parse_bmp`, used by :func:`synth_bmp_media` and tests."""
    import struct

    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    bgr = rgb[:, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    if not top_down:
        rows = rows[::-1]
    raster = rows.tobytes()
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    return header + dib + raster


def synth_bmp_media(
    spark,
    n_rows: int = 50,
    width: int = 16,
    height: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-image table with uncompressed 24-bpp BMP
    payloads (alternating bottom-up/top-down rows to exercise both
    raster orders); same ground-truth-equality contract as
    :func:`synth_ppm_media`."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads = []
            for i in ids:
                rng = np.random.default_rng(seed * 1000003 + int(i))
                raster = rng.integers(
                    0, 256, size=(height, width, 3), dtype=np.uint8
                )
                payloads.append(bmp_bytes(raster, top_down=bool(int(i) % 2)))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(arr: np.ndarray, ch: int) -> np.ndarray:
    """Reverse PNG per-row filtering. ``arr`` is (h, 1+w*ch) uint8 —
    filter byte + filtered row. Returns (h, w*ch) uint8 scanlines.
    Sub/Average/Paeth are sequential along the row by definition
    (each byte's predictor uses the RECONSTRUCTED left neighbor), so
    those rows run a per-byte loop; None/Up rows are whole-row numpy
    adds. Fine for media-sized images; a native kernel slots in here
    if filtered PNGs ever dominate a profile."""
    h, rb1 = arr.shape
    rowbytes = rb1 - 1
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    for y in range(h):
        ft = int(arr[y, 0])
        row = arr[y, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub (mod-256 wrap is the spec; mask explicitly
            # rather than rely on numpy's warn-on-overflow scalar add)
            for x in range(ch, rowbytes):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ft == 2:  # Up
            row += prev
        elif ft == 3:  # Average
            for x in range(rowbytes):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(rowbytes):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = row
        prev = row
    return out


def _parse_png(payload: bytes) -> np.ndarray:
    """REAL decoder for PNG: stdlib ``zlib`` inflate + numpy per-row
    unfiltering — no codec library. Supports bit depth 8, color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both
    non-interlaced and Adam7-interlaced rasters, multi-IDAT streams.
    Chunk CRCs are verified. Returns (h, w, 3) uint8 RGB (alpha
    dropped, gray replicated). Raises ValueError on malformed or
    unsupported input (bit depths 1/2/4/16 are out of scope)."""
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(payload)
    ihdr = None
    plte = None
    idat = []
    seen_iend = False
    while pos + 8 <= n and not seen_iend:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            seen_iend = True
        pos += 12 + length
    if ihdr is None or not idat or not seen_iend:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, ct, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("malformed PNG IHDR")
    if depth not in (8, 16) or ct not in _PNG_CHANNELS or (
        depth == 16 and ct == 3
    ):
        raise ValueError(
            f"unsupported PNG: depth={depth} color_type={ct} "
            "(8/16-bit color types 0/2/4/6, 8-bit palette)"
        )
    if w == 0 or h == 0:
        raise ValueError("malformed PNG dimensions")
    ch = _PNG_CHANNELS[ct]
    sb = depth // 8  # bytes per sample; filters operate on BYTES with
    bpp = ch * sb    # bpp = channels * sample bytes (spec 9.2)
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        need = h * (w * bpp + 1)
        if len(raw) != need:
            raise ValueError(f"PNG raster: {len(raw)} bytes, need {need}")
        img = _png_unfilter(
            np.frombuffer(raw, np.uint8).reshape(h, w * bpp + 1), bpp
        ).reshape(h, w, bpp)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        img = np.zeros((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            take = ph * (pw * bpp + 1)
            chunk = raw[off : off + take]
            if len(chunk) != take:
                raise ValueError("truncated PNG interlace pass")
            off += take
            sub = _png_unfilter(
                np.frombuffer(chunk, np.uint8).reshape(ph, pw * bpp + 1),
                bpp,
            ).reshape(ph, pw, bpp)
            img[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("trailing bytes after PNG interlace passes")
    if sb == 2:  # 16-bit big-endian samples -> high byte (std 16->8)
        img = np.ascontiguousarray(img.reshape(h, w, ch, 2)[..., 0])
    if ct == 2:
        return img.copy()
    if ct == 6:
        return img[:, :, :3].copy()
    if ct in (0, 4):
        return np.repeat(img[:, :, :1], 3, axis=2)
    # ct == 3: palette lookup
    if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
        raise ValueError("paletted PNG without a valid PLTE")
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    idx = img[:, :, 0]
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("PNG palette index out of range")
    return pal[idx]


def png_bytes(
    arr: np.ndarray,
    color_type: int = 2,
    row_filters=0,
    interlace: bool = False,
    palette: np.ndarray | None = None,
    depth: int = 8,
) -> bytes:
    """Serialize an image as a PNG — the writer counterpart of
    :func:`_parse_png`, used by :func:`synth_png_media` and tests.

    ``arr``: (h, w, 3) RGB for color_type 2, (h, w) gray for 0,
    (h, w) palette indices for 3 (``palette`` = (N, 3) required),
    (h, w, 2) gray+alpha for 4, (h, w, 4) RGBA for 6.
    ``row_filters``: a filter type 0-4 or a per-scanline sequence
    (cycled), applied with the true encoder formulas so every decode
    branch is exercisable. ``interlace=True`` writes Adam7 passes.
    ``depth=16`` widens each 8-bit sample to the 16-bit value v*257
    (hi byte == v, so the decoder's high-byte reduction round-trips).
    """
    import struct
    import zlib

    if depth not in (8, 16) or (depth == 16 and color_type == 3):
        raise ValueError(f"unsupported depth {depth} for ct {color_type}")
    ch = _PNG_CHANNELS[color_type]
    a = np.asarray(arr, dtype=np.uint8)
    if ch == 1 and a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] != ch:
        raise ValueError(f"array shape {a.shape} != channels {ch}")
    h, w, _ = a.shape
    if depth == 16:  # v -> (v, v) big-endian == v * 257
        a = np.repeat(a.reshape(h, w, ch, 1), 2, axis=3).reshape(
            h, w, ch * 2
        )
    bpp = ch * (depth // 8)

    def filter_pass(sub: np.ndarray, base: int) -> bytes:
        ph, pw = sub.shape[:2]
        flat = sub.reshape(ph, pw * bpp).astype(np.int16)
        out = bytearray()
        for y in range(ph):
            ft = (
                row_filters[(base + y) % len(row_filters)]
                if isinstance(row_filters, (list, tuple))
                else int(row_filters)
            )
            cur = flat[y]
            prev = flat[y - 1] if y > 0 else np.zeros_like(cur)
            left = np.zeros_like(cur)
            left[bpp:] = cur[:-bpp]
            upleft = np.zeros_like(cur)
            upleft[bpp:] = prev[:-bpp]
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = cur - left
            elif ft == 2:
                enc = cur - prev
            elif ft == 3:
                enc = cur - ((left + prev) >> 1)
            elif ft == 4:
                p = left + prev - upleft
                pa_ = np.abs(p - left)
                pb = np.abs(p - prev)
                pc = np.abs(p - upleft)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc),
                    left,
                    np.where(pb <= pc, prev, upleft),
                )
                enc = cur - pred
            else:
                raise ValueError(f"bad filter type {ft}")
            out.append(ft)
            out += (enc & 0xFF).astype(np.uint8).tobytes()
        return bytes(out)

    if not interlace:
        raster = filter_pass(a, 0)
    else:
        parts, base = [], 0
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filter_pass(sub, base))
                base += sub.shape[0]
        raster = b"".join(parts)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)
    )
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("color_type 3 requires palette=")
        out += chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    comp = zlib.compress(raster, 6)
    # split the stream across two IDATs to exercise multi-IDAT reads
    mid = len(comp) // 2
    out += chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    return out + chunk(b"IEND", b"")


def synth_png_media(
    spark,
    n_rows: int = 50,
    width: int = 16,
    height: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-image table with 8-bit RGB PNG payloads —
    per-row filters cycle 0..4 and odd ids are Adam7-interlaced, so
    decoding exercises every unfilter branch and the interlace
    scatter; same ground-truth-equality contract as
    :func:`synth_ppm_media`."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads = []
            for i in ids:
                rng = np.random.default_rng(seed * 1000003 + int(i))
                raster = rng.integers(
                    0, 256, size=(height, width, 3), dtype=np.uint8
                )
                payloads.append(
                    png_bytes(
                        raster,
                        row_filters=[0, 1, 2, 3, 4],
                        interlace=bool(int(i) % 2),
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def _packbits_decode(data: bytes, need: int) -> bytes:
    """Apple PackBits (TIFF compression 32773): n>=0 -> n+1 literals;
    n in [-127,-1] -> next byte repeated 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < need:
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += bytes([data[i]]) * (1 - n)
            i += 1
    if len(out) < need:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:need])


def _tiff_lzw_decode(data: bytes, need: int) -> bytes:
    """TIFF-flavor LZW (compression 5): MSB-first variable-width codes
    starting at 9 bits, clear=256, EOI=257, EARLY code-width change
    (width bumps when the table reaches 2^width - 1, one entry sooner
    than GIF's LSB-first variant). Native fast path (tl_lzw_tiff) with
    this Python machine as source of truth and fallback."""
    from tl_spark.kernel import native_entropy

    native = native_entropy.lzw_tiff(data, need)
    if native is not None:
        return native
    out = bytearray()
    pos = buf = nbits = 0
    CLEAR, EOI = 256, 257
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < need:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            buf = (buf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (buf >> nbits) & ((1 << width) - 1)
        buf &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF LZW code {code} out of range")
        out += entry
        prev = entry
        # EARLY change, decoder side: the decoder's table lags the
        # encoder's by one entry, so it must widen one entry sooner
        # than its own size suggests (libtiff's maxcode-1 rule — the
        # famous TIFF6 spec off-by-one)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < need:
        raise ValueError("short TIFF LZW stream")
    return bytes(out[:need])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Encoder counterpart of :func:`_tiff_lzw_decode` (same early-
    change bookkeeping; table reset at 4094 entries per the spec)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code == 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _parse_tiff(payload: bytes) -> np.ndarray:
    """REAL decoder for baseline TIFF: pure struct/numpy, both byte
    orders (II/MM), 8-bit grayscale (photometric 0/1) and RGB/RGBA,
    chunky planar config, strip layout, uncompressed (1), Adobe
    Deflate (8, stdlib zlib), or PackBits (32773). Returns (h, w, 3)
    uint8 RGB. Raises ValueError on malformed or unsupported input
    (tiled, LZW, 16-bit, palette TIFFs stay on the stub policy)."""
    import struct

    if len(payload) < 8 or payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    for e in range(n_entries):
        at = ifd_off + 2 + 12 * e
        if at + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ = struct.unpack_from(bo + "HH", payload, at)
        (count,) = struct.unpack_from(bo + "I", payload, at + 4)
        if typ not in type_size:
            continue  # rationals etc. — not needed for raster decode
        total = type_size[typ] * count
        src = at + 8 if total <= 4 else struct.unpack_from(
            bo + "I", payload, at + 8
        )[0]
        if src + total > len(payload):
            raise ValueError("TIFF tag data out of bounds")
        tags[tag] = list(
            struct.unpack_from(bo + str(count) + type_fmt[typ], payload, src)
        )

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    comp = one(259, 1)
    photo = one(262)
    planar = one(284, 1)
    if any(b != 8 for b in bits) or planar != 1:
        raise ValueError(
            f"unsupported TIFF: bits={bits} planar={planar} (8-bit chunky only)"
        )
    if comp not in (1, 5, 8, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} "
            "(none/LZW/Deflate/PackBits only)"
        )
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if photo not in (0, 1, 2) or spp not in (1, 3, 4):
        raise ValueError(
            f"unsupported TIFF photometric={photo} samples={spp}"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)
    raster = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        rows = min(rows_per_strip, h - rows_done)
        need = rows * w * spp
        if comp == 32773:
            raster += _packbits_decode(strip, need)
        elif comp == 5:  # LZW
            raster += _tiff_lzw_decode(strip, need)
        elif comp == 8:  # Adobe Deflate (zlib stream per strip)
            import zlib

            try:
                inflated = zlib.decompress(strip)
            except zlib.error as exc:
                raise ValueError(f"bad TIFF deflate strip: {exc}") from exc
            if len(inflated) < need:
                raise ValueError("short TIFF deflate strip")
            raster += inflated[:need]
        else:
            if cnt < need:
                raise ValueError("truncated TIFF strip data")
            raster += strip[:need]
        rows_done += rows
    if len(raster) < h * w * spp:
        raise ValueError("TIFF raster short of declared dimensions")
    img = np.frombuffer(
        bytes(raster[: h * w * spp]), np.uint8
    ).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo via row cumsum
        img = np.cumsum(img, axis=1, dtype=np.uint8)
    if spp == 1:
        if photo == 0:  # WhiteIsZero -> invert
            img = 255 - img
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()  # drop alpha if present


def _packbits_encode(row: bytes) -> bytes:
    """Minimal spec-valid PackBits: runs of >=3 as repeats, else
    literals (row-bounded, as TIFF requires)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i = j + 1
        else:
            lit_start = i
            while (
                i < n
                and i - lit_start < 128
                and not (
                    i + 2 < n and row[i] == row[i + 1] == row[i + 2]
                )
            ):
                i += 1
            out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def tiff_bytes(
    img: np.ndarray,
    byte_order: str = "II",
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
) -> bytes:
    """Serialize 8-bit grayscale (h, w) or RGB (h, w, 3) as a baseline
    TIFF — writer counterpart of :func:`_parse_tiff` for tests.
    ``compression``: 1 (none), 5 (LZW, early-change), 8 (Adobe
    Deflate, zlib per strip), or 32773 (PackBits, encoded per row as
    the spec requires). ``predictor=2`` applies horizontal
    differencing before compression (tag 317)."""
    import struct

    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    if predictor == 2:
        wide = img.reshape(h, w, spp).astype(np.int16)
        img = (
            np.concatenate(
                [wide[:, :1], np.diff(wide, axis=1)], axis=1
            ) & 0xFF
        ).astype(np.uint8)
    bo = "<" if byte_order == "II" else ">"
    rps = h if rows_per_strip is None else rows_per_strip
    flat = img.reshape(h, w * spp)
    strips = []
    for r0 in range(0, h, rps):
        chunk = flat[r0 : r0 + rps].tobytes()
        if compression == 5:
            chunk = _tiff_lzw_encode(chunk)
        elif compression == 32773:
            rowlen = w * spp
            chunk = b"".join(
                _packbits_encode(chunk[i : i + rowlen])
                for i in range(0, len(chunk), rowlen)
            )
        elif compression == 8:
            import zlib

            chunk = zlib.compress(chunk, 6)
        strips.append(chunk)

    header = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
    entries = []
    extra = bytearray()
    data_base = None  # patched after layout

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [compression])
    entry(262, 3, [1 if gray else 2])
    entry(273, 4, ["STRIPS"])  # placeholder, patched below
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(279, 4, [len(s) for s in strips])
    if predictor == 2:
        entry(317, 3, [2])
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    type_size = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}
    # lay out overflow tag data after the IFD, strips after that
    overflow_at = 8 + ifd_size
    blobs = []
    for tag, typ, vals in entries:
        if vals == ["STRIPS"]:
            vals = [0] * len(strips)  # placeholder length
        total = type_size[typ] * len(vals)
        if total > 4:
            blobs.append(total)
    strips_at = overflow_at + sum(blobs)
    strip_offsets = []
    at = strips_at
    for s in strips:
        strip_offsets.append(at)
        at += len(s)
    out = bytearray(header)
    out += struct.pack(bo + "H", n)
    overflow = bytearray()
    ov_at = overflow_at
    for tag, typ, vals in entries:
        if vals == ["STRIPS"]:
            vals = strip_offsets
        total = type_size[typ] * len(vals)
        packed = struct.pack(bo + str(len(vals)) + type_fmt[typ], *vals)
        if total <= 4:
            val_field = packed + b"\x00" * (4 - total)
        else:
            val_field = struct.pack(bo + "I", ov_at)
            overflow += packed
            ov_at += total
        out += struct.pack(bo + "HHI", tag, typ, len(vals)) + val_field
    out += struct.pack(bo + "I", 0)  # next-IFD pointer
    out += overflow
    for s in strips:
        out += s
    return bytes(out)


def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """256-entry int16 decode tables for ITU-T G.711 mu-law and A-law,
    built from the published expansion formulas (the classic public-
    domain g711.c algorithm, vectorized)."""
    codes = np.arange(256, dtype=np.uint8)
    # mu-law: complement, then t = ((quant<<3)+BIAS) << segment
    u = (~codes) & 0xFF
    t = (((u & 0x0F).astype(np.int32) << 3) + 0x84) << ((u & 0x70) >> 4)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    # A-law: xor 0x55; segment 0 adds 8, segment 1 adds 0x108,
    # higher segments shift; sign bit SET means positive
    a = codes ^ 0x55
    seg = ((a & 0x70) >> 4).astype(np.int32)
    q = (a & 0x0F).astype(np.int32) << 4
    mag = np.where(
        seg == 0,
        q + 8,
        np.where(seg == 1, q + 0x108, (q + 0x108) << np.maximum(seg - 1, 0)),
    )
    alaw = np.where(a & 0x80, mag, -mag).astype(np.int16)
    return ulaw, alaw


_ULAW_LUT, _ALAW_LUT = _g711_luts()

_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
     37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
     157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
     544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
     1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
     4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
     12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
     29794, 32767],
    dtype=np.int32,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decoder step: returns (new_pred, new_idx)."""
    step = int(_IMA_STEPS[idx])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_INDEX[nibble & 7])))
    return pred, idx


def _ima_adpcm_decode(
    data: bytes, channels: int, block_align: int
) -> np.ndarray:
    """REAL decoder for IMA ADPCM WAV data (format tag 0x11): per-block
    4-byte channel headers (predictor int16, step index, reserved) —
    the predictor is the block's first output sample — then 4-byte
    data words interleaved per channel, two 4-bit samples per byte,
    low nibble first. Sequential per spec (each step's quantizer state
    depends on the previous); clips are media-sized, so the Python
    inner loop is acceptable. Returns (n, channels) int16."""
    hdr = 4 * channels
    if block_align <= hdr or (block_align - hdr) % (4 * channels) != 0:
        raise ValueError(f"bad IMA ADPCM block_align {block_align}")
    chans: list[list[int]] = [[] for _ in range(channels)]
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < hdr:
            raise ValueError("truncated IMA ADPCM block header")
        preds, idxs = [], []
        for c in range(channels):
            pred = int.from_bytes(
                block[4 * c : 4 * c + 2], "little", signed=True
            )
            idx = block[4 * c + 2]
            if idx > 88:
                raise ValueError(f"IMA ADPCM step index {idx} > 88")
            preds.append(pred)
            idxs.append(idx)
            chans[c].append(pred)  # header predictor = sample 0
        body = block[hdr:]
        if len(body) % (4 * channels) != 0:
            raise ValueError("truncated IMA ADPCM block body")
        for w0 in range(0, len(body), 4):
            c = (w0 // 4) % channels
            for byte in body[w0 : w0 + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                    chans[c].append(preds[c])
    n = min(len(ch) for ch in chans)
    out = np.empty((n, channels), dtype=np.int16)
    for c in range(channels):
        out[:, c] = chans[c][:n]
    return out


def _ima_adpcm_encode(
    samples: np.ndarray, words_per_block: int = 8
) -> tuple[bytes, int]:
    """IMA ADPCM encoder (writer counterpart of the decoder, same
    quantizer state machine). ``samples``: (n, channels) int16. Pads
    the tail block with the last sample. Returns (data, block_align).
    """
    n, channels = samples.shape
    spb = words_per_block * 8 + 1  # samples per block per channel
    block_align = 4 * channels + 4 * channels * words_per_block
    out = bytearray()
    idxs = [0] * channels
    for b0 in range(0, n, spb):
        blk = samples[b0 : b0 + spb]
        if blk.shape[0] < spb:  # pad with the final sample
            pad = np.repeat(blk[-1:], spb - blk.shape[0], axis=0)
            blk = np.concatenate([blk, pad], axis=0)
        preds = [int(blk[0, c]) for c in range(channels)]
        for c in range(channels):
            out += int(preds[c]).to_bytes(2, "little", signed=True)
            out.append(idxs[c])
            out.append(0)
        nibbles: list[list[int]] = [[] for _ in range(channels)]
        for c in range(channels):
            pred, idx = preds[c], idxs[c]
            for s in blk[1:, c]:
                step = int(_IMA_STEPS[idx])
                diff = int(s) - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                pred, idx = _ima_step(pred, idx, nib)
                nibbles[c].append(nib)
            idxs[c] = idx
        for w in range(words_per_block):
            for c in range(channels):
                for k in range(4):
                    lo = nibbles[c][w * 8 + 2 * k]
                    hi = nibbles[c][w * 8 + 2 * k + 1]
                    out.append(lo | (hi << 4))
    return bytes(out), block_align


def wav_bytes(
    samples: np.ndarray, rate: int = 8000, audio_fmt: int = 1,
    pcm_bits: int = 16,
) -> bytes:
    """Serialize (n, channels) int16 samples as a RIFF/WAV payload in
    format 1 (PCM at ``pcm_bits`` = 8/16/24), 6 (A-law), 7 (mu-law),
    or 0x11 (IMA ADPCM) — the writer counterpart of
    :func:`_parse_wav` for tests/synth tables. G.711 encoding picks
    the nearest code by decoded magnitude (exact inverse of the
    decode LUT on its own range)."""
    import struct

    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if audio_fmt == 1 and pcm_bits == 8:
        data = ((samples.astype(np.int32) >> 8) + 128).astype(
            np.uint8
        ).tobytes()
        bits, block_align = 8, channels
    elif audio_fmt == 1 and pcm_bits == 24:
        v = samples.astype(np.int32) << 8
        b = np.empty((n * channels, 3), np.uint8)
        flat = v.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        data = b.tobytes()
        bits, block_align = 24, 3 * channels
    elif audio_fmt == 1:
        data = samples.astype("<i2").tobytes()
        bits, block_align = 16, 2 * channels
    elif audio_fmt in (6, 7):
        lut = _ALAW_LUT if audio_fmt == 6 else _ULAW_LUT
        order = np.argsort(lut.astype(np.int32), kind="stable")
        pos = np.searchsorted(
            lut.astype(np.int32)[order], samples.astype(np.int32).ravel()
        )
        pos = np.clip(pos, 1, 255)
        lo, hi = order[pos - 1], order[np.minimum(pos, 255)]
        flat = samples.astype(np.int32).ravel()
        pick_hi = np.abs(lut[hi].astype(np.int32) - flat) < np.abs(
            lut[lo].astype(np.int32) - flat
        )
        data = np.where(pick_hi, hi, lo).astype(np.uint8).tobytes()
        bits, block_align = 8, channels
    elif audio_fmt == 0x11:
        data, block_align = _ima_adpcm_encode(samples)
        bits = 4
    else:
        raise ValueError(f"unsupported audio_fmt {audio_fmt}")
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, channels, rate,
        rate * block_align, block_align, bits,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def synth_tiff_media(
    spark,
    n_rows: int = 24,
    width: int = 17,
    height: int = 13,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-image table with baseline TIFF payloads
    cycling byte order (odd ids MM), compression (every third id
    PackBits), strip layout (every fourth id 4-row strips), and
    grayscale vs RGB (every fifth id gray); same ground-truth-equality
    contract as :func:`synth_ppm_media`."""

    def _payload(i: int) -> bytes:
        rng = np.random.default_rng(seed * 1000003 + int(i))
        if i % 5 == 0:
            img = rng.integers(0, 256, (height, width), np.uint8)
        else:
            img = rng.integers(0, 256, (height, width, 3), np.uint8)
        return tiff_bytes(
            img,
            byte_order="MM" if i % 2 else "II",
            compression=32773 if i % 3 == 0 else 1,
            rows_per_strip=4 if i % 4 == 0 else None,
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(
                        [_payload(int(i)) for i in ids], type=pa.binary()
                    ),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def synth_jpeg_media(
    spark,
    n_rows: int = 30,
    width: int = 48,
    height: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-image table with JFIF payloads (odd ids
    4:2:0-subsampled, every third id with restart markers, every
    fifth id progressive/SOF2). JPEG is lossy, so the ground-truth
    contract differs from the other synth tables: tests re-encode
    locally with the same parameters and demand feature equality
    against a local decode of the SAME payload (decode determinism),
    plus a PSNR bound vs the original."""
    from tl_spark.operators.jpeg import jpeg_bytes, jpeg_bytes_progressive

    def _payload(i: int) -> bytes:
        rng = np.random.default_rng(seed * 1000003 + int(i))
        yy, xx = np.mgrid[0:height, 0:width]
        f1, f2 = 5 + (i % 7), 4 + (i % 5)
        img = np.stack(
            [
                128 + 90 * np.sin(xx / f1) * np.cos(yy / f2),
                128 + 70 * np.cos(xx / (f2 + 2) + yy / f1),
                128 + 50 * np.sin((xx + yy) / (f1 + 3)),
            ],
            axis=2,
        )
        img = (img + rng.normal(0, 2, img.shape)).clip(0, 255).astype(np.uint8)
        if i % 5 == 4:
            return jpeg_bytes_progressive(
                img, quality=90, subsample="420" if i % 2 else "444"
            )
        return jpeg_bytes(
            img,
            quality=90,
            subsample="420" if i % 2 else "444",
            restart_interval=2 if i % 3 == 0 else 0,
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(
                        [_payload(int(i)) for i in ids], type=pa.binary()
                    ),
                ],
                names=["media_id", "payload"],
            )

    df = spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
    return attach_media_meta(df)


def _parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for RIFF/WAVE PCM16: pure struct/numpy parsing, no
    codec library. Returns (samples int16 ndarray of shape
    (n, channels), sample_rate). Format tags 1 (PCM16), 6 (A-law),
    7 (mu-law), and 0x11 (IMA ADPCM) decode for real; anything else
    raises ValueError."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, block_align, bits = fmt
    if channels < 1:
        raise ValueError("zero channels")
    if audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(
            data[: (len(data) // (2 * channels)) * 2 * channels], dtype="<i2"
        ).reshape(-1, channels)
        return samples, rate
    if audio_fmt == 1 and bits == 8:  # unsigned 8-bit PCM -> int16
        u = np.frombuffer(
            data[: (len(data) // channels) * channels], dtype=np.uint8
        )
        samples = ((u.astype(np.int16) - 128) << 8).reshape(-1, channels)
        return samples, rate
    if audio_fmt == 1 and bits == 24:  # little-endian 24-bit -> int16
        frame = 3 * channels
        trimmed = data[: (len(data) // frame) * frame]
        b = np.frombuffer(trimmed, dtype=np.uint8).reshape(-1, 3)
        # assemble signed 24-bit, then keep the top 16 bits
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return (v >> 8).astype(np.int16).reshape(-1, channels), rate
    if audio_fmt in (6, 7) and bits == 8:  # G.711 A-law / mu-law
        lut = _ALAW_LUT if audio_fmt == 6 else _ULAW_LUT
        codes = np.frombuffer(
            data[: (len(data) // channels) * channels], dtype=np.uint8
        )
        return lut[codes].reshape(-1, channels), rate
    if audio_fmt == 0x11 and bits == 4:  # IMA ADPCM
        return _ima_adpcm_decode(data, channels, block_align), rate
    raise ValueError(
        f"unsupported WAV (fmt={audio_fmt}, bits={bits}): only PCM16, "
        "G.711 A-law/mu-law, and IMA ADPCM decode"
    )


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
    on_error: str = "raise",
) -> DataFrame:
    """Per-clip audio features: duration_ms, RMS, zero-crossing rate,
    peak — computed from REAL samples for RIFF/WAV payloads in PCM16,
    G.711 A-law/mu-law, or IMA ADPCM (parsed by :func:`_parse_wav`);
    non-WAV payloads follow the stub policy (fake = deterministic
    sha256 sample stream, error = NotImplementedError). Map-only
    Arrow batches. ``on_error="skip"`` drops undecodable payloads
    instead of failing the task (the corpus-scale posture)."""
    _check_on_error(on_error)

    def _features(samples: np.ndarray, rate: int):
        mono = samples.astype(np.float64).mean(axis=1)
        n = len(mono)
        if n == 0:
            return 0, 0.0, 0.0, 0
        rms = float(np.sqrt(np.mean(mono**2)))
        zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        return (
            int(round(n * 1000 / rate)),
            round(rms, 6),
            round(zc, 6),
            # widen before abs: np.abs(int16 -32768) wraps to -32768
            int(np.abs(samples.astype(np.int32)).max()),
        )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            keep, dur, rms, zcr, peak = [], [], [], [], []
            for i, p in zip(ids, payloads):
                try:
                    if p and p[:4] == b"RIFF":
                        samples, rate = _malformed_as_valueerror(_parse_wav, p, "WAV")
                    elif p and p[:4] == b"fLaC":
                        from tl_spark.operators.flac import flac_decode

                        samples, rate = _malformed_as_valueerror(
                            flac_decode, p, "FLAC"
                        )
                    elif decode_stub == "fake":
                        raw = _fake_decode(p, 2048)
                        samples = raw.view("<i2").reshape(-1, 1).copy()
                        rate = 16000
                    else:
                        raise NotImplementedError(
                            "perceptual-codec audio (MP3/AAC) decoding "
                            "requires tables this container can't verify; "
                            "RIFF/WAV PCM16 and FLAC decode for real, or "
                            "pass decode_stub='fake'"
                        )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                d, r, z, pk = _features(samples, rate)
                keep.append(i)
                dur.append(d)
                rms.append(r)
                zcr.append(z)
                peak.append(pk)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(dur, type=pa.int64()),
                    pa.array(rms, type=pa.float64()),
                    pa.array(zcr, type=pa.float64()),
                    pa.array(peak, type=pa.int64()),
                ],
                names=[id_col, "duration_ms", "rms", "zcr", "peak"],
            )

    return df.select(id_col, payload_col).mapInArrow(
        fn,
        f"{id_col} long, duration_ms long, rms double, zcr double, peak long",
    )


def audio_spectral_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
    rolloff: float = 0.85,
    on_error: str = "raise",
) -> DataFrame:
    """Spectral descriptors per clip — centroid_hz, bandwidth_hz,
    flatness, rolloff_hz — from the magnitude spectrum (rfft) of the
    mono mix. WAV payloads (PCM16/G.711/ADPCM) decode for real; the
    stub policy applies otherwise. Map-only Arrow batches; the FFT is
    O(n log n) per clip and clips are media-sized.

    Definitions (magnitude spectrum m[k], bin freqs f[k], DC excluded
    from flatness): centroid = sum(f*m)/sum(m); bandwidth =
    sqrt(sum(((f-centroid)^2)*m)/sum(m)); flatness = geometric mean /
    arithmetic mean of m[1:]; rolloff_hz = lowest f below which
    ``rolloff`` of total magnitude accumulates."""

    def _spectral(samples: np.ndarray, rate: int):
        mono = samples.astype(np.float64).mean(axis=1)
        if len(mono) < 2 or not np.any(mono):
            return 0.0, 0.0, 0.0, 0.0
        m = np.abs(np.fft.rfft(mono))
        f = np.fft.rfftfreq(len(mono), d=1.0 / rate)
        tot = m.sum()
        if tot == 0:
            return 0.0, 0.0, 0.0, 0.0
        centroid = float((f * m).sum() / tot)
        bandwidth = float(np.sqrt((((f - centroid) ** 2) * m).sum() / tot))
        body = m[1:]
        pos = body[body > 0]
        flat = (
            float(np.exp(np.mean(np.log(pos))) / body.mean())
            if len(pos) == len(body) and len(body)
            else 0.0
        )
        cum = np.cumsum(m)
        ro = float(f[int(np.searchsorted(cum, rolloff * tot))])
        return (
            round(centroid, 6), round(bandwidth, 6),
            round(flat, 6), round(ro, 6),
        )

    _check_on_error(on_error)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            keep = []
            cols = ([], [], [], [])
            for i, p in zip(ids, payloads):
                try:
                    if p and p[:4] == b"RIFF":
                        samples, rate = _malformed_as_valueerror(_parse_wav, p, "WAV")
                    elif p and p[:4] == b"fLaC":
                        from tl_spark.operators.flac import flac_decode

                        samples, rate = _malformed_as_valueerror(
                            flac_decode, p, "FLAC"
                        )
                    elif decode_stub == "fake":
                        raw = _fake_decode(p, 2048)
                        samples = raw.view("<i2").reshape(-1, 1).copy()
                        rate = 16000
                    else:
                        raise NotImplementedError(
                            "perceptual-codec audio (MP3/AAC) decoding "
                            "requires tables this container can't verify; "
                            "WAV (PCM16/G.711/ADPCM) and FLAC decode for "
                            "real, or pass decode_stub='fake'"
                        )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                keep.append(i)
                for c, v in zip(cols, _spectral(samples, rate)):
                    c.append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(keep, type=pa.int64())]
                + [pa.array(c, type=pa.float64()) for c in cols],
                names=[
                    id_col, "centroid_hz", "bandwidth_hz",
                    "flatness", "rolloff_hz",
                ],
            )

    return df.select(id_col, payload_col).mapInArrow(
        fn,
        f"{id_col} long, centroid_hz double, bandwidth_hz double, "
        "flatness double, rolloff_hz double",
    )


def synth_wav_media(
    spark,
    n_rows: int = 20,
    n_samples: int = 800,
    rate: int = 8000,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-audio table: each payload is a valid RIFF/WAV
    PCM16 mono clip (seeded sine + noise), so :func:`audio_features`
    runs on genuine samples with exactly reproducible ground truth."""
    import struct

    def _wav_bytes(i: int) -> bytes:
        rng = np.random.default_rng(seed * 7919 + i)
        t = np.arange(n_samples)
        freq = 100 + (i % 10) * 50
        wave = 8000 * np.sin(2 * np.pi * freq * t / rate)
        wave = (wave + rng.integers(-500, 500, n_samples)).astype("<i2")
        data = wave.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([_wav_bytes(int(i)) for i in ids], type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    return spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")


def synth_compressed_wav_media(
    spark,
    n_rows: int = 30,
    n_samples: int = 400,
    rate: int = 8000,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL-audio table cycling the compressed WAV
    formats — id%3 selects A-law (6), mu-law (7), IMA ADPCM (0x11);
    odd ids are stereo. Same ground-truth contract as
    :func:`synth_wav_media`: tests re-encode/re-decode locally and
    demand exact sample equality with the Spark-side decode."""

    def _payload(i: int) -> bytes:
        rng = np.random.default_rng(seed * 7919 + i)
        t = np.arange(n_samples)
        ch = 2 if i % 2 else 1
        sig = np.stack(
            [
                (
                    6000 * np.sin(2 * np.pi * (100 + 50 * (i % 10) + 30 * c) * t / rate)
                    + rng.integers(-300, 300, n_samples)
                ).astype(np.int16)
                for c in range(ch)
            ],
            axis=1,
        )
        fmt = (6, 7, 0x11)[i % 3]
        return wav_bytes(sig, rate, fmt)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(
                        [_payload(int(i)) for i in ids], type=pa.binary()
                    ),
                ],
                names=["media_id", "payload"],
            )

    return spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")


def resize_images(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
    on_error: str = "raise",
) -> DataFrame:
    """Image resize (task brief op): decode (REAL for PPM/BMP/GIF/
    PNG/JPEG via ``_decode_image``'s header sniff, stub
    policy otherwise), nearest-neighbor downsample the grayscale plane
    to (out_h, out_w) with deterministic index sampling, and emit the
    resized plane as a binary column plus dims. Map-only Arrow
    batches; the output is fixed-size (out_h*out_w bytes/row), so a
    downstream shuffle or embedding step sees bounded rows regardless
    of source resolution."""

    _check_on_error(on_error)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column("media").to_pylist()
            keep, blobs, means = [], [], []
            for i, p, m in zip(ids, payloads, metas):
                try:
                    img = _decode_image(
                        p, m["width"], m["height"], decode_stub
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                h, w = img.shape
                # nearest-neighbor: index grid centers, deterministic
                ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = img[np.ix_(ys, xs)]
                keep.append(i)
                blobs.append(small.tobytes())
                means.append(float(small.mean()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(blobs, type=pa.binary()),
                    pa.array([out_w] * len(blobs), type=pa.int32()),
                    pa.array([out_h] * len(blobs), type=pa.int32()),
                    pa.array(means, type=pa.float64()),
                ],
                names=[id_col, "pixels", "out_w", "out_h", "mean_px"],
            )

    return df.select(id_col, payload_col, "media").mapInArrow(
        fn,
        f"{id_col} long, pixels binary, out_w int, out_h int, mean_px double",
    )
