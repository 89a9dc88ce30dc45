"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (per the build brief): image/audio/video travel as ``binary``
columns with a typed metadata struct. All Spark-side plumbing — schema,
partition-preserving mapInArrow, batch shapes, deterministic
feature/frame outputs — is REAL and tested; only the codec step is
stubbed, because no image/audio libraries exist in this container:

- ``decode_stub="error"``  -> NotImplementedError (the honest default
  for production: plug a real codec into ``_decode_image``/_audio).
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


def _decode_image(payload: bytes, width: int, height: int, stub: str) -> np.ndarray:
    if stub == "fake":
        return _fake_decode(payload, width * height).reshape(height, width)
    raise NotImplementedError(
        "image decoding requires a codec library; none is available in "
        "this container — pass decode_stub='fake' for the deterministic "
        "test decoder, or plug a real decoder in here"
    )


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
) -> DataFrame:
    """Per-image feature extraction: decode -> 16-bin histogram +
    mean/std, vectorized per Arrow batch."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col)
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column("media").to_pylist()
            hists, means, stds = [], [], []
            for p, m in zip(payloads, metas):
                img = _decode_image(p, m["width"], m["height"], decode_stub)
                hist = np.bincount(img.ravel() >> 4, minlength=16)
                hists.append([int(x) for x in hist])
                means.append(float(img.mean()) if img.size else 0.0)
                stds.append(float(img.std()) if img.size else 0.0)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
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


def sample_frames(
    df: DataFrame,
    every_k: int = 10,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "error",
) -> DataFrame:
    """Frame sampling for video payloads: one OUTPUT ROW per kept frame
    (row-expanding mapInArrow — batch cardinality legitimately changes).
    """

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column("media").to_pylist()
            out_ids, out_frame_idx, out_mean = [], [], []
            for i, p, m in zip(ids, payloads, metas):
                if m["media_type"] != "video":
                    continue
                for fidx in range(0, m["n_frames"], every_k):
                    if decode_stub == "fake":
                        frame = _fake_decode(
                            (p or b"") + fidx.to_bytes(4, "little"), 256
                        )
                        out_mean.append(float(frame.mean()))
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
