"""Winnowing document fingerprints + substring-overlap detection.

The MOSS algorithm (Schleimer, Wilkerson, Aiken 2003 — public): hash
every k-gram of the document, slide a window of ``w`` hashes, keep
each window's minimum. Guarantee: any substring match of length >=
``w + k - 1`` characters between two documents shares at least one
selected fingerprint — so fingerprint overlap detects long verbatim
substring reuse (license boilerplate, quoted passages, template
text) that whole-document MinHash misses when the rest of the
documents differ.

Scale shape (100 TB):
- fingerprinting is map-only (one Arrow-batch numpy kernel per
  partition, the same wrap-mod-2^64 cumulative polynomial trick as
  ``functions.text.rolling_fingerprint``);
- overlap pairing explodes (doc, fp), caps pathological fingerprint
  buckets exactly like the MinHash LSH band join (a fingerprint
  shared by thousands of docs is boilerplate, not signal), and
  self-joins ids only — shuffle rows are (fp, id) pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = np.uint64(1000003)


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """All k-gram polynomial hashes mod 2^64 of a uint8 byte array,
    via the invertible-base cumulative-sum trick (B odd => B^-1 exists
    mod 2^64; uint64 wraparound IS the modulus)."""
    binv = np.uint64(pow(int(_B), -1, 1 << 64))
    n = len(data)
    d = data.astype(np.uint64)
    pows = np.ones(n, dtype=np.uint64)
    pows[1:] = _B
    np.cumprod(pows, out=pows)
    invpows = np.ones(n, dtype=np.uint64)
    invpows[1:] = binv
    np.cumprod(invpows, out=invpows)
    c = np.cumsum(d * invpows, dtype=np.uint64)
    cw = c[k - 1 :]
    cprev = np.concatenate((np.zeros(1, dtype=np.uint64), c[: n - k]))
    return pows[k - 1 :] * (cw - cprev)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """(id, fps array<long>) — the distinct winnowing-selected
    fingerprints per document (sorted, int64-viewed). Documents
    shorter than ``k`` bytes get an empty array."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        with np.errstate(over="ignore"):
            for batch in batches:
                ids = batch.column(id_col)
                texts = batch.column(text_col).to_pylist()
                out = []
                for t in texts:
                    data = np.frombuffer(
                        (t or "").encode("utf-8"), dtype=np.uint8
                    )
                    if len(data) < k:
                        out.append([])
                        continue
                    h = _kgram_hashes(data, k)
                    if len(h) <= window:
                        sel = np.array([h.min()], dtype=np.uint64)
                    else:
                        sel = np.unique(
                            np.lib.stride_tricks.sliding_window_view(
                                h, window
                            ).min(axis=1)
                        )
                    out.append(
                        sorted(int(x) for x in sel.view(np.int64))
                    )
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(out, type=pa.list_(pa.int64()))],
                    names=[id_col, "fps"],
                )

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, fps array<long>"
    )


def substring_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 64,
) -> DataFrame:
    """(id_a, id_b, n_shared) for id_a < id_b — document pairs sharing
    >= ``min_shared`` winnowing fingerprints (i.e., likely verbatim
    substring reuse of length >= window + k - 1). ``max_bucket_size``
    drops boilerplate fingerprints shared by huge doc sets before the
    self-join, the same worst-case bound as the MinHash band join."""
    fps = winnow_fingerprints(df, text_col, id_col, k, window)
    flat = fps.select(
        F.col(id_col).alias("id"), F.explode("fps").alias("fp")
    )
    sizes = flat.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
    flat = (
        flat.join(sizes, "fp")
        .filter(F.col("_n") <= max_bucket_size)
        .drop("_n")
    )
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
