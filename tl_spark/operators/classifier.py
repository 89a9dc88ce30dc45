"""Trainable text quality classifier: logistic regression over the
engine's hashed bag-of-words embeddings.

The standard web-corpus curation tool (GPT-3's WebText-vs-CommonCrawl
filter, LLaMA's Wikipedia-reference classifier, RefinedWeb/FineWeb
variants are all this shape): score documents with a tiny linear model
over cheap text features and keep/weight by score. This implementation
is model-free of external deps — features come from
:func:`tl_spark.operators.embed.hashed_embedding` (signed feature
hashing, Weinberger et al. 2009), the classifier is plain logistic
regression.

Scale shape (the ``train_bpe`` pattern):
- TRAINING runs on a bounded, content-hash-deterministic sample:
  features are computed DISTRIBUTED (hashed_embedding: one id shuffle),
  then at most ``max_train_docs`` per class of sparse (doc, slot, val)
  triples reach the driver, where full-batch gradient descent runs in
  numpy — deterministic (no SGD shuffling), partition-independent.
- SCORING is map-only after the embedding's single id shuffle: the
  weight vector ships in the task closure (dim floats, a few KB) and a
  vectorized Arrow batch computes sigmoid(emb @ w + b) — no per-row
  Python, no join, no broadcast table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tl_spark.operators.embed import hashed_embedding


def _collect_sparse(emb: DataFrame, max_docs: int):
    """Deterministically sample ``max_docs`` docs (by xxhash64 of id)
    and collect their non-zero (row, slot, val) triples."""
    picked = (
        emb.withColumn("_h", F.xxhash64(F.col("id")))
        .orderBy("_h", "id")
        .limit(max_docs)
        .select("id", "embedding")
    )
    rows = picked.collect()
    doc_idx, slots, vals = [], [], []
    for r_i, r in enumerate(rows):
        for s_i, v in enumerate(r["embedding"]):
            if v != 0.0:
                doc_idx.append(r_i)
                slots.append(s_i)
                vals.append(v)
    return (
        len(rows),
        np.asarray(doc_idx, np.int64),
        np.asarray(slots, np.int64),
        np.asarray(vals, np.float64),
    )


def train_text_classifier(
    pos: DataFrame,
    neg: DataFrame,
    dim: int = 4096,
    epochs: int = 100,
    lr: float = 2.0,
    l2: float = 1e-4,
    max_train_docs: int = 20_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> dict:
    """Train a logistic-regression quality model from positive
    (keep-worthy) and negative (drop-worthy) example corpora.

    Returns a plain-dict model {"w": [dim floats], "b": float,
    "dim": int, "hash_fn": str} — JSON-serializable, closure-shippable.

    Deterministic: the per-class sample is xxhash64-ordered (content
    of ids, not partition order), features are the deterministic
    hashed embeddings, and training is full-batch gradient descent
    (no stochastic shuffling) — identical inputs give an identical
    model on any cluster layout.
    """
    if dim < 2 or epochs < 1 or max_train_docs < 2:
        raise ValueError("bad training hyper-parameters")
    n_p, dp, sp, vp = _collect_sparse(
        hashed_embedding(pos, dim, text_col, id_col, hash_fn=hash_fn),
        max_train_docs,
    )
    n_n, dn, sn, vn = _collect_sparse(
        hashed_embedding(neg, dim, text_col, id_col, hash_fn=hash_fn),
        max_train_docs,
    )
    if n_p == 0 or n_n == 0:
        raise ValueError("both classes need at least one document")
    n = n_p + n_n
    doc = np.concatenate([dp, dn + n_p])
    slot = np.concatenate([sp, sn])
    val = np.concatenate([vp, vn])
    y = np.concatenate([np.ones(n_p), np.zeros(n_n)])
    # class balancing: each class contributes equal total weight
    sample_w = np.concatenate(
        [np.full(n_p, 0.5 / n_p), np.full(n_n, 0.5 / n_n)]
    )

    w = np.zeros(dim, np.float64)
    b = 0.0
    for _ in range(epochs):
        m = np.zeros(n, np.float64)
        np.add.at(m, doc, val * w[slot])
        p = 1.0 / (1.0 + np.exp(-(m + b)))
        err = (p - y) * sample_w
        grad = np.zeros(dim, np.float64)
        np.add.at(grad, slot, err[doc] * val)
        grad += l2 * w
        w -= lr * grad
        b -= lr * float(err.sum())
    return {
        "w": w.tolist(),
        "b": float(b),
        "dim": int(dim),
        "hash_fn": hash_fn,
    }


def classifier_scores(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score) — sigmoid(w . hashed_embedding + b), higher = more
    keep-worthy. Features are recomputed with the model's own dim and
    hash function, so train/score featurization can never drift.

    Plan shape: hashed_embedding's single id shuffle, then ONE
    mapInArrow stage with the weights in the closure (vectorized
    matmul over the batch's embedding matrix — no join, no broadcast
    table, no per-row Python)."""
    w = np.asarray(model["w"], np.float64)
    b = float(model["b"])
    dim = int(model["dim"])
    if w.shape != (dim,):
        raise ValueError("model weight/dim mismatch")
    emb = hashed_embedding(
        df, dim, text_col, id_col, hash_fn=model.get("hash_fn", "xxhash64")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id")
            embs = batch.column("embedding")
            n = len(ids)
            flat = np.asarray(
                embs.flatten().to_numpy(zero_copy_only=False), np.float64
            )
            if flat.size != n * dim:  # ragged/null rows: slow path
                mat = np.array(embs.to_pylist(), np.float64).reshape(n, dim)
            else:
                mat = flat.reshape(n, dim)
            score = 1.0 / (1.0 + np.exp(-(mat @ w + b)))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(np.round(score, 6), type=pa.float64())],
                names=["id", "score"],
            )

    return emb.mapInArrow(fn, "id long, score double")


def classify_quality(
    df: DataFrame,
    model: dict,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, keep) — thresholded keep decision per document."""
    s = classifier_scores(df, model, text_col, id_col)
    return s.select(
        "id", "score", (F.col("score") >= threshold).alias("keep")
    )
