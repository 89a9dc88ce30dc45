"""Sequence packing: assign documents to fixed-capacity training
sequences (training-data op).

LLM pre-training consumes fixed-length sequences; packing multiple
short documents into one sequence (instead of padding each) is the
standard throughput lever. The distributed shape used here:

1. token counts are a map-only projection (whitespace token family —
   swap in the BPE-ish counter for budget-exact packing);
2. documents are bucketed DETERMINISTICALLY by hash(id) % n_buckets —
   the packing shuffle key. Bucket count scales with corpus size, so
   each bucket is a bounded in-memory group;
3. within a bucket, docs are sorted by id and packed greedily
   (first-fit-contiguous) in one ``applyInPandas`` pass — the only
   inherently sequential step, parallel ACROSS buckets;
4. pack ids are globally unique and deterministic:
   ``bucket * 2^32 + local_pack_index`` — independent of input
   partitioning, executor count, and scheduling order.

Oversize documents (token count > capacity) become single-doc packs
flagged ``oversize`` — the caller decides whether to split/truncate
them (a tokenizer-level concern) or drop them.

At 100 TB: one shuffle on the bucket key; group state is
O(docs_per_bucket) ids+counts, tunable; no driver actions anywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tl_spark.functions.text import token_count

PACK_SCHEMA = (
    "doc_id long, n_tokens int, bucket int, pack_id long, "
    "pack_pos int, oversize boolean"
)


def pack_documents(
    df: DataFrame,
    capacity: int = 2048,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document: (doc_id, n_tokens, bucket, pack_id,
    pack_pos, oversize). Every document appears exactly once; the sum
    of ``n_tokens`` within a pack never exceeds ``capacity`` unless the
    pack is a single ``oversize`` document."""
    assert capacity > 0 and n_buckets > 0
    counted = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("int").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        base = bucket << 32
        pack_ids, positions, oversize = [], [], []
        cur_pack, cur_fill, cur_pos = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > capacity:
                # oversize: its own pack, never shared. Break on
                # cur_pos (occupancy), not cur_fill — zero-token docs
                # occupy positions without raising cur_fill, and the
                # oversize doc must not share their pack.
                if cur_pos > 0:
                    cur_pack += 1
                pack_ids.append(base + cur_pack)
                positions.append(0)
                oversize.append(True)
                cur_pack += 1
                cur_fill, cur_pos = 0, 0
                continue
            if cur_fill + n > capacity:
                cur_pack += 1
                cur_fill, cur_pos = 0, 0
            pack_ids.append(base + cur_pack)
            positions.append(cur_pos)
            oversize.append(False)
            cur_fill += n
            cur_pos += 1
        out = pdf[["doc_id", "n_tokens", "bucket"]].copy()
        out["pack_id"] = pd.Series(pack_ids, dtype="int64")
        out["pack_pos"] = pd.Series(positions, dtype="int32")
        out["oversize"] = oversize
        return out

    return counted.groupBy("bucket").applyInPandas(pack, PACK_SCHEMA)


def pack_summary(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-pack fill statistics: (pack_id, n_docs, total_tokens, fill)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(capacity)), 4).alias("fill"),
    )
