"""Incremental near-dup detection against a persisted MinHash index.

The production dedup shape: the corpus's banded-LSH index is built
ONCE and persisted; each arriving increment (a day's crawl, a new
shard) is checked against it without re-sketching the corpus. This is
the difference between O(increment) and O(corpus) per ingest at
100 TB.

Index layout under ``path`` (all parquet, any Hadoop-visible FS):
- ``bands/``  (band, bh, id) partitioned by ``band`` — the bucket
  table the increment joins against;
- ``sigs/``   (id, sig) — for est_jaccard verification;
- ``meta/``   one row of sketch parameters (n_hashes, bands,
  shingle_k, sample_mod). Increments READ their parameters from meta,
  so a mismatched sketch is impossible by construction.

Scale shape: the increment's band table is tiny relative to the index
and is explicitly broadcast — the index side is scanned map-only
(no shuffle of corpus-sized data), and the verification join attaches
signatures by id for matched candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tl_spark.operators.dedup import minhash_signatures


def _band_rows(sigs: DataFrame, bands: int, r: int) -> DataFrame:
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * r + 1, r)).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("id", "e.band", "e.bh")


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    sample_mod: int | None = None,
) -> dict:
    """Build and persist the corpus MinHash index. Returns counts."""
    assert n_hashes % bands == 0
    r = n_hashes // bands
    spark = df.sparkSession
    sigs = (
        minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, sample_mod)
        .filter(F.col("sig").isNotNull())
        .persist()
    )
    try:
        base = path.rstrip("/")
        sigs.write.mode("overwrite").parquet(base + "/sigs")
        _band_rows(sigs, bands, r).write.mode("overwrite").partitionBy(
            "band"
        ).parquet(base + "/bands")
        spark.createDataFrame(
            [(n_hashes, bands, shingle_k, sample_mod)],
            "n_hashes int, bands int, shingle_k int, sample_mod int",
        ).write.mode("overwrite").parquet(base + "/meta")
        n = sigs.count()
    finally:
        sigs.unpersist()
    return {"docs_indexed": n, "path": base}


def incremental_neardup(
    df_new: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """(id_new, id_index, est_jaccard) — near-dup candidates between
    the increment and the persisted index, est >= ``threshold``.
    Sketch parameters come from the index's meta table (mismatch is
    impossible). The increment side is broadcast; the index bucket
    table is scanned map-only."""
    spark = df_new.sparkSession
    base = index_path.rstrip("/")
    meta = spark.read.parquet(base + "/meta").collect()[0]
    n_hashes, bands = meta["n_hashes"], meta["bands"]
    r = n_hashes // bands
    new_sigs = (
        minhash_signatures(
            df_new, text_col, id_col, n_hashes,
            meta["shingle_k"], meta["sample_mod"],
        )
        .filter(F.col("sig").isNotNull())
        .persist()
    )
    new_bands = _band_rows(new_sigs, bands, r).select(
        F.col("id").alias("id_new"), "band", "bh"
    )
    idx_bands = spark.read.parquet(base + "/bands").select(
        F.col("id").alias("id_index"), "band", "bh"
    )
    cands = (
        idx_bands.join(F.broadcast(new_bands), ["band", "bh"])
        .select("id_new", "id_index")
        .dropDuplicates(["id_new", "id_index"])
    )
    idx_sigs = spark.read.parquet(base + "/sigs").select(
        F.col("id").alias("id_index"), F.col("sig").alias("sig_i")
    )
    paired = cands.join(
        new_sigs.select(F.col("id").alias("id_new"), F.col("sig").alias("sig_n")),
        "id_new",
    ).join(idx_sigs, "id_index")
    est = F.expr(
        "size(filter(zip_with(sig_n, sig_i, (x, y) -> x = y), v -> v)) "
        f"/ cast({n_hashes} as double)"
    )
    out = (
        paired.select(
            "id_new", "id_index", F.round(est, 4).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    from tl_spark.cache import attach_handles

    # caller-owned handle for the increment's signature cache
    return attach_handles(out, new_sigs)
