"""End-to-end corpus curation: the operators composed into one job.

extract -> text stats -> exact dedup -> MinHash near-dup -> quality
filter -> curated parquet + a drop-reason report. This is the
"training-data pipeline" shape the engine exists for; each stage is
the already-tested operator, composed with the same scale rules
(broadcast small sides, digest-only shuffles, map-only extraction).

Drop precedence (a row is counted once, in this order):
  exact_dup > near_dup > low_quality > too_short
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tl_spark.functions.extract import extract_main_content
from tl_spark.functions.text import lang_guess, quality_score, token_count
from tl_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)


def curate(
    df: DataFrame,
    text_col: str = "text",
    quality_min: float = 0.2,
    min_tokens: int = 2,
    neardup_jaccard: float = 0.85,
    strip_tags=None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, dropped) DataFrames.

    ``curated``: conv_id, turn_idx, role, ts, extracted_text, n_tokens,
    quality, lang_guess, doc_uid.
    ``dropped``: doc_uid + drop_reason (exact_dup | near_dup |
    low_quality | too_short).
    """
    from tl_spark.functions.extract import DEFAULT_STRIP_TAGS

    ex = extract_main_content(
        df,
        text_col=text_col,
        passthrough=["conv_id", "turn_idx", "role", "ts"],
        strip_tags=DEFAULT_STRIP_TAGS if strip_tags is None else strip_tags,
    )
    ex = ex.withColumn(
        "doc_uid", F.xxhash64("conv_id", "turn_idx")
    ).withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))

    c = F.col("extracted_text")
    stats = ex.select(
        "conv_id", "turn_idx", "role", "ts", "extracted_text", "doc_uid",
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
    )

    # exact dedup: keep the first (conv_id, turn_idx) per distinct text;
    # window over the text hash — one digest shuffle
    w = Window.partitionBy(F.sha2("extracted_text", 256)).orderBy(
        "conv_id", "turn_idx"
    )
    stats = stats.withColumn("_rank", F.row_number().over(w))
    exact_dups = stats.filter(F.col("_rank") > 1).select(
        "doc_uid", F.lit("exact_dup").alias("drop_reason")
    )
    survivors = stats.filter(F.col("_rank") == 1).drop("_rank")

    # near-dup among exact-dedup survivors: LSH candidates verified by
    # character-shingle Jaccard; drop the later (conv, turn) of a pair.
    docs = survivors.select(
        F.col("doc_uid").alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )
    cands = minhash_lsh_candidates(docs, n_hashes=32, bands=8)
    verified = ngram_jaccard_pairs(
        docs, cands, threshold=neardup_jaccard
    )
    near_dups = (
        verified.select(F.col("id_b").alias("doc_uid"))
        .distinct()
        .join(exact_dups.select("doc_uid"), "doc_uid", "left_anti")
        .select("doc_uid", F.lit("near_dup").alias("drop_reason"))
    )

    kept_after_dedup = survivors.join(
        near_dups.select("doc_uid"), "doc_uid", "left_anti"
    )

    low_q = kept_after_dedup.filter(
        (F.col("quality") < quality_min) & (F.col("n_tokens") >= min_tokens)
    ).select("doc_uid", F.lit("low_quality").alias("drop_reason"))
    short = kept_after_dedup.filter(F.col("n_tokens") < min_tokens).select(
        "doc_uid", F.lit("too_short").alias("drop_reason")
    )

    curated = kept_after_dedup.filter(
        (F.col("quality") >= quality_min) & (F.col("n_tokens") >= min_tokens)
    )
    dropped = exact_dups.unionByName(near_dups).unionByName(low_q).unionByName(short)
    return curated, dropped


def run_curation_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    **kwargs,
) -> dict:
    t0 = time.time()
    df = spark.read.parquet(input_path)
    curated, dropped = curate(df, **kwargs)
    curated.write.mode("overwrite").parquet(output_path)
    reasons = {
        r["drop_reason"]: r["n"]
        for r in dropped.groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_in = df.count()
    n_out = spark.read.parquet(output_path).count()
    return {
        "rows_in": n_in,
        "rows_curated": n_out,
        "dropped": reasons,
        "wall_s": round(time.time() - t0, 2),
    }
