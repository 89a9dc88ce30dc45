"""Model-free text embeddings via the signed feature-hashing trick.

Weinberger et al. (2009): hash each token to one of ``dim`` slots
with a +/-1 sign from a second hash, sum, L2-normalize. No model
artifact, fully deterministic, and cosine over these vectors is an
unbiased estimator of the (normalized) bag-of-words similarity — so
the output plugs straight into the engine's vector stack
(cosine_topk_bruteforce / LSH-ANN / IVF / PQ / embedding_neardup),
closing a complete text -> vector -> retrieval path with zero
external dependencies.

Scale shape: tokenize/explode/hash are map-side; ONE shuffle on the
doc id aggregates slot sums; the dense vector materializes from the
aggregated map via JVM ``transform(sequence(...))`` — no Python, no
UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tl_spark.functions.text import tokens


def hashed_embedding(
    df: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, embedding array<float>) — L2-normalized signed-hash
    bag-of-words vectors. Documents with no tokens get the zero
    vector (normalization guarded).

    ``hash_fn``: "xxhash64" (default; fastest, Spark-specific) or
    "md5" — slot from the first 8 hex chars, sign from the next 8.
    The md5 leg exists because it is exactly re-expressible in ANSI
    SQL (DuckDB ``CAST('0x'||substr(md5(tok),1,8) AS UBIGINT)``), so
    the driver oracle can pin the full hashing+normalization path;
    both legs share every other step."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    tok = F.explode(tokens(F.col(text_col))).alias("tok")
    t = df.select(F.col(id_col).alias("id"), tok)
    if lowercase:
        t = t.select("id", F.lower(F.col("tok")).alias("tok"))
    if hash_fn == "md5":
        h = F.md5(F.col("tok"))
        slot = F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim)
        ).cast("int")
        sign = (
            F.pmod(
                F.conv(F.substring(h, 9, 8), 16, 10).cast("long"), F.lit(2)
            )
            * 2
            - 1
        ).cast("double")
    else:
        slot = F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int")
        sign = (
            F.pmod(F.xxhash64("tok", F.lit("sign-salt")), F.lit(2)) * 2 - 1
        ).cast("double")
    sums = (
        t.select("id", slot.alias("slot"), sign.alias("s"))
        .groupBy("id", "slot")
        .agg(F.sum("s").alias("v"))
    )
    as_map = sums.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("slot", "v"))
        ).alias("m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i], F.lit(0.0)),
    )
    vec = as_map.select("id", dense.alias("_raw"))
    norm = F.sqrt(
        F.aggregate(
            "_raw", F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    out = vec.select(
        "id",
        F.when(
            norm > 0,
            F.transform("_raw", lambda x: (x / norm).cast("float")),
        )
        .otherwise(F.transform("_raw", lambda x: x.cast("float")))
        .alias("embedding"),
    )
    # docs with zero tokens never reach the aggregation — re-attach
    # them with the zero vector so the output covers every input id
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    zero = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.lit(0.0).cast("float"),
    )
    missing = all_ids.join(out.select("id"), "id", "left_anti").select(
        "id", zero.alias("embedding")
    )
    return out.unionByName(missing)
