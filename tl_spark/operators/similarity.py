"""Similarity search over an embedding column (array<float>).

Two paths, per SURVEY/task brief:

- cosine_topk_bruteforce: exact top-k against a literal query vector.
  The dot product is a JVM-side ``aggregate(zip_with(...))`` — stays in
  whole-stage codegen, no Python. At 100 TB this is the once-in-a-while
  exact path: a full scan + a tiny TakeOrdered; no shuffle of the
  vectors themselves.

- lsh_bucket_candidates: the scale path. Random-hyperplane signatures
  (sign-bit LSH) computed by a vectorized Arrow UDF (numpy matmul per
  batch; the plane matrix is seeded and regenerated per worker, no
  driver-side broadcast payload). Probing cost becomes
  O(bucket size), and bucket assignment is a narrow map — candidates
  co-locate with one hash-shuffle on the signature.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_sim_col(vec_col: str, query: list[float]):
    """JVM-side cosine(vec, literal query) as a Column (double)."""
    qlit = "array(" + ",".join(f"cast({x!r} as double)" for x in query) + ")"
    dot = (
        f"aggregate(zip_with({vec_col}, {qlit}, (x, y) -> cast(x as double) * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    nv = (
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * x), "
        f"cast(0.0 as double), (acc, v) -> acc + v))"
    )
    nq = sum(x * x for x in query) ** 0.5
    return F.expr(f"({dot}) / (({nv}) * cast({nq!r} as double))")


def cosine_topk_bruteforce(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity (ties broken by id for
    determinism). Plan: scan -> project -> TakeOrderedAndProject."""
    sim = cosine_sim_col(vec_col, query)
    return (
        df.select(F.col(id_col).alias("id"), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _make_lsh_udf(n_planes: int, dim: int, seed: int):
    @pandas_udf("int")
    def lsh_sig(vecs: pd.Series) -> pd.Series:
        import numpy as np

        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    return lsh_sig


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    Pairs are generated only within LSH sign-buckets (one shuffle on the
    bucket id), then verified with the exact JVM-side cosine. Bucket-size
    cap bounds the worst case exactly like the MinHash path.
    """
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    dim = len(first[0])
    sig_udf = _make_lsh_udf(n_planes, dim, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        sig_udf(F.col(vec_col)).alias("_sig"),
    )
    sizes = b.groupBy("_sig").agg(F.count(F.lit(1)).alias("_bsz"))
    b = b.join(sizes, "_sig").filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")

    pa_, pb_ = b.alias("a"), b.alias("b")
    pairs = pa_.join(
        pb_,
        (F.col("a._sig") == F.col("b._sig")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.v").alias("va"),
        F.col("b.v").alias("vb"),
    )
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), (s, v) -> s + v)"
    na = "sqrt(aggregate(transform(va, x -> x * x), cast(0.0 as double), (s, v) -> s + v))"
    nb = "sqrt(aggregate(transform(vb, x -> x * x), cast(0.0 as double), (s, v) -> s + v))"
    cos = F.expr(f"({dot}) / (({na}) * ({nb}))")
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_bucket_candidates(
    df: DataFrame,
    query: list[float],
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    k: int = 10,
) -> DataFrame:
    """ANN: rank by exact cosine only within the query's LSH bucket.

    Recall/latency tradeoff is n_planes (bucket count 2^n_planes).
    Deterministic: the plane matrix depends only on (seed, dim).
    """
    import numpy as np

    dim = len(query)
    sig_udf = _make_lsh_udf(n_planes, dim, seed)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qbits = (np.asarray(query) @ planes) > 0
    qsig = int((qbits @ (1 << np.arange(n_planes))).astype(np.int64))

    bucketed = df.withColumn("_sig", sig_udf(F.col(vec_col)))
    probe = bucketed.filter(F.col("_sig") == qsig)
    sim = cosine_sim_col(vec_col, query)
    return (
        probe.select(F.col(id_col).alias("id"), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
