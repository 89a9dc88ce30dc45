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
