"""Model-free text embeddings via the signed feature-hashing trick.

Weinberger et al. (2009): hash each token to one of ``dim`` slots
with a +/-1 sign from a second hash, sum, L2-normalize. No model
artifact, fully deterministic, and cosine over these vectors is an
unbiased estimator of the (normalized) bag-of-words similarity — so
the output plugs straight into the engine's vector stack
(cosine_topk_bruteforce / LSH-ANN / IVF / PQ / embedding_neardup),
closing a complete text -> vector -> retrieval path with zero
external dependencies.

Scale shape, JVM leg: tokenize/explode/hash are map-side; ONE
shuffle on the doc id aggregates slot sums; the dense vector
materializes from the aggregated map via JVM
``transform(sequence(...))`` — no Python, no UDF, fully codegen'd.
Arrow leg (round 8, md5 family only): a single map-only
``mapInArrow`` computes the identical vectors per batch with zero
shuffles — bit-equal, suite-pinned (see ``impl="arrow"``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tl_spark.functions.text import tokens


def _batch_hashed_embedding_md5(texts, dim: int, lowercase: bool):
    """Vectorized md5-leg embeddings for ONE Arrow batch: tokens are
    factorized, every DISTINCT token gets its md5 A/B words from the
    shared single-block MD5 kernel (operators.dedup._md5_ab_batch),
    slot sums come from one bincount, and normalization runs as fused
    float64 ops narrowed to float32 — every value bit-equal to the JVM
    expression chain (slot sums are exact small-integer doubles in any
    summation order; sqrt and the divide are single correctly-rounded
    IEEE ops; the float cast is one correctly-rounded narrowing).
    Returns an (n_docs, dim) float32 matrix."""
    from itertools import chain

    import numpy as np
    import pandas as pd

    from tl_spark.operators.dedup import _md5_ab_batch

    n = len(texts)
    toks_per_doc = [t.split() if t else [] for t in texts]
    if lowercase:
        toks_per_doc = [[w.lower() for w in ws] for ws in toks_per_doc]
    counts = np.fromiter(
        (len(x) for x in toks_per_doc), dtype=np.int64, count=n
    )
    v = np.zeros((n, dim), dtype=np.float64)
    total = int(counts.sum())
    if total:
        inv, uniques = pd.factorize(
            pd.Series(list(chain.from_iterable(toks_per_doc)), dtype=object)
        )
        ua, ub = _md5_ab_batch([t.encode("utf-8") for t in uniques])
        # first 8 hex chars == digest bytes 0-3 big-endian == byteswap
        # of the little-endian A word; sign == parity of hex chars
        # 9-16 == low bit of byteswapped B
        slot_u = (ua.byteswap().astype(np.int64)) % dim
        sign_u = ((ub.byteswap() & np.uint32(1)).astype(np.float64)) * 2.0 - 1.0
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat = rows * dim + slot_u[inv]
        v = np.bincount(
            flat, weights=sign_u[inv], minlength=n * dim
        ).reshape(n, dim)
    norm = np.sqrt((v * v).sum(axis=1))
    safe = np.where(norm > 0, norm, 1.0)
    return (v / safe[:, None]).astype(np.float32)


def hashed_embedding(
    df: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    hash_fn: str = "xxhash64",
    impl: str = "jvm",
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
    if impl not in ("jvm", "arrow"):
        raise ValueError(f"unknown impl: {impl}")
    if impl == "arrow":
        # Round-8 map-only leg (md5 family only — xxhash64 is
        # Spark-internal): one mapInArrow replaces the explode, the
        # two aggregations and the zero-vector anti-join — the r7 plan
        # shuffled (id, slot) rows plus three more Exchanges for a
        # value each row already determines. Bit-equal output, pinned
        # by tests/test_embed.py::test_hashed_embedding_arrow_leg.
        if hash_fn != "md5":
            raise ValueError("impl='arrow' supports hash_fn='md5' only")
        import pyarrow as pa

        lc = lowercase

        def fn(batches):
            for batch in batches:
                ids = batch.column(id_col)
                texts = batch.column(text_col).to_pylist()
                emb = _batch_hashed_embedding_md5(texts, dim, lc)
                flat = pa.array(emb.reshape(-1), type=pa.float32())
                offs = pa.array(
                    range(0, (len(texts) + 1) * dim, dim), type=pa.int32()
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        ids.cast(pa.int64()),
                        pa.ListArray.from_arrays(offs, flat),
                    ],
                    names=["id", "embedding"],
                )

        return df.select(id_col, text_col).mapInArrow(
            fn, "id long, embedding array<float>"
        )
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
