"""Deduplication operators for web-scale corpus curation.

Scale design notes (the point is 100 TB, not 60k rows):

- exact_dedup: one hash-shuffle on a 256-bit digest; map-side partial
  aggregation applies; output is tiny (one row per distinct text).
- MinHash+LSH: signatures are computed JVM-side with built-in
  higher-order functions (transform/array_min over character
  shingles) — no Python in the signature path. Banding turns the
  O(n^2) similarity join into |bands| hash-shuffles on band digests;
  only same-bucket pairs are compared exactly. Bucket explosion is
  bounded: a distinct-on-(band,id) projection precedes the self-join
  and AQE's skew-join splits hot buckets.
- SimHash: 64-bit signature via a vectorized Arrow-batch UDF (numpy
  matrix ops per batch); near-dup candidates = equal signature
  (or banded Hamming pieces for radius>0).
- n-gram Jaccard verification runs only on LSH candidates.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: (text_hash, keep_id = min id, n_dups)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles_expr(text_col: str, k: int = 5, distinct: bool = False):
    """Character k-shingles as a JVM-side SQL expression (empty array
    when the text is shorter than k)."""
    inner = (
        f"transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k}))"
    )
    if distinct:
        inner = f"array_distinct({inner})"
    return F.expr(
        f"case when length({text_col}) >= {k} then {inner} else array() end"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    shingle_k: int = 5,
    sample_mod: int | None = None,
) -> DataFrame:
    """(id, sig: array<long>[n_hashes]) — min over shingle hashes per seed.

    Built entirely from Spark SQL higher-order functions; the hash is
    xxhash64(shingle, seed) so signatures are deterministic across
    cluster sizes and runs.

    ``sample_mod``: the 100 TB cost lever. Character shingling
    explodes ~len(text) rows per doc — the dominant cost of the LSH
    pipeline. ``sample_mod=m`` keeps only shingles whose content hash
    falls in one residue class (pmod(xxhash64(shingle, 9173), m) == 0),
    cutting exploded rows ~m x. Because the filter depends only on
    shingle CONTENT, identical texts still get identical signatures
    and near-identical texts still agree on the sampled sub-space —
    minhash over a hash-sampled shingle set is still an unbiased
    Jaccard estimator of the sampled universe (standard winnowing/
    MOD-sampling argument); variance grows ~sqrt(m) for fixed
    n_hashes. None (default) = no sampling — the oracle-checked
    driver queries use full signatures.
    """
    sh = shingles_expr(text_col, shingle_k)
    # Formulated as explode -> n_hashes MIN aggregates rather than
    # higher-order-function array folds: HOF lambdas evaluate
    # interpreted (no whole-stage codegen) and were ~10x slower, while
    # hash-aggregate MINs codegen and combine map-side, so the shuffle
    # carries one partial signature per (id, partition) — the shape
    # that survives a 100x scale-up. "Seeding" is xxhash64(shingle,
    # seed_index) — hashing the pair. Docs shorter than shingle_k have
    # NO signature (sig = NULL, kept as one null-shingle row by
    # explode_outer): a shared fallback signature would make every
    # pair of short docs a false est_jaccard=1.0 candidate, so the
    # banding layer skips null signatures instead.
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode_outer(sh).alias("_s")
    )
    if sample_mod is not None and sample_mod > 1:
        # post-explode so the filter is codegen'd (house rule 3), and
        # null-preserving so empty docs keep their null-sig row. A doc
        # none of whose shingles is sampled is ABSENT from the output
        # — it carries no signal in the sampled space; the banding
        # layer skips null/missing signatures either way.
        exploded = exploded.filter(
            F.col("_s").isNull()
            | (F.pmod(F.xxhash64("_s", F.lit(9173)), F.lit(sample_mod)) == 0)
        )
    # NB: Spark's xxhash64 SKIPS null arguments (it does not return
    # null), so the null shingle must be nulled out explicitly.
    hashed = exploded.select(
        "id",
        *[
            F.when(
                F.col("_s").isNotNull(), F.xxhash64("_s", F.lit(i))
            ).alias(f"_h{i}")
            for i in range(n_hashes)
        ],
    )
    agg = hashed.groupBy("id").agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(n_hashes)]
    )
    return agg.select(
        "id",
        F.when(
            F.col("_h0").isNotNull(),
            F.array(*[f"_h{i}" for i in range(n_hashes)]),
        ).alias("sig"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket_size: int = 64,
    sample_mod: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs (id_a < id_b) via banded MinHash.

    ``sample_mod`` is forwarded to :func:`minhash_signatures` — the
    shingle-sampling cost lever for corpus scale (est_jaccard then
    estimates Jaccard over the sampled shingle space).

    est_jaccard = fraction of matching signature positions.

    ``max_bucket_size`` drops pathological LSH buckets before the
    self-join: a bucket with thousands of members means the band
    carries no discriminating information for those rows (e.g. boiler-
    plate-identical docs), and joining it is O(bucket^2). True near-dup
    pairs in a dropped bucket still surface through their other
    ``bands - 1`` band hashes. This cap is what bounds worst-case
    shuffle volume at corpus scale; AQE's skew-join handles the
    remaining moderate buckets.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    # persist: the signature table is consumed 3x (bucket sizing + both
    # sides of the self-join); without this the shingle+minhash pipeline
    # re-runs each time. Size is n_docs x (8 + 8*n_hashes) bytes — tiny
    # relative to the corpus, MEMORY_AND_DISK spills safely at scale.
    sigs = (
        minhash_signatures(df, text_col, id_col, n_hashes, shingle_k, sample_mod)
        # shingle-less docs carry no signal — excluded, not fallback-
        # bucketed together (which made unrelated short docs est=1.0)
        .filter(F.col("sig").isNotNull())
        .persist()
    )

    band_rows = sigs.select(
        "id",
        "sig",
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
    ).select("id", "sig", "e.band", "e.bh")

    # the self-join + distinct shuffles ONLY (band, bh, id) — signatures
    # are re-attached afterwards from the persisted table. A matching
    # pair can collide in up to `bands` buckets; carrying the sig arrays
    # through that pre-distinct blow-up would multiply shuffle bytes by
    # ~8 * n_hashes.
    band_rows = band_rows.drop("sig")
    sizes = band_rows.groupBy("band", "bh").agg(
        F.count(F.lit(1)).alias("_bsz")
    )
    band_rows = (
        band_rows.join(sizes, ["band", "bh"])
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        pairs.join(
            sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
    )
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) "
        f"/ cast({n_hashes} as double)"
    )
    return pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact character-shingle Jaccard for candidate pairs.

    Joins the (small) candidate set back to the corpus twice; at scale
    the candidate side is the broadcast side.
    """
    sh = shingles_expr(text_col, shingle_k, distinct=True)
    docs = df.select(F.col(id_col).alias("id"), sh.alias("sh"))
    out = (
        candidates.join(docs.alias("da"), F.col("id_a") == F.col("da.id"))
        .join(docs.alias("db"), F.col("id_b") == F.col("db.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("da.sh", "db.sh"))
                / F.size(F.array_union("da.sh", "db.sh")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def _simhash64_impl(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens, vectorized per Arrow batch.

    Token hashes are md5-low64 (deterministic across processes — Python
    ``hash()`` is salted). Per-batch memoization: each distinct token is
    hashed once, then all bit-matrix math is numpy.
    """
    import hashlib

    import numpy as np

    cache: dict[str, int] = {}

    def tok_hash(tok: str) -> int:
        h = cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
            cache[tok] = h
        return h

    shifts = np.arange(64, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        if not toks:
            continue
        hs = np.fromiter((tok_hash(tok) for tok in toks), dtype=np.uint64)
        # bits[t, b] in {0,1}; vote = 2*sum(bits) - n_tokens
        bits = (hs[:, None] >> shifts) & np.uint64(1)
        vote = 2 * bits.sum(axis=0).astype(np.int64) - len(toks)
        out[i] = (weights * (vote > 0).astype(np.uint64)).sum()
    return pd.Series(out.astype(np.int64))


_simhash64 = None


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    # pandas_udf parses its DDL type against the ACTIVE session — build
    # it lazily so importing this module never requires a SparkContext
    # (spark-submit --py-files imports happen before session creation).
    global _simhash64
    if _simhash64 is None:
        _simhash64 = pandas_udf("long")(_simhash64_impl)
    return df.select(
        F.col(id_col).alias("id"), _simhash64(F.col(text_col)).alias("simhash")
    )
