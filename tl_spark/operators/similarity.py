"""Similarity search over an embedding column (array<float>).

Three paths, per SURVEY/task brief:

- cosine_topk_bruteforce: exact top-k against a literal query vector.
  The dot product is a vectorized Arrow-batch pandas UDF (numpy
  matmul over the whole batch) — NOT an interpreted higher-order
  function fold (PLANS.md house rule 3: HOF lambdas evaluate
  interpreted row-at-a-time; the numpy path is one BLAS call per
  batch). At 100 TB this is the once-in-a-while exact path: a full
  scan + a tiny TakeOrderedAndProject; no shuffle of the vectors.

- ann_multiprobe_topk: the scale path. Random-hyperplane signatures
  (sign-bit LSH) bucket the corpus; the query probes buckets in
  increasing flip-cost order (sum of |query . plane| over flipped
  bits — the standard multi-probe LSH ordering) until the probed
  buckets hold at least ``min_candidates`` vectors, then exact-cosine
  re-ranks only those. The bucket histogram is a 2^n_planes-row
  aggregate (map-side combined — tiny at any corpus size); only the
  probed buckets' vectors are re-read.

- embedding_neardup_pairs: near-duplicate pairs via sign-bucket
  self-join + exact cosine verification, bucket-size capped.

- build_ivf_index / ivf_topk: FAISS-style IVF-Flat coarse quantizer
  (driver-trained spherical k-means, partition-pruned probes when
  written with write_ivf_index).

- build_pq_index / pq_topk (round 4): FAISS-style product
  quantization — m-byte codes (32x compression on 64-dim float),
  driver-built ADC lookup tables, optional exact re-rank of the ADC
  shortlist. Composable with the IVF list assignment for full IVF-PQ.

All signatures are deterministic: the plane matrix depends only on
(seed, dim) and is regenerated per worker from the seed — no
broadcast payload, identical across cluster sizes and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tl_spark.cache import attach_handles


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def _make_cosine_udf(query: list[float]):
    """cosine(vec, literal query) as a vectorized pandas UDF.

    numpy matmul per Arrow batch; each row's result depends only on
    that row and the query (BLAS dgemv), so values are deterministic
    across batch boundaries and cluster sizes.
    """
    q = np.asarray(query, dtype=np.float64)
    nq = float(np.sqrt(q @ q))

    @pandas_udf("double")
    def cos(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.zeros(0, dtype=np.float64))
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        dots = m @ q
        nv = np.sqrt(np.einsum("ij,ij->i", m, m))
        return pd.Series(dots / (nv * nq))

    return cos


_pair_cos_udf = None


def _pair_cosine(col_a, col_b):
    """cosine(vec_a, vec_b) for two array columns (vectorized batch
    UDF; used on candidate pairs only — the bucketing keeps this set
    small relative to the corpus)."""
    global _pair_cos_udf
    if _pair_cos_udf is None:

        @pandas_udf("double")
        def _impl(a: pd.Series, b: pd.Series) -> pd.Series:
            if len(a) == 0:
                return pd.Series(np.zeros(0, dtype=np.float64))
            ma = np.vstack(a.to_numpy()).astype(np.float64)
            mb = np.vstack(b.to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", ma, mb)
            na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
            nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
            return pd.Series(dots / (na * nb))

        _pair_cos_udf = _impl
    return _pair_cos_udf(col_a, col_b)


def cosine_topk_bruteforce(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity (ties broken by id for
    determinism). Plan: scan -> ArrowEvalPython -> TakeOrderedAndProject."""
    sim = _make_cosine_udf(query)(F.col(vec_col))
    return (
        df.select(F.col(id_col).alias("id"), F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _make_lsh_udf(n_planes: int, seed: int):
    """Sign-bit LSH signature UDF. The plane matrix is derived from
    (seed, dim) with dim read off the batch itself — no driver-side
    action and no broadcast; every worker regenerates the same planes.
    """

    @pandas_udf("long")
    def lsh_sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        planes = _planes(mat.shape[1], n_planes, seed)
        bits = (mat @ planes) > 0
        weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int64))

    return lsh_sig


def _probe_order(query: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """All 2^n_planes bucket signatures sorted by multi-probe flip
    cost: cost(sig) = sum of |query . plane_b| over bits b where sig
    differs from the query's signature. Ties break by signature value
    (deterministic)."""
    n_planes = planes.shape[1]
    proj = query @ planes  # (n_planes,)
    qbits = (proj > 0).astype(np.int64)
    sigs = np.arange(1 << n_planes, dtype=np.int64)
    bits = (sigs[:, None] >> np.arange(n_planes)) & 1  # (2^n, n)
    flips = bits != qbits
    costs = flips @ np.abs(proj)
    order = np.lexsort((sigs, costs))
    return sigs[order]


def build_ann_index(
    df: DataFrame,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """The ANN 'index': (id, v, _sig) with sign-bucket signatures.

    At corpus scale this is computed ONCE and persisted/written next
    to the embeddings (it is a pure map, one extra int64 per row);
    every query then probes it without re-signaturing the corpus.
    Pass the result as ``index=`` to :func:`ann_multiprobe_topk` —
    ideally ``.persist()``-ed (or read back from parquet) so the
    histogram pass and the probe pass share one materialization.
    """
    sig_udf = _make_lsh_udf(n_planes, seed)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sig_udf(F.col(vec_col)).alias("_sig"),
    )


def ann_multiprobe_topk(
    df: DataFrame | None,
    query: list[float],
    n_planes: int = 8,
    k: int = 10,
    min_candidates: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    index: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k with margin-ordered multi-probe.

    1. signature every vector (map-only; skipped when a precomputed
       ``index`` from :func:`build_ann_index` is passed — the shape to
       use at corpus scale, where the index is built once);
    2. bucket histogram: <= 2^n_planes rows, map-side combined;
    3. driver picks the cheapest probe prefix (multi-probe flip-cost
       order) whose cumulative occupancy >= max(k, min_candidates);
    4. exact cosine re-rank over ONLY the probed buckets.

    Recall/latency is controlled by ``min_candidates`` (default 4k);
    at corpus scale n_planes grows so a probe prefix is a vanishing
    fraction of the data. Deterministic end to end: planes from
    (seed, dim), probe order ties broken by signature.
    """
    if n_planes > 20:
        raise ValueError("n_planes > 20: enumerate probe order lazily")
    want = max(k, min_candidates if min_candidates is not None else 4 * k)

    q = np.asarray(query, dtype=np.float64)
    planes = _planes(len(query), n_planes, seed)
    order = _probe_order(q, planes)

    bucketed = (
        index
        if index is not None
        else build_ann_index(df, n_planes, vec_col, id_col, seed)
    )
    hist = {
        r["_sig"]: r["n"]
        for r in bucketed.groupBy("_sig").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probe: list[int] = []
    cum = 0
    for sig in order:
        s = int(sig)
        n = hist.get(s, 0)
        if n:
            probe.append(s)
            cum += n
        if cum >= want:
            break

    sim = _make_cosine_udf(query)(F.col("v"))
    return (
        bucketed.filter(F.col("_sig").isin(probe))
        .select("id", F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
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
    """Single-bucket ANN probe (kept as the minimal-latency variant;
    prefer :func:`ann_multiprobe_topk`, which bounds recall)."""
    return ann_multiprobe_topk(
        df,
        query,
        n_planes=n_planes,
        k=k,
        min_candidates=k,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
    )


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
    bucket id), then verified with the exact vectorized cosine.
    Bucket-size cap bounds the worst case exactly like the MinHash path.
    Identical (and positively-scaled) vectors always share a bucket, so
    true duplicates have recall 1 by construction; perturbed near-dups
    trade recall for n_planes like any sign-LSH (see
    tests/test_operators.py recall test).

    Scale shape (mirrors minhash_lsh_candidates): the self-join
    shuffles ONLY (_sig, id) — carrying the vectors through it would
    multiply shuffle bytes by ~8*dim per candidate row. Vectors are
    re-attached AFTER pairing by two id-joins against the persisted
    signature table (the pair set is tiny relative to the corpus, so
    AQE broadcasts it into those joins and the vectors never shuffle).
    Pinned by tests/test_operators.py::
    test_embedding_neardup_selfjoin_carries_no_vectors.
    Caller-owned cache handle: see tl_spark.cache.unpersist_handles.
    """
    sig_udf = _make_lsh_udf(n_planes, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        sig_udf(F.col(vec_col)).alias("_sig"),
    ).persist()
    sizes = b.groupBy("_sig").agg(F.count(F.lit(1)).alias("_bsz"))
    keys = (
        b.select("id", "_sig")
        .join(sizes, "_sig")
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )

    pa_, pb_ = keys.alias("a"), keys.alias("b")
    # a pair shares exactly ONE bucket (the full signature), so the
    # join output is already duplicate-free — no dropDuplicates needed
    pairs = pa_.join(
        pb_,
        (F.col("a._sig") == F.col("b._sig")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
    )
    pairs = pairs.join(
        b.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(
        b.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b"
    )
    cos = _pair_cosine(F.col("va"), F.col("vb"))
    out = (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return attach_handles(out, b)


# ------------------------------------------------- IVF (round 3)


def _spherical_kmeans(sample: np.ndarray, n_lists: int, iters: int, seed: int):
    """Deterministic spherical k-means on the (driver-side) training
    sample: seeded init, cosine assignment, mean-renormalize update,
    empty lists re-seeded from the worst-covered point. Returns unit
    centroids (n_lists, dim)."""
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(sample, axis=1)
    pts = sample[norms > 0] / norms[norms > 0, None]
    if len(pts) == 0:
        raise ValueError("IVF training sample has no nonzero vectors")
    n_lists = min(n_lists, len(pts))
    cent = pts[rng.choice(len(pts), size=n_lists, replace=False)]
    for _ in range(iters):
        sims = pts @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_lists):
            members = pts[assign == c]
            if len(members) == 0:
                # re-seed from the point farthest from its centroid
                worst = np.argmin(np.max(sims, axis=1))
                cent[c] = pts[worst]
                continue
            m = members.sum(axis=0)
            n = np.linalg.norm(m)
            cent[c] = m / n if n > 0 else cent[c]
    return cent


def build_ivf_index(
    df: DataFrame,
    n_lists: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_size: int = 4096,
    train_iters: int = 8,
):
    """IVF coarse quantizer (the task brief's 'IVF variant' of ANN).

    Returns ``(index_df, centroids)``: ``index_df`` = (id, v, _list)
    with each vector assigned to its nearest (cosine) centroid,
    ``centroids`` a unit (n_lists, dim) ndarray.

    Scale shape: training collects ONLY a content-hash-sampled subset
    (~train_size rows — one bounded driver action, same budget class
    as the ANN bucket histogram); k-means runs in numpy on the driver;
    assignment is a single vectorized map pass with the centroid
    matrix shipped in the UDF closure (n_lists x dim floats — KBs).
    At corpus scale the index is written bucketed/partitioned BY
    ``_list`` so a probe reads only the probed lists' files
    (partition pruning); queries never rescan the corpus.
    Deterministic end to end: the sample filter is a content hash,
    k-means is seeded, ties in assignment break by list id (argmax
    returns the first maximum).
    """
    n = df.count()
    mod = max(1, n // train_size)
    sample_rows = (
        df.select(
            F.xxhash64(F.col(vec_col).cast("array<double>")).alias("_h"),
            F.col(vec_col).alias("v"),
        )
        .filter(F.pmod(F.col("_h"), F.lit(mod)) == 0)
        .collect()
    )
    # collect() returns partition order — canonicalize (hash, vector)
    # so training, and therefore the centroids, are independent of the
    # input's partitioning (pinned by test)
    sample_rows.sort(key=lambda r: (r["_h"], tuple(r["v"])))
    sample = np.array([r["v"] for r in sample_rows], dtype=np.float64)
    cent = _spherical_kmeans(sample, n_lists, train_iters, seed)

    c_mat = cent  # closure-shipped; KBs

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m / norms[:, None]) @ c_mat.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    index_df = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        assign(F.col(vec_col)).alias("_list"),
    )
    return index_df, cent


def write_ivf_index(index_df: DataFrame, centroids, path: str) -> None:
    """Persist an IVF index partitioned BY ``_list`` so probes are
    file-pruned: ``<path>/lists/_list=<c>/*.parquet`` holds each list's
    vectors, ``<path>/centroids`` the (list, centroid) table. This
    makes :func:`ivf_topk`'s scale claim real — a probed read scans
    only the ``nprobe`` matching partition directories (PartitionFilters
    in the scan, pinned by tests/test_query_ops.py) instead of the
    whole corpus.
    """
    spark = index_df.sparkSession
    index_df.write.mode("overwrite").partitionBy("_list").parquet(
        path + "/lists"
    )
    cent_rows = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(centroids)
    ]
    spark.createDataFrame(
        cent_rows, "list int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/centroids")


def read_ivf_index(spark, path: str):
    """(index_df, centroids) back from :func:`write_ivf_index`.

    ``index_df`` reads the partitioned layout lazily — downstream
    ``_list`` filters (ivf_topk probes) prune to the matching partition
    directories; only the tiny centroid table is collected eagerly.
    """
    index_df = spark.read.parquet(path + "/lists")
    rows = spark.read.parquet(path + "/centroids").collect()
    rows.sort(key=lambda r: r["list"])
    cent = np.array([r["centroid"] for r in rows], dtype=np.float64)
    return index_df, cent


def ivf_topk(
    index_df: DataFrame,
    centroids,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query ON THE DRIVER
    (n_lists rows — no Spark job), scan only the ``nprobe`` nearest
    lists, exact-cosine re-rank those candidates to top-k. Recall is
    controlled by nprobe exactly as in FAISS-style IVF-Flat; the scan
    cost is the probed lists' fraction of the corpus (file-pruned when
    the index is partitioned by _list)."""
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        raise ValueError("zero query vector")
    sims = centroids @ (q / qn)
    order = np.lexsort((np.arange(len(sims)), -sims))
    probe = [int(x) for x in order[: max(1, nprobe)]]
    sim = _make_cosine_udf(query)(F.col("v"))
    return (
        index_df.filter(F.col("_list").isin(probe))
        .select("id", F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


# ---------------------------------------------------------------- PQ ----


def _train_pq_codebooks(
    sample: np.ndarray, m: int, k: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace L2 k-means (FAISS-style product quantization
    training), deterministic: seeded init, empty cells re-seeded from
    the worst-quantized point. Returns (m, k, dsub) codebooks."""
    n, dim = sample.shape
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    k = min(k, n)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        rng = np.random.default_rng(seed * 7919 + j)
        pts = sample[:, j * dsub : (j + 1) * dsub]
        cent = pts[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # squared L2 via the expansion trick: one matmul per iter
            d2 = (
                (pts**2).sum(1)[:, None]
                - 2.0 * (pts @ cent.T)
                + (cent**2).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = pts[assign == c]
                if len(members) == 0:
                    worst = np.argmax(np.min(d2, axis=1))
                    cent[c] = pts[worst]
                else:
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def build_pq_index(
    df: DataFrame,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_size: int = 4096,
    train_iters: int = 8,
):
    """Product-quantization index (the compression leg of FAISS-style
    IVF-PQ; composes with :func:`build_ivf_index`'s coarse quantizer).

    Each vector is split into ``m`` subvectors and every subvector is
    replaced by the id of its nearest codebook centroid (``2^nbits``
    per subspace) — ``m`` bytes per vector instead of ``4*dim``
    (64-dim float -> 8 bytes = 32x). At 100 TB THIS is what makes the
    ANN corpus memory-resident: codes for 10^9 vectors fit in 8 GB.

    Returns ``(codes_df, codebooks)``: codes_df = (id, _code binary of
    m bytes), codebooks an (m, 2^nbits, dim/m) ndarray. Training
    mirrors build_ivf_index: one bounded content-hash-sampled driver
    collect, canonically sorted so codebooks are independent of input
    partitioning; encoding is a single vectorized map pass with the
    codebooks in the UDF closure (m * k * dsub floats — KBs).
    """
    assert nbits <= 8, "codes are packed one byte per subspace"
    k = 1 << nbits
    n = df.count()
    mod = max(1, n // train_size)
    rows = (
        df.select(
            F.xxhash64(F.col(vec_col).cast("array<double>")).alias("_h"),
            F.col(vec_col).alias("v"),
        )
        .filter(F.pmod(F.col("_h"), F.lit(mod)) == 0)
        .collect()
    )
    rows.sort(key=lambda r: (r["_h"], tuple(r["v"])))
    sample = np.array([r["v"] for r in rows], dtype=np.float64)
    books = _train_pq_codebooks(sample, m, k, train_iters, seed)

    dsub = books.shape[2]

    @pandas_udf("binary")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            pts = mat[:, j * dsub : (j + 1) * dsub]
            cent = books[j]
            d2 = (
                (pts**2).sum(1)[:, None]
                - 2.0 * (pts @ cent.T)
                + (cent**2).sum(1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes])

    codes_df = df.select(
        F.col(id_col).alias("id"), encode(F.col(vec_col)).alias("_code")
    )
    return codes_df, books


def pq_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query: list[float],
    k: int = 10,
    rerank: int = 0,
    df: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes: per-subspace lookup tables
    (dot(query_sub, centroid) and centroid norms) are built ON THE
    DRIVER, shipped in the UDF closure, and each corpus vector's
    approximate cosine is m table gathers — no float vectors are read
    at all. With ``rerank > 0`` (and ``df``), the top ``rerank`` ADC
    candidates are re-scored with exact cosine against the original
    vectors (the broadcast-joined shortlist), the standard IVF-PQ
    recall recovery.

    Output: (id, cosine) — approximate when rerank=0 (column still
    named cosine: it estimates the same quantity; tests bound the
    recall, the oracle-checked exact path is cosine_topk_bruteforce).
    """
    mq, kq, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        raise ValueError("zero query vector")
    # LUTs: dot(q_j, c) and |c|^2 per subspace centroid
    dots = np.empty((mq, kq), dtype=np.float64)
    sqn = np.empty((mq, kq), dtype=np.float64)
    for j in range(mq):
        dots[j] = codebooks[j] @ q[j * dsub : (j + 1) * dsub]
        sqn[j] = (codebooks[j] ** 2).sum(axis=1)

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=np.float64)
        c = np.frombuffer(b"".join(codes.to_numpy()), dtype=np.uint8).reshape(
            len(codes), mq
        )
        cols = np.arange(mq)
        dot = dots[cols, c].sum(axis=1)
        norm = np.sqrt(sqn[cols, c].sum(axis=1))
        norm[norm == 0] = 1.0
        return pd.Series(dot / (norm * qn))

    scored = codes_df.select("id", F.round(adc(F.col("_code")), 6).alias("cosine"))
    if rerank <= 0:
        return scored.orderBy(F.desc("cosine"), F.asc("id")).limit(k)
    assert df is not None, "rerank needs the original vector table"
    shortlist = (
        scored.orderBy(F.desc("cosine"), F.asc("id")).limit(rerank).select("id")
    )
    exact = _make_cosine_udf(query)(F.col(vec_col))
    return (
        df.join(F.broadcast(shortlist), df[id_col] == shortlist["id"])
        .select(F.col(id_col).alias("id"), F.round(exact, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )

# ------------------------------------------------- SemDeDup (round 6)


def semantic_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_size: int = 4096,
    train_iters: int = 8,
    max_list_size: int = 2048,
) -> DataFrame:
    """Within-cluster near-duplicate pairs — the pair-level core of
    the SemDeDup shape (Abbas et al. 2023, public knowledge): the IVF
    coarse quantizer (:func:`build_ivf_index`) assigns every vector to
    its nearest spherical-k-means centroid; WITHIN each list all pairs
    with round-6 cosine >= ``threshold`` are emitted as
    (id_a < id_b, list, cosine). Callers impose their own keep rule
    (see :func:`semantic_dedup` and curate()'s semantic_dup gate,
    which uses document order, not id order).

    Scale shape: centroid training is one bounded driver action
    (content-hash sample); assignment is map-only (centroid matrix in
    the closure); the all-pairs stage shuffles on ``_list`` ONLY
    (applyInPandas groups) — the published SemDeDup shape, where the
    cluster count is chosen so lists fit in memory (list size ~
    n/n_lists). ``max_list_size`` bounds the O(s^2) stage exactly
    like the LSH bucket caps: only the first ``max_list_size`` ids
    (ascending) of an oversized list participate, overflow ids emit
    no pairs — deterministic, and the escape is raising ``n_lists``.

    Cosine is rounded to 6dp before the threshold compare on every
    leg (numpy here, DuckDB in the suite oracle), the same
    boundary-stability contract as :func:`embedding_neardup_pairs`.
    """
    index_df, _cent = build_ivf_index(
        df,
        n_lists=n_lists,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
        train_size=train_size,
        train_iters=train_iters,
    )
    thr = float(threshold)
    cap = int(max_list_size)

    def _pairs_in_list(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        head = pdf.iloc[:cap]
        n = len(head)
        if n < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "list": [], "cosine": []}
            ).astype(
                {"id_a": "int64", "id_b": "int64", "list": "int32",
                 "cosine": "float64"}
            )
        m = np.vstack(head["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = np.round(mn @ mn.T, 6)
        ii, jj = np.tril_indices(n, k=-1)  # jj < ii (earlier position)
        hit = sims[ii, jj] >= thr
        ids = head["id"].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[jj[hit]],
                "id_b": ids[ii[hit]],
                "list": np.full(hit.sum(), int(head["_list"].iloc[0]),
                                dtype=np.int32),
                "cosine": sims[ii[hit], jj[hit]],
            }
        )

    return index_df.groupBy("_list").applyInPandas(
        _pairs_in_list, "id_a long, id_b long, list int, cosine double"
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    train_size: int = 4096,
    train_iters: int = 8,
    max_list_size: int = 2048,
):
    """Semantic deduplication: cluster-then-dedup-within-cluster (the
    SemDeDup shape). A vector drops iff some EARLIER (smaller id)
    vector in its IVF list has round-6 cosine >= ``threshold`` — the
    id-order keep rule (use :func:`semantic_neardup_pairs` directly
    when another document order governs, as curate() does).

    Returns ``(kept, dropped)``: ``kept`` = surviving input rows;
    ``dropped`` = (id, list, max_cos) with ``max_cos`` the max cosine
    against an earlier same-list vector. The drop set is tiny, so the
    final anti-join broadcasts under AQE; see
    :func:`semantic_neardup_pairs` for the full scale shape.
    """
    pairs = semantic_neardup_pairs(
        df,
        threshold=threshold,
        n_lists=n_lists,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
        train_size=train_size,
        train_iters=train_iters,
        max_list_size=max_list_size,
    )
    dropped = (
        pairs.groupBy(F.col("id_b").alias("id"), F.col("list"))
        .agg(F.max("cosine").alias("max_cos"))
    )
    kept = df.join(
        dropped.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    return kept, dropped
