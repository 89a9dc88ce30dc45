"""Keyword retrieval over the corpus: distributed BM25 scoring.

Okapi BM25 (Robertson et al.), the standard sparse-retrieval baseline
a corpus engine needs next to its ANN path. Everything is JVM-side
DataFrame expressions — no Python in the hot path.

Two plans, picked by query size (round 8):

- <= 16 distinct terms (the common retrieval shape): per-term tf is a
  map-side ``size(filter(tokens))`` column — no explode, no (id, term)
  aggregation, no re-attach joins; one aggregation to a 1-row stats
  table (n_docs, exact avgdl, per-term df) broadcast back, and the
  narrow per-doc projection persisted so the corpus is tokenized once
  (see :func:`_bm25_scores_mapside`).
- larger (batched) query sets: explode -> map-side-combined count
  aggregation, filtered to the query term set BEFORE the aggregation;
  document frequency and corpus aggregates broadcast-joined back.

At 100 TB: neither plan shuffles corpus text — the general path's
only corpus-sized shuffle carries (doc, term, tf) triples for query
terms; the map-side path shuffles one narrow cached row per doc into
a single 1-row aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tl_spark.cache import attach_handles, keep_handles
from tl_spark.functions.text import tokens


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    stable_sum: bool = False,
) -> DataFrame:
    """(id, bm25) for every document matching >=1 query term, higher =
    more relevant. Standard Okapi BM25 with the non-negative idf
    variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scores are deterministic and exactly re-expressible in ANSI SQL
    (the suite pins them against DuckDB); ``round`` to 6 places makes
    the cross-engine float comparison stable.

    ``stable_sum=True`` makes the per-doc score bit-reproducible
    across engines: per-term contributions are summed in term-sorted
    order (a sequential fold over a sorted array) instead of
    aggregation order, and ``avgdl`` is computed as exact-integer
    sum(dl)/n rather than a float running average. Used by the
    driver-window query so the DuckDB oracle matches to the last
    ulp before rounding."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    q = [t.lower() for t in query_terms]
    if len(set(q)) <= 16:
        return _bm25_scores_mapside(
            df, sorted(set(q)), text_col, id_col, k1, b, stable_sum
        )
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    )
    # doc lengths + corpus stats (1-row broadcast). sum(dl) over longs
    # is exact, so avgdl is one correctly-rounded division — identical
    # in any engine — where avg() would be an order-dependent float sum.
    lens = toks.select("id", F.size("_t").alias("dl"))
    # constant-valued but NON-FOLDABLE equi-join key (pmod of a data
    # column by 1 is always 0, but Catalyst can't fold it) so the
    # 1-row broadcast plans as BroadcastHashJoin — a literal key would
    # constant-fold back into a BroadcastNestedLoopJoin
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    ).withColumn("_one", F.pmod(F.col("n_docs"), F.lit(1)).cast("int"))
    # query-term postings: filter BEFORE the count aggregation
    qlit = F.array(*[F.lit(t) for t in q])
    tf = (
        toks.select("id", F.explode("_t").alias("term"))
        .filter(F.array_contains(qlit, F.lower(F.col("term"))))
        .select("id", F.lower(F.col("term")).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("id").alias("df"))
    idf = (
        dfreq.withColumn("_one", F.pmod(F.col("df"), F.lit(1)).cast("int"))
        .join(F.broadcast(stats), "_one")
        .select(
            "term",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "id")
        .withColumn("_one", F.pmod(F.col("tf"), F.lit(1)).cast("int"))
        .join(F.broadcast(stats), "_one")
        .select(
            "id",
            "term",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
    )
    if stable_sum:
        # sequential fold over the term-sorted contributions: the same
        # additions in the same order every run and in the oracle
        score = F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            ),
            6,
        ).alias("bm25")
    else:
        score = F.round(F.sum("_s"), 6).alias("bm25")
    return contrib.groupBy("id").agg(score)


def _bm25_scores_mapside(
    df: DataFrame,
    q: list[str],
    text_col: str,
    id_col: str,
    k1: float,
    b: float,
    stable_sum: bool,
) -> DataFrame:
    """Round-8 fast path for small query sets (the common retrieval
    shape): per-term tf is a map-side ``size(filter(tokens))`` column,
    so the corpus-wide explode, the (id, term) aggregation, the
    doc-frequency aggregation and the two re-attach joins all
    disappear. What remains is ONE aggregation to a 1-row stats table
    (n_docs, exact-integer avgdl, per-term df — broadcast back via the
    same non-foldable-key BroadcastHashJoin trick as the general path)
    plus a second map-only pass that folds the per-term contributions
    in sorted-term order. 20 Exchanges -> 4 (plan diff in plans/r08);
    scores are bit-identical: a missing term contributes exactly 0.0
    and IEEE ``x + 0.0 == x`` for the non-negative partial sums, so
    the fold equals the general path's sorted fold over present terms.
    ``q`` arrives sorted and deduplicated.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    )
    def _is_term(term):
        # NB: the HOF lambda must be unary — PySpark dispatches on
        # arity, and a second parameter would bind the element INDEX
        def pred(x):
            return F.lower(x) == F.lit(term)

        return pred

    tf_cols = [
        F.size(F.filter("_t", _is_term(t))).alias(f"_tf{j}")
        for j, t in enumerate(q)
    ]
    # persist the narrow per-doc projection (id, dl, tf per query
    # term — a handful of numbers per document) so the corpus is
    # tokenized ONCE: the stats aggregation and the scoring pass both
    # read the cache instead of re-running scan+tokenize (guide §5 —
    # cache the small reused projection, never the corpus). Handle
    # released by the caller via tl_spark.cache.unpersist_handles.
    base = toks.select("id", F.size("_t").alias("dl"), *tf_cols).persist()
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"_tf{j}") > 0).cast("long")).alias(f"_df{j}")
            for j in range(len(q))
        ],
    ).withColumn("_one", F.pmod(F.col("n_docs"), F.lit(1)).cast("int"))
    matched = base.filter(
        sum((F.col(f"_tf{j}") > 0).cast("int") for j in range(len(q)))
        > 0
    ).withColumn("_one", F.pmod(F.col("dl"), F.lit(1)).cast("int"))
    joined = matched.join(F.broadcast(stats), "_one")

    def contrib(j: int):
        # mirrors the general path's expressions term by term so every
        # IEEE operation happens in the identical order
        tf = F.col(f"_tf{j}")
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"_df{j}") + 0.5)
            / (F.col(f"_df{j}") + 0.5)
        )
        return (
            idf
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        )

    score = F.lit(0.0)
    for j in range(len(q)):  # q is sorted: the stable_sum fold order
        score = score + contrib(j)
    out = joined.select("id", F.round(score, 6).alias("bm25"))
    return attach_handles(out, base)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    stable_sum: bool = False,
) -> DataFrame:
    """Top-k BM25 matches, deterministically tie-broken by id
    (TakeOrderedAndProject — no full sort at scale)."""
    scores = bm25_scores(df, query_terms, text_col, id_col, k1, b, stable_sum)
    out = scores.orderBy(F.col("bm25").desc(), F.col("id")).limit(k)
    return keep_handles(out, scores)
