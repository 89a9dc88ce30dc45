"""Keyword retrieval over the corpus: distributed BM25 scoring.

Okapi BM25 (Robertson et al.), the standard sparse-retrieval baseline
a corpus engine needs next to its ANN path. Everything is JVM-side
DataFrame expressions — no Python in the hot path — and every shuffle
key is a term or a doc id:

- per-doc term frequencies: explode -> map-side-combined count
  aggregation, filtered to the (tiny, broadcast-literal) query term
  set BEFORE the aggregation, so the corpus-wide explode never
  shuffles non-query terms;
- document frequency per term and the corpus (N, avgdl) aggregates
  are computed once and broadcast-joined back (1-row and
  |query|-row tables);
- the final score is one map-side expression + a per-doc sum.

At 100 TB: the only corpus-sized shuffle carries (doc, term, tf)
triples for query terms only — proportional to the query's posting
lists, not the corpus. The same shape serves batched query sets
(pass more terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    return (
        bm25_scores(df, query_terms, text_col, id_col, k1, b, stable_sum)
        .orderBy(F.col("bm25").desc(), F.col("id"))
        .limit(k)
    )
