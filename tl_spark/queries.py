"""Driver-contract query battery: Spark implementations + DuckDB oracles.

Every SQL-checkable query is written so Spark and DuckDB produce
bit-identical values:

- money aggregations go through exact decimal(18,2) sums (never raw
  double sums, whose value depends on reduction order) and are cast to
  double only at the end;
- doubles that must cross an aggregation are rounded first in double
  precision (IEEE ops are order-free per-row), then summed as decimals;
- every computed column is aliased identically here and in ORACLE_SQL;
- ties in top-k / windows are broken by a unique key.

The extraction/sketch queries (kernel, minhash, simhash, ANN) are not
ANSI-SQL-expressible and are registered without oracles (driver does a
rows-only check); their correctness gate is the golden corpus
(tests/test_goldens.py) and operator tests instead.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tl_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    lang_guess,
    punct_count,
    quality_score,
    token_count,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, scale=2):
    return col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------- relational

def _rev_dec():
    """Exact-decimal revenue: price * (1 - discount).

    NEVER ``round()`` a double product — Spark rounds the shortest
    decimal repr while DuckDB rounds the binary value, so they disagree
    on .xx5 boundaries. Casting each factor to decimal first makes the
    arithmetic exact and engine-independent.
    """
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return price * (F.lit(1) - disc)


def _charge_dec():
    tax = F.col("l_tax").cast("decimal(6,4)")
    return _rev_dec() * (F.lit(1) + tax)


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)
_CHARGE_SQL = f"({_REV_SQL}) * (1 + CAST(l_tax AS DECIMAL(6,4)))"


def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    out = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice")))
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(_rev_dec()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge_dec()), 2).cast("double").alias("sum_charge"),
            # averages: exact decimal sum -> double, THEN one IEEE
            # division — bit-identical in both engines. NO rounding
            # (round() on doubles is engine-divergent) and never
            # decimal division (engine-specific result scales).
            (
                F.sum(_dec(F.col("l_quantity"))).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(_dec(F.col("l_extendedprice"))).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
            (
                F.sum(_dec(F.col("l_discount"), 4)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM({_CHARGE_SQL}), 2) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_segment_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    out = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )
    return out


Q3_SQL = f"""
SELECT o_orderkey, o_orderdate,
       CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_nation_revenue(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    out = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )
    return out


Q5_SQL = f"""
SELECT r_name, n_name,
       CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def top_customers_per_segment(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    totals = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        totals.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "total_spend", "rnk")
        .orderBy("c_mktsegment", "rnk")
    )


TOP_CUSTOMERS_SQL = """
WITH totals AS (
  SELECT c_mktsegment, c_custkey, c_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, c_custkey, c_name
)
SELECT c_mktsegment, c_custkey, c_name, total_spend,
       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                          ORDER BY total_spend DESC, c_custkey ASC) AS rnk
FROM totals
QUALIFY rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def orders_running_total(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
WHERE o_custkey <= 20
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def events_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    val = F.round(F.col("value"), 4)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(val, 4)).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def part_brand_stats(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_dec(F.col("p_retailprice"))).cast("double").alias("sum_price"),
            F.max("p_size").alias("max_size"),
            F.min("p_size").alias("min_size"),
        )
        .orderBy("p_brand")
    )


PART_BRAND_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       MAX(p_size) AS max_size, MIN(p_size) AS min_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def supplier_region_acctbal(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec(F.col("s_acctbal"))).cast("double").alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


SUPPLIER_REGION_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def order_priority_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def events_sessionized(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum windows; per-session rollup."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        1,
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.withColumn("sess_id", F.sum(new_sess).over(cum))
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.round(F.col("value"), 4), 4))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "sess_id")
    )


EVENTS_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sess_id
  FROM marked
)
SELECT user_id, sess_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, sess_id
ORDER BY user_id, sess_id
"""


def events_asof_last_view(spark, sf_dir):
    """As-of join expressed as a running window: for every 'click',
    the most recent 'view' at-or-before it for the same user.

    Scalable shape: ONE shuffle on user_id, then a running
    last-non-null inside each partition — no range-join blow-up
    (this is the windowed formulation of ASOF JOIN; DuckDB oracle uses
    the identical window so semantics match bit-for-bit).
    """
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    out = (
        e.withColumn("last_view_ts", prev_view)
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_view_ts",
            F.when(
                F.col("last_view_ts").isNotNull(),
                F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts"),
            ).alias("secs_since_view"),
        )
        .orderBy("event_id")
    )
    return out


EVENTS_ASOF_SQL = """
WITH marked AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_view_ts
  FROM events
)
SELECT event_id, user_id, ts, last_view_ts,
       CASE WHEN last_view_ts IS NOT NULL
            THEN CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(last_view_ts)) AS BIGINT) END
         AS secs_since_view
FROM marked
WHERE event_type = 'click'
ORDER BY event_id
"""


def order_price_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per priority class."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


PERCENTILES_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------- text ops

_TOKENS_SQL = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def doc_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        token_count(c).cast("long").alias("n_tokens"),
        F.length(c).cast("long").alias("n_chars_c"),
        punct_count(c).cast("long").alias("n_punct"),
    ).orderBy("doc_id")


DOC_TOKEN_SQL = f"""
SELECT doc_id,
       len({_TOKENS_SQL}) AS n_tokens,
       length(text) AS n_chars_c,
       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
FROM documents ORDER BY doc_id
"""


def doc_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


DOC_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
         CAST(len(list_distinct(list_intersect({_TOKENS_SQL}, {_STOP_LIST}))) AS DOUBLE) AS stop
  FROM documents
)
SELECT doc_id,
       ROUND(
         LEAST(n_tok / 20.0, 1.0) * 0.4
         + LEAST(stop / 2.0, 1.0) * 0.3
         + (CASE WHEN n_chars > 0
                 THEN 1.0 - LEAST(punct / n_chars * 10, 1.0)
                 ELSE 0.0 END) * 0.3,
         4) AS quality
FROM t ORDER BY doc_id
"""


def doc_lang_guess(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", lang_guess(F.col("text")).alias("lang_guess")
    ).orderBy("doc_id")


def _lang_hits_sql(words):
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({_TOKENS_SQL}, x -> list_contains({lst}, x)))"


def _doc_lang_sql():
    from tl_spark.functions.text import LANG_MARKERS

    en = _lang_hits_sql(LANG_MARKERS["en"])
    de = _lang_hits_sql(LANG_MARKERS["de"])
    fr = _lang_hits_sql(LANG_MARKERS["fr"])
    es = _lang_hits_sql(LANG_MARKERS["es"])
    return f"""
WITH t AS (
  SELECT doc_id, {en} AS h_en, {de} AS h_de, {fr} AS h_fr, {es} AS h_es
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN h_en > 0 AND h_en >= GREATEST(h_de, h_fr, h_es) THEN 'en'
         WHEN h_de > 0 AND h_de >= GREATEST(h_fr, h_es) THEN 'de'
         WHEN h_fr > 0 AND h_fr >= h_es THEN 'fr'
         WHEN h_es > 0 THEN 'es'
         ELSE 'und'
       END AS lang_guess
FROM t ORDER BY doc_id
"""


def doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    ).orderBy("doc_id")


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(
             list_sort(list_filter(
               regexp_split_to_array(
                 lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')),
                 '\\s+'),
               x -> x <> '')),
             ' ')) AS fp
FROM documents ORDER BY doc_id
"""


def doc_rolling_fingerprint(spark, sf_dir):
    """Winnowing-style min rolling-hash fingerprint (rows-only: the
    Rabin-Karp fold over bytes is not ANSI-SQL-expressible)."""
    from tl_spark.functions.text import rolling_fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("rfp")
    ).orderBy("doc_id")


def dedup_exact_docs(spark, sf_dir):
    from tl_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d).orderBy("text_hash")


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY sha256(text) ORDER BY text_hash
"""


# ------------------------------------------------------- embeddings / ANN

_QUERY_VEC = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]


def embedding_cosine_topk(spark, sf_dir):
    from tl_spark.operators.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(e, _QUERY_VEC, k=20)


def _cosine_sql():
    q = "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in _QUERY_VEC) + "]"
    nq = sum(x * x for x in _QUERY_VEC) ** 0.5
    return f"""
WITH t AS (
  SELECT vec_id AS id,
         list_sum(list_transform(list_zip(embedding, {q}),
                  p -> CAST(p[1] AS DOUBLE) * p[2])) AS dot,
         sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nv
  FROM embeddings
)
SELECT id, ROUND(dot / (nv * CAST({nq!r} AS DOUBLE)), 6) AS cosine
FROM t ORDER BY cosine DESC, id ASC LIMIT 20
"""


def ann_lsh_topk(spark, sf_dir):
    from tl_spark.operators.similarity import lsh_bucket_candidates

    e = _t(spark, sf_dir, "embeddings")
    return lsh_bucket_candidates(e, _QUERY_VEC, n_planes=8, k=20)


def embedding_neardup(spark, sf_dir):
    from tl_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, threshold=0.95).orderBy("id_a", "id_b")


def dedup_minhash(spark, sf_dir):
    from tl_spark.operators.dedup import minhash_lsh_candidates

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d, n_hashes=32, bands=8).orderBy(
        "id_a", "id_b"
    )


def dedup_simhash(spark, sf_dir):
    from tl_spark.operators.dedup import simhash_signatures

    d = _t(spark, sf_dir, "documents")
    return simhash_signatures(d).orderBy("id")


def dedup_ngram_jaccard(spark, sf_dir):
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cands = minhash_lsh_candidates(d, n_hashes=32, bands=8)
    return ngram_jaccard_pairs(d, cands, threshold=0.3).orderBy("id_a", "id_b")


# ------------------------------------------------------------- extraction

_DOC_HTML_TMPL = (
    "<html><body><main><p>",  # + text
    "</p></main><nav>site nav</nav>"
    '<script>var x = "<b>js</b>";</script></body></html>',
)


def _docs_as_html(spark, sf_dir):
    """Deterministic HTML wrapping of the documents table (the driver
    tables carry no HTML; BASELINE's transcript table is synthesized)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit(_DOC_HTML_TMPL[0]), F.col("text"), F.lit(_DOC_HTML_TMPL[1])
        ).alias("text"),
    )


def extract_documents(spark, sf_dir):
    """Flagship: kernel extraction over HTML-wrapped documents.

    Non-SQL-expressible (rows-only check); parity is enforced by the
    golden corpus against the compiled reference instead.
    """
    from tl_spark.functions.extract import extract_main_content

    html = _docs_as_html(spark, sf_dir)
    out = extract_main_content(html, passthrough=["doc_id"])
    return out.select(
        "doc_id",
        "extracted_text",
        F.to_json("spans").alias("spans_json"),
        "n_nodes",
        "html_version",
        "error",
    ).orderBy("doc_id")


EXTRACT_DOCS_SQL = """
SELECT doc_id,
       text AS extracted_text
FROM documents ORDER BY doc_id
"""  # see extract_documents_text query below for the SQL-checkable slice


def extract_documents_text(spark, sf_dir):
    """SQL-checkable slice of extraction: for the fixed wrapper template
    the kernel's extracted_text must equal the original document text
    (boilerplate stripped, payload preserved byte-for-byte). This turns
    the non-SQL kernel into a DuckDB-checkable invariant.
    """
    from tl_spark.functions.extract import extract_main_content

    html = _docs_as_html(spark, sf_dir)
    out = extract_main_content(html, passthrough=["doc_id"])
    return out.select("doc_id", "extracted_text").orderBy("doc_id")


def selector_extract_p(spark, sf_dir):
    """Selector-driven extraction: inner_text + spans of every <p> in
    the HTML-wrapped documents (rows-only; kernel-parity gated)."""
    from tl_spark.functions.query import query_selector_extract

    html = _docs_as_html(spark, sf_dir)
    return query_selector_extract(html, "p", mode="inner_text").orderBy(
        "doc_id", "node_idx"
    )


def lookup_by_id(spark, sf_dir):
    """get_element_by_id over the wrapped docs (scan mode, the
    reference default); every doc has <p id="t..."> absent, so probe
    the template's absent id plus main-content extraction is separate.
    Uses a present id: none in template -> synthesize one per doc."""
    from tl_spark.functions.query import get_elements_by_id

    d = _t(spark, sf_dir, "documents")
    html = d.select(
        "doc_id",
        F.concat(
            F.lit('<div id="payload">'), F.col("text"), F.lit("</div>")
        ).alias("text"),
    )
    return get_elements_by_id(html, "payload").orderBy("doc_id")


LOOKUP_BY_ID_SQL = """
SELECT doc_id, 0 AS node_idx, text AS inner_text
FROM documents ORDER BY doc_id
"""


def lookup_by_class(spark, sf_dir):
    """get_elements_by_class_name over wrapped docs; the wrapper gives
    every doc exactly one class hit whose inner_text is the doc text."""
    from tl_spark.functions.query import get_elements_by_class

    d = _t(spark, sf_dir, "documents")
    html = d.select(
        "doc_id",
        F.concat(
            F.lit('<div class="msg user">'), F.col("text"), F.lit("</div>")
        ).alias("text"),
    )
    return get_elements_by_class(html, "msg").orderBy("doc_id")


LOOKUP_BY_CLASS_SQL = LOOKUP_BY_ID_SQL


def doc_outer_html_roundtrip(spark, sf_dir):
    """Serialization op: dom_outer_html of a properly-closed wrapper is
    the identity — DuckDB-checkable as the same concat expression."""
    from typing import Iterator as _It

    def fn(batches):
        from tl_spark.kernel.htmlparse import parse

        for batch in batches:
            ids = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            outs = [parse(t or "").dom_outer_html() for t in texts]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(outs, type=pa.string())],
                names=["doc_id", "outer_html"],
            )

    html = _docs_as_html(spark, sf_dir)
    return html.mapInArrow(fn, "doc_id long, outer_html string").orderBy(
        "doc_id"
    )


DOC_OUTER_HTML_SQL = f"""
SELECT doc_id,
       '{_DOC_HTML_TMPL[0]}' || text || '{_DOC_HTML_TMPL[1].replace("'", "''")}'
         AS outer_html
FROM documents ORDER BY doc_id
"""


def doc_html_version(spark, sf_dir):
    """Doctype detection plumbing: '<!doctype html>' prefix => HTML5."""
    from tl_spark.functions.extract import extract_main_content

    d = _t(spark, sf_dir, "documents")
    html = d.select(
        "doc_id",
        F.concat(F.lit("<!doctype html><p>"), F.col("text"), F.lit("</p>")).alias(
            "text"
        ),
    )
    out = extract_main_content(html, passthrough=["doc_id"])
    return out.select("doc_id", "html_version").orderBy("doc_id")


DOC_HTML_VERSION_SQL = """
SELECT doc_id, 'HTML5' AS html_version FROM documents ORDER BY doc_id
"""


def curate_documents(spark, sf_dir):
    """Composed curation pipeline over HTML-wrapped documents
    (rows-only): extract -> stats -> exact dedup -> near-dup ->
    quality/length filters."""
    from tl_spark.curation import curate

    d = _t(spark, sf_dir, "documents")
    transcripts = d.select(
        F.lit("cdoc").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit(_DOC_HTML_TMPL[0]), F.col("text"), F.lit(_DOC_HTML_TMPL[1])
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    curated, _dropped = curate(transcripts, quality_min=0.0, min_tokens=1)
    return curated.select(
        "turn_idx", "extracted_text", "n_tokens", "quality", "lang_guess"
    ).orderBy("turn_idx")


def parse_nodes_docs(spark, sf_dir):
    """Node-arena explosion of HTML-wrapped documents (rows-only)."""
    from tl_spark.functions.extract import parse_nodes

    html = _docs_as_html(spark, sf_dir)
    out = parse_nodes(html)
    return out.select(
        "doc_id", "node_idx", "kind", "name", "start", "end",
        "n_children", "parent",
    ).orderBy("doc_id", "node_idx")


def media_image_features(spark, sf_dir):
    """Multimodal plumbing: deterministic media table + fake-decode
    feature extraction (rows-only; codecs are stubbed in-container)."""
    from tl_spark.operators.multimodal import image_features, synth_media

    media = synth_media(spark, n_rows=500)
    out = image_features(media, decode_stub="fake")
    return out.select(
        "media_id",
        F.round("mean_px", 4).alias("mean_px"),
        F.round("std_px", 4).alias("std_px"),
    ).orderBy("media_id")


def selector_counts(spark, sf_dir):
    """Per-document node/selector statistics via the kernel (rows-only)."""
    d = _t(spark, sf_dir, "documents")
    html = _docs_as_html(spark, sf_dir)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from tl_spark.kernel.htmlparse import parse

        for batch in batches:
            ids = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            n_p = []
            n_main = []
            n_all = []
            for t in texts:
                dom = parse(t or "")
                n_p.append(len(dom.query_selector("p")))
                n_main.append(len(dom.query_selector("main, nav")))
                n_all.append(len(dom.query_selector("*")))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_p, type=pa.int32()),
                    pa.array(n_main, type=pa.int32()),
                    pa.array(n_all, type=pa.int32()),
                ],
                names=["doc_id", "n_p", "n_main_nav", "n_nodes_all"],
            )

    return html.mapInArrow(
        fn, "doc_id long, n_p int, n_main_nav int, n_nodes_all int"
    ).orderBy("doc_id")


# ---------------------------------------------------------------- registry

def queries():
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_segment_revenue": q3_segment_revenue,
        "q5_nation_revenue": q5_nation_revenue,
        "top_customers_per_segment": top_customers_per_segment,
        "orders_running_total": orders_running_total,
        "events_hourly": events_hourly,
        "part_brand_stats": part_brand_stats,
        "supplier_region_acctbal": supplier_region_acctbal,
        "order_priority_counts": order_priority_counts,
        "doc_token_stats": doc_token_stats,
        "doc_quality": doc_quality,
        "doc_lang_guess": doc_lang_guess,
        "doc_fingerprint": doc_fingerprint,
        "dedup_exact": dedup_exact_docs,
        "embedding_cosine_topk": embedding_cosine_topk,
        "extract_documents": extract_documents,
        "extract_documents_text": extract_documents_text,
        "selector_counts": selector_counts,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "ann_lsh_topk": ann_lsh_topk,
        "embedding_neardup": embedding_neardup,
        "parse_nodes_docs": parse_nodes_docs,
        "media_image_features": media_image_features,
        "events_sessionized": events_sessionized,
        "events_asof_last_view": events_asof_last_view,
        "order_price_percentiles": order_price_percentiles,
        "selector_extract_p": selector_extract_p,
        "lookup_by_id": lookup_by_id,
        "lookup_by_class": lookup_by_class,
        "doc_outer_html_roundtrip": doc_outer_html_roundtrip,
        "doc_html_version": doc_html_version,
        "doc_rolling_fingerprint": doc_rolling_fingerprint,
        "curate_documents": curate_documents,
    }


def oracle_sql():
    return {
        "q1_pricing_summary": Q1_SQL,
        "q3_segment_revenue": Q3_SQL,
        "q5_nation_revenue": Q5_SQL,
        "top_customers_per_segment": TOP_CUSTOMERS_SQL,
        "orders_running_total": RUNNING_TOTAL_SQL,
        "events_hourly": EVENTS_HOURLY_SQL,
        "part_brand_stats": PART_BRAND_SQL,
        "supplier_region_acctbal": SUPPLIER_REGION_SQL,
        "order_priority_counts": ORDER_PRIORITY_SQL,
        "doc_token_stats": DOC_TOKEN_SQL,
        "doc_quality": DOC_QUALITY_SQL,
        "doc_lang_guess": _doc_lang_sql(),
        "doc_fingerprint": DOC_FINGERPRINT_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "embedding_cosine_topk": _cosine_sql(),
        "extract_documents_text": EXTRACT_DOCS_SQL,
        "events_sessionized": EVENTS_SESSION_SQL,
        "events_asof_last_view": EVENTS_ASOF_SQL,
        "order_price_percentiles": PERCENTILES_SQL,
        # lookup_by_id is also SQL-expressible for THIS wrapper: every
        # doc yields exactly one hit with node_idx 0 and the doc text
        "lookup_by_id": LOOKUP_BY_ID_SQL,
        "lookup_by_class": LOOKUP_BY_CLASS_SQL,
        "doc_outer_html_roundtrip": DOC_OUTER_HTML_SQL,
        "doc_html_version": DOC_HTML_VERSION_SQL,
        # extract_documents / selector_counts / dedup_minhash /
        # dedup_simhash / dedup_ngram_jaccard / ann_lsh_topk:
        # non-SQL-expressible -> rows-only driver check
    }
