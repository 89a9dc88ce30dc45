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

Round-8 sink optimization: every query's trailing deterministic-order
sink is ``.repartition(1).sortWithinPartitions(keys)`` instead of
``.orderBy(keys)``. A global range sort SAMPLES its child to pick
partition boundaries, which re-executes the entire upstream segment
since the last materialized exchange — for the map-only battery
queries that means every kernel/regex pass runs TWICE per action
(measured exactly 2x: doc_fingerprint 4.88 s -> 2.49 s, doc_pii
8.24 s -> 4.57 s at sf1.0/local[32]; see OPTIMIZATION_r08.md). The
sink output is small by construction (driver-check projections), the
sort keys are a unique tuple in every query, and a single-partition
sort of the final rows produces the IDENTICAL row sequence with one
upstream execution and no sampling job (verified row-for-row). The
``repartition(1)`` (not ``coalesce(1)``) keeps every upstream stage at
full parallelism. Production callers use the operators directly and
never pay this sink.

The extraction/sketch queries are made SQL-checkable through two
patterns (the kernel itself is additionally gated by the golden corpus,
tests/test_goldens.py — byte parity with the compiled reference):

- **wrapper invariants**: the driver's ``documents.text`` is tag-free
  (no ``<``/``>``, pure ASCII — asserted by ``doc_token_stats`` being
  green on ``length(text)``), so wrapping it in a fixed HTML template
  makes every kernel output (node arena, spans, selector hits) a
  closed-form SQL expression of ``length(text)``;
- **planted ground truth**: dedup/near-dup queries run on the corpus
  UNION an id-shifted copy, so the expected pair set is exactly the
  planted twins (max natural pair cosine at sf0.01 is 0.51; exact
  twins are found with probability 1 by construction in both MinHash
  banding and sign-LSH bucketing);
- **exact re-expression**: simhash (DuckDB ``md5_number_upper`` ==
  md5[:8] little-endian), n-gram Jaccard (exploded-shingle join), and
  the Rabin-Karp rolling fingerprint (windowed polynomial mod 2^64 in
  HUGEINT arithmetic) are reproduced value-for-value in SQL.

Only ``media_image_features`` stays rows-only: its deterministic fake
decoder is a sha256 byte stream, which SQL cannot reproduce; its gate
is tests/test_multimodal.py determinism + shape tests.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tl_spark.cache import keep_handles

from tl_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    lang_guess,
    punct_count,
    quality_score,
    token_count,
)


def _bytes_conf(v: str) -> int:
    v = v.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
    if v and v[-1] in units:
        return int(v[:-1]) * units[v[-1]]
    return int(v)


def _t(
    spark: SparkSession, sf_dir: str, name: str, fanout: str = "auto"
) -> DataFrame:
    """Read a driver table with SCALE-ADAPTIVE parallelism.

    A small parquet table bin-packs into a handful of scan splits
    (sf1.0 documents.parquet is one 5.6 MB file -> 1-2 tasks under the
    bench's 8 MB maxPartitionBytes), which starves every downstream
    map phase: the round-8 probe measured minhash signatures at 6.2 s
    on 2 of 32 cores. When the estimated split count is below half the
    session parallelism AND the input is small enough that one
    round-robin shuffle is trivial (<= 256 MB), fan the scan out to
    defaultParallelism; large inputs (the 100 TB regime) already carry
    >= cores splits and pass through untouched — the guard is derived
    from input size + session conf, never a local-mode constant
    (guide §2.2/§2.5: scale-adaptive partitioning, deterministic
    round-robin via Spark's sort-before-repartition).
    """
    from pathlib import Path

    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    try:
        p = Path(path)
        size = (
            sum(f.stat().st_size for f in p.glob("**/*") if f.is_file())
            if p.is_dir()
            else p.stat().st_size
        )
        mpb = _bytes_conf(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        par = spark.sparkContext.defaultParallelism
        est_parts = size // mpb + 1
        # "auto": fan out only when the scan is badly starved (< par/4
        # splits): a moderately-split table (sf1.0 lineitem: 14 splits
        # at 32 cores) loses more to the round-robin shuffle — which
        # also destroys the natural orderkey clustering that makes
        # partial aggregation effective — than it gains in map
        # parallelism (q3 probe: 2.2 s natural vs 3.0 s fanned-out).
        # "force": fan out below full parallelism — for pure
        # scan+aggregate queries whose map work dominates and whose
        # partial aggregation collapses regardless of clustering
        # (q1 probe: 1.91 s natural vs 1.35 s fanned-out).
        need = est_parts < par if fanout == "force" else est_parts * 4 <= par
        if fanout != "off" and need and size <= 256 << 20:
            df = df.repartition(par)
    except Exception:
        pass
    return df


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
    # forced fan-out: pure scan+aggregate to 4 groups — see _t
    l = _t(spark, sf_dir, "lineitem", fanout="force")
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
        .repartition(1).sortWithinPartitions("l_returnflag", "l_linestatus")
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



def _tbl_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a driver table — the scale signal for the
    adaptive join shapes below (0 when unreadable: conservative)."""
    from pathlib import Path

    try:
        pth = Path(f"{sf_dir}/{name}.parquet")
        if pth.is_dir():
            return sum(
                f.stat().st_size for f in pth.glob("**/*") if f.is_file()
            )
        return pth.stat().st_size
    except Exception:
        return 0


# pre-aggregation (guide §2.3 aggregate-before-shuffle) trades one
# extra aggregation stage for a smaller, narrower join shuffle. The
# trade only pays once the fact table is large enough that shuffle
# bytes dominate fixed stage cost — measured crossover between the
# driver scales (sf0.1 lineitem 11 MB: pre-agg LOSES 0.9 s of stage
# overhead; sf1.0 110 MB: pre-agg WINS 0.8 s). 64 MB ~ 2 MB/core at
# local[32] and is size-derived, not scale-factor-derived, so the
# choice follows the data at any SF; both shapes produce identical
# values (exact decimal sums are associative; inner joins drop whole
# orderkey groups).
_PREAGG_MIN_BYTES = 64 << 20


def q3_segment_revenue(spark, sf_dir):
    # round 8 (VERDICT r7 item 2): no F.broadcast on the SF-growing
    # customer table — AQE broadcasts it while it fits.
    # fanout off on every side: the join/aggregation shuffles supply
    # the parallelism, and the round-robin fan-out both adds an
    # Exchange per table and destroys lineitem's natural orderkey
    # clustering (r8 probe at sf0.1: 0.70 s natural vs 1.54 s fanned)
    # NO lineitem pre-aggregation here, unlike q5/top_customers: q3's
    # own grouping key IS the orderkey, so pre-aggregating would do
    # the same per-orderkey grouping twice (A/B at sf1.0: 1.95 s
    # simple vs 2.37 s pre-agged); the join's hash partitioning on
    # l_orderkey is reused by the groupBy, so the agg adds no Exchange
    c = _t(spark, sf_dir, "customer", fanout="off").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders", fanout="off")
    l = _t(spark, sf_dir, "lineitem", fanout="off")
    grouped = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )
    return grouped.orderBy(
        F.desc("revenue"), F.asc("o_orderkey")
    ).limit(10)


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
    # fanout off: see q3 — join shuffles supply the parallelism
    r = _t(spark, sf_dir, "region", fanout="off")
    n = _t(spark, sf_dir, "nation", fanout="off")
    c = _t(spark, sf_dir, "customer", fanout="off")
    o = _t(spark, sf_dir, "orders", fanout="off")
    l = _t(spark, sf_dir, "lineitem", fanout="off")
    # round 8 (guide §2.3 aggregate-before-shuffle, size-adaptive —
    # see _PREAGG_MIN_BYTES): above the crossover lineitem
    # pre-aggregates (exact decimal revenue, row count) per orderkey,
    # so the orderkey join shuffles ~4x fewer, narrower rows; the
    # final (r_name, n_name) aggregation sums the per-order partials —
    # decimal sums are exact and associative, counts add, so values
    # are identical.
    if _tbl_bytes(sf_dir, "lineitem") >= _PREAGG_MIN_BYTES:
        lside = l.groupBy("l_orderkey").agg(
            F.sum(_rev_dec()).alias("_rev"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        rev_col, cnt_col = F.sum("_rev"), F.sum("_cnt")
    else:
        lside = l.select(
            "l_orderkey", _rev_dec().alias("_rev"), F.lit(1).alias("_cnt")
        )
        rev_col, cnt_col = F.sum("_rev"), F.count(F.lit(1))
    out = (
        lside.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is NOT a bounded dimension (it grows with SF) — no
        # broadcast hint; AQE picks broadcast when it actually fits
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(rev_col, 2).cast("double").alias("revenue"),
            cnt_col.alias("n_lineitems"),
        )
        .repartition(1).sortWithinPartitions("r_name", "n_name")
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
    # round 8 (VERDICT r7 item 2 + guide §2.3): the F.broadcast hint on
    # the SF-growing customer table is gone (AQE decides), and orders
    # aggregates per custkey BEFORE the join — c_custkey is customer's
    # key, so grouping the joined rows by (segment, custkey, name) is
    # the same partition of orders as grouping orders by custkey alone
    # and attaching the unique (segment, name) afterwards; the exact
    # decimal sum is order-free, so total_spend is identical. The
    # pre-join shuffle carries (custkey, decimal) instead of every
    # order row joined with two customer strings.
    # fanout off: see q3 — join/aggregation shuffles supply parallelism
    c = _t(spark, sf_dir, "customer", fanout="off")
    o = _t(spark, sf_dir, "orders", fanout="off")
    if _tbl_bytes(sf_dir, "orders") >= _PREAGG_MIN_BYTES // 4:
        osum = o.groupBy("o_custkey").agg(
            F.sum(_dec(F.col("o_totalprice"))).alias("_spend")
        )
        totals = (
            osum.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .select(
                "c_mktsegment",
                "c_custkey",
                "c_name",
                F.col("_spend").cast("double").alias("total_spend"),
            )
        )
    else:
        totals = (
            o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment", "c_custkey", "c_name")
            .agg(
                F.sum(_dec(F.col("o_totalprice")))
                .cast("double")
                .alias("total_spend")
            )
        )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return (
        totals.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "total_spend", "rnk")
        .repartition(1).sortWithinPartitions("c_mktsegment", "rnk")
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
    ).repartition(1).sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")


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
    # fanout off: the two-phase count_distinct aggregation supplies
    # its own parallelism; fanning the scan measured neutral at sf1.0
    # and -0.35 s at sf0.1
    e = _t(spark, sf_dir, "events", fanout="off")
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
        .repartition(1).sortWithinPartitions("hour", "event_type")
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
        .repartition(1).sortWithinPartitions("p_brand")
    )


PART_BRAND_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       MAX(p_size) AS max_size, MIN(p_size) AS min_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def supplier_region_acctbal(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier", fanout="off")
    n = _t(spark, sf_dir, "nation", fanout="off")
    r = _t(spark, sf_dir, "region", fanout="off")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec(F.col("s_acctbal"))).cast("double").alias("sum_acctbal"),
        )
        .repartition(1).sortWithinPartitions("r_name")
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
        .repartition(1).sortWithinPartitions("o_orderpriority")
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
        .repartition(1).sortWithinPartitions("user_id", "sess_id")
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


def events_dedup_latest(spark, sf_dir):
    """Keep-latest dedup by (user_id, event_type) — the standard CDC /
    upsert compaction shape: one shuffle on the key, row_number window,
    deterministic tie-break by event_id."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
        .repartition(1).sortWithinPartitions("user_id", "event_type")
    )


EVENTS_DEDUP_LATEST_SQL = """
SELECT user_id, event_type, event_id, ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


def media_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing (rows-only like media_image_features:
    the fake frame decode is a sha256 stream): one output row per kept
    frame of every synthetic video payload — exercises row-expanding
    mapInArrow batches end to end."""
    from tl_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, n_rows=500)
    out = sample_frames(media, every_k=10, decode_stub="fake")
    return out.select(
        "media_id", "frame_idx", F.round("frame_mean", 4).alias("frame_mean")
    ).repartition(1).sortWithinPartitions("media_id", "frame_idx")


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
        .repartition(1).sortWithinPartitions("event_id")
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
        .repartition(1).sortWithinPartitions("o_orderpriority")
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
    ).repartition(1).sortWithinPartitions("doc_id")


DOC_TOKEN_SQL = f"""
SELECT doc_id,
       len({_TOKENS_SQL}) AS n_tokens,
       length(text) AS n_chars_c,
       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
FROM documents ORDER BY doc_id
"""


def doc_bpe_tokens(spark, sf_dir):
    """BPE-ish pre-tokenization count (task-brief op): GPT-2-style
    regex restricted to the Java-regex ∩ RE2 feature set so Spark and
    DuckDB count the identical match sequence."""
    from tl_spark.functions.text import bpe_token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", bpe_token_count(F.col("text")).cast("long").alias("n_bpe")
    ).repartition(1).sortWithinPartitions("doc_id")


def _bpe_sql() -> str:
    from tl_spark.functions.text import BPE_ISH_RE

    pat = BPE_ISH_RE.replace("'", "''")
    return f"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe
FROM documents ORDER BY doc_id
"""


def doc_top_terms(spark, sf_dir):
    """Corpus-level top-20 terms: lowercase, punctuation-stripped
    whitespace tokens -> count -> top-k (ties broken by term). The
    plan is explode -> partial+final HashAggregate (map-side combine)
    -> TakeOrderedAndProject: the canonical corpus-vocabulary shape
    that survives a 100x scale-up (the shuffle carries one partial
    count per distinct term per partition)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9 ]", " "))
    toks = F.filter(F.split(norm, r"\s+"), lambda x: x != "")
    return (
        d.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


TOP_TERMS_SQL = """
WITH toks AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(
             lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')),
             '\\s+'),
           x -> x <> '')) AS term
  FROM documents
)
SELECT term, COUNT(*) AS n FROM toks
GROUP BY term ORDER BY n DESC, term ASC LIMIT 20
"""


def doc_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    ).repartition(1).sortWithinPartitions("doc_id")


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
    ).repartition(1).sortWithinPartitions("doc_id")


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


def docs_balanced_sample(spark, sf_dir):
    """Deterministic quota sampling: top-25 docs per language stratum
    by quality (ties by doc_id) — the dataset-balancing step of a
    curation pipeline. Window-based, so it is reproducible across
    partitionings/cluster sizes (Spark's sample()/sampleBy() are NOT:
    their Bernoulli draw depends on row order within partitions)."""
    d = _t(spark, sf_dir, "documents")
    q = quality_score(F.col("text")).alias("quality")
    w = Window.partitionBy("lang").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "lang", q)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 25)
        .repartition(1).sortWithinPartitions("lang", "rnk")
    )


def _balanced_sample_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
         CAST(len(list_distinct(list_intersect({_TOKENS_SQL}, {_STOP_LIST})))
              AS DOUBLE) AS stop
  FROM documents
), scored AS (
  SELECT doc_id, lang,
         ROUND(
           LEAST(n_tok / 20.0, 1.0) * 0.4
           + LEAST(stop / 2.0, 1.0) * 0.3
           + (CASE WHEN n_chars > 0
                   THEN 1.0 - LEAST(punct / n_chars * 10, 1.0)
                   ELSE 0.0 END) * 0.3,
           4) AS quality
  FROM t
)
SELECT doc_id, lang, quality,
       ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY quality DESC, doc_id ASC) AS rnk
FROM scored
QUALIFY rnk <= 25
ORDER BY lang, rnk
"""


def doc_fingerprint(spark, sf_dir):
    # Arrow-batch kernel leg of functions.text.fingerprint — bit-equal
    # output (suite-pinned), ~5x the JVM regexp_replace chain; see the
    # fingerprint_arrow docstring for the equivalence argument.
    from tl_spark.functions.text import fingerprint_arrow

    d = _t(spark, sf_dir, "documents")
    return fingerprint_arrow(d).repartition(1).sortWithinPartitions(
        "doc_id"
    )


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
    """Winnowing-style min rolling-hash fingerprint. SQL-checkable
    after all: the windowed Rabin-Karp polynomial mod 2^64 is
    reproduced in DuckDB HUGEINT arithmetic (ROLLING_FP_SQL) — each
    window is an explicit 16-term dot product with precomputed
    B^k mod 2^64 constants; min over windows in unsigned order, then
    reinterpreted as signed int64 exactly like the numpy impl."""
    from tl_spark.functions.text import rolling_fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("rfp")
    ).repartition(1).sortWithinPartitions("doc_id")


def _rolling_fp_sql(window: int = 16, base: int = 1000003) -> str:
    m = 1 << 64
    pows = [pow(base, e, m) for e in range(window)]  # B^0..B^15
    # windowed hash at 0-based start j: sum_{o=1..w} byte[j+o] * B^(w-o)
    terms = " + ".join(
        f"CAST(ord(text[j+{o}]) AS HUGEINT) * {pows[window - o]}::HUGEINT"
        for o in range(1, window + 1)
    )
    # docs shorter than the window hash in full (variable-length dot
    # product via list comprehension); empty text hashes to 0
    pow_list = "[" + ", ".join(f"{p}::HUGEINT" for p in pows) + "]"
    return f"""
WITH win AS (
  SELECT doc_id,
         ({terms}) % {m}::HUGEINT AS h
  FROM (SELECT doc_id, text, unnest(range(0, length(text) - {window - 1})) AS j
        FROM documents WHERE length(text) >= {window})
), agg AS (
  SELECT doc_id, MIN(h) AS mh FROM win GROUP BY doc_id
  UNION ALL
  SELECT doc_id,
         CASE WHEN length(text) = 0 THEN 0::HUGEINT
              ELSE list_sum([CAST(ord(text[i]) AS HUGEINT)
                             * ({pow_list})[length(text) - i + 1]
                             for i in range(1, length(text) + 1)])
                   % {m}::HUGEINT END AS mh
  FROM documents WHERE length(text) < {window}
)
SELECT doc_id,
       CAST(CASE WHEN mh >= {1 << 63}::HUGEINT
                 THEN mh - {m}::HUGEINT ELSE mh END AS BIGINT) AS rfp
FROM agg ORDER BY doc_id
"""


def doc_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals per document:
    dup_word_frac (1 - distinct/total tokens) and top_bigram_frac
    (most frequent adjacent-token bigram's share of all bigrams).

    Round-8 shape: both signals are PER-ROW functions of the token
    array, so the whole query is one map-side projection — the r7
    explode + two (doc_id, bigram)-keyed HashAggregates + re-attach
    join shuffled ~n_tokens short-string rows per doc for a value each
    row already determines (8.7 s -> ~1 s at sf1.0; guide §2.4). The
    top bigram count is the longest equal-run in the SORTED bigram
    array (a fold over ~n_tok elements per row — same shape as
    functions.text.top_bigram_char_frac); the max multiplicity of a
    multiset equals its sorted longest run, so top_c is identical to
    the aggregation formulation value-for-value."""
    from tl_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        tokens(F.col("text")).alias("t"),
    ).withColumn("n_tok", F.size("t"))
    grams = F.sort_array(
        F.transform(
            F.sequence(F.lit(1), F.col("n_tok") - 1),
            lambda i: F.concat(
                F.element_at("t", i), F.lit(" "), F.element_at("t", i + 1)
            ),
        )
    )
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(run, acc["best"]).alias("best"),
        )

    top_c = F.aggregate(grams, zero, step)["best"]
    n = F.col("n_tok")
    dup = F.when(
        n > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("t")) / n.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))
    tbf = F.when(
        n >= 2,
        F.round(top_c.cast("double") / (n - 1), 6),
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        dup.alias("dup_word_frac"),
        tbf.alias("top_bigram_frac"),
    ).repartition(1).sortWithinPartitions("doc_id")


DOC_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
), base AS (
  SELECT doc_id, t, len(t) AS n_tok FROM toks
), pos AS (
  SELECT doc_id, t, unnest(range(1, n_tok)) AS i FROM base WHERE n_tok >= 2
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg FROM pos
), top AS (
  SELECT doc_id, max(c) AS top_c FROM (
    SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       CASE WHEN n_tok > 0
            THEN round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / n_tok, 6)
            ELSE 0.0 END AS dup_word_frac,
       CASE WHEN n_tok >= 2
            THEN round(CAST(top_c AS DOUBLE) / (n_tok - 1), 6)
            ELSE 0.0 END AS top_bigram_frac
FROM base b LEFT JOIN top USING (doc_id)
ORDER BY doc_id
"""


def doc_pii_redaction(spark, sf_dir):
    """PII scrub (email / IPv4 / phone -> typed placeholders) + per-type
    counts. The documents table is clean ASCII prose, so realistic PII
    is injected deterministically from doc_id on BOTH sides; the
    redaction chain is all-JVM regexp_replace (codegen), patterns
    restricted to the Java-regex ∩ RE2 subset so DuckDB reproduces the
    identical match sequence. Counts are staged in masking order
    (emails removed before IPs are counted, IPs before phones) so each
    character is attributed to exactly one category."""
    from tl_spark.functions.text import pii_counts, pii_redact

    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".7 tel +1 555 01"),
        F.format_string("%04d", F.pmod(F.col("doc_id"), F.lit(10000))),
    )
    t = d.select("doc_id", injected.alias("t"))
    n_email, n_ip, n_phone = pii_counts(F.col("t"))
    return t.select(
        "doc_id",
        pii_redact(F.col("t")).alias("redacted"),
        n_email.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_phone.cast("long").alias("n_phones"),
    ).repartition(1).sortWithinPartitions("doc_id")


_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE_RE = r"\+?\d[\d -]{7,}\d"

DOC_PII_SQL = rf"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 tel +1 555 01'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
), staged AS (
  SELECT doc_id, t,
         regexp_replace(t, '{_PII_EMAIL_RE}', '[EMAIL]', 'g') AS t1
  FROM injected
), staged2 AS (
  SELECT doc_id, t, t1,
         regexp_replace(t1, '{_PII_IP_RE}', '[IP]', 'g') AS t2
  FROM staged
)
SELECT doc_id,
       regexp_replace(t2, '{_PII_PHONE_RE}', '[PHONE]', 'g') AS redacted,
       len(regexp_extract_all(t,  '{_PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t1, '{_PII_IP_RE}'))    AS n_ips,
       len(regexp_extract_all(t2, '{_PII_PHONE_RE}')) AS n_phones
FROM staged2 ORDER BY doc_id
"""


def dedup_exact_docs(spark, sf_dir):
    from tl_spark.operators.dedup import exact_dedup

    # unscaled read: sha256 is cheaper than the adaptive fan-out's
    # round-robin shuffle (r8 probe: 0.47 s unscaled vs 0.89 s
    # fanned-out at sf1.0) — the groupBy supplies the parallelism
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(d).repartition(1).sortWithinPartitions("text_hash")


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY sha256(text) ORDER BY text_hash
"""


# ------------------------------------------------------- embeddings / ANN

_QUERY_VEC = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]


def embedding_cosine_topk(spark, sf_dir):
    from tl_spark.operators.similarity import cosine_topk_bruteforce

    # unscaled read: the brute-force dot products are cheaper than the
    # adaptive fan-out's vector shuffle (r8 bench: 0.37 s unscaled vs
    # 0.62 s fanned-out at sf1.0)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
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
    """Multi-probe ANN over the corpus UNION 20 planted needles
    (positively-scaled copies of the query at vec_id 2_000_000+i).

    A scaled copy has the query's exact sign signature, so it lives in
    the FIRST-probed bucket and cosine exactly 1.0 (>> the 0.21 max
    natural similarity) — the true top-20 is the needle set and the
    probe budget stays small (80 candidates of 520), i.e. this checks
    the ANN path doing real candidate pruning, not a disguised scan.
    Uniform-random embeddings are sign-LSH's worst case (no cluster
    structure: exact top-k recall needs ~95% probing — measured in
    tests/test_operators.py); real embedding corpora are clustered,
    which is the regime the planted cluster stands in for."""
    from tl_spark.operators.similarity import ann_multiprobe_topk

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qlit = "array(" + ",".join(f"cast({x!r} as float)" for x in _QUERY_VEC) + ")"
    needles = spark.range(20).select(
        (F.col("id") + 2000000).alias("vec_id"),
        F.expr(
            f"cast(transform({qlit}, x -> x * (1.0 + cast(id as double) / 20.0))"
            " as array<float>)"
        ).alias("embedding"),
    )
    return ann_multiprobe_topk(
        e.unionByName(needles), _QUERY_VEC, n_planes=8, k=20, min_candidates=80
    )


ANN_TOPK_SQL = """
SELECT CAST(2000000 + r.range AS BIGINT) AS id,
       CAST(1.0 AS DOUBLE) AS cosine
FROM range(20) r ORDER BY id
"""


def embedding_neardup(spark, sf_dir):
    """Near-dup pairs over the corpus UNION planted exact twins
    (vec_id + 1_000_000). Expected output is exactly the 500 planted
    pairs: max natural pair cosine is ~0.51 << 0.95 threshold, and an
    exact twin shares every LSH sign bucket by construction."""
    from tl_spark.operators.similarity import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    out = embedding_neardup_pairs(e.unionByName(twins), threshold=0.95)
    # .orderBy returns a new DataFrame and drops the plain-attribute
    # cache handle — re-attach so consumers can release the vector
    # cache (tl_spark.cache.keep_handles).
    return keep_handles(out.repartition(1).sortWithinPartitions("id_a", "id_b"), out)


NEARDUP_SQL = """
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
       CAST(1.0 AS DOUBLE) AS cosine
FROM embeddings ORDER BY id_a
"""


def semantic_dedup_docs(spark, sf_dir):
    """SemDeDup-shape semantic dedup (operators/similarity.py:741,
    Abbas et al. 2023 — public knowledge) over the corpus UNION
    planted exact twins (vec_id + 1_000_000): assign every vector to
    its nearest IVF centroid, then within each list drop any vector
    whose list holds an EARLIER (smaller id) vector with round-6
    cosine >= 0.95. A twin is assigned to its original's list by
    construction (identical vector -> identical nearest centroid)
    with cosine exactly 1.0, and the max natural pair cosine is
    ~0.51 << 0.95 — so the drop set is exactly the 500 twins,
    closed-form in SQL. The IVF list id itself is k-means-dependent,
    so the checked projection carries (id, max_cos) only."""
    from tl_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = e.select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    _kept, dropped = semantic_dedup(e.unionByName(twins), threshold=0.95)
    return dropped.select("id", "max_cos").repartition(1).sortWithinPartitions("id")


SEMANTIC_DEDUP_SQL = """
SELECT vec_id + 1000000 AS id, CAST(1.0 AS DOUBLE) AS max_cos
FROM embeddings ORDER BY id
"""


def dedup_minhash(spark, sf_dir):
    """MinHash+LSH over the corpus UNION planted exact twins
    (doc_id + 1_000_000). A twin pair has identical signatures, so it
    collides in every band (found with probability 1) and its
    est_jaccard is exactly 1.0 — the planted set is the SQL-checkable
    slice of the candidate generator. (Natural near-1.0 pairs exist in
    the corpus but their est values are xxhash64-dependent, hence the
    planted-pair projection.)"""
    from tl_spark.operators.dedup import minhash_lsh_candidates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    cands = minhash_lsh_candidates(
        d.unionByName(twins), n_hashes=32, bands=8
    )
    out = cands.filter(
        (F.col("id_b") - F.col("id_a") == 1000000)
        & (F.col("id_a") < 1000000)
        & (F.col("est_jaccard") == 1.0)
    ).repartition(1).sortWithinPartitions("id_a")
    return keep_handles(out, cands)  # carry the sig-table cache handle


DEDUP_MINHASH_SQL = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
       CAST(1.0 AS DOUBLE) AS est_jaccard
FROM documents ORDER BY id_a
"""


def dedup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    from tl_spark.operators.dedup import simhash_signatures

    return simhash_signatures(d).repartition(1).sortWithinPartitions("id")


# Exact SQL re-expression of the 64-bit SimHash: DuckDB's
# md5_number_upper(tok) equals int.from_bytes(md5(tok)[:8], 'little')
# (verified value-for-value); per-bit votes are occurrence-weighted
# sums, the final signature is reinterpreted as signed int64.
DEDUP_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
), votes AS (
  SELECT doc_id, b.range AS bit,
         SUM(CASE WHEN (md5_number_upper(tok) >> CAST(b.range AS UBIGINT))
                       & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM toks CROSS JOIN range(64) b GROUP BY 1, 2
), agg AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0
                  THEN CAST(1 AS HUGEINT) << CAST(bit AS INT)
                  ELSE 0 END) AS u
  FROM votes GROUP BY 1
)
SELECT doc_id AS id,
       CAST(CASE WHEN u >= 9223372036854775808
                 THEN u - 18446744073709551616 ELSE u END AS BIGINT)
         AS simhash
FROM agg ORDER BY id
"""


def doc_contamination(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any 13-char
    n-gram with a 'benchmark' set (here: docs 0-4). Exact by
    construction — no sketching — so the brute-force SQL oracle
    matches value-for-value; the Spark plan broadcasts the benchmark
    shingle set (map-side semi-join, no corpus shuffle)."""
    from tl_spark.operators.dedup import ngram_contamination

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") < 5)
    out = ngram_contamination(d, bench, n=13)
    return out.select(
        F.col("id").alias("doc_id"), F.col("n_hits").cast("long").alias("n_hits")
    ).repartition(1).sortWithinPartitions("doc_id")


DOC_CONTAMINATION_SQL = """
WITH bsh AS (
  SELECT DISTINCT unnest([text[i:i+12] for i in range(1, length(text)-11)]) AS s
  FROM documents WHERE doc_id < 5 AND length(text) >= 13
), dsh AS (
  SELECT doc_id,
         unnest(list_distinct([text[i:i+12] for i in range(1, length(text)-11)])) AS s
  FROM documents WHERE length(text) >= 13
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM dsh JOIN bsh USING (s)
GROUP BY doc_id ORDER BY doc_id
"""


def dedup_simhash_neardup(spark, sf_dir):
    """Banded-Hamming SimHash near-dups (radius 3). Recall is exact by
    pigeonhole (3 flipped bits spoil at most 3 of 4 bands), so the
    output equals brute-force all-pairs Hamming <= 3 — which the
    oracle computes directly from the SQL-re-expressed signatures.

    bands=4 (16-bit pieces), not the operator-default 8: 8-bit pieces
    have only 256 possible values per band, so natural bucket sizes
    grow linearly with the corpus and blow the exactness cap already
    at sf0.1 (29 over-cap buckets). 16-bit pieces keep every bucket
    under 512 at both driver scales — certified empty by
    simhash_cap_report in tests/test_operators.py::
    test_simhash_driver_params_within_cap_precondition."""
    from tl_spark.operators.dedup import simhash_neardup_pairs

    d = _t(spark, sf_dir, "documents")
    out = simhash_neardup_pairs(d, max_hamming=3, bands=4, max_bucket_size=512)
    # no cache handle since round 8: the in-bucket verify removed the
    # operator's persisted signature table
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    ).repartition(1).sortWithinPartitions("id_a", "id_b")


def _simhash_neardup_sql() -> str:
    # reuse the validated signature re-expression as a CTE, then
    # brute-force all pairs with xor + bit_count
    sig_cte = DEDUP_SIMHASH_SQL.strip().rstrip().removesuffix("ORDER BY id")
    return f"""
WITH sigs AS (
{sig_cte}
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def dedup_ngram_jaccard(spark, sf_dir):
    """LSH candidates verified by exact 5-char-shingle Jaccard at
    threshold 0.5. At >= 0.5 banded MinHash (32 hashes / 8 bands) has
    recall 1 on this corpus — the pair set equals the brute-force
    all-pairs SQL oracle (the only LSH-missed pairs sit at ~0.30,
    right at the old threshold, which is why it moved to 0.5)."""
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cands = minhash_lsh_candidates(d, n_hashes=32, bands=8)
    verified = ngram_jaccard_pairs(d, cands, threshold=0.5)
    return keep_handles(verified.repartition(1).sortWithinPartitions("id_a", "id_b"), verified)


# Brute-force exact Jaccard via an exploded-shingle self-join (the
# list_intersect all-pairs formulation takes ~40 s on 500 docs; this
# runs in ~2 s). text[i:i+4] is DuckDB's INCLUSIVE slice = 5 chars.
NGRAM_JACCARD_SQL = """
WITH docs AS (
  -- hash-materialize (doc_id, text) before the self-join; see
  -- _curate_sql for the 8x plan note
  SELECT doc_id, text FROM documents GROUP BY doc_id, text
), sh AS (
  SELECT doc_id,
         unnest(list_distinct([text[i:i+4] for i in range(1, length(text)-3)]))
           AS s
  FROM docs WHERE length(text) >= 5
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 4) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 4) >= 0.5
ORDER BY id_a, id_b
"""


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

    Fully SQL-checkable for the fixed wrapper: the documents table is
    tag-free, so the DOM is the 12-node template arena and every
    output column is a closed form of length(text) — one top-level
    span [0, L+101] (the <html> raw extent), 12 nodes, no doctype.
    Kernel parity on arbitrary HTML is enforced by the golden corpus.
    """
    from tl_spark.functions.extract import extract_main_content

    html = _docs_as_html(spark, sf_dir)
    # jvm_fastpath off: the HTML wrapper guarantees a '<' in every row,
    # so the tag-free branch would only add an empty second scan
    out = extract_main_content(
        html, passthrough=["doc_id"], jvm_fastpath=False
    )
    return out.select(
        "doc_id",
        "extracted_text",
        F.to_json("spans").alias("spans_json"),
        "n_nodes",
        "html_version",
        "error",
    ).repartition(1).sortWithinPartitions("doc_id")


EXTRACT_DOCS_FULL_SQL = """
SELECT doc_id, text AS extracted_text,
       '[{"start":0,"end":' || CAST(length(text) + 101 AS VARCHAR) || '}]'
         AS spans_json,
       CAST(12 AS INTEGER) AS n_nodes,
       CAST(NULL AS VARCHAR) AS html_version,
       CAST(NULL AS VARCHAR) AS error
FROM documents ORDER BY doc_id
"""


EXTRACT_DOCS_SQL = """
SELECT doc_id,
       text AS extracted_text
FROM documents ORDER BY doc_id
"""  # the extracted_text-only slice (extract_documents_text query)


def extract_documents_text(spark, sf_dir):
    """SQL-checkable slice of extraction: for the fixed wrapper template
    the kernel's extracted_text must equal the original document text
    (boilerplate stripped, payload preserved byte-for-byte). This turns
    the non-SQL kernel into a DuckDB-checkable invariant.
    """
    from tl_spark.functions.extract import extract_main_content

    html = _docs_as_html(spark, sf_dir)
    # jvm_fastpath off: wrapped docs always contain '<' (see above)
    out = extract_main_content(
        html, passthrough=["doc_id"], jvm_fastpath=False
    )
    return out.select("doc_id", "extracted_text").repartition(1).sortWithinPartitions("doc_id")


def main_content_docs(spark, sf_dir):
    """Density-based main-content selection (the north rule's "DOM
    heuristics" leg, functions/readability.py): each document is
    wrapped in one of THREE realistic page shells (nav bars, link
    rails, comment threads, footers — doc_id % 3) and the operator
    must pick the content block by text/link-density score, never by
    position or a fixed template. The winner's inner_text, byte span,
    tag, and candidate count are all closed forms of the documents
    table, so the oracle is value-exact: the shells are built so the
    content block's score dominates every decoy for any text >= the
    corpus minimum (see readability.MAIN_HTML_VARIANTS).

    Plan: the kernel stage is map-only (mapInArrow, zero Exchange);
    the final orderBy exists for the driver's deterministic hash
    check — a single-partition sort since round 8 (module note)."""
    from tl_spark.functions.readability import (
        docs_as_variant_html,
        main_content_extract,
    )

    d = _t(spark, sf_dir, "documents")
    html = docs_as_variant_html(d)
    out = main_content_extract(html, html_col="text", id_col="doc_id")
    return out.select(
        "doc_id", "main_text", "main_tag", "span_start", "span_end",
        "n_candidates",
    ).repartition(1).sortWithinPartitions("doc_id")


def _main_content_sql() -> str:
    from tl_spark.functions.readability import MAIN_HTML_VARIANTS

    marker = '<div id="main">'
    starts = [pre.index(marker) for pre, _ in MAIN_HTML_VARIANTS]
    # end (inclusive) = div start + bytes from div open to end of the
    # prefix + len(text) + bytes of the suffix through "</div>" - 1
    end_consts = [
        s + (len(pre) - s) + (post.index("</div>") + 6) - 1
        for (pre, post), s in zip(MAIN_HTML_VARIANTS, starts)
    ]
    ncand = [5, 6, 5]  # body+nav+main+side+foot / +section+comments / td pair

    def case(vals, plus_len=False):
        tail = " + length(text)" if plus_len else ""
        return (
            f"CAST(CASE doc_id % 3 WHEN 0 THEN {vals[0]} WHEN 1 THEN "
            f"{vals[1]} ELSE {vals[2]} END{tail} AS BIGINT)"
        )

    return f"""
SELECT doc_id,
       'Heading ' || text || 'read more' AS main_text,
       'div' AS main_tag,
       {case(starts)} AS span_start,
       {case(end_consts, plus_len=True)} AS span_end,
       {case(ncand)} AS n_candidates
FROM documents ORDER BY doc_id
"""


MAIN_CONTENT_SQL = _main_content_sql()


def selector_extract_p(spark, sf_dir):
    """Selector-driven extraction: inner_text + spans of every <p> in
    the HTML-wrapped documents. For the fixed wrapper every doc has
    exactly one <p> at arena handle 3 with raw extent [18, L+24]."""
    from tl_spark.functions.query import query_selector_extract

    html = _docs_as_html(spark, sf_dir)
    return query_selector_extract(html, "p", mode="inner_text").repartition(1).sortWithinPartitions(
        "doc_id", "node_idx"
    )


SELECTOR_EXTRACT_P_SQL = """
SELECT doc_id, CAST(3 AS INTEGER) AS node_idx, text AS inner_text,
       CAST(18 AS INTEGER) AS start,
       CAST(length(text) + 24 AS INTEGER) AS "end"
FROM documents ORDER BY doc_id
"""


def _selector_wrapper_query(spark, sf_dir, prefix, mid, suffix, selector):
    """Shared shape for the attribute-selector battery: two sibling
    elements, only the second (containing the doc text) matches."""
    from tl_spark.functions.query import query_selector_extract

    d = _t(spark, sf_dir, "documents")
    html = d.select(
        "doc_id",
        F.concat(
            F.lit(prefix + mid), F.col("text"), F.lit(suffix)
        ).alias("text"),
    )
    return query_selector_extract(html, selector, mode="inner_text").repartition(1).sortWithinPartitions(
        "doc_id", "node_idx"
    )


_ATTR_WRAP = (
    '<div data-role="sidebar">chrome</div>',
    '<div data-role="article">',
    "</div>",
)


def _attr_selector_sql(node_idx: int, start: int, end_off: int) -> str:
    return f"""
SELECT doc_id, CAST({node_idx} AS INTEGER) AS node_idx,
       text AS inner_text,
       CAST({start} AS INTEGER) AS start,
       CAST(length(text) + {end_off} AS INTEGER) AS "end"
FROM documents ORDER BY doc_id
"""


def selector_attr_eq(spark, sf_dir):
    """[k=v] exact attribute match (selector.rs attr_eq)."""
    return _selector_wrapper_query(
        spark, sf_dir, *_ATTR_WRAP, "[data-role=article]"
    )


def selector_attr_prefix(spark, sf_dir):
    """tag[k^=v] starts-with attribute match on a tag-qualified node."""
    return _selector_wrapper_query(
        spark, sf_dir, *_ATTR_WRAP, "div[data-role^=art]"
    )


def selector_attr_suffix(spark, sf_dir):
    """[k$=v] ends-with attribute match."""
    return _selector_wrapper_query(
        spark, sf_dir, *_ATTR_WRAP, "[data-role$=cle]"
    )


def selector_attr_contains(spark, sf_dir):
    """[k*=v] substring attribute match."""
    return _selector_wrapper_query(
        spark, sf_dir, *_ATTR_WRAP, "[data-role*=tic]"
    )


def selector_attr_ws(spark, sf_dir):
    """[k~=v] whitespace-list attribute match (Unicode White_Space
    splitting, matching Rust split_whitespace)."""
    return _selector_wrapper_query(
        spark,
        sf_dir,
        '<p data-tags="alpha beta">skip</p>',
        '<p data-tags="beta gamma delta">',
        "</p>",
        "p[data-tags~=gamma]",
    )


def selector_id_class(spark, sf_dir):
    """tag#id.class combinator chain (and-composition of tag, id-slot
    and class-membership predicates)."""
    return _selector_wrapper_query(
        spark,
        sf_dir,
        '<div class="box">x</div>',
        '<div id="main" class="box article">',
        "</div>",
        "div#main.article",
    )


# node layout of the two-sibling wrappers: [elem0, raw0, elem1(match),
# raw1(=doc text)] -> matched node handle 2; start is the fixed prefix
# length, end = L + (len(mid) + len(suffix) - 1)
SELECTOR_ATTR_SQL = _attr_selector_sql(2, 37, 67)
SELECTOR_ATTR_WS_SQL = _attr_selector_sql(2, 34, 69)
SELECTOR_ID_CLASS_SQL = _attr_selector_sql(2, 24, 64)


def pdf_extract_docs(spark, sf_dir):
    """PDF text + layout extraction end-to-end (north rule's
    "PDF/layout parse" slot; no reference analog — y21/tl is
    HTML-only). Each document is rendered to a REAL PDF in one of
    eight variants by doc_id % 8 (classic xref / Flate content +
    quote-op lines / xref-stream+ObjStm+predictor+hex strings /
    incremental update + ASCII85·Flate cascade + TJ kern splits /
    RC4-encrypted / AES-128-encrypted, both with the empty user
    password / embedded symbolic subset TrueType / embedded subset
    bare-CFF, both with no /Encoding and no /ToUnicode; see
    operators/pdf.py + pdf_crypt.py + fontprog.py), then parsed back
    by the from-scratch ISO 32000 kernel: xref chain, standard-
    security-handler decryption, filter cascades, font decoding
    (WinAnsi, Identity-H + ToUnicode CMap, and embedded-font-program
    cmap/post/charset chains), the full text-state machine, and
    layout re-assembly of deliberately out-of-draw-order content.

    SQL-checkable because generation wraps text by a closed rule
    (8 words/line, 5 lines/page): the oracle reproduces the exact page
    text. Plan: the kernel stage (synth + extract co-located) is
    map-only; the trailing orderBy exists only for the driver's
    deterministic hash check (single-partition sort since round 8) —
    drop it in production and the job is zero-Exchange.
    """
    from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pdfs = synth_pdf_media(docs)
    return pdf_text_pages(pdfs).repartition(1).sortWithinPartitions("doc_id", "page_no")


PDF_EXTRACT_SQL = """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), ln AS (
  SELECT doc_id, ws,
         CAST(unnest(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS INT) AS li
  FROM w WHERE len(ws) > 0
), lines AS (
  SELECT doc_id, li,
         array_to_string(list_slice(ws, li*8+1, li*8+8), ' ') AS line
  FROM ln
)
SELECT doc_id, CAST(floor(li/5) AS INT) AS page_no,
       string_agg(line, chr(10) ORDER BY li) AS text,
       CAST(length(string_agg(line, chr(10) ORDER BY li)) AS INT) AS nchars
FROM lines GROUP BY doc_id, CAST(floor(li/5) AS INT)
ORDER BY doc_id, page_no
"""


def pdf_extract_twocol_docs(spark, sf_dir):
    """The X-Y-cut column path under a driver-strength oracle (VERDICT
    r6 item 6): every document is rendered as a TWO-COLUMN PDF whose
    draw order is deliberately scrambled (right column first, rotated
    — see operators/pdf._content_ops_twocol), then extracted with
    ``columns="auto"``. The generator's closed reading-order rule
    (first ceil(n/2) lines down the left column, rest down the right,
    guaranteed gutter) means X-Y-cut segmentation recovers exactly the
    sequential wrap order — so the oracle is the SAME closed-form SQL
    as the single-column query (PDF_EXTRACT_SQL). Plain row assembly
    (columns="off") provably does NOT match on this input
    (tests/test_pdf.py pins the negative), so a green check certifies
    the recursive cut, not a vacuous pass-through. Suite-gated beyond
    the 50-query driver window (tests/test_pdf.py)."""
    from tl_spark.operators.pdf import pdf_text_pages, synth_pdf_media

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pdfs = synth_pdf_media(docs, layout="twocol")
    return pdf_text_pages(pdfs, columns="auto").repartition(1).sortWithinPartitions("doc_id", "page_no")


def selector_extract_p_outer(spark, sf_dir):
    """outer_html extraction mode through the selector surface: for
    the fixed wrapper the <p> node's outer_html is exactly
    '<p>' || text || '</p>' (byte-identity serialization — the
    reference decodes no entities and normalizes nothing)."""
    from tl_spark.functions.query import query_selector_extract

    html = _docs_as_html(spark, sf_dir)
    return query_selector_extract(html, "p", mode="outer_html").repartition(1).sortWithinPartitions(
        "doc_id", "node_idx"
    )


SELECTOR_P_OUTER_SQL = """
SELECT doc_id, CAST(3 AS INTEGER) AS node_idx,
       '<p>' || text || '</p>' AS outer_html,
       CAST(18 AS INTEGER) AS start,
       CAST(length(text) + 24 AS INTEGER) AS "end"
FROM documents ORDER BY doc_id
"""


def selector_extract_main_inner(spark, sf_dir):
    """inner_html extraction mode: the <main> node's inner_html is the
    raw markup between its tags, '<p>' || text || '</p>'."""
    from tl_spark.functions.query import query_selector_extract

    html = _docs_as_html(spark, sf_dir)
    return query_selector_extract(html, "main", mode="inner_html").repartition(1).sortWithinPartitions(
        "doc_id", "node_idx"
    )


SELECTOR_MAIN_INNER_SQL = """
SELECT doc_id, CAST(2 AS INTEGER) AS node_idx,
       '<p>' || text || '</p>' AS inner_html,
       CAST(12 AS INTEGER) AS start,
       CAST(length(text) + 31 AS INTEGER) AS "end"
FROM documents ORDER BY doc_id
"""


def lookup_by_class_tracked(spark, sf_dir):
    """get_elements_by_class_name in tracked (close-time map) mode —
    agrees with scan mode on well-formed wrappers (mode divergence on
    unclosed elements is kernel-test pinned)."""
    from tl_spark.functions.query import get_elements_by_class

    d = _t(spark, sf_dir, "documents")
    html = d.select(
        "doc_id",
        F.concat(
            F.lit('<div class="msg user">'), F.col("text"), F.lit("</div>")
        ).alias("text"),
    )
    return get_elements_by_class(html, "msg", tracked=True).repartition(1).sortWithinPartitions("doc_id")


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
    return get_elements_by_id(html, "payload").repartition(1).sortWithinPartitions("doc_id")


LOOKUP_BY_ID_SQL = """
SELECT doc_id, 0 AS node_idx, text AS inner_text
FROM documents ORDER BY doc_id
"""


def lookup_by_id_tracked(spark, sf_dir):
    """get_element_by_id in tracked (close-time map) mode — the second
    of the reference's two observably-different modes (vdom.rs:43-63).
    On well-formed wrappers both modes agree, so the same SQL oracle
    pins tracked-mode plumbing; the mode DIFFERENCE on unclosed
    elements is pinned by the golden/kernel tests."""
    from tl_spark.functions.query import get_elements_by_id

    d = _t(spark, sf_dir, "documents")
    html = d.select(
        "doc_id",
        F.concat(
            F.lit('<div id="payload">'), F.col("text"), F.lit("</div>")
        ).alias("text"),
    )
    return get_elements_by_id(html, "payload", tracked=True).repartition(1).sortWithinPartitions("doc_id")


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
    return get_elements_by_class(html, "msg").repartition(1).sortWithinPartitions("doc_id")


LOOKUP_BY_CLASS_SQL = LOOKUP_BY_ID_SQL


def doc_outer_html_roundtrip(spark, sf_dir):
    """Serialization op: dom_outer_html of a properly-closed wrapper is
    the identity — DuckDB-checkable as the same concat expression.
    Native DOM kernel fast path with silent Python fallback."""
    from tl_spark.kernel import native_dom as _nd

    params = _nd.encode_params(_nd.OP_DOC_OUTER_HTML)

    def fn(batches):
        from tl_spark.kernel import native_dom
        from tl_spark.kernel.htmlparse import parse

        for batch in batches:
            ids = batch.column("doc_id")
            res = native_dom.dom_query_batch(batch.column("text"), params)
            if res is not None and len(res[5]) == len(ids):
                # OP_DOC_OUTER_HTML emits exactly one row per doc in order
                yield pa.RecordBatch.from_arrays(
                    [ids, res[5]], names=["doc_id", "outer_html"]
                )
                continue
            texts = batch.column("text").to_pylist()
            outs = [parse(t or "").dom_outer_html() for t in texts]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(outs, type=pa.string())],
                names=["doc_id", "outer_html"],
            )

    html = _docs_as_html(spark, sf_dir)
    return html.mapInArrow(fn, "doc_id long, outer_html string").repartition(1).sortWithinPartitions(
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
    out = extract_main_content(
        html, passthrough=["doc_id"], jvm_fastpath=False
    )
    return out.select("doc_id", "html_version").repartition(1).sortWithinPartitions("doc_id")


DOC_HTML_VERSION_SQL = """
SELECT doc_id, 'HTML5' AS html_version FROM documents ORDER BY doc_id
"""


def media_info_docs(spark, sf_dir):
    """The unified media metadata router end-to-end (LLM-pipeline
    scope; no reference analog — y21/tl is HTML-only). Each document
    id keys a REAL media payload in one of EIGHT container variants
    (doc_id % 8: PNG / GIF / 24-bpp BMP / MPEG-1 Layer III frame
    chain / ISO BMFF movie / FLAC / Ogg-Vorbis / WebM —
    operators/media_info.synth_media_for_docs), then
    media_stream_info routes it by MAGIC BYTES to the real parser:
    header-only image dims, the MPEG/ADTS frame walks, the BMFF box
    tree, the FLAC STREAMINFO, the Ogg page walk (CRC-verified), the
    EBML tree. SQL-checkable because every payload parameter is a
    closed form over doc_id (the writers are exact; the FLAC fixture
    uses verbatim subframes so even its compressed length — hence the
    real mean bitrate — is a constant; rounding was audited to have
    no half-integer cases, so DuckDB round == Python round).
    Plan: synth + route co-located, map-only; the trailing sink is
    the driver-hash determinism sort, drop it in production."""
    from tl_spark.operators.media_info import (
        media_stream_info,
        synth_media_for_docs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = synth_media_for_docs(docs, id_col="doc_id")
    out = media_stream_info(media, id_col="doc_id", on_error="raise")
    return out.select(
        "doc_id", "kind", "container", "width", "height", "duration_ms",
        "sample_rate", "channels", "bitrate_kbps", "n_samples",
    ).repartition(1).sortWithinPartitions("doc_id")


def _media_info_sql() -> str:
    # the FLAC fixture's verbatim payload lengths are constants per
    # channel count (content-independent), so the router's REAL mean
    # bitrate is a closed form; no rounding in this oracle lands on a
    # half-integer over the reachable doc_id set (audited: mp3 / mp4 /
    # flac duration+bitrate / ogg over doc_id < 200000)
    from tl_spark.operators.media_info import flac_fixture_lens

    len1, len2 = flac_fixture_lens()
    return f"""
WITH m AS (
  SELECT doc_id, doc_id % 8 AS v,
         CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sr3,
         9600 + (doc_id % 7) * 480 AS oggn
  FROM documents)
SELECT doc_id,
  CASE WHEN v <= 2 THEN 'image' WHEN v IN (3, 5, 6) THEN 'audio'
       ELSE 'video' END AS kind,
  CASE v WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
         WHEN 3 THEN 'mp3' WHEN 4 THEN 'mp4' WHEN 5 THEN 'flac'
         WHEN 6 THEN 'ogg' ELSE 'webm' END AS container,
  CAST(CASE WHEN v <= 2 THEN 16 + doc_id % 101
            WHEN v = 4 THEN 320 + (doc_id % 4) * 160
            WHEN v = 7 THEN 640 + (doc_id % 4) * 320
            ELSE 0 END AS BIGINT) AS width,
  CAST(CASE WHEN v <= 2 THEN 16 + doc_id % 67
            WHEN v = 4 THEN 180 + (doc_id % 4) * 90
            WHEN v = 7 THEN 360 + (doc_id % 4) * 180
            ELSE 0 END AS BIGINT) AS height,
  CAST(CASE WHEN v = 3 THEN round((20 + doc_id % 11) * 1152 * 1000.0 / sr3)
            WHEN v = 4 THEN round((500 + (doc_id % 97) * 37) * 1000.0 /
                 (600 + (doc_id % 3) * 400))
            WHEN v = 5 THEN round(2400 * 1000.0 / sr3)
            WHEN v = 6 THEN round(oggn * 1000.0 / sr3)
            WHEN v = 7 THEN 3000 + (doc_id % 11) * 700
            ELSE 0 END AS BIGINT) AS duration_ms,
  CAST(CASE WHEN v IN (3, 5, 6) THEN sr3
            WHEN v = 7 THEN 48000
            ELSE 0 END AS BIGINT) AS sample_rate,
  CAST(CASE WHEN v = 3 THEN CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END
            WHEN v = 5 THEN CASE WHEN doc_id % 16 = 5 THEN 2 ELSE 1 END
            WHEN v = 6 THEN CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END
            WHEN v = 7 THEN 2
            ELSE 0 END AS BIGINT) AS channels,
  CAST(CASE WHEN v = 3 THEN 128
            WHEN v = 5 THEN round(
                 (CASE WHEN doc_id % 16 = 5 THEN {len2} ELSE {len1} END)
                 * 8.0 * sr3 / 2400000.0)
            WHEN v = 6 THEN 96
            ELSE 0 END AS BIGINT) AS bitrate_kbps,
  CAST(CASE WHEN v = 3 THEN 20 + doc_id % 11
            WHEN v = 4 THEN 24 + doc_id % 7
            WHEN v = 5 THEN 2400
            WHEN v = 6 THEN oggn
            ELSE 0 END AS BIGINT) AS n_samples
FROM m
ORDER BY doc_id
"""


MEDIA_INFO_SQL = _media_info_sql()


def _doc_transcripts(d):
    """HTML-wrap the documents table as single-turn transcripts
    (conv_id constant, turn_idx = doc_id) — the curation queries'
    shared input shape."""
    return d.select(
        F.lit("cdoc").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit(_DOC_HTML_TMPL[0]), F.col("text"), F.lit(_DOC_HTML_TMPL[1])
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def _curated_out(curated):
    out = curated.select(
        "turn_idx",
        "extracted_text",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality",
        "lang_guess",
    ).repartition(1).sortWithinPartitions("turn_idx")
    return keep_handles(out, curated)  # carry curate's cache handles


def curate_documents(spark, sf_dir):
    """Composed curation pipeline over HTML-wrapped documents:
    extract -> stats -> exact dedup -> near-dup (LSH + exact Jaccard
    >= 0.85, later turn dropped) -> quality/length filters.

    SQL-checkable end to end: extraction is the proven wrapper
    identity, stats formulas are the (green) doc_quality/lang oracles,
    and the near-dup drop set equals brute-force all-pairs Jaccard
    >= 0.85 with the later doc_id dropped (deterministic tie-break by
    (conv_id, turn_idx), not by hash order)."""
    from tl_spark.curation import curate

    d = _t(spark, sf_dir, "documents")
    curated, _dropped = curate(
        _doc_transcripts(d), quality_min=0.0, min_tokens=1
    )
    return _curated_out(curated)


def curate_documents_clusters(spark, sf_dir):
    """curate_documents with ``neardup_mode="clusters"``: the
    TRANSITIVE closure of verified near-dup pairs collapses to one
    surviving doc per cluster (connected components via min-label +
    pointer jumping, operators/graph.py) instead of the pairwise
    later-drops rule. The oracle computes the same closure with a
    recursive CTE over the brute-force verified pair set — the two
    modes genuinely differ on shapes like A~C, B~C with A<B<C (pairs
    keeps A and B; clusters keeps only A)."""
    from tl_spark.curation import curate

    d = _t(spark, sf_dir, "documents")
    curated, _dropped = curate(
        _doc_transcripts(d),
        quality_min=0.0,
        min_tokens=1,
        neardup_mode="clusters",
    )
    return _curated_out(curated)


def _curate_sql(neardup_mode: str = "pairs") -> str:
    """Brute-force re-expression of the composed curation pipeline:
    verified near-dup set = all-pairs exact 5-shingle Jaccard >= 0.85.
    ``pairs`` mode drops the later doc_id of each verified pair;
    ``clusters`` mode drops every doc whose TRANSITIVE closure over
    verified pairs (recursive CTE) reaches a smaller doc_id — only the
    earliest doc per duplicate cluster survives (A~B and B~C with no
    A~C edge still collapse to one doc). Survivors carry the
    (independently green) token/quality/lang formulas."""
    from tl_spark.functions.text import LANG_MARKERS

    en = _lang_hits_sql(LANG_MARKERS["en"])
    de = _lang_hits_sql(LANG_MARKERS["de"])
    fr = _lang_hits_sql(LANG_MARKERS["fr"])
    es = _lang_hits_sql(LANG_MARKERS["es"])
    if neardup_mode == "pairs":
        dropped_cte = "SELECT DISTINCT id_b AS doc_id FROM verified"
        closure_ctes = ""
    else:
        closure_ctes = """ edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION
  SELECT id_b, id_a FROM verified
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),"""
        dropped_cte = "SELECT u AS doc_id FROM reach GROUP BY u HAVING MIN(v) < u"
    return f"""
WITH RECURSIVE docs AS (
  -- the GROUP BY forces a hash-materialization of (doc_id, text)
  -- BEFORE the shingle unnest feeds both sides of the self-join;
  -- without it DuckDB re-evaluates the parquet scan + list
  -- comprehension per side (~8x slower at sf0.1, same rows)
  SELECT doc_id, text FROM documents GROUP BY doc_id, text
), sh AS (
  SELECT doc_id,
         unnest(list_distinct([text[i:i+4] for i in range(1, length(text)-3)]))
           AS s
  FROM docs WHERE length(text) >= 5
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), verified AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 4) >= 0.85
),{closure_ctes} dropped AS (
  {dropped_cte}
), kept AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
), t AS (
  SELECT doc_id, text,
         CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
         CAST(len(list_distinct(list_intersect({_TOKENS_SQL}, {_STOP_LIST})))
              AS DOUBLE) AS stop,
         {en} AS h_en, {de} AS h_de, {fr} AS h_fr, {es} AS h_es
  FROM kept
)
SELECT CAST(doc_id AS INTEGER) AS turn_idx,
       text AS extracted_text,
       CAST(n_tok AS BIGINT) AS n_tokens,
       ROUND(
         LEAST(n_tok / 20.0, 1.0) * 0.4
         + LEAST(stop / 2.0, 1.0) * 0.3
         + (CASE WHEN n_chars > 0
                 THEN 1.0 - LEAST(punct / n_chars * 10, 1.0)
                 ELSE 0.0 END) * 0.3,
         4) AS quality,
       CASE
         WHEN h_en > 0 AND h_en >= GREATEST(h_de, h_fr, h_es) THEN 'en'
         WHEN h_de > 0 AND h_de >= GREATEST(h_fr, h_es) THEN 'de'
         WHEN h_fr > 0 AND h_fr >= h_es THEN 'fr'
         WHEN h_es > 0 THEN 'es'
         ELSE 'und'
       END AS lang_guess
FROM t WHERE n_tok >= 1
ORDER BY turn_idx
"""


def parse_nodes_docs(spark, sf_dir):
    """Node-arena explosion of HTML-wrapped documents. For the fixed
    tag-free wrapper every doc yields the same 12-node arena with
    boundaries affine in L = length(text) — the SQL oracle cross-joins
    a 12-row template table carrying (base, +L?) per offset."""
    from tl_spark.functions.extract import parse_nodes

    html = _docs_as_html(spark, sf_dir)
    out = parse_nodes(html)
    return out.select(
        "doc_id", "node_idx", "kind", "name", "start", "end",
        "n_children", "parent",
    ).repartition(1).sortWithinPartitions("doc_id", "node_idx")


# (node_idx, kind[0=tag,1=raw], name, start_base, start_has_L,
#  end_base, n_children, parent); every end is after the doc text so
# end = end_base + L unconditionally
PARSE_NODES_SQL = """
WITH tmpl(node_idx, kind, name, s0, sv, e0, n_children, parent) AS (VALUES
  (0, 0, 'html',   0,   0, 101, 1, -1),
  (1, 0, 'body',   6,   0,  94, 3,  0),
  (2, 0, 'main',  12,   0,  31, 1,  1),
  (3, 0, 'p',     18,   0,  24, 1,  2),
  (4, 1, NULL,    21,   0,  20, 0,  3),
  (5, 0, 'nav',   32,   1,  50, 1,  1),
  (6, 1, NULL,    37,   1,  44, 0,  5),
  (7, 0, 'script',51,   1,  87, 3,  1),
  (8, 1, NULL,    59,   1,  67, 0,  7),
  (9, 0, 'b',     68,   1,  76, 1,  7),
  (10, 1, NULL,   71,   1,  72, 0,  9),
  (11, 1, NULL,   77,   1,  78, 0,  7)
)
SELECT d.doc_id,
       CAST(t.node_idx AS INTEGER) AS node_idx,
       CAST(t.kind AS INTEGER) AS kind,
       t.name,
       CAST(t.s0 + t.sv * length(d.text) AS INTEGER) AS start,
       CAST(t.e0 + length(d.text) AS INTEGER) AS "end",
       CAST(t.n_children AS INTEGER) AS n_children,
       CAST(t.parent AS INTEGER) AS parent
FROM documents d CROSS JOIN tmpl t
ORDER BY d.doc_id, node_idx
"""


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
    ).repartition(1).sortWithinPartitions("media_id")


def document_extract_docs(spark, sf_dir):
    """The unified document-text router over a mixed four-format
    corpus (operators/docrouter.py; suite-gated via the DuckDB oracle
    in tests/test_docrouter.py — beyond the driver window)."""
    from tl_spark.operators.docrouter import (
        document_extract,
        synth_document_media,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = document_extract(synth_document_media(docs))
    return out.repartition(1).sortWithinPartitions("doc_id")


def rtf_extract_docs(spark, sf_dir):
    """RTF text extraction over the id-keyed synth table
    (operators/rtf.py; suite-gated via the DuckDB oracle in
    tests/test_rtf.py — beyond the driver window)."""
    from tl_spark.operators.rtf import rtf_extract, synth_rtf_media

    n = _t(spark, sf_dir, "documents").count()
    out = rtf_extract(synth_rtf_media(spark, min(n, 500)))
    return out.repartition(1).sortWithinPartitions("media_id")


def epub_extract_docs(spark, sf_dir):
    """EPUB book-text extraction through the HTML kernel over the
    id-keyed synth table (operators/epub.py; suite-gated via the
    DuckDB oracle in tests/test_epub.py — beyond the driver window)."""
    from tl_spark.operators.epub import epub_extract, synth_epub_media

    n = _t(spark, sf_dir, "documents").count()
    out = epub_extract(synth_epub_media(spark, min(n, 500)))
    return out.repartition(1).sortWithinPartitions("media_id")


def office_extract_docs(spark, sf_dir):
    """DOCX/PPTX/XLSX text extraction over the id-keyed synth office
    table (operators/ooxml.py; suite-gated via the string_agg DuckDB
    oracle in tests/test_ooxml.py — beyond the driver window)."""
    from tl_spark.operators.ooxml import office_extract, synth_office_media

    n = _t(spark, sf_dir, "documents").count()
    out = office_extract(synth_office_media(spark, min(n, 500)))
    return out.repartition(1).sortWithinPartitions("media_id")


def subtitle_extract_docs(spark, sf_dir):
    """SRT/WebVTT transcript extraction over the doc_id-keyed synth
    subtitle table (operators/subtitles.py; suite-gated via the
    string_agg DuckDB oracle in tests/test_subtitles.py — lives
    beyond the 50-query driver window)."""
    from tl_spark.operators.subtitles import (
        subtitle_extract,
        synth_subtitle_media,
    )

    n = _t(spark, sf_dir, "documents").count()
    out = subtitle_extract(synth_subtitle_media(spark, min(n, 500)))
    return out.select(
        "media_id", "format", "transcript", "n_cues", "duration_ms",
        "speech_ms",
    ).repartition(1).sortWithinPartitions("media_id")


SELECTOR_COUNTS_SQL = """
SELECT doc_id, CAST(1 AS INTEGER) AS n_p, CAST(2 AS INTEGER) AS n_main_nav,
       CAST(12 AS INTEGER) AS n_nodes_all
FROM documents ORDER BY doc_id
"""


def selector_counts(spark, sf_dir):
    """Per-document node/selector statistics via the kernel. Constant
    for the tag-free wrapper: 1 <p>, 2 main|nav hits, 12 arena nodes —
    a regression in parsing, selector matching, or '*' handling flips
    the constants."""
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
    ).repartition(1).sortWithinPartitions("doc_id")


# ---------------------------------------------------------------- registry

# ---- round-5 window rotations: fresh operators with exact oracles ----

_BM25_TERMS = ["the", "data", "model"]


def bm25_corpus_topk(spark, sf_dir):
    """Okapi BM25 top-25 over documents for a fixed 3-term query,
    ``stable_sum`` mode (operators/retrieval.py): avgdl is an exact
    integer-sum division and per-doc scores fold in term-sorted order,
    so every double matches the DuckDB re-expression bit-for-bit
    before the final round-6 (the one residual cross-engine delta is
    <=1 ulp of ln(), absorbed by the rounding)."""
    from tl_spark.operators.retrieval import bm25_topk

    d = _t(spark, sf_dir, "documents")
    return bm25_topk(
        d, _BM25_TERMS, k=25, text_col="text", id_col="doc_id",
        stable_sum=True,
    )


# The pivoted sum mirrors the Spark-side sequential fold exactly:
# contributions added in lexicographic term order, and x + 0.0 == x in
# IEEE for the positive BM25 terms, so missing terms don't perturb it.
BM25_TOPK_SQL = f"""
WITH lens AS (
  SELECT doc_id AS id, len({_TOKENS_SQL}) AS dl FROM documents
), stats AS (
  SELECT count(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl
  FROM lens
), toks AS (
  SELECT doc_id AS id, lower(t.term) AS term
  FROM documents, UNNEST({_TOKENS_SQL}) AS t(term)
), tf AS (
  SELECT id, term, count(*) AS tf FROM toks
  WHERE term IN ('data', 'model', 'the') GROUP BY id, term
), dfreq AS (
  SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM dfreq, stats
), contrib AS (
  SELECT tf.id, tf.term,
         idf.idf * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl)) AS s
  FROM tf JOIN idf USING (term) JOIN lens USING (id), stats
), folded AS (
  SELECT id,
         ((0.0 + COALESCE(MAX(CASE WHEN term = 'data' THEN s END), 0.0))
            + COALESCE(MAX(CASE WHEN term = 'model' THEN s END), 0.0))
            + COALESCE(MAX(CASE WHEN term = 'the' THEN s END), 0.0) AS raw
  FROM contrib GROUP BY id
)
SELECT id, round(raw, 6) AS bm25 FROM folded
ORDER BY bm25 DESC, id LIMIT 25
"""


_HEMB_DIM = 16


def doc_hashed_embedding(spark, sf_dir):
    """Signed feature-hashing embeddings (operators/embed.py, md5 leg,
    dim=16) exploded to (id, slot, val) rows. Exactness chain: slot
    sums are exact integer-valued doubles; the L2 norm is sqrt of an
    exact integer sum (order-free); val narrows to float32 and back —
    every step correctly-rounded IEEE on identical inputs, so the
    DuckDB oracle (which mirrors the float narrowing) reproduces the
    values bit-for-bit before round-6."""
    from tl_spark.operators.embed import hashed_embedding

    d = _t(spark, sf_dir, "documents")
    # arrow leg: map-only, bit-equal (see operators/embed.py impl note)
    emb = hashed_embedding(d, dim=_HEMB_DIM, hash_fn="md5", impl="arrow")
    return (
        emb.select("id", F.posexplode("embedding").alias("slot", "v"))
        .select(
            "id",
            "slot",
            F.round(F.col("v").cast("double"), 6).alias("val"),
        )
        .repartition(1).sortWithinPartitions("id", "slot")
    )


HASHED_EMB_SQL = f"""
WITH toks AS (
  SELECT doc_id AS id, lower(t.term) AS tok
  FROM documents, UNNEST({_TOKENS_SQL}) AS t(term)
), hashed AS (
  SELECT id,
         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT) % {_HEMB_DIM}
              AS INT) AS slot,
         CASE WHEN CAST('0x' || substr(md5(tok), 9, 8) AS UBIGINT) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS s
  FROM toks
), sums AS (
  SELECT id, slot, SUM(s) AS v FROM hashed GROUP BY id, slot
), grid AS (
  SELECT d.doc_id AS id, CAST(r.range AS INT) AS slot
  FROM documents d CROSS JOIN range({_HEMB_DIM}) r
), dense AS (
  SELECT g.id, g.slot, COALESCE(s.v, 0.0) AS v
  FROM grid g LEFT JOIN sums s ON s.id = g.id AND s.slot = g.slot
), norms AS (
  SELECT id, sqrt(SUM(v * v)) AS nrm FROM dense GROUP BY id
)
SELECT d.id, d.slot,
       CASE WHEN n.nrm > 0
            THEN round(CAST(CAST(d.v / n.nrm AS FLOAT) AS DOUBLE), 6)
            ELSE 0.0 END AS val
FROM dense d JOIN norms n USING (id)
ORDER BY d.id, d.slot
"""


def docs_cap_per_domain(spark, sf_dir):
    """C4-style per-domain cap (operators/urls.py) over a
    deterministic URL synthesis: host{doc_id % 7}.example.com, except
    doc_id % 13 == 0 rows get an unparseable URL (null host — kept,
    uncapped). Cap 3 per host ranked by doc_id (order_by_hash=False;
    the xxhash64 rank mode stays suite-gated — not SQL-expressible).
    Output (doc_id, host) where host comes from Spark's
    try_parse_url and the oracle recomputes it from the construction,
    so a parse regression surfaces as a value mismatch."""
    from tl_spark.operators.urls import cap_per_domain, url_host

    d = _t(spark, sf_dir, "documents")
    with_url = d.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 13) == 0,
            F.concat(F.lit("not a url "), F.col("doc_id")),
        )
        .otherwise(
            F.concat(
                F.lit("https://host"),
                F.col("doc_id") % 7,
                F.lit(".example.com/"),
                F.col("source"),
                F.lit("/"),
                F.col("doc_id"),
            )
        )
        .alias("url"),
    )
    capped = cap_per_domain(with_url, max_per_host=3, order_by_hash=False)
    return capped.select(
        "doc_id", url_host(F.col("url")).alias("host")
    ).repartition(1).sortWithinPartitions("doc_id")


CAP_DOMAIN_SQL = """
WITH urls AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN NULL
              ELSE 'host' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
         END AS host
  FROM documents
), ranked AS (
  SELECT doc_id, host,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
  FROM urls WHERE host IS NOT NULL
)
SELECT doc_id, host FROM ranked WHERE rn <= 3
UNION ALL
SELECT doc_id, host FROM urls WHERE host IS NULL
ORDER BY doc_id
"""


def doc_lang_id(spark, sf_dir):
    """16-language character-n-gram-profile identification
    (operators/langid.py, JVM broadcast-join leg — the oracle leg;
    the map-only Arrow kernel leg is pinned equal by
    tests/test_langid.py). Integer trigram-weight sums end-to-end,
    so the DuckDB oracle matches bit-for-bit."""
    from tl_spark.operators.langid import ngram_lang_id

    d = _t(spark, sf_dir, "documents")
    return ngram_lang_id(d).repartition(1).sortWithinPartitions("doc_id")


def _doc_lang_id_sql():
    from tl_spark.operators.langid import ngram_lang_id_sql

    return ngram_lang_id_sql()


# Driver-window classifier model: logistic regression over the md5-leg
# dim-16 hashed embeddings, trained ONCE on the deterministic synthetic
# pos/neg corpora in tools/train_window_classifier.py (re-running that
# script reproduces these constants byte-for-byte). Inlined as literals
# so the Spark leg and the DuckDB oracle share the exact same doubles.
_CLS_W = [
    -2.359261910568872, -1.055694655267476, 0.5943603795515211,
    -1.0162982524531776, 2.0912542989771885, 0.5767355422110089,
    -0.8294344904004287, 0.834982925361492, 0.8707359092813449,
    -4.460899412708516, -0.7637408563794047, -0.862561000098646,
    0.25092511908146947, 5.514901569595258, -1.5306741127699175,
    -2.3230498368494854,
]
_CLS_B = -1.6613038651196639


def doc_classifier_scores(spark, sf_dir):
    """Quality-classifier scores (operators/classifier.py shape) with
    the trained weight vector inlined: sigmoid(w . emb + b) over the
    already-oracle'd md5-leg dim-16 hashed embeddings. This wrapper
    scores with JVM expressions in a FIXED left-associative slot order
    (slot rounding mirrored on both sides), so the DuckDB oracle folds
    the identical IEEE operations; the production numpy scoring path
    (classifier_scores) is pinned approx-equal by tests/test_langid.py.
    """
    from tl_spark.operators.embed import hashed_embedding

    d = _t(spark, sf_dir, "documents")
    # arrow leg: map-only, bit-equal (see operators/embed.py impl note)
    emb = hashed_embedding(d, dim=_HEMB_DIM, hash_fn="md5", impl="arrow")
    z = F.lit(0.0)
    for i in range(_HEMB_DIM):
        v = F.round(F.col("embedding")[i].cast("double"), 6)
        z = z + v * F.lit(_CLS_W[i])
    z = z + F.lit(_CLS_B)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return emb.select(
        F.col("id").alias("doc_id"), score.alias("cls_score")
    ).repartition(1).sortWithinPartitions("doc_id")


def _classifier_scores_sql():
    """DuckDB oracle: hashed-embedding CTEs (same as HASHED_EMB_SQL),
    slot pivot, then the identical left-associative dot + sigmoid."""
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN slot = {i} THEN val END) AS v{i}"
        for i in range(_HEMB_DIM)
    )
    dot = " + ".join(f"v{i} * {_CLS_W[i]!r}" for i in range(_HEMB_DIM))
    return f"""
WITH toks AS (
  SELECT doc_id AS id, lower(t.term) AS tok
  FROM documents, UNNEST({_TOKENS_SQL}) AS t(term)
), hashed AS (
  SELECT id,
         CAST(CAST('0x' || substr(md5(tok), 1, 8) AS UBIGINT) % {_HEMB_DIM}
              AS INT) AS slot,
         CASE WHEN CAST('0x' || substr(md5(tok), 9, 8) AS UBIGINT) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS s
  FROM toks
), sums AS (
  SELECT id, slot, SUM(s) AS v FROM hashed GROUP BY id, slot
), grid AS (
  SELECT d.doc_id AS id, CAST(r.range AS INT) AS slot
  FROM documents d CROSS JOIN range({_HEMB_DIM}) r
), dense AS (
  SELECT g.id, g.slot, COALESCE(s.v, 0.0) AS v
  FROM grid g LEFT JOIN sums s ON s.id = g.id AND s.slot = g.slot
), norms AS (
  SELECT id, sqrt(SUM(v * v)) AS nrm FROM dense GROUP BY id
), vals AS (
  SELECT d.id, d.slot,
         CASE WHEN n.nrm > 0
              THEN round(CAST(CAST(d.v / n.nrm AS FLOAT) AS DOUBLE), 6)
              ELSE 0.0 END AS val
  FROM dense d JOIN norms n USING (id)
), piv AS (
  SELECT id,
         {pivots}
  FROM vals GROUP BY id
)
SELECT id AS doc_id,
       round(1.0 / (1.0 + exp(-(0.0 + {dot} + {_CLS_B!r}))), 6)
         AS cls_score
FROM piv ORDER BY doc_id
"""


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
        "doc_bpe_tokens": doc_bpe_tokens,
        "doc_top_terms": doc_top_terms,
        "doc_quality": doc_quality,
        "doc_lang_guess": doc_lang_guess,
        "doc_fingerprint": doc_fingerprint,
        "docs_balanced_sample": docs_balanced_sample,
        "dedup_exact": dedup_exact_docs,
        "embedding_cosine_topk": embedding_cosine_topk,
        "extract_documents": extract_documents,
        "extract_documents_text": extract_documents_text,
        "selector_counts": selector_counts,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "dedup_simhash_neardup": dedup_simhash_neardup,
        "doc_contamination": doc_contamination,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "ann_lsh_topk": ann_lsh_topk,
        "embedding_neardup": embedding_neardup,
        "parse_nodes_docs": parse_nodes_docs,
        "events_sessionized": events_sessionized,
        "events_asof_last_view": events_asof_last_view,
        "order_price_percentiles": order_price_percentiles,
        # Round-7 third rotation: main_content_docs (density-based
        # main-content selection — the north rule's "DOM heuristics"
        # leg, value-exact over three rotating page shells) takes the
        # slot of selector_extract_p, which is triply redundant (the
        # golden corpus pins all 17 selectors x 774 docs x 4 modes,
        # and selector_extract_main_inner + selector_attr_eq keep the
        # selector-extraction family in the window). It keeps its
        # exact DuckDB check as a suite-oracle (ROTATED_R7).
        "main_content_docs": main_content_docs,
        "selector_attr_eq": selector_attr_eq,
        # Round-6 rotation (VERDICT r5 items 1+4): doc_lang_id (the
        # 16-language n-gram-profile classifier) and
        # doc_classifier_scores (inlined-weight quality classifier)
        # take the slots of selector_attr_prefix (shared
        # SELECTOR_ATTR_SQL with selector_attr_eq, which stays) and
        # lookup_by_class_tracked (shared oracle shape with
        # lookup_by_id_tracked, which stays). Displaced queries keep
        # identical suite-oracles (test_driver_contract.py ROTATED_R6).
        "doc_lang_id": doc_lang_id,
        # attr_suffix / attr_contains were retired from the driver
        # window in round 3 for diversity: they shared one oracle with
        # attr_eq/attr_prefix and the golden corpus pins all 14
        # selector variants three other ways (VERDICT r2 called them
        # triply redundant). Their slots carry two training-data ops.
        "doc_repetition": doc_repetition,
        "doc_pii_redaction": doc_pii_redaction,
        # Round-5 rotation (VERDICT r4 item 3): bm25 / hashed-embedding
        # / domain-cap / cluster-curation take the window slots of
        # selector_attr_ws, selector_id_class, lookup_by_id and
        # lookup_by_class — those four were redundantly gated (the
        # golden corpus pins every selector variant, and the lookup
        # pair shared oracles with their _tracked twins, which stay).
        # The displaced queries keep identical suite-oracles
        # (tests/test_driver_contract.py ROTATED_R5).
        "bm25_corpus_topk": bm25_corpus_topk,
        "doc_hashed_embedding": doc_hashed_embedding,
        # Round-6 second rotation: pdf_extract_docs (the north rule's
        # "PDF/layout parse" slot — from-scratch ISO 32000 kernel with
        # a value-exact oracle) takes the slot of
        # selector_extract_p_outer, which is redundantly gated (shares
        # its closed-form oracle shape with selector_extract_main_inner
        # AND the golden corpus pins outer_html serialization on 774
        # docs × native/Python legs). It keeps its exact DuckDB check
        # as a suite-oracle (test_driver_contract.py ROTATED_R6).
        "pdf_extract_docs": pdf_extract_docs,
        "selector_extract_main_inner": selector_extract_main_inner,
        "events_dedup_latest": events_dedup_latest,
        "docs_cap_per_domain": docs_cap_per_domain,
        # Round-7 rotation (VERDICT r6 item 5): semantic_dedup_docs
        # (the SemDeDup curation gate — round 6's flagship addition,
        # previously suite-only) takes the slot of
        # lookup_by_id_tracked, whose twin check (same LOOKUP_BY_ID_SQL
        # oracle shape) already lives suite-side; it keeps its exact
        # DuckDB check as a suite-oracle (ROTATED_R7).
        "semantic_dedup_docs": semantic_dedup_docs,
        "curate_documents_clusters": curate_documents_clusters,
        "doc_classifier_scores": doc_classifier_scores,
        "doc_outer_html_roundtrip": doc_outer_html_roundtrip,
        # Round-7 second rotation: media_info_docs (the unified
        # magic-byte media router over five REAL container variants —
        # sitting 3's LLM-pipeline flagship) takes the slot of
        # doc_html_version, which is triply redundant (the 774-doc
        # golden corpus pins VDom::version per doc across native AND
        # Python legs, and read_markdown's doctype path has its own
        # oracle). It keeps its exact DuckDB check as a suite-oracle
        # (test_driver_contract.py ROTATED_R7).
        "media_info_docs": media_info_docs,
        "doc_rolling_fingerprint": doc_rolling_fingerprint,
        "curate_documents": curate_documents,
        # The driver verifies only the FIRST 50 registry entries
        # (CORRECTNESS_r02.json). Entries from here down have no
        # oracle_sql() row: the sha256-fake media decoders are not
        # SQL-reproducible (gates: tests/test_multimodal.py), and the
        # four round-5 rotated-out queries keep their exact DuckDB
        # checks as suite-oracles in tests/test_driver_contract.py.
        "media_image_features": media_image_features,
        "media_frame_sample": media_frame_sample,
        # rotated out in round 7 (slot carries media_info_docs); keeps
        # its exact DuckDB oracle as a suite gate (ROTATED_R7) and the
        # golden corpus pins version detection three other ways
        "doc_html_version": doc_html_version,
        "selector_attr_ws": selector_attr_ws,
        "selector_id_class": selector_id_class,
        "lookup_by_id": lookup_by_id,
        "lookup_by_class": lookup_by_class,
        # rotated out in round 6 (slots carry doc_lang_id /
        # doc_classifier_scores); suite-gated via ROTATED_R6
        "selector_attr_prefix": selector_attr_prefix,
        "lookup_by_class_tracked": lookup_by_class_tracked,
        # rotated out in round 6 (slot carries pdf_extract_docs);
        # suite-gated via ROTATED_R6
        "selector_extract_p_outer": selector_extract_p_outer,
        # rotated out in round 7 (slot carries semantic_dedup_docs);
        # suite-gated via ROTATED_R7
        "lookup_by_id_tracked": lookup_by_id_tracked,
        # rotated out in round 7, third rotation (slot carries
        # main_content_docs); suite-gated via ROTATED_R7 and the
        # golden corpus pins <p> selector extraction four ways
        "selector_extract_p": selector_extract_p,
        # columns="auto" X-Y-cut path under the same closed-form
        # oracle as pdf_extract_docs; suite-gated (tests/test_pdf.py)
        "pdf_extract_twocol_docs": pdf_extract_twocol_docs,
        # born beyond the window in round 7 sitting 4: SRT/WebVTT
        # transcript extraction, suite-gated (tests/test_subtitles.py)
        "subtitle_extract_docs": subtitle_extract_docs,
        # born beyond the window in round 7 sitting 4: OOXML office
        # text extraction, suite-gated (tests/test_ooxml.py)
        "office_extract_docs": office_extract_docs,
        # born beyond the window in round 7 sitting 4: EPUB book text
        # through the HTML kernel, suite-gated (tests/test_epub.py)
        "epub_extract_docs": epub_extract_docs,
        # born beyond the window in round 7 sitting 4: RTF text
        # extraction, suite-gated (tests/test_rtf.py)
        "rtf_extract_docs": rtf_extract_docs,
        # born beyond the window in round 7 sitting 4: the unified
        # document router, suite-gated (tests/test_docrouter.py)
        "document_extract_docs": document_extract_docs,
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
        "doc_bpe_tokens": _bpe_sql(),
        "doc_top_terms": TOP_TERMS_SQL,
        "doc_quality": DOC_QUALITY_SQL,
        "doc_lang_guess": _doc_lang_sql(),
        "doc_fingerprint": DOC_FINGERPRINT_SQL,
        "docs_balanced_sample": _balanced_sample_sql(),
        "dedup_exact": DEDUP_EXACT_SQL,
        "embedding_cosine_topk": _cosine_sql(),
        "extract_documents": EXTRACT_DOCS_FULL_SQL,
        "extract_documents_text": EXTRACT_DOCS_SQL,
        "events_sessionized": EVENTS_SESSION_SQL,
        "events_asof_last_view": EVENTS_ASOF_SQL,
        "order_price_percentiles": PERCENTILES_SQL,
        "selector_counts": SELECTOR_COUNTS_SQL,
        # selector_extract_p rotated OUT of the driver window in round
        # 7 (third rotation; its SQL stays as the ROTATED_R7 suite
        # gate); its slot carries main_content_docs
        "main_content_docs": MAIN_CONTENT_SQL,
        "selector_attr_eq": SELECTOR_ATTR_SQL,
        # selector_attr_prefix / lookup_by_class_tracked rotated OUT
        # of the driver window in round 6; their SQL constants stay
        # and gate them as suite-oracles (ROTATED_R6).
        "doc_lang_id": _doc_lang_id_sql(),
        "doc_classifier_scores": _classifier_scores_sql(),
        "doc_repetition": DOC_REPETITION_SQL,
        "doc_pii_redaction": DOC_PII_SQL,
        "bm25_corpus_topk": BM25_TOPK_SQL,
        "doc_hashed_embedding": HASHED_EMB_SQL,
        "docs_cap_per_domain": CAP_DOMAIN_SQL,
        "curate_documents_clusters": _curate_sql("clusters"),
        # selector_extract_p_outer rotated OUT of the driver window in
        # round 6; SELECTOR_P_OUTER_SQL stays and gates it as a
        # suite-oracle (ROTATED_R6).
        "pdf_extract_docs": PDF_EXTRACT_SQL,
        "selector_extract_main_inner": SELECTOR_MAIN_INNER_SQL,
        "events_dedup_latest": EVENTS_DEDUP_LATEST_SQL,
        # selector_attr_ws / selector_id_class / lookup_by_id /
        # lookup_by_class rotated OUT of the driver window in round 5;
        # their SQL constants stay and gate them as suite-oracles
        # (tests/test_driver_contract.py ROTATED_R5).
        "parse_nodes_docs": PARSE_NODES_SQL,
        "dedup_minhash": DEDUP_MINHASH_SQL,
        "dedup_simhash": DEDUP_SIMHASH_SQL,
        "dedup_simhash_neardup": _simhash_neardup_sql(),
        "doc_contamination": DOC_CONTAMINATION_SQL,
        "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
        "ann_lsh_topk": ANN_TOPK_SQL,
        "embedding_neardup": NEARDUP_SQL,
        "doc_rolling_fingerprint": _rolling_fp_sql(),
        "curate_documents": _curate_sql(),
        # lookup_by_id_tracked rotated OUT of the driver window in
        # round 7 (slot carries semantic_dedup_docs); LOOKUP_BY_ID_SQL
        # stays and gates it as a suite-oracle (ROTATED_R7).
        "semantic_dedup_docs": SEMANTIC_DEDUP_SQL,
        "doc_outer_html_roundtrip": DOC_OUTER_HTML_SQL,
        "media_info_docs": MEDIA_INFO_SQL,
        # media_image_features: the deterministic fake decoder is a
        # sha256 byte stream — not SQL-reproducible -> rows-only check
    }
