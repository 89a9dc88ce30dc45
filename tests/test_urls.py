"""URL curation ops: host stats + per-domain caps (DuckDB oracle)."""

import pyspark.sql.functions as F


def _corpus(spark):
    rows = []
    i = 0
    for host, n in (("big.example.com", 8), ("small.org", 2), ("mid.net", 4)):
        for k in range(n):
            rows.append((i, f"https://{host}/page{k}?q=1"))
            i += 1
    rows.append((i, "not a url at all"))
    rows.append((i + 1, "also::bad"))
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_stats(spark):
    from tl_spark.operators.urls import domain_stats

    got = [
        (r["host"], r["n_docs"])
        for r in domain_stats(_corpus(spark)).collect()
    ]
    assert got[0] == ("big.example.com", 8)
    assert ("mid.net", 4) in got and ("small.org", 2) in got


def test_cap_per_domain_deterministic_and_partition_independent(spark):
    from tl_spark.operators.urls import cap_per_domain, url_host

    df = _corpus(spark)
    a = cap_per_domain(df.repartition(2), max_per_host=3)
    b = cap_per_domain(df.repartition(11), max_per_host=3)
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert ra == rb
    # per-host counts respect the cap; null-host rows always survive
    counts = (
        a.withColumn("h", url_host(F.col("url")))
        .groupBy("h")
        .count()
        .collect()
    )
    by = {r["h"]: r["count"] for r in counts}
    assert by["big.example.com"] == 3
    assert by["mid.net"] == 3
    assert by["small.org"] == 2
    assert by.get(None, 0) == 2
    assert a.columns == df.columns


def test_cap_per_domain_duckdb_oracle(spark):
    """The hash-ranked cap re-expressed in DuckDB SQL must select the
    same doc set (xxhash64 pinned via Spark: the oracle re-ranks by
    the SAME hash values exported as a column)."""
    import duckdb

    from tl_spark.operators.urls import cap_per_domain

    df = _corpus(spark).withColumn("h64", F.xxhash64(F.col("doc_id")))
    got = sorted(
        r["doc_id"] for r in cap_per_domain(df, max_per_host=2).collect()
    )
    pdf = df.select(
        "doc_id", "url", "h64",
        F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
    ).toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM (
              SELECT doc_id,
                     row_number() OVER (
                       PARTITION BY host ORDER BY h64, doc_id
                     ) AS rn
              FROM docs WHERE host IS NOT NULL
            ) WHERE rn <= 2
            UNION ALL
            SELECT doc_id FROM docs WHERE host IS NULL
            """
        ).fetchall()
    )
    assert got == exp
