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


def test_canonicalize_url_matches_python_reference(spark):
    """Pin against an independent urllib-based canonicalizer on
    adversarial fixtures: tracking params, fragments, case, default
    and explicit ports, empty paths, unparseable inputs, userinfo,
    non-http schemes."""
    import re
    from urllib.parse import urlsplit

    from tl_spark.operators.urls import canonicalize_url

    TRACK = re.compile(
        r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid"
        r"|ref|ref_src)="
    )

    def ref(u):
        t = u.strip()
        try:
            p = urlsplit(t)
        except ValueError:
            return t
        if (
            p.scheme.lower() not in ("http", "https")
            or not p.hostname
            or p.username is not None
        ):
            return t
        port = ""
        if p.port is not None:
            default = 80 if p.scheme.lower() == "http" else 443
            if p.port != default:
                port = f":{p.port}"
        path = p.path or "/"
        q = "&".join(
            x for x in p.query.split("&") if x and not TRACK.match(x)
        )
        return (
            f"{p.scheme.lower()}://{p.hostname.lower()}{port}{path}"
            + (f"?{q}" if q else "")
        )

    fixtures = [
        "https://Example.COM/Page?utm_source=x&id=3&utm_medium=y#frag",
        "http://example.com:80/a?gclid=abc",
        "https://example.com:443/",
        "https://example.com:8443/x?a=1&fbclid=zzz&b=2",
        "  http://EXAMPLE.com  ",
        "https://example.com",
        "http://example.com/path/?ref=tw",
        "http://example.com/?utm_campaign=1",
        "ftp://example.com/file",
        "not a url at all",
        "http://user:pw@example.com/secret",
        "https://example.com/a?x=1&x=2&utm_term=k",
        "http://sub.Example.Org/A/B.html#x?y",
        "https://example.com/p?ref_src=twsrc",
        "https://example.com/p?refresh=1",  # NOT a tracking param
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(fixtures)],
                               "i long, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, u in enumerate(fixtures):
        assert got[i] == ref(u), (u, got[i], ref(u))


def test_canonicalize_url_collapses_variants_for_dedup(spark):
    from tl_spark.operators.urls import canonicalize_url

    variants = [
        "https://Example.com/article?utm_source=a",
        "https://example.com:443/article#top",
        "https://example.com/article?utm_medium=b&utm_term=c",
        "  https://EXAMPLE.COM/article  ",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    distinct = (
        df.select(canonicalize_url(F.col("url")).alias("c"))
        .distinct()
        .collect()
    )
    assert len(distinct) == 1
    assert distinct[0]["c"] == "https://example.com/article"
