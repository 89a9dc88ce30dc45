"""URL-level crawl curation: host stats and per-domain caps.

The diversity step every crawl-derived corpus applies (C4, Gopher,
RefinedWeb all cap per-domain contributions): without it, a handful
of template-heavy hosts dominate the token budget. All JVM-side —
``parse_url`` host extraction, window-based deterministic caps — so
the plan is codegen'd end to end.

Scale shape: host extraction is map-only; the cap is ONE shuffle on
the host key with a window row_number (skew-safe: the window's
per-host work is linear, and hash ordering means no sort on document
content); stats are a map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def url_host(col) -> "F.Column":
    """Lower-cased registrable host from a URL column (JVM parse_url;
    null for unparseable URLs)."""
    return F.lower(F.try_parse_url(col, F.lit("HOST")))


def domain_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(host, n_docs) — per-host document counts, descending. The
    standard first look at crawl balance."""
    return (
        df.select(url_host(F.col(url_col)).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("host"))
    )


def cap_per_domain(
    df: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_by_hash: bool = True,
) -> DataFrame:
    """Keep at most ``max_per_host`` documents per host. Selection is
    deterministic and partitioning-independent: within a host, docs
    rank by xxhash64(id) (a reproducible pseudo-random sample of the
    host's pages — the C4 posture) or by id itself when
    ``order_by_hash=False`` (keep the first pages). Docs with
    unparseable URLs (null host) are KEPT — they form no domain to
    cap. Returns the input columns unchanged."""
    if max_per_host < 1:
        raise ValueError("max_per_host must be >= 1")
    order = (
        F.xxhash64(F.col(id_col)) if order_by_hash else F.col(id_col)
    )
    with_host = df.withColumn("_host", url_host(F.col(url_col)))
    # null hosts bypass the window entirely — otherwise every
    # unparseable URL lands in ONE window partition (skew)
    null_part = with_host.filter(F.col("_host").isNull()).drop("_host")
    w = Window.partitionBy("_host").orderBy(order, F.col(id_col))
    capped = (
        with_host.filter(F.col("_host").isNotNull())
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= max_per_host)
        .drop("_host", "_rank")
    )
    return capped.unionByName(null_part)


_TRACKING_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid"
    r"|ref|ref_src)="
)


def canonicalize_url(col) -> "F.Column":
    """Canonical form of an absolute http(s) URL, all-JVM:

    - scheme and host lowercased; default ports (:80 http, :443
      https) stripped, other explicit ports kept;
    - fragment dropped;
    - tracking query parameters removed (utm_*, gclid, fbclid,
      msclkid, mc_cid/mc_eid, igshid, ref/ref_src), other params kept
      in their original order; an emptied query loses its '?';
    - empty path becomes '/'.

    URLs that don't parse (null host), non-http(s) schemes, or URLs
    carrying userinfo are returned TRIMMED BUT OTHERWISE UNCHANGED —
    the op never invents structure for inputs it doesn't understand.
    The standard pre-dedup step for crawl corpora: variants of one
    page (tracking params, fragments, case-y hosts) collapse to one
    key before exact/near dedup or per-domain caps.
    """
    u = F.trim(col)
    scheme = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    userinfo = F.try_parse_url(u, F.lit("USERINFO"))
    authority = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.try_parse_url(u, F.lit("QUERY"))
    kept_q = F.array_join(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM_RE),
        ),
        "&",
    )
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(kept_q != "", F.concat(F.lit("?"), kept_q)).otherwise(
            F.lit("")
        ),
    )
    eligible = (
        host.isNotNull()
        & scheme.isin("http", "https")
        & userinfo.isNull()
    )
    return F.when(eligible, rebuilt).otherwise(u)
