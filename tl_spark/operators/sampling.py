"""Temperature-based source resampling (training-mix balancing).

The published multilingual/data-mix shape (XLM-R / CCNet style):
given documents tagged with a ``source`` (domain, language, crawl
slice), sample source ``s`` with probability proportional to
``p_s^(1/T)`` where ``p_s`` is its corpus share. High temperature
flattens the mix toward uniform-over-sources; ``T=1`` keeps natural
proportions. Down-sampling without replacement with the largest
possible total yield gives the closed form

    keep_s = (n_min / n_s) ** (1 - 1/T)

per-document keep probability (the smallest source keeps everything;
at ``T→∞`` every source keeps ``n_min`` docs in expectation).

Determinism (the reason this is NOT ``df.sample``): the Bernoulli
draw is ``u(doc) = int(md5(id)[:4 bytes], 16) / 2**32`` — a pure
column function, reproducible across partitionings and cluster
sizes, re-computable in ANSI SQL. For ``T=2`` the keep rule is
evaluated in EXACT integer arithmetic::

    keep  ⟺  u < sqrt(n_min/n_s)  ⟺  h*h*n_s < n_min * 2**64

so the DuckDB oracle comparison carries zero floating-point boundary
risk (tests/test_sampling.py pins value-exactness). Other
temperatures use a double-precision threshold; documents within one
ULP of the boundary could in principle flip between engines — fine
for production, which is why only the integer path is oracle-gated.

Scale: one tiny aggregate (one row per source) broadcast-joined back;
the filter is map-side. No other shuffle. Survives any corpus size
with bounded driver state (#sources rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["temperature_resample"]

_2_64 = "18446744073709551616"  # 2**64


def temperature_resample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 2.0,
) -> DataFrame:
    """Deterministically down-sample ``df`` so source sizes follow the
    temperature-``T`` mix. Returns the kept rows with an added
    ``keep_prob`` column. ``temperature >= 1`` (T=1 keeps everything).

    NULL-source policy: a NULL ``source_col`` is treated as its own
    group (null-safe join), so NULL-source rows are resampled like any
    other source rather than being silently dropped by a null-rejecting
    inner join while still influencing ``n_min``.
    """
    if temperature < 1.0:
        raise ValueError("temperature must be >= 1.0 (T=1 keeps all)")
    if temperature == 1.0:
        return df.withColumn("keep_prob", F.lit(1.0))
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    stats = F.broadcast(
        counts.withColumnRenamed(source_col, "_src").crossJoin(
            F.broadcast(nmin)
        )
    )
    # null-safe equality: the NULL-source group joins to its own count
    joined = df.join(
        stats, F.col(source_col).eqNullSafe(F.col("_src")), how="inner"
    ).drop("_src")

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    r = 1.0 - 1.0 / temperature
    if abs(r - 0.5) < 1e-12:
        # T=2: exact integer arithmetic — h^2 * n_s < n_min * 2^64.
        # decimal(38,0) holds h^2*n up to ~1.8e19 * |source| exactly.
        dec = "decimal(38,0)"
        keep = (
            h.cast(dec) * h.cast(dec) * F.col("_n").cast(dec)
            < F.col("_nmin").cast(dec) * F.lit(_2_64).cast(dec)
        )
    else:
        u = h.cast("double") / F.lit(4294967296.0)
        keep = u < F.pow(
            F.col("_nmin").cast("double") / F.col("_n").cast("double"),
            F.lit(r),
        )
    return (
        joined.filter(keep)
        .withColumn(
            "keep_prob",
            F.pow(
                F.col("_nmin").cast("double") / F.col("_n").cast("double"),
                F.lit(r),
            ),
        )
        .drop("_n", "_nmin")
    )
