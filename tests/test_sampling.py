"""Temperature resampling (operators/sampling.py): exact DuckDB
suite-oracle for the integer T=2 path, mix-shape and determinism
properties for the general path."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tl_spark.operators.sampling import temperature_resample

SF_DIR = "/root/testdata/sf0.01"

# the sf corpus has near-uniform sources (every source keeps ~100%
# at any T), so the test re-tags docs with a SKEWED source column —
# identically in Spark and SQL — to exercise the down-sampling math:
# 70% "web", 20% "books", 10% "code"
_SKEW_SQL = (
    "CASE WHEN doc_id % 10 < 7 THEN 'web' "
    "WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END"
)

T2_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id, {_SKEW_SQL} AS source
  FROM read_parquet('{SF_DIR}/documents.parquet')
), c AS (
  SELECT source, COUNT(*) AS n FROM base GROUP BY source
), m AS (SELECT MIN(n) AS nmin FROM c),
d AS (
  SELECT doc_id, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT)
           AS h
  FROM base
)
SELECT d.doc_id, d.source
FROM d JOIN c USING (source) CROSS JOIN m
WHERE CAST(h AS HUGEINT) * CAST(h AS HUGEINT) * c.n
      < CAST(m.nmin AS HUGEINT) * 18446744073709551616
ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "source", F.expr(_SKEW_SQL)
    )


def test_t2_matches_duckdb_oracle_exactly(spark, docs):
    got = sorted(
        (r.doc_id, r.source)
        for r in temperature_resample(docs, temperature=2.0)
        .select("doc_id", "source")
        .collect()
    )
    exp = duckdb.sql(T2_ORACLE_SQL).fetchall()
    assert got == [tuple(r) for r in exp]
    assert 0 < len(got) < docs.count()


def test_mix_shape_follows_temperature(spark, docs):
    """Kept counts per source ≈ n_min^(1-1/T) * n_s^(1/T); the
    smallest source keeps everything."""
    n_by = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    nmin = min(n_by.values())
    for T in (2.0, 4.0):
        kept = {
            r[0]: r[1]
            for r in temperature_resample(docs, temperature=T)
            .groupBy("source")
            .count()
            .collect()
        }
        smallest = min(n_by, key=n_by.get)
        assert kept[smallest] == n_by[smallest]
        for s, n in n_by.items():
            expect = n * (nmin / n) ** (1.0 - 1.0 / T)
            # Bernoulli noise: 5-sigma tolerance
            tol = 5 * math.sqrt(expect) + 1
            assert abs(kept.get(s, 0) - expect) <= tol, (T, s)


def test_t1_keeps_everything(spark, docs):
    out = temperature_resample(docs, temperature=1.0)
    assert out.count() == docs.count()
    assert out.select(F.min("keep_prob")).first()[0] == 1.0


def test_deterministic_across_partitionings(spark, docs):
    a = sorted(
        r.doc_id
        for r in temperature_resample(docs.repartition(1), temperature=3.0)
        .select("doc_id")
        .collect()
    )
    b = sorted(
        r.doc_id
        for r in temperature_resample(docs.repartition(17), temperature=3.0)
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_rejects_sub_one_temperature(spark, docs):
    with pytest.raises(ValueError):
        temperature_resample(docs, temperature=0.5)


def test_plan_broadcasts_stats(spark, docs):
    plan = (
        temperature_resample(docs, temperature=2.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_null_source_is_its_own_group(spark):
    """NULL sources form their own group via the null-safe join: rows
    survive resampling instead of being dropped by a null-rejecting
    inner join while still setting n_min (ADVICE r6)."""
    df = spark.createDataFrame(
        [(i, "web" if i % 4 else None) for i in range(400)],
        "doc_id long, source string",
    )
    out = temperature_resample(df, temperature=2.0)
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # NULL group (100 rows, the n_min source) keeps ~all of its rows
    assert None in by_src and by_src[None] >= 80
    # skewed group is down-sampled toward sqrt(nmin/n) * n
    assert 0 < by_src["web"] < 300
    # every output row still carries a well-defined keep_prob
    assert out.filter(F.col("keep_prob").isNull()).count() == 0
