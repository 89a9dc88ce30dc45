"""Simulate the driver's correctness gate: Spark query vs DuckDB oracle.

Mirrors the driver: same parquet tables registered as DuckDB views,
column-name-sorted, order-insensitive, exact value comparison.
"""

import math

import duckdb
import pytest

import tl_spark.queries as Q

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


ORACLES = sorted(Q.oracle_sql())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, ddb, name):
    qdf = Q.queries()[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = ddb.execute(Q.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{a[mism[0]]!r} vs {b[mism[0]]!r}"
    )


def test_rows_only_queries_run(spark):
    only_rows = set(Q.queries()) - set(Q.oracle_sql())
    assert only_rows  # the non-SQL ops exist
    for name in sorted(only_rows):
        df = Q.queries()[name](spark, "/root/testdata/sf0.001")
        n = df.count()
        assert n >= 0
        df.limit(5).collect()


def test_oracle_keys_subset_of_queries():
    assert set(Q.oracle_sql()) <= set(Q.queries())


def test_driver_window_is_fully_oracle_backed():
    """The driver verifies only the FIRST 50 registry entries
    (CORRECTNESS_r02.json has exactly the first 50 keys of the r2
    registry). Every query inside that window must carry a DuckDB
    oracle, and only the no-oracle media decoders may sit beyond it —
    otherwise an oracle-backed query is silently never driver-checked.
    """
    names = list(Q.queries())
    window, beyond = names[:50], names[50:]
    oracles = set(Q.oracle_sql())
    missing = [n for n in window if n not in oracles]
    assert not missing, f"no-oracle queries inside driver window: {missing}"
    assert all(n not in oracles for n in beyond), (
        f"oracle-backed queries OUTSIDE the driver window: "
        f"{[n for n in beyond if n in oracles]}"
    )


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())


RETIRED_FROM_WINDOW = ["selector_attr_suffix", "selector_attr_contains"]


@pytest.mark.parametrize("name", RETIRED_FROM_WINDOW)
def test_retired_attr_selector_variants_still_match_oracle(spark, ddb, name):
    """attr_suffix / attr_contains left the driver registry in round 3
    (their slots carry doc_repetition / doc_pii_redaction; the golden
    corpus pins all selector variants independently) but they stay
    suite-verified against the same closed-form oracle here."""
    qdf = getattr(Q, name)(spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = ddb.execute(Q.SELECTOR_ATTR_SQL)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert normalize(spark_rows, qdf.columns) == normalize(duck_rows, duck_cols)
