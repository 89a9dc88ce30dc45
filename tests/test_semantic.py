"""Tests for semantic_dedup (SemDeDup-shape cluster-then-dedup,
tl_spark/operators/similarity.py) and its curate() gate."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tl_spark.operators.similarity import semantic_dedup

SF_DIR = "/root/testdata/sf0.001"


def _planted_frame(spark, n_noise=40, dim=16, groups=3, copies=4):
    """Deterministic corpus: `groups` planted paraphrase clusters of
    `copies` near-identical vectors (cosine ~0.999) + spread-out noise
    vectors. ids: group g copy c -> 1000*g + c; noise -> 5000+i."""
    rng = np.random.RandomState(11)
    rows = []
    for g in range(groups):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for c in range(copies):
            v = base + 0.01 * rng.randn(dim)
            rows.append((1000 * g + c, [float(x) for x in v]))
    for i in range(n_noise):
        v = rng.randn(dim)
        rows.append((5000 + i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_planted_paraphrase_clusters_collapse_to_earliest(spark):
    df = _planted_frame(spark)
    kept, dropped = semantic_dedup(
        df, threshold=0.95, n_lists=8, train_size=10_000
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    drop_rows = dropped.collect()
    drop_ids = {r["id"] for r in drop_rows}
    # each planted cluster keeps exactly its earliest id
    for g in range(3):
        members = {1000 * g + c for c in range(4)}
        assert 1000 * g in kept_ids, f"earliest of group {g} dropped"
        assert members - {1000 * g} <= drop_ids, (
            f"group {g} copies not deduped: "
            f"{(members - {1000 * g}) - drop_ids}"
        )
    # random noise vectors are not near-duplicates of anything
    assert all(i >= 1000 * 0 and i < 5000 for i in drop_ids)
    assert kept_ids | drop_ids == {
        r["vec_id"] for r in df.select("vec_id").collect()
    }
    for r in drop_rows:
        assert r["max_cos"] >= 0.95


def test_drop_set_matches_sql_oracle_given_assignment(spark):
    """Conditional suite-oracle: with the (deterministic) list
    assignment taken from the Spark side, the drop set must equal the
    ANSI-SQL 'exists an earlier same-list vector with round-6 cosine
    >= t' rule, evaluated independently by DuckDB."""
    from tl_spark.operators.similarity import build_ivf_index

    df = _planted_frame(spark)
    thr = 0.95
    kept, dropped = semantic_dedup(
        df, threshold=thr, n_lists=8, train_size=10_000
    )
    index_df, _ = build_ivf_index(df, n_lists=8, train_size=10_000)
    pdf = index_df.toPandas()
    pdf["v"] = pdf["v"].apply(lambda a: [float(x) for x in a])
    con = duckdb.connect()
    con.register("assign", pdf)
    oracle = con.execute(
        f"""
        WITH cos AS (
          SELECT b.id AS id, b._list AS list,
                 round(
                   list_dot_product(a.v, b.v)
                   / (NULLIF(sqrt(list_dot_product(a.v, a.v)), 0)
                      * NULLIF(sqrt(list_dot_product(b.v, b.v)), 0)),
                   6) AS c
          FROM assign a JOIN assign b
            ON a._list = b._list AND a.id < b.id
        )
        SELECT id, list, MAX(c) AS max_cos
        FROM cos GROUP BY id, list HAVING MAX(c) >= {thr}
        ORDER BY id
        """
    ).fetchdf()
    got = (
        dropped.orderBy("id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert list(got["id"]) == list(oracle["id"])
    assert list(got["list"]) == list(oracle["list"])
    assert np.allclose(got["max_cos"], oracle["max_cos"], atol=2e-6)


def test_oversized_list_cap_passes_overflow_through(spark):
    """max_list_size bounds the O(s^2) stage: overflow ids (beyond the
    first cap ids per list) pass through untouched."""
    # all vectors identical -> one list, everything past id 0 is a dup
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept, dropped = semantic_dedup(
        df, threshold=0.9, n_lists=2, train_size=100, max_list_size=5
    )
    drop_ids = sorted(r["id"] for r in dropped.collect())
    # first 5 ids participate: 1..4 drop; ids 5..9 overflow -> kept
    assert drop_ids == [1, 2, 3, 4]
    assert kept.count() == 6


def test_semantic_dedup_partitioning_invariant(spark):
    df = _planted_frame(spark)
    _, d1 = semantic_dedup(df, threshold=0.95, n_lists=8,
                           train_size=10_000)
    _, d2 = semantic_dedup(df.repartition(13), threshold=0.95,
                           n_lists=8, train_size=10_000)
    r1 = sorted((r["id"], r["list"], r["max_cos"]) for r in d1.collect())
    r2 = sorted((r["id"], r["list"], r["max_cos"]) for r in d2.collect())
    assert r1 == r2


def test_curate_semantic_dedup_gate(spark):
    """curate(semantic_dedup_cos=...) drops hashed-embedding
    near-identical docs (paraphrase-free exact re-wordings share the
    token bag -> cosine 1.0) as semantic_dup, keeping the earliest
    (conv_id, turn_idx); totality holds."""
    from tl_spark.curation import curate

    base = ("the committee published a detailed report on renewable "
            "energy for the northern region")
    shuffled = ("renewable energy report on the committee published "
                "for a detailed the northern region")  # same token bag
    other = ("volunteers planted hundreds of trees along the river "
             "bank during the spring festival")
    rows = [
        ("c1", 0, "user", None, f"<html><body><p>{base}</p></body></html>"),
        ("c1", 1, "user", None,
         f"<html><body><p>{shuffled}</p></body></html>"),
        ("c2", 0, "user", None,
         f"<html><body><p>{other}</p></body></html>"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
        "ts timestamp, text string"
    )
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=2, neardup_jaccard=1.01,
        semantic_dedup_cos=0.99,
    )
    cur = curated.toPandas()
    drp = dropped.toPandas()
    assert len(cur) + len(drp) == 3
    sem = drp[drp["drop_reason"] == "semantic_dup"]
    assert len(sem) == 1
    # the earliest turn of the paraphrase pair survives
    assert ("c1", 0) in {tuple(x) for x in cur[["conv_id", "turn_idx"]].values}
    assert ("c2", 0) in {tuple(x) for x in cur[["conv_id", "turn_idx"]].values}
