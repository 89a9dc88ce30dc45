"""BM25 retrieval: hand-computed oracle + DuckDB suite-oracle."""

import math

import pytest


def test_bm25_matches_hand_computation(spark):
    """Three tiny docs, every quantity (tf, df, idf, dl, avgdl)
    hand-derived in plain Python with the same formula."""
    from tl_spark.operators.retrieval import bm25_scores

    docs = {
        1: "spark engine for big data processing",
        2: "the spark spark engine",
        3: "unrelated words entirely here",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    q = ["spark", "engine"]
    got = {
        r["id"]: r["bm25"] for r in bm25_scores(df, q).collect()
    }
    # reference
    k1, b = 1.2, 0.75
    tok = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in tok.values()) / n
    exp = {}
    for i, ts in tok.items():
        s = 0.0
        for term in q:
            tf = sum(1 for w in ts if w.lower() == term)
            if tf == 0:
                continue
            dfreq = sum(
                1 for v in tok.values() if any(w.lower() == term for w in v)
            )
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(ts) / avgdl)
            )
        if s > 0:
            exp[i] = round(s, 6)
    assert set(got) == set(exp) == {1, 2}  # doc 3 matches nothing
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-5, (i, got[i], exp[i])
    # doc 2 repeats 'spark' but misses nothing doc 1 has; both match


def test_bm25_topk_deterministic_and_plan(spark):
    """Top-k is a TakeOrderedAndProject (no global sort), and the
    result is identical across partitionings."""
    from tl_spark.operators.retrieval import bm25_topk

    rows = [
        (i, f"alpha beta doc{i} " + ("target " * (i % 5)))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = bm25_topk(df.repartition(2), ["target", "alpha"], k=7).collect()
    c = bm25_topk(df.repartition(13), ["target", "alpha"], k=7).collect()
    assert [(r["id"], r["bm25"]) for r in a] == [
        (r["id"], r["bm25"]) for r in c
    ]
    assert len(a) == 7
    plan = bm25_topk(df, ["target"], k=7)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_duckdb_suite_oracle(spark):
    """Same formula re-expressed in ANSI SQL over the sf0.01 documents
    table must agree per doc to 1e-5 (cross-engine float tolerance)."""
    import duckdb

    from tl_spark.operators.retrieval import bm25_scores

    path = "/root/testdata/sf0.01/documents.parquet"
    df = spark.read.parquet(path)
    q = ["the", "data", "model"]
    got = {
        r["id"]: r["bm25"]
        for r in bm25_scores(df, q, text_col="text", id_col="doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    sql = """
    WITH toks AS (
      SELECT doc_id AS id, lower(t.term) AS term
      FROM documents,
           UNNEST(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '')) AS t(term)
    ),
    lens AS (SELECT id, count(*) AS dl FROM toks GROUP BY id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    tf AS (
      SELECT id, term, count(*) AS tf FROM toks
      WHERE term IN ('the', 'data', 'model') GROUP BY id, term
    ),
    dfreq AS (SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM dfreq, stats
    )
    SELECT tf.id,
           round(sum(idf.idf * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / stats.avgdl))),
                 6) AS bm25
    FROM tf JOIN idf USING (term) JOIN lens USING (id), stats
    GROUP BY tf.id
    """
    exp = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert set(got) == set(exp)
    assert len(got) > 10  # the corpus genuinely matches these terms
    for i in got:
        assert abs(got[i] - exp[i]) < 1e-5, (i, got[i], exp[i])


def test_bm25_stable_sum_equals_default_and_is_bit_reproducible(spark):
    """stable_sum changes only the summation ORDER: scores agree with
    the default mode to float tolerance, and repeated runs over
    different partitionings are bit-identical (the property the
    driver oracle relies on)."""
    from tl_spark.operators.retrieval import bm25_scores

    rows = [
        (i, f"alpha beta gamma{i % 3} " + ("target " * (i % 4)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = ["target", "alpha", "gamma1"]
    base = {r["id"]: r["bm25"] for r in bm25_scores(df, q).collect()}
    stable = {
        r["id"]: r["bm25"]
        for r in bm25_scores(df, q, stable_sum=True).collect()
    }
    assert set(base) == set(stable)
    for i in base:
        assert abs(base[i] - stable[i]) < 1e-5, i
    again = {
        r["id"]: r["bm25"]
        for r in bm25_scores(
            df.repartition(7), q, stable_sum=True
        ).collect()
    }
    assert stable == again  # exact equality, not tolerance
