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
    oracle, and no oracle-backed query may sit beyond it (beyond-window
    entries are the no-oracle media decoders plus the round-5 rotated
    queries, whose exact checks continue as suite-oracles) — otherwise
    an oracle-backed query is silently never driver-checked.
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


LM_SCORE_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok,
         generate_subscripts(
           list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), 1
         ) AS i
  FROM documents
), bg AS (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS v FROM toks)
SELECT doc_id AS id,
       ROUND(AVG(LN((cb + 1.0) / (cu + v))), 6) AS lm_score,
       CAST(count(*) AS BIGINT) AS n_bigrams
FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
GROUP BY doc_id ORDER BY id
"""


def test_bigram_lm_scores_match_oracle(spark, ddb):
    """Suite-oracle for the round-4 bigram-LM quality scorer (the
    50-query driver window is full, so this op is suite-gated like the
    retired selector variants): add-one-smoothed avg bigram
    log-probability per doc, exact vs the brute-force DuckDB
    re-expression on the sf0.01 corpus."""
    from tl_spark.operators.lm import bigram_lm_scores

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    qdf = bigram_lm_scores(d).orderBy("id").select(
        "id", "lm_score", F_count_cast("n_bigrams")
    )
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = ddb.execute(LM_SCORE_SQL)
    duck_cols = [x[0] for x in res.description]
    duck_rows = res.fetchall()
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert normalize(spark_rows, qdf.columns) == normalize(duck_rows, duck_cols)


def F_count_cast(col):
    from pyspark.sql import functions as F

    return F.col(col).cast("long").alias(col)


NORMALIZE_SQL = r"""
SELECT doc_id,
       nfc_normalize(
         regexp_replace(text,
           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')
       ) AS norm_text
FROM documents ORDER BY doc_id
"""


def test_normalize_text_matches_oracle(spark, ddb):
    """Suite-oracle for round-4 text normalization: control-char strip
    (JVM regex) + Unicode NFC (pandas/unicodedata) must equal DuckDB's
    regexp_replace + nfc_normalize — two independent NFC
    implementations (Python unicodedata vs DuckDB's utf8proc) pinned
    equal on the corpus plus adversarial compositions."""
    from tl_spark.functions.text import normalize_text

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    adversarial = [
        "e\u0301cole de\u0301ja\u0300 vu",  # combining accents -> compose
        "\u00e9cole d\u00e9j\u00e0 vu",  # already precomposed
        "a\x00b\x07c\x1fd\x7fe",  # control chars stripped
        "keep\ttabs\nand\rreturns",  # tab/newline/return kept
        "\uff76\u3099 halfwidth ka + combining dakuten",
        "\u212b angstrom sign",  # NFC -> U+00C5
        "",
    ]
    extra = spark.createDataFrame(
        [(900001 + i, t) for i, t in enumerate(adversarial)],
        "doc_id long, text string",
    )
    corpus = d.select("doc_id", "text").unionByName(extra)
    qdf = corpus.select(
        "doc_id", normalize_text(F_text()).alias("norm_text")
    ).orderBy("doc_id")
    spark_vals = {r["doc_id"]: r["norm_text"] for r in qdf.collect()}

    duck_vals = dict(ddb.execute(NORMALIZE_SQL).fetchall())
    scalar = (
        r"SELECT nfc_normalize(regexp_replace(?,"
        r" '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'))"
    )
    for i, t in enumerate(adversarial):
        duck_vals[900001 + i] = ddb.execute(scalar, [t]).fetchone()[0]
    assert set(spark_vals) == set(duck_vals)
    mism = sorted(k for k in spark_vals if spark_vals[k] != duck_vals[k])
    assert not mism, (
        f"{len(mism)} mismatches; first ({mism[0]}): "
        f"{spark_vals[mism[0]]!r} vs {duck_vals[mism[0]]!r}"
    )


def F_text():
    from pyspark.sql import functions as F

    return F.col("text")


# Queries that hold (or have held) a driver-window slot but now sit
# beyond position 50 — each must name the suite test that still gates
# it, so rotation can never silently drop coverage (it did in r2).
SUITE_GATED_BEYOND_WINDOW = {
    "media_image_features": "tests/test_multimodal.py",
    "media_frame_sample": "tests/test_multimodal.py",
    # rotated out in round 5 (slots now carry bm25_corpus_topk,
    # doc_hashed_embedding, docs_cap_per_domain,
    # curate_documents_clusters); exact DuckDB checks continue below
    # in test_rotated_r5_queries_still_match_oracle
    "selector_attr_ws": "tests/test_driver_contract.py::ROTATED_R5",
    "selector_id_class": "tests/test_driver_contract.py::ROTATED_R5",
    "lookup_by_id": "tests/test_driver_contract.py::ROTATED_R5",
    "lookup_by_class": "tests/test_driver_contract.py::ROTATED_R5",
    # rotated out in round 6 (slots now carry doc_lang_id,
    # doc_classifier_scores); exact DuckDB checks continue below in
    # test_rotated_r6_queries_still_match_oracle
    "selector_attr_prefix": "tests/test_driver_contract.py::ROTATED_R6",
    "lookup_by_class_tracked": "tests/test_driver_contract.py::ROTATED_R6",
    # rotated out in round 6 (slot now carries pdf_extract_docs);
    # exact DuckDB check continues below in
    # test_rotated_r6_queries_still_match_oracle
    "selector_extract_p_outer": "tests/test_driver_contract.py::ROTATED_R6",
    # rotated out in round 7 (slot now carries semantic_dedup_docs);
    # exact DuckDB check continues below in
    # test_rotated_r7_queries_still_match_oracle
    "lookup_by_id_tracked": "tests/test_driver_contract.py::ROTATED_R7",
    # rotated out in round 7, second rotation (slot now carries
    # media_info_docs); exact DuckDB check continues below in
    # test_rotated_r7_queries_still_match_oracle
    "doc_html_version": "tests/test_driver_contract.py::ROTATED_R7",
    # rotated out in round 7, third rotation (slot now carries
    # main_content_docs); exact DuckDB check continues below in
    # test_rotated_r7_queries_still_match_oracle
    "selector_extract_p": "tests/test_driver_contract.py::ROTATED_R7",
    # born beyond the window in round 7: the columns="auto" X-Y-cut
    # path under the same closed-form oracle as pdf_extract_docs,
    # plus a pinned negative (columns="off" must NOT match on the
    # two-column input)
    "pdf_extract_twocol_docs": "tests/test_pdf.py::test_twocol_query_matches_oracle",
    # born beyond the window in round 7 sitting 4: SRT/WebVTT
    # transcript extraction under a string_agg DuckDB oracle
    "subtitle_extract_docs": "tests/test_subtitles.py::test_operator_with_duckdb_oracle",
    # born beyond the window in round 7 sitting 4: OOXML (DOCX/PPTX/
    # XLSX) text extraction under a string_agg DuckDB oracle
    "office_extract_docs": "tests/test_ooxml.py::test_operator_with_duckdb_oracle",
    # born beyond the window in round 7 sitting 4: EPUB book text
    # through the HTML kernel under a DuckDB oracle
    "epub_extract_docs": "tests/test_epub.py::test_operator_with_duckdb_oracle",
    # born beyond the window in round 7 sitting 4: RTF text extraction
    # under a DuckDB oracle
    "rtf_extract_docs": "tests/test_rtf.py::test_operator_with_duckdb_oracle",
    # born beyond the window in round 7 sitting 4: the unified
    # document-text router over a mixed four-format corpus
    "document_extract_docs": "tests/test_docrouter.py::test_mixed_corpus_operator_with_duckdb_oracle",
}


def test_window_rotation_has_suite_gates():
    """Every registry entry beyond the driver's 50-query window must be
    explicitly listed with its suite-level gate, and every query that
    had a driver row last round either still sits in the window or is
    suite-gated — the cap can shrink coverage only loudly."""
    import json
    from pathlib import Path

    names = list(Q.queries())
    window, beyond = set(names[:50]), names[50:]
    unaccounted = [n for n in beyond if n not in SUITE_GATED_BEYOND_WINDOW]
    assert not unaccounted, (
        f"registry entries beyond the 50-query driver window with no "
        f"declared suite gate: {unaccounted}"
    )
    rounds = sorted(Path("/root/repo").glob("CORRECTNESS_r*.json"))
    if rounds:
        last = json.loads(rounds[-1].read_text())
        rotated_out = set(last) - window
        ungated = [n for n in rotated_out if n not in SUITE_GATED_BEYOND_WINDOW]
        assert not ungated, (
            f"queries with a driver row in {rounds[-1].name} now outside "
            f"the window and not suite-gated: {ungated}"
        )


def test_registry_consumers_can_release_all_caches(spark):
    """ADVICE r3 (medium): query wrappers returned .select/.orderBy
    derivatives of operator outputs, dropping the plain-attribute cache
    handles — unpersist_handles became a no-op and sketch caches
    accumulated across driver/bench sessions. Pin the fix registry-wide:
    consume each entry at sf0.001, release its handles, and assert the
    session's persisted-RDD set returns to its pre-query state.
    (Delta-based: earlier suite tests may legitimately hold caches.)
    """
    from tl_spark.cache import unpersist_handles

    sc = spark.sparkContext
    leaks = {}
    for name, fn in Q.queries().items():
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        df = fn(spark, "/root/testdata/sf0.001")
        df.count()
        unpersist_handles(df)
        after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        if after - before:
            leaks[name] = sorted(after - before)
            # release so one leak doesn't cascade into later entries
            for rid in after - before:
                sc._jsc.getPersistentRDDs().get(rid).unpersist()
    assert not leaks, f"cache handles leaked past unpersist_handles: {leaks}"


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


# Round-5 rotation: these four left the driver window (their slots now
# carry bm25_corpus_topk / doc_hashed_embedding / docs_cap_per_domain /
# curate_documents_clusters) but keep the SAME exact DuckDB oracles as
# suite gates. The selector pair is additionally pinned by the golden
# corpus; the lookup pair's oracles are shared with the _tracked twins
# that stayed in the window.
ROTATED_R5 = {
    "selector_attr_ws": "SELECTOR_ATTR_WS_SQL",
    "selector_id_class": "SELECTOR_ID_CLASS_SQL",
    "lookup_by_id": "LOOKUP_BY_ID_SQL",
    "lookup_by_class": "LOOKUP_BY_CLASS_SQL",
}


@pytest.mark.parametrize("name", sorted(ROTATED_R5))
def test_rotated_r5_queries_still_match_oracle(spark, ddb, name):
    qdf = Q.queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = ddb.execute(getattr(Q, ROTATED_R5[name]))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert normalize(spark_rows, qdf.columns) == normalize(duck_rows, duck_cols)


# Round-6 rotation: these three left the driver window (their slots
# now carry doc_lang_id / doc_classifier_scores / pdf_extract_docs)
# but keep the SAME exact DuckDB oracles as suite gates.
# selector_attr_prefix is additionally pinned by the golden corpus;
# lookup_by_class_tracked's oracle is shared with
# lookup_by_id_tracked's shape (and the class-lookup path stays
# golden-pinned via lookup_by_class in ROTATED_R5);
# selector_extract_p_outer shares its closed-form oracle shape with
# selector_extract_main_inner (still in the window) and outer_html
# serialization stays golden-pinned on 774 docs.
ROTATED_R6 = {
    "selector_attr_prefix": "SELECTOR_ATTR_SQL",
    "lookup_by_class_tracked": "LOOKUP_BY_CLASS_SQL",
    "selector_extract_p_outer": "SELECTOR_P_OUTER_SQL",
}


@pytest.mark.parametrize("name", sorted(ROTATED_R6))
def test_rotated_r6_queries_still_match_oracle(spark, ddb, name):
    qdf = Q.queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = ddb.execute(getattr(Q, ROTATED_R6[name]))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert normalize(spark_rows, qdf.columns) == normalize(duck_rows, duck_cols)


# Round-7 rotation: lookup_by_id_tracked left the driver window (its
# slot now carries semantic_dedup_docs — round 6's SemDeDup curation
# gate, previously suite-only) but keeps the SAME exact DuckDB oracle
# as a suite gate. The tracked-id lookup path stays driver-checked
# structurally via the golden corpus (tracked maps are pinned per node
# on 774 docs) and its oracle shape is shared with lookup_by_id in
# ROTATED_R5.
ROTATED_R7 = {
    "lookup_by_id_tracked": "LOOKUP_BY_ID_SQL",
    # second r7 rotation: slot carries media_info_docs; version
    # detection stays golden-pinned on 774 docs across both legs
    "doc_html_version": "DOC_HTML_VERSION_SQL",
    # third r7 rotation: slot carries main_content_docs (density-based
    # main-content selection); <p> selector extraction stays pinned by
    # the golden corpus (17 selectors x 774 docs x 4 modes) and the
    # selector-extraction family stays in the window via
    # selector_extract_main_inner + selector_attr_eq
    "selector_extract_p": "SELECTOR_EXTRACT_P_SQL",
}


@pytest.mark.parametrize("name", sorted(ROTATED_R7))
def test_rotated_r7_queries_still_match_oracle(spark, ddb, name):
    qdf = Q.queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    res = ddb.execute(getattr(Q, ROTATED_R7[name]))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert normalize(spark_rows, qdf.columns) == normalize(duck_rows, duck_cols)
