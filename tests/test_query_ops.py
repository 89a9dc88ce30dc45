"""DataFrame-level selector/lookup operators vs kernel-direct results."""

import pytest

from tl_spark.kernel import parse


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, '<div class="a"><p class="b">x</p><p>y</p></div>'),
        (2, '<p id="k">hello <span>world</span></p><p class="b">z</p>'),
        (3, "plain text"),
        (4, '<div id="u"><p class="c">unclosed'),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_query_selector_extract_matches_kernel(spark, docs_df):
    from tl_spark.functions.query import query_selector_extract

    out = query_selector_extract(docs_df, "p", mode="inner_text").collect()
    got = {(r["doc_id"], r["node_idx"]): (r["inner_text"], r["start"], r["end"]) for r in out}
    want = {}
    for row in docs_df.collect():
        dom = parse(row["text"])
        for h in dom.query_selector("p"):
            want[(row["doc_id"], h)] = (
                dom.inner_text(h),
                *dom.boundaries(h),
            )
    assert got == want
    assert len(got) == 5  # docs 1,2 have two <p> each; doc 4 one


def test_query_selector_dead_combinator_dataframe(spark, docs_df):
    from tl_spark.functions.query import query_selector_extract

    out = query_selector_extract(docs_df, ".a .b", mode="outer_html")
    assert out.count() == 0  # Descendant parses but never matches


def test_query_selector_invalid_fails_fast(spark, docs_df):
    from tl_spark.functions.query import query_selector_extract

    with pytest.raises(ValueError):
        query_selector_extract(docs_df, '[title="two words"]')


def test_lookup_modes_diverge_on_unclosed(spark, docs_df):
    from tl_spark.functions.query import get_elements_by_id

    scan = get_elements_by_id(docs_df, "u", tracked=False).collect()
    tracked = get_elements_by_id(docs_df, "u", tracked=True).collect()
    assert [r["doc_id"] for r in scan] == [4]
    assert tracked == []  # id maps populate only at close time


def test_get_elements_by_class(spark, docs_df):
    from tl_spark.functions.query import get_elements_by_class

    out = get_elements_by_class(docs_df, "b").collect()
    assert sorted((r["doc_id"], r["inner_text"]) for r in out) == [
        (1, "x"),
        (2, "z"),
    ]


def test_no_cartesian_or_nested_loop_in_any_driver_query(spark):
    """Plan-hygiene sweep: no driver query may plan a CartesianProduct
    or BroadcastNestedLoopJoin — at corpus scale either is a job
    killer. (Self-joins here are equi-joins on band/bucket digests
    with range post-filters, which plan as hash/sort-merge joins.)"""
    import tl_spark.queries as Q

    sf = "/root/testdata/sf0.001"
    for name, fn in Q.queries().items():
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in plan, f"{name} plans a {bad}"


# ------------------------------------------------- round-3 additions


@pytest.fixture(scope="module")
def ddb_documents():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.01/documents.parquet'"
    )
    return con


def test_query_selector_scoped_matches_kernel(spark, docs_df):
    """Spark-level subtree-scoped query == per-doc kernel
    tag_query_selector on the first scope match."""
    from tl_spark.functions.query import query_selector_scoped
    from tl_spark.kernel.selector import parse_selector, selector_matches

    out = query_selector_scoped(docs_df, "div", "p", mode="inner_text").collect()
    got = {
        (r["doc_id"], r["scope_idx"], r["node_idx"]): r["inner_text"]
        for r in out
    }
    want = {}
    scope_ast = parse_selector("div")
    for row in docs_df.collect():
        dom = parse(row["text"])
        scope = next(
            (
                h
                for h in range(len(dom.nodes))
                if selector_matches(scope_ast, dom, h)
            ),
            None,
        )
        if scope is None:
            continue
        for h in dom.tag_query_selector(scope, "p"):
            want[(row["doc_id"], scope, h)] = dom.inner_text(h)
    assert got == want
    # the scoping is a real discriminator on doc 2: its <p> nodes are
    # OUTSIDE any div, so doc 2 contributes no rows despite matching "p"
    assert not any(k[0] == 2 for k in got)
    assert any(k[0] == 1 for k in got)


def test_query_selector_scoped_duckdb_oracle(spark, ddb_documents):
    """Suite-level DuckDB oracle for subtree-scoped matching (the one
    §2.C surface without a driver-window slot — the registry's 50
    oracle-backed entries are full): wrap the tag-free sf0.01 document
    text so the scoped result is a closed form of length(text).

    Wrapper '<div><main class="m"><p>' + text + '</p></main><p>footer
    </p></div>': doc-scope "p" matches handles 2 AND 4; scoped to
    "main" only handle 2 survives, with raw extent [21, len(text)+27].
    """
    import pyspark.sql.functions as F

    from tl_spark.functions.query import query_selector_scoped

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    html = d.select(
        "doc_id",
        F.concat(
            F.lit('<div><main class="m"><p>'),
            F.col("text"),
            F.lit("</p></main><p>footer</p></div>"),
        ).alias("text"),
    )
    got = (
        query_selector_scoped(html, "main", "p", mode="inner_text")
        .orderBy("doc_id")
        .collect()
    )
    oracle = ddb_documents.execute(
        """
        SELECT doc_id, CAST(1 AS INTEGER) AS scope_idx,
               CAST(2 AS INTEGER) AS node_idx, text AS inner_text,
               CAST(21 AS INTEGER) AS start,
               CAST(length(text) + 27 AS INTEGER) AS "end"
        FROM documents ORDER BY doc_id
        """
    ).fetchall()
    assert [tuple(r) for r in got] == oracle
    # and WITHOUT scoping the footer <p> (handle 4) also matches:
    from tl_spark.functions.query import query_selector_extract

    n_unscoped = query_selector_extract(html, "p").count()
    assert n_unscoped == 2 * len(oracle)


def test_no_broadcast_hint_on_sf_growing_tables():
    """Plan-hygiene sweep (VERDICT r7 item 2): no declared query may
    force-broadcast an SF-growing driver table (customer bit q3/q5 in
    r6/r7). Only the bounded dimensions (nation: 25 rows, region: 5)
    may carry an explicit hint; everything else is AQE's decision."""
    import inspect
    import re

    import tl_spark.queries as Q

    src = inspect.getsource(Q)
    growing = (
        "customer", "orders", "lineitem", "events", "documents",
        "embeddings", "supplier", "part",
    )
    hints = re.findall(r"F\.broadcast\(\s*(\w+)\s*[),]", src)
    assert hints and set(hints) <= {"n", "r"}, hints
    # and the bound names really are the bounded dimensions
    for t in growing:
        assert not re.search(
            rf'{t}\s*=\s*F\.broadcast|F\.broadcast\(\s*_t\([^)]*"{t}"', src
        ), t
