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
