"""Density-based main-content selection: exact semantics unit tests,
adversarial shapes, the Spark operator, and the driver-oracle query
(tl_spark/functions/readability.py)."""

import duckdb
import pytest

from tl_spark.functions.readability import (
    MAIN_HTML_VARIANTS,
    main_content_extract,
    score_candidates,
    select_main_content,
)
from tl_spark.kernel.htmlparse import parse

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    return con


def test_scores_are_exact_closed_forms():
    html = (
        '<body><div id="a">0123456789</div>'
        '<div id="b"><a href="/">0123456789</a>0123456789</div>'
        '<div id="c"><a href="/">linklink</a></div></body>'
    )
    cands = {  # keyed by own_len for this fixture
        (c["own_len"], c["own_link_len"]): c
        for c in score_candidates(parse(html.encode()))
    }
    # body: all text belongs to nested candidates
    assert (0, 0) in cands and cands[(0, 0)]["score"] == 0.0
    # a: 10 chars, no links
    assert cands[(10, 0)]["score"] == 10.0
    # b: 20 chars, half links -> 20 * 0.5^2 = 5
    assert cands[(20, 10)]["score"] == 5.0
    # c: pure link -> 0
    assert cands[(8, 8)]["score"] == 0.0


def test_winner_is_density_not_length():
    # the longer block is linkier; density must pick the shorter one
    html = (
        "<body><div>"
        + '<a href="/x">word </a>' * 30  # 150 chars, all links
        + "</div><div>plain content of medium length here</div></body>"
    )
    r = select_main_content(html)
    assert r["text"] == "plain content of medium length here"


def test_nested_candidate_attribution():
    # the outer div's own text excludes the inner candidate's text
    html = '<div>outer<div>inner content that is longer</div></div>'
    cands = score_candidates(parse(html.encode()))
    by_own = sorted(c["own_len"] for c in cands)
    assert by_own == [5, 28]
    r = select_main_content(html)
    # winner is the inner div; its full inner_text is just its own
    assert r["text"] == "inner content that is longer"


def test_winner_text_includes_nested_candidates():
    # winner selection uses OWN text, output uses FULL inner_text
    html = (
        "<body><div>the main body of the article text continues"
        "<div>aside</div> and continues</div></body>"
    )
    r = select_main_content(html)
    assert "aside" in r["text"] and r["text"].startswith("the main")


def test_score_strip_tags_excluded():
    html = (
        "<body><div>visible</div>"
        "<div><script>var boilerplate_that_is_long = 1;</script>x</div>"
        "</body>"
    )
    cands = score_candidates(parse(html.encode()))
    lens = sorted(c["own_len"] for c in cands)
    assert lens == [0, 1, 7]  # script text never counted
    r = select_main_content(html)
    assert r["text"] == "visible"


def test_fallback_whole_document():
    r = select_main_content("<p>hello</p> world")
    assert r["tag"] == "" and r["text"] == "hello world"
    assert r["start"] == 0
    # pure-link candidates also fall back
    r = select_main_content('<body><div><a href="/">x</a></div></body>')
    assert r["tag"] == "" and r["text"] == "x"


def test_tie_breaks_to_earliest():
    r = select_main_content("<div>abcd</div><div>abcd</div>")
    assert r["start"] == 0


def test_three_variants_all_pick_the_content_block():
    text = "z" * 44  # the corpus minimum length
    for k, (pre, post) in enumerate(MAIN_HTML_VARIANTS):
        r = select_main_content(pre + text + post)
        assert r["tag"] == "div", k
        assert r["text"] == "Heading " + text + "read more", k


def test_operator_on_error_policy(spark):
    df = spark.createDataFrame(
        [(1, "<div>fine content here</div>")], "doc_id long, text string"
    )
    out = main_content_extract(df).collect()
    assert out[0]["main_text"] == "fine content here"
    # a None payload must follow the on_error contract
    bad = spark.createDataFrame([(2, None)], "doc_id long, text string")
    assert main_content_extract(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        main_content_extract(bad, on_error="raise").collect()


def test_main_content_docs_matches_oracle(spark, ddb):
    import tl_spark.queries as Q

    qdf = Q.queries()["main_content_docs"](spark, SF_DIR)
    spark_rows = sorted(tuple(r) for r in qdf.collect())
    res = ddb.execute(Q.MAIN_CONTENT_SQL)
    duck_cols = [d[0] for d in res.description]
    assert sorted(qdf.columns) == sorted(duck_cols)
    assert spark_rows == sorted(tuple(r) for r in res.fetchall())


def test_plan_is_map_only_before_the_hash_sort(spark):
    """The kernel stage must stay shuffle-free: the only Exchange in
    the plan is the final orderBy the driver's hash check needs."""
    import tl_spark.queries as Q

    qdf = Q.queries()["main_content_docs"](spark, SF_DIR)
    plan = qdf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the orderBy range partition
