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
    """The kernel stage must stay shuffle-free: the only Exchanges in
    the plan are the round-8 adaptive scan fan-out (a round-robin
    Exchange BELOW the kernel — queries._t) and the single-partition
    deterministic sink; no hash/range Exchange may appear around the
    kernel itself."""
    import tl_spark.queries as Q

    qdf = Q.queries()["main_content_docs"](spark, SF_DIR)
    plan = qdf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_native_main_content_parity():
    """The round-8 native-arena scoring leg must reproduce
    select_main_content value-for-value over the golden corpus (774
    documents of real-world HTML shapes), the three driver page
    shells, and edge cases (empty doc, no candidate, pure-link nav,
    nested candidates, strip subtrees inside the winner)."""
    import json
    import pyarrow as pa
    from pathlib import Path

    from tl_spark.functions.readability import (
        MAIN_HTML_VARIANTS,
        _native_main_content_batch,
        select_main_content,
    )

    docs = []
    goldens = Path(__file__).parent / "goldens/corpus.jsonl"
    with goldens.open() as f:
        for line in f:
            docs.append(json.loads(line)["html"])
    for pre, post in MAIN_HTML_VARIANTS:
        docs.append(pre + "driver document text body here" + post)
    docs += [
        "",
        "plain text only",
        '<div><a href="/">all link</a></div>',
        '<div>outer<section>inner text that is longer</section></div>',
        '<div>keep<script>var x = "drop me";</script>tail</div>',
        '<body><td>cell one</td><td>cell two longer text</td></body>',
    ]
    arr = pa.array(docs, type=pa.string())
    native = _native_main_content_batch(arr)
    assert native is not None, "native DOM unavailable"
    texts, starts, ends, tags, scores, ncs = native
    for i, d in enumerate(docs):
        want = select_main_content(d)
        got = {
            "text": texts[i],
            "start": starts[i],
            "end": ends[i],
            "tag": tags[i],
            "score": scores[i],
            "n_candidates": ncs[i],
        }
        assert got == want, (i, d[:120], got, want)
