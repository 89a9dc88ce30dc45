"""Native DOM kernel (dom.rs) == Python DOM kernel, everywhere.

The Python arena parser / selector matcher / serializers
(kernel/htmlparse.py, kernel/selector.py) are the semantic source of
truth — themselves pinned against the compiled reference by the golden
corpus. The native DOM legs must match them VALUE-FOR-VALUE over:

- the 774-doc golden corpus × its 17 selectors (all four modes),
- id/class lookups in both scan and tracked modes,
- whole-document outer_html and the node-arena explosion,
- hypothesis fuzz over html-ish and full-unicode text,
- quirk cases: attr spill, duplicate attrs, unclosed tags (where
  tracked and scan lookups observably differ), comment forms, doctype
  residue splitting multibyte chars.

Tests skip when the cdylib isn't present (optional by design).
"""

import json
from pathlib import Path

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tl_spark.kernel import native_dom as nd
from tl_spark.kernel.htmlparse import KIND_TAG, parse
from tl_spark.kernel.selector import parse_selector, selector_matches

GOLDENS = Path(__file__).parent / "goldens/corpus.jsonl"

pytestmark = pytest.mark.skipif(
    nd.load_dom() is None, reason="native DOM kernel not built/loadable"
)

MODES = ("inner_text", "inner_html", "outer_html", "raw")


def _py_value(dom, h, mode):
    if mode == "inner_text":
        return dom.inner_text(h)
    if mode == "inner_html":
        return dom.inner_html(h)
    if mode == "outer_html":
        return dom.outer_html(h)
    return dom.raw_bytes(h).decode("utf-8", "replace")


def _native_qs(docs, ast, mode):
    col = pa.array(docs, type=pa.string())
    res = nd.dom_query_batch(
        col, nd.encode_params(nd.OP_QS_EXTRACT, mode, b"", ast)
    )
    assert res is not None
    doc_idx, node_idx, _sc, start, end, text = res
    return list(
        zip(
            doc_idx.tolist(),
            node_idx.tolist(),
            text.to_pylist(),
            start.tolist(),
            end.tolist(),
        )
    )


def _py_qs(docs, ast, mode):
    out = []
    for d_i, doc in enumerate(docs):
        dom = parse(doc)
        for h in range(len(dom.nodes)):
            if selector_matches(ast, dom, h):
                s, e = dom.boundaries(h)
                out.append((d_i, h, _py_value(dom, h, mode), s, e))
    return out


def _assert_qs_equal(docs, selector, mode="inner_text"):
    ast = parse_selector(selector)
    assert ast is not None, selector
    assert _native_qs(docs, ast, mode) == _py_qs(docs, ast, mode), (
        selector,
        mode,
    )


def _golden_docs():
    return [json.loads(l) for l in GOLDENS.open()]


def test_native_dom_selectors_on_golden_corpus():
    """Every golden selector over every golden doc, one mode per
    selector (rotating through all four modes for coverage)."""
    goldens = _golden_docs()
    docs = [g["html"] for g in goldens]
    selectors = sorted({s for g in goldens for s in g["selectors"]})
    for i, sel in enumerate(selectors):
        ast = parse_selector(sel)
        if ast is None:
            continue
        mode = MODES[i % len(MODES)]
        _assert_qs_equal(docs, sel, mode)


def test_native_dom_all_modes_on_golden_sample():
    """All four modes × a structural selector over the full corpus."""
    docs = [g["html"] for g in _golden_docs()]
    for mode in MODES:
        _assert_qs_equal(docs, "*", mode)


def test_native_dom_scoped_query_matches_python():
    docs = [g["html"] for g in _golden_docs()]
    scope_ast = parse_selector("div")
    ast = parse_selector("span")
    col = pa.array(docs, type=pa.string())
    res = nd.dom_query_batch(
        col,
        nd.encode_params(nd.OP_QS_SCOPED, "outer_html", b"", ast, scope_ast),
    )
    assert res is not None
    doc_idx, node_idx, scope_idx, start, end, text = res
    native = list(
        zip(
            doc_idx.tolist(),
            scope_idx.tolist(),
            node_idx.tolist(),
            text.to_pylist(),
            start.tolist(),
            end.tolist(),
        )
    )
    py = []
    for d_i, doc in enumerate(docs):
        dom = parse(doc)
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
        for h in dom.tag_query_selector(scope, "span") or []:
            s, e = dom.boundaries(h)
            py.append((d_i, scope, h, dom.outer_html(h), s, e))
    assert native == py


def _native_lookup(docs, op, key):
    col = pa.array(docs, type=pa.string())
    res = nd.dom_query_batch(col, nd.encode_params(op, key=key))
    assert res is not None
    doc_idx, node_idx, _sc, _s, _e, text = res
    return list(zip(doc_idx.tolist(), node_idx.tolist(), text.to_pylist()))


def test_native_dom_lookups_match_python_on_goldens():
    docs = [g["html"] for g in _golden_docs()]
    for key, op_scan, op_tracked, pyfn in (
        (b"x", nd.OP_BY_ID, nd.OP_BY_ID_TRACKED, "id"),
        (b"a", nd.OP_BY_CLASS, nd.OP_BY_CLASS_TRACKED, "class"),
    ):
        for tracked, op in ((False, op_scan), (True, op_tracked)):
            native = _native_lookup(docs, op, key)
            py = []
            for d_i, doc in enumerate(docs):
                dom = parse(
                    doc, track_ids=tracked, track_classes=tracked
                )
                if pyfn == "id":
                    h = dom.get_element_by_id(key)
                    hits = [] if h is None else [h]
                else:
                    hits = dom.get_elements_by_class_name(key)
                for h in hits:
                    py.append((d_i, h, dom.inner_text(h)))
            assert native == py, (key, tracked)


def test_native_dom_outer_html_matches_python_on_goldens():
    docs = [g["html"] for g in _golden_docs()]
    col = pa.array(docs, type=pa.string())
    res = nd.dom_query_batch(col, nd.encode_params(nd.OP_DOC_OUTER_HTML))
    assert res is not None
    assert res[5].to_pylist() == [parse(d).dom_outer_html() for d in docs]


def _native_nodes(docs):
    col = pa.array(docs, type=pa.string())
    res = nd.parse_nodes_batch(col)
    assert res is not None
    rows = []
    ao = res["attr_offs"].tolist()
    keys = res["key"].to_pylist()
    vals = res["value"].to_pylist()
    present = res["val_present"].tolist()
    for r in range(res["n_rows"]):
        attrs = [
            (keys[a], vals[a] if present[a] else None)
            for a in range(ao[r], ao[r + 1])
        ]
        rows.append(
            (
                res["doc_idx"][r],
                res["node_idx"][r],
                res["kind"][r],
                # the Spark wrapper nulls names for non-tag rows via a
                # kind-derived validity bitmap; mirror that here
                res["name"][r].as_py() if res["kind"][r] == 0 else None,
                res["start"][r],
                res["end"][r],
                res["n_children"][r],
                res["parent"][r],
                attrs if res["kind"][r] == 0 else None,
            )
        )
    return rows


def _py_nodes(docs):
    rows = []
    for d_i, doc in enumerate(docs):
        dom = parse(doc)
        parent = [-1] * len(dom.nodes)
        for h, node in enumerate(dom.nodes):
            if node[0] == KIND_TAG:
                for c in node[3]:
                    parent[c] = h
        for h, node in enumerate(dom.nodes):
            s, e = dom.boundaries(h)
            if node[0] == KIND_TAG:
                name = node[1].decode("utf-8", "replace")
                nkids = len(node[3])
                attrs = [
                    (
                        k.decode("utf-8", "replace"),
                        None if v is None else v.decode("utf-8", "replace"),
                    )
                    for k, v in node[2].iter_all()
                ]
            else:
                name, nkids, attrs = None, 0, None
            rows.append((d_i, h, node[0], name, s, e, nkids, parent[h], attrs))
    return rows


def test_native_parse_nodes_matches_python_on_goldens():
    docs = [g["html"] for g in _golden_docs()]
    assert _native_nodes(docs) == _py_nodes(docs)


QUIRK_DOCS = [
    # attr spill (>2 raw attrs, dup keys inline vs spilled)
    '<a x="1" x="2">dup inline</a>',
    '<a x="1" y="2" x="3" z="4">spilled dedup</a>',
    '<a x="1" x="2" y="3">spill at third</a>',
    # unclosed elements: tracked vs scan lookups observably differ
    '<div id="x">unclosed',
    '<div id="x">a</div><p id="x">b',
    '<span class="a">one<span class="a">nested unclosed',
    # comment forms
    "<!-- normal --> <!--> <!-- -- > --> <!-- unterminated",
    "a<!---->b",
    # doctype forms + residue leak (splits the multibyte char)
    "<!doctype html>éresidue",
    "<!DOCTYPE HTML>x",
    "<!doctype xml>y",
    "<!doctypehtml>z",
    # void/self-close, name quirks
    "<br><br/><img src=x><command>text</command>",
    "<b/>after",
    # whitespace quirk: tab is NOT tag whitespace
    "<p\tclass='t'>tab</p>",
    "<p\nclass='n'>newline</p>",
    # valueless + unquoted + quote-follower consumption
    "<a disabled href=x'y q='v'w>t</a>",
    "<a k = 'v'>spaced eq</a>",
    # missing '>' drop
    "<a href='x'",
    "<p",
    # empty + text-only
    "",
    "plain text only",
    # empty ident name
    "<?php echo ?>",
    # nested class members with exotic ws
    '<i class="a\tb\x0cc d">ws</i>',
    '<i class=" ">empty members</i>',
]

QUIRK_SELECTORS = [
    "*",
    "a",
    "p",
    "#x",
    ".a",
    "[x]",
    "[x=1]",
    '[x="1"]',
    "[class~=b]",
    "[class^=a]",
    "[class$=d]",
    "[class*=b]",
    "a,p",
    "a p",
    "a>p",
    "i.a",
    "[disabled]",
    "[href^=x]",
]


def test_native_dom_quirk_docs_all_ops():
    for sel in QUIRK_SELECTORS:
        ast = parse_selector(sel)
        if ast is None:
            continue
        for mode in MODES:
            _assert_qs_equal(QUIRK_DOCS, sel, mode)
    assert _native_nodes(QUIRK_DOCS) == _py_nodes(QUIRK_DOCS)
    col = pa.array(QUIRK_DOCS, type=pa.string())
    res = nd.dom_query_batch(col, nd.encode_params(nd.OP_DOC_OUTER_HTML))
    assert res[5].to_pylist() == [
        parse(d).dom_outer_html() for d in QUIRK_DOCS
    ]
    for op, key in (
        (nd.OP_BY_ID, b"x"),
        (nd.OP_BY_ID_TRACKED, b"x"),
        (nd.OP_BY_CLASS, b"a"),
        (nd.OP_BY_CLASS_TRACKED, b"a"),
    ):
        tracked = op in (nd.OP_BY_ID_TRACKED, nd.OP_BY_CLASS_TRACKED)
        native = _native_lookup(QUIRK_DOCS, op, key)
        py = []
        for d_i, doc in enumerate(QUIRK_DOCS):
            dom = parse(doc, track_ids=tracked, track_classes=tracked)
            if key == b"x":
                h = dom.get_element_by_id(key)
                hits = [] if h is None else [h]
            else:
                hits = dom.get_elements_by_class_name(key)
            py.extend((d_i, h, dom.inner_text(h)) for h in hits)
        assert native == py, (op, key)


def test_native_dom_tracked_differs_from_scan_on_unclosed():
    """Sanity: the two id-lookup modes genuinely diverge on unclosed
    elements (so the quirk tests above exercise both codepaths)."""
    docs = ['<div id="q">unclosed']
    scan = _native_lookup(docs, nd.OP_BY_ID, b"q")
    tracked = _native_lookup(docs, nd.OP_BY_ID_TRACKED, b"q")
    assert scan and not tracked  # never closed => never registered


_HTMLISH = st.text(
    alphabet=(
        "<>/=\"' \n\t!-abcdiv spanclshrefx123é中"
    ),
    max_size=220,
)


@settings(max_examples=300, deadline=None)
@given(docs=st.lists(_HTMLISH, min_size=1, max_size=6))
def test_native_dom_fuzz_htmlish(docs):
    _assert_qs_equal(docs, "*", "outer_html")
    _assert_qs_equal(docs, "div", "inner_text")
    _assert_qs_equal(docs, ".cls", "inner_html")
    assert _native_nodes(docs) == _py_nodes(docs)


@settings(max_examples=120, deadline=None)
@given(docs=st.lists(st.text(max_size=160), min_size=1, max_size=4))
def test_native_dom_fuzz_full_unicode(docs):
    _assert_qs_equal(docs, "*", "inner_text")
    assert _native_nodes(docs) == _py_nodes(docs)


def test_native_dom_sliced_batches():
    docs = ["<p>a</p>", "", '<div id="x">b</div>', "", "<span>c</span>"]
    full = pa.array(docs, type=pa.string())
    ast = parse_selector("*")
    for start in range(len(docs)):
        col = full.slice(start)
        if len(col) == 0:
            continue
        res = nd.dom_query_batch(
            col, nd.encode_params(nd.OP_QS_EXTRACT, "outer_html", b"", ast)
        )
        assert res is not None
        native = list(zip(res[0].tolist(), res[5].to_pylist()))
        py = []
        for d_i, doc in enumerate(docs[start:]):
            dom = parse(doc)
            for h in range(len(dom.nodes)):
                if selector_matches(ast, dom, h):
                    py.append((d_i, dom.outer_html(h)))
        assert native == py, start
        pn = nd.parse_nodes_batch(col)
        assert pn is not None
        assert pn["n_rows"] == sum(
            len(parse(d).nodes) for d in docs[start:]
        )


def test_native_dom_batches_do_not_leak_memory():
    import gc
    import resource

    docs = [
        "<html><body><div class='x'>"
        + "<p id='k'>hello <b>world</b></p>" * 30
        + "</div></body></html>"
    ] * 300
    col = pa.array(docs, type=pa.string())
    ast = parse_selector("p")
    params = nd.encode_params(nd.OP_QS_EXTRACT, "outer_html", b"", ast)
    for _ in range(5):
        nd.dom_query_batch(col, params)
        nd.parse_nodes_batch(col)
    gc.collect()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for _ in range(150):
        assert nd.dom_query_batch(col, params) is not None
        assert nd.parse_nodes_batch(col) is not None
    gc.collect()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss1 - rss0) / 1024
    assert growth_mb < 150, f"RSS grew {growth_mb:.0f} MB over 300 calls"
