"""Property-based robustness: the kernel never crashes/hangs and its
structural invariants hold for arbitrary input. (Byte-parity with the
reference is covered by tests/test_goldens.py; these properties guard
the invariants the Spark layer relies on.)"""

from hypothesis import given, settings
from hypothesis import strategies as st

from tl_spark.functions.extract import extract_document
from tl_spark.kernel import KIND_RAW, KIND_TAG, parse

html_text = st.text(
    alphabet=st.sampled_from(
        list("<>/!=\"' \n\t\rabcdePÆ☃-_:+.#[]~^$*,&;0123456789\x00")
    ),
    max_size=300,
)


@settings(max_examples=500, deadline=None)
@given(html_text)
def test_parse_never_crashes_and_invariants(s):
    dom = parse(s)
    buf_len = len(s.encode("utf-8"))
    n = len(dom.nodes)
    assert dom.children() == sorted(dom.children())
    for h in dom.children():
        assert 0 <= h < n
    for h, node in enumerate(dom.nodes):
        start, end = dom.boundaries(h)
        # inclusive span within the source (empty spans: end == start-1)
        assert 0 <= start <= buf_len
        assert end >= start - 1
        assert end < buf_len
        if node[0] == KIND_TAG:
            for c in node[3]:
                assert h < c < n  # children come after their parent
            rng = dom.subtree_range(h)
            if rng is not None:
                assert node[3][0] == rng[0]
                assert rng[1] >= rng[0]
        # raw bytes of the node are literally in the source
        raw = dom.raw_bytes(h)
        assert raw == s.encode("utf-8")[start:end + 1] or raw == b""


@settings(max_examples=300, deadline=None)
@given(html_text)
def test_extract_document_never_crashes(s):
    text, spans, n_nodes, version, err = extract_document(s)
    assert err is None
    buf_len = len(s.encode("utf-8"))
    for sp in spans or []:
        assert 0 <= sp["start"] <= buf_len
        assert sp["start"] - 1 <= sp["end"] < buf_len


@settings(max_examples=200, deadline=None)
@given(html_text)
def test_serializers_never_crash(s):
    dom = parse(s)
    dom.dom_outer_html()
    dom.dom_inner_text()
    for h in range(len(dom.nodes)):
        dom.inner_html(h)


@settings(max_examples=200, deadline=None)
@given(html_text, st.sampled_from([".a", "#x", "p", "[href]", "*", "p.a,#x"]))
def test_selectors_never_crash(s, sel):
    dom = parse(s)
    hits = dom.query_selector(sel)
    if hits is not None:
        for h in hits:
            assert 0 <= h < len(dom.nodes)
