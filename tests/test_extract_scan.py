"""extract_scan (no-DOM single-pass) == DOM-route extraction, everywhere."""

import json
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

from tl_spark.functions.extract import (
    DEFAULT_STRIP_TAGS,
    _extract_bytes_flat,
    _extract_bytes_flat_dom,
)

GOLDENS = Path(__file__).parent / "goldens/corpus.jsonl"


def _both(buf):
    a = _extract_bytes_flat(buf, DEFAULT_STRIP_TAGS)
    b = _extract_bytes_flat_dom(buf, DEFAULT_STRIP_TAGS)
    return (a[0], list(a[1]), list(a[2]), a[3], a[4]), (
        b[0], list(b[1]), list(b[2]), b[3], b[4],
    )


def test_scan_equals_dom_on_golden_corpus():
    with GOLDENS.open() as f:
        for line in f:
            html = json.loads(line)["html"]
            buf = html.encode("utf-8")
            a, b = _both(buf)
            assert a == b, html


def test_scan_equals_dom_on_strip_heavy_docs():
    docs = [
        "<script>js<div>x</div></script>after",
        "<nav>menu<script>n</script></nav>text",
        "<script>never closes <p>lost",
        "<SCRIPT>not stripped (case)</SCRIPT>",
        "<script/>self-closed keeps tail",
        "<style>.a{}</style><main>keep</main>",
        "keep<nav>drop</nav>keep2<style>drop",
        "<div><nav>inner drop</nav>kept</div>",
        "<script></script>",
    ]
    for d in docs:
        a, b = _both(d.encode())
        assert a == b, d


@settings(max_examples=800, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("<>/!=\"' \n\tabcdiv pscriptnavstyle-_:+.&;09")
        ),
        max_size=250,
    )
)
def test_scan_equals_dom_fuzz(s):
    a, b = _both(s.encode("utf-8"))
    assert a == b
