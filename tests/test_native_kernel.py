"""Native scan kernel (ctypes cdylib) == Python extract_scan, everywhere.

The Python scanner is the semantic source of truth (itself pinned
against the DOM route and the golden corpus); the native kernel must be
byte-identical on text, spans, node counts and version — over the full
golden corpus, adversarial strip-heavy docs, and hypothesis fuzz. Tests
skip when the cdylib isn't present (it's optional by design).
"""

import json
from pathlib import Path

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tl_spark.functions.extract import DEFAULT_STRIP_TAGS
from tl_spark.kernel.htmlparse import extract_scan
from tl_spark.kernel.native import extract_batch_arrays, load

GOLDENS = Path(__file__).parent / "goldens/corpus.jsonl"

pytestmark = pytest.mark.skipif(
    load() is None, reason="native kernel not built/loadable"
)


def _native_batch(docs, strip_tags=DEFAULT_STRIP_TAGS):
    col = pa.array(docs, type=pa.string())
    res = extract_batch_arrays(col, strip_tags)
    assert res is not None
    text_arr, spans_arr, n_nodes_arr, version_arr = res
    # compare TEXT AT THE BYTE LEVEL: the doctype residue-leak quirk
    # can split a multi-byte char (both impls, by design — the machine
    # is byte-oriented), so .as_py() str decoding would throw on
    # byte-identical, correct output.
    bufs = text_arr.buffers()
    offs = memoryview(bufs[1]).cast("i")
    data = bytes(memoryview(bufs[2])) if bufs[2] is not None else b""
    out = []
    for i in range(len(docs)):
        out.append(
            (
                data[offs[i] : offs[i + 1]],
                [(s["start"], s["end"]) for s in spans_arr[i].as_py()],
                n_nodes_arr[i].as_py(),
                version_arr[i].as_py(),
            )
        )
    return out


def _python_one(doc, strip_tags=DEFAULT_STRIP_TAGS):
    text, spans, n_nodes, version = extract_scan(
        doc.encode("utf-8"), strip_tags
    )
    return (text, [tuple(s) for s in spans], n_nodes, version)


def _assert_equal(docs, strip_tags=DEFAULT_STRIP_TAGS):
    got = _native_batch(docs, strip_tags)
    for d, doc in enumerate(docs):
        want = _python_one(doc, strip_tags)
        assert got[d] == want, f"doc {d}: {doc!r}\n rs={got[d]}\n py={want}"


def test_native_equals_python_on_golden_corpus():
    with GOLDENS.open() as f:
        docs = [json.loads(line)["html"] for line in f]
    # batch them the way Arrow would (multiple docs per call)
    for k in range(0, len(docs), 128):
        _assert_equal(docs[k : k + 128])


def test_native_equals_python_on_adversarial_docs():
    docs = [
        "",
        "no tags",
        "a<b",
        "<",
        "< ",
        "<p>unclosed",
        "<>anon</>",
        "<!doctype html><p>x</p>",
        "<!DOCTYPE HTML><p>x</p>",
        "<!doctype xhtml><p>x</p>",
        "<!unknown>leak>",
        "<!-->instant close",
        "<!--never closes",
        "<!-- a -- b -->tail",
        "<script>drop<p>inner</p></script>kept",
        "<script>never closes <p>lost",
        "<nav><script>double strip</script></nav>t",
        "<div attr=unquoted>t</div>",
        "<div a = 'sp'>t</div>",
        "<div a='x\"y'>t</div>",
        "<br/><img src='x'><p>t</p>",
        "<p\n class='a'\n>t</p>",
        "<\np>ws name</p>",
        "</p>stray close",
        "<p><p><p>deep</p></p></p>",
        "<p>a</P>case close",
        "<div/>self closed non-void",
        "<area><base><wbr>voids",
        "t1<!-- c -->t2<script>s</script>t3",
        "<html a='1' b=\"2\" c>mixed</html>",
        "é unicode <p>café</p> ☃",
    ]
    _assert_equal(docs)


def test_native_respects_strip_tag_set():
    docs = ["<aside>x</aside><p>y</p>", "<p>z</p>"]
    _assert_equal(docs, frozenset((b"aside", b"p")))
    _assert_equal(docs, frozenset())


@settings(max_examples=500, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("<>/!=\"' \n\tabcdiv pscriptnavstyle-_:+.&;09é")
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_native_equals_python_fuzz(docs):
    _assert_equal(docs)


def test_fast_batch_uses_native_and_matches_python(monkeypatch):
    """The Arrow fast path must produce identical RecordBatches with the
    native kernel on and off (the off path is the proven Python
    scanner)."""
    from tl_spark.functions import extract as E

    docs = [
        "<html><body><p>hello</p><script>x</script>t</body></html>",
        "plain",
        "<!doctype html><div a='1'>d</div>",
    ]
    batch = pa.RecordBatch.from_arrays(
        [pa.array([1, 2, 3], type=pa.int64()), pa.array(docs)],
        names=["rid", "text"],
    )
    fn = E._make_arrow_fn("text", ["rid"], DEFAULT_STRIP_TAGS)
    with_native = list(fn(iter([batch])))
    monkeypatch.setattr(E, "_native_extract_batch", lambda col, st: None)
    without = list(fn(iter([batch])))
    assert len(with_native) == len(without) == 1
    assert with_native[0].equals(without[0])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(max_size=120),  # FULL unicode range, not just the
        min_size=1,             # html-ish alphabet
        max_size=4,
    )
)
def test_native_equals_python_fuzz_full_unicode(docs):
    """Differential fuzz over arbitrary unicode (surrogates excluded by
    hypothesis; Arrow strings are valid UTF-8 by construction) — the
    native byte machine must track the Python scanner on text far
    outside the html-ish alphabet."""
    _assert_equal(docs)


def test_native_batches_do_not_leak_memory():
    """The foreign-buffer protocol (malloc'd arrays + holder __del__ ->
    tl_batch_free) must return memory: process RSS growth over 300
    batches x ~1.2 MB of input+output stays far below the ~700 MB that
    leaking either side would accumulate."""
    import gc
    import resource

    docs = [
        "<html><body><main>" + "<p class='x'>hello world</p>" * 40
        + "</main><script>drop()</script></body></html>"
    ] * 500
    col = pa.array(docs, type=pa.string())
    for _ in range(5):  # warm allocators
        extract_batch_arrays(col, DEFAULT_STRIP_TAGS)
    gc.collect()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for _ in range(300):
        res = extract_batch_arrays(col, DEFAULT_STRIP_TAGS)
        assert res is not None
        del res
    gc.collect()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss1 - rss0) / 1024  # ru_maxrss is KB on Linux
    assert growth_mb < 120, f"RSS grew {growth_mb:.0f} MB over 300 batches"


def _read_text_bytes(text_arr, n):
    """Byte-level text column read (see _native_batch for why)."""
    bufs = text_arr.buffers()
    offs = memoryview(bufs[1]).cast("i")
    data = bytes(memoryview(bufs[2])) if bufs[2] is not None else b""
    return [data[offs[i] : offs[i + 1]] for i in range(n)]


def test_native_sliced_all_empty_batch_does_not_abort():
    """ADVICE r4 (medium): a sliced Arrow batch (col.offset > 0) whose
    docs are ALL empty strings preceded by non-empty data has
    offs[base] == offs[base+n] > 0; the kernel used to leave `data` as
    an empty slice and panic at `&data[s..e]` with s=e>0 — a panic
    across the extern "C" boundary that SIGABRTs the whole worker
    process (uncatchable from Python). Must return empty outputs."""
    full = pa.array(["<p>hello</p>", "", "", ""], type=pa.string())
    col = full.slice(1)  # 3 empty docs; non-empty parent data buffer
    assert col.offset > 0
    res = extract_batch_arrays(col, DEFAULT_STRIP_TAGS)
    assert res is not None
    text_arr, spans_arr, n_nodes_arr, version_arr = res
    assert _read_text_bytes(text_arr, 3) == [b"", b"", b""]
    for i in range(3):
        assert spans_arr[i].as_py() == []
        assert n_nodes_arr[i].as_py() == 0
        assert version_arr[i].as_py() is None


def test_native_sliced_batches_match_python_at_every_offset():
    """Sliced batches (absolute Arrow offsets) must equal the Python
    scanner doc-for-doc at every slice start, including slices that
    begin or end on empty docs."""
    docs = ["<div>a</div>", "", "<p>x <b>y</b></p>", "", "<span>z</span>", ""]
    full = pa.array(docs, type=pa.string())
    for start in range(len(docs)):
        col = full.slice(start)
        if len(col) == 0:
            continue
        res = extract_batch_arrays(col, DEFAULT_STRIP_TAGS)
        assert res is not None
        texts = _read_text_bytes(res[0], len(col))
        for i, doc in enumerate(docs[start:]):
            exp_text, exp_spans, exp_nodes, exp_ver = _python_one(doc)
            assert texts[i] == exp_text, (start, i)
            assert [
                (s["start"], s["end"]) for s in res[1][i].as_py()
            ] == list(exp_spans)
            assert res[2][i].as_py() == exp_nodes
            assert res[3][i].as_py() == exp_ver
