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


# -------------------------------------------- round-3: minhash kernel


def _minhash_reference_one_doc(text, k=5, n_hashes=32, sample_mod=None):
    """Independent per-doc reference for _batch_minhash: plain Python
    loops over one document in isolation — no concatenation, no
    reduceat, no masking machinery to share bugs with."""
    import numpy as np

    b = text.encode("utf-8") if text else b""
    if len(b) < k:
        return None

    def hash_window(win: bytes, base: int) -> int:
        h = 0
        for byte in win:
            h = (h * base + byte) % (1 << 64)
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) % (1 << 64)
        h ^= h >> 29
        return h

    mins = [None] * n_hashes
    any_sampled = False
    for j in range(len(b) - k + 1):
        win = b[j : j + k]
        if sample_mod is not None and sample_mod > 1:
            if hash_window(win, 0x100000001B3) % sample_mod != 0:
                continue
        any_sampled = True
        for i in range(n_hashes):
            blk, r = divmod(i, 64)
            h1 = hash_window(win, 1000003 + 4 * blk)
            h2 = hash_window(win, (0x9E3779B97F4A7C15 | 1) + 4 * blk)
            rot = h2 if r == 0 else ((h2 << r) | (h2 >> (64 - r))) % (1 << 64)
            m = h1 ^ rot
            if mins[i] is None or m < mins[i]:
                mins[i] = m
    if not any_sampled:
        return None
    return [v - (1 << 64) if v >= (1 << 63) else v for v in mins]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([None, 2, 7]),
)
def test_batch_minhash_equals_per_doc_reference(texts, sample_mod):
    """The vectorized batch kernel (concatenated bytes, boundary
    masking, reduceat segments) must equal the naive one-doc-at-a-time
    reference for EVERY document in ANY batch composition — including
    multi-byte UTF-8, empties, Nones and sampled-out docs."""
    from tl_spark.operators.dedup import _batch_minhash

    got = _batch_minhash(texts, 5, 32, sample_mod)
    for d, t in enumerate(texts):
        want = _minhash_reference_one_doc(t, 5, 32, sample_mod)
        have = None if got[d] is None else [int(x) for x in got[d]]
        assert have == want, f"doc {d} ({t!r}): batch != reference"


def test_minhash_components_independent_past_64():
    """ADVICE r3: rot64(h2, i % 64) alone makes component i == i+64,
    silently duplicating signature slots for n_hashes > 64. Each
    64-block now draws fresh base hashes: components must differ
    across blocks, block 0 must stay byte-identical to the n<=64
    family, and the batch kernel must still match the per-doc
    reference at n_hashes=96."""
    from tl_spark.operators.dedup import _batch_minhash

    texts = ["the quick brown fox jumps over the lazy dog", "abcdefgh"]
    sigs96 = _batch_minhash(texts, 5, 96, None)
    sigs32 = _batch_minhash(texts, 5, 32, None)
    for d, t in enumerate(texts):
        s = [int(x) for x in sigs96[d]]
        assert s[:32] == [int(x) for x in sigs32[d]]  # block-0 stability
        assert s[:32] != s[64:96], f"doc {d}: block 1 duplicates block 0"
        assert s == _minhash_reference_one_doc(t, 5, 96, None)


# -------------------------------------------- round-4: simhash kernel


@settings(max_examples=120, deadline=None)
@given(
    st.binary(max_size=90),
)
def test_md5_low64_batch_equals_hashlib(token):
    """The vectorized single-block MD5 (RFC 1321 compression in numpy)
    must be bit-exact vs hashlib for every length — including the
    55/56-byte single/multi-block boundary and the empty string."""
    import hashlib

    from tl_spark.operators.dedup import _md5_low64_batch

    got = _md5_low64_batch([token, b"", b"x" * 55, b"y" * 56])
    for t, g in zip([token, b"", b"x" * 55, b"y" * 56], got):
        assert int(g) == int.from_bytes(
            hashlib.md5(t).digest()[:8], "little"
        ), t


def _simhash_reference_one_doc(text):
    """Independent per-doc SimHash reference: plain Python loops, one
    doc in isolation — no factorize/reduceat machinery to share bugs
    with the batch kernel."""
    import hashlib

    if not text:
        return 0
    toks = text.split()
    if not toks:
        return 0
    votes = [0] * 64
    for tok in toks:
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = sum(1 << b for b in range(64) if votes[b] > 0)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF),
                max_size=60,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_simhash_batch_equals_per_doc_reference(texts):
    """The round-4 vectorized SimHash (factorized token stream +
    batch MD5 + reduceat votes) must equal the naive per-doc reference
    for EVERY document in ANY batch composition — empties, Nones,
    whitespace-only and multi-byte UTF-8 included."""
    import pandas as pd

    from tl_spark.operators.dedup import _simhash64_impl

    got = _simhash64_impl(pd.Series(texts, dtype=object))
    for d, t in enumerate(texts):
        assert int(got[d]) == _simhash_reference_one_doc(t), f"doc {d}: {t!r}"
