"""Density-based main-content selection: the DOM-heuristics leg of
the north rule's "HTML boilerplate strip, PDF/layout parse, DOM
heuristics" triad.

The fixed-tag strip (functions/extract.py DEFAULT_STRIP_TAGS) removes
script/style/nav subtrees but keeps every other block — headers,
sidebars, footers, related-links rails all survive. This module adds
the classic text/link-density family of heuristics (the public
Readability / Boilerpipe lineage: score blocks by how much of their
text is link anchor text, pick the densest content block), defined
here with EXACT, closed-form semantics so the operator is
driver-oracle checkable:

- **Candidates** are elements with tag in ``CANDIDATE_TAGS``
  (div/article/section/main/td/body).
- **Own text** of a candidate is its descendant Raw text EXCLUDING
  text inside any nested candidate (each text node is attributed to
  its NEAREST candidate ancestor), with ``SCORE_STRIP_TAGS``
  (script/style/noscript/template) subtrees excluded. Lengths are in
  BYTES of the raw source (deterministic; no entity decoding — the
  kernel's inner_text semantics).
- **Link text** is own text lying inside an ``<a>`` subtree.
- ``link_density = own_link_len / own_len`` (0 when own_len is 0) and
  ``score = own_len * (1 - link_density)^2`` — long blocks win, links
  punish quadratically (a nav bar of pure links scores 0 regardless
  of length).
- **Winner**: highest score; ties break to the EARLIEST start offset.
  When no candidate scores > 0 the whole document is the fallback
  (equivalent to the fixed-tag extraction).
- **Output**: the winner's full ``inner_text`` (nested candidates
  included — the winner is a container, not a partition), its
  inclusive byte span, tag name, and score.

Scale posture: map-only Arrow batches over the same kernel arena the
flagship extraction uses — one extra O(nodes) attribution pass, zero
shuffle, no Python-per-row UDFs.

Reference parity note: the reference engine (an HTML parser library)
exposes no content-scoring API; this is pipeline scope layered ON TOP
of the §2-parity kernel (SURVEY.md §6).
"""

from __future__ import annotations

from typing import Iterator

from tl_spark.kernel.htmlparse import (
    KIND_COMMENT,
    KIND_RAW,
    KIND_TAG,
    _CHILDREN,
    _E,
    _NAME,
    _S,
    parse,
)

__all__ = [
    "CANDIDATE_TAGS",
    "SCORE_STRIP_TAGS",
    "score_candidates",
    "select_main_content",
    "main_content_extract",
    "MAIN_HTML_VARIANTS",
    "docs_as_variant_html",
]

CANDIDATE_TAGS = frozenset(
    (b"div", b"article", b"section", b"main", b"td", b"body")
)
SCORE_STRIP_TAGS = frozenset(
    (b"script", b"style", b"noscript", b"template")
)


def score_candidates(dom) -> list[dict]:
    """One O(nodes) pass attributing each Raw text node to its nearest
    candidate ancestor; returns per-candidate dicts in document order:
    handle, tag, own_len, own_link_len, link_density, score."""
    nodes = dom.nodes
    cands: dict[int, list] = {}  # handle -> [own_len, own_link_len]
    order: list[int] = []
    # explicit stack of (handle, nearest_candidate, link_depth)
    stack = [(h, -1, 0) for h in reversed(dom.children())]
    while stack:
        h, near, link = stack.pop()
        nd = nodes[h]
        kind = nd[0]
        if kind == KIND_RAW:
            if near >= 0:
                ln = nd[_E] - nd[_S]
                acc = cands[near]
                acc[0] += ln
                if link:
                    acc[1] += ln
            continue
        if kind == KIND_COMMENT:
            continue
        name = nd[_NAME]
        if name in SCORE_STRIP_TAGS:
            continue
        if name in CANDIDATE_TAGS:
            cands[h] = [0, 0]
            order.append(h)
            near = h
        if name == b"a":
            link += 1
        for c in reversed(nd[_CHILDREN]):
            stack.append((c, near, link))
    out = []
    for h in order:
        own, link_len = cands[h]
        ld = link_len / own if own else 0.0
        out.append(
            {
                "handle": h,
                "tag": nodes[h][_NAME].decode("latin-1"),
                "own_len": own,
                "own_link_len": link_len,
                "link_density": ld,
                "score": own * (1.0 - ld) ** 2,
            }
        )
    return out


def select_main_content(html) -> dict:
    """Parse + score + select. Returns dict(text, start, end, tag,
    score, n_candidates); the fallback (no scoring candidate) has
    tag="" and the whole-document text/span."""
    buf = html.encode("utf-8") if isinstance(html, str) else bytes(html)
    dom = parse(buf)
    cands = score_candidates(dom)
    best = None
    for c in cands:  # document order: ties keep the earliest
        if c["score"] > 0 and (best is None or c["score"] > best["score"]):
            best = c
    if best is None:
        text = "".join(
            dom.inner_text(h, strip_tags=SCORE_STRIP_TAGS)
            for h in dom.children()
        )
        return {
            "text": text,
            "start": 0,
            "end": max(0, len(buf) - 1),
            "tag": "",
            "score": 0.0,
            "n_candidates": len(cands),
        }
    h = best["handle"]
    start, end = dom.boundaries(h)
    return {
        "text": dom.inner_text(h, strip_tags=SCORE_STRIP_TAGS),
        "start": start,
        "end": end,
        "tag": best["tag"],
        "score": best["score"],
        "n_candidates": len(cands),
    }


_SCHEMA_SUFFIX = (
    "main_text string, span_start long, span_end long, "
    "main_tag string, score double, n_candidates long"
)

_CAND_NAMES = [t.decode() for t in sorted(CANDIDATE_TAGS)]
_STRIP_NAMES = [t.decode() for t in sorted(SCORE_STRIP_TAGS)]


def _native_main_content_batch(col):
    """Arena-array implementation of :func:`select_main_content` for a
    whole pyarrow StringArray: the native DOM kernel parses the batch
    (round-8 probe: 0.98 s vs 4.27 s pure-Python parse for the 200k
    realhtml corpus), and the scoring pass — nearest-candidate / link
    / strip attribution — runs over the flat (kind, name, start, end,
    parent) arrays instead of re-walking Python node tuples. Returns
    (texts, starts, ends, tags, scores, ncands) lists or None when the
    native DOM is unavailable (caller falls back to the Python path).
    Value parity with select_main_content is pinned by
    tests/test_readability.py::test_native_main_content_parity (incl.
    the golden corpus).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from tl_spark.kernel import native_dom

    if col.null_count != 0 or not pa.types.is_string(col.type):
        return None
    res = native_dom.parse_nodes_batch(col)
    if res is None:
        return None
    kind = res["kind"]
    start = res["start"]
    end = res["end"]
    parent = res["parent"]
    doc_idx = res["doc_idx"]
    names = res["name"]
    is_tag = kind == 0
    is_raw = kind == 1

    def name_mask(vals):
        m = pc.is_in(names, value_set=pa.array(vals, type=pa.string()))
        return m.to_numpy(zero_copy_only=False) & is_tag

    cand = name_mask(_CAND_NAMES)
    strip = name_mask(_STRIP_NAMES)
    link = name_mask(["a"])

    n_docs = len(col)
    bounds = np.searchsorted(doc_idx, np.arange(n_docs + 1)).tolist()
    bufs = col.buffers()
    offs = np.frombuffer(
        bufs[1], dtype=np.int32, count=n_docs + 1 + col.offset
    )
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    base = col.offset

    # one vectorized pass builds plain-int lists for the per-node scan
    # (numpy SCALAR indexing in a hot Python loop is ~10x a list index
    # — it made the first cut of this leg slower than the Python parse)
    CAND, STRIP, LINK, RAW = 1, 2, 4, 8
    codes = (
        cand.astype(np.uint8) * CAND
        + strip.astype(np.uint8) * STRIP
        + link.astype(np.uint8) * LINK
        + is_raw.astype(np.uint8) * RAW
    ).tolist()
    parent_l = parent.tolist()
    start_l = start.tolist()
    end_l = end.tolist()

    texts, starts_o, ends_o, tags, scores, ncands = [], [], [], [], [], []
    for d in range(n_docs):
        d0, d1 = bounds[d], bounds[d + 1]
        k = d1 - d0
        s0, s1 = int(offs[base + d]), int(offs[base + d + 1])
        doc = data[s0:s1].tobytes()
        near = [-1] * k
        instrip = [False] * k
        # fallback-path strip mask mirrors inner_text's root
        # transparency (h != handle): a TOP-LEVEL strip tag's own
        # subtree is NOT stripped when the whole document is the
        # traversal root, only strips strictly below a top-level child
        fbstrip = [False] * k
        inlink = [False] * k
        own = [0] * k
        ownl = [0] * k
        order = []
        for j in range(k):
            g = d0 + j
            c = codes[g]
            p = parent_l[g]
            if p >= 0:
                pin = instrip[p]
                ins = pin or bool(c & STRIP)
                instrip[j] = ins
                fbstrip[j] = fbstrip[p] or (
                    bool(codes[d0 + p] & STRIP) and parent_l[d0 + p] >= 0
                )
                inlink[j] = inlink[p] or bool(c & LINK)
                nr = near[p]
            else:
                pin = False
                ins = bool(c & STRIP)
                instrip[j] = ins
                inlink[j] = bool(c & LINK)
                nr = -1
            if (c & CAND) and not pin:
                near[j] = j
                order.append(j)
                continue
            near[j] = nr
            if (c & RAW) and nr >= 0 and not instrip[j]:
                ln = end_l[g] - start_l[g] + 1
                own[nr] += ln
                if inlink[j]:
                    ownl[nr] += ln
        best = -1
        best_score = 0.0
        for j in order:  # document order: ties keep the earliest
            o = own[j]
            ld = ownl[j] / o if o else 0.0
            sc = o * (1.0 - ld) ** 2
            if sc > 0 and (best < 0 or sc > best_score):
                best = j
                best_score = sc
        if best < 0:
            raws = [
                doc[start_l[g]:end_l[g] + 1]
                for g in range(d0, d1)
                if (codes[g] & RAW) and not fbstrip[g - d0]
            ]
            texts.append(b"".join(raws).decode("utf-8", "replace"))
            starts_o.append(0)
            ends_o.append(max(0, len(doc) - 1))
            tags.append("")
            scores.append(0.0)
            ncands.append(len(order))
            continue
        # subtree extent: descendants are a contiguous index run whose
        # parents all lie inside the run; the first node whose parent
        # precedes `best` (an ancestor or earlier sibling's parent —
        # parents always precede children in arena order) ends it
        ext = best + 1
        while ext < k and parent_l[d0 + ext] >= best:
            ext += 1
        raws = [
            doc[start_l[g]:end_l[g] + 1]
            for g in range(d0 + best + 1, d0 + ext)
            if (codes[g] & RAW) and not instrip[g - d0]
        ]
        texts.append(b"".join(raws).decode("utf-8", "replace"))
        starts_o.append(start_l[d0 + best])
        ends_o.append(end_l[d0 + best])
        tags.append(names[d0 + best].as_py())
        scores.append(best_score)
        ncands.append(len(order))
    return texts, starts_o, ends_o, tags, scores, ncands


def main_content_extract(
    df,
    html_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple = (),
    on_error: str = "raise",
):
    """Density-selected main content per document: map-only Arrow
    batches, zero shuffle. ``on_error="skip"`` drops rows whose HTML
    the kernel refuses (the corpus posture)."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
    )

    _check_on_error(on_error)
    keep = [id_col, *passthrough]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            try:
                native = _native_main_content_batch(batch.column(html_col))
            except Exception:
                native = None
            if native is not None:
                texts, starts, ends, tags, scores, ncs = native
                arrays = [batch.column(c) for c in keep]
                arrays += [
                    pa.array(texts, type=pa.string()),
                    pa.array(starts, type=pa.int64()),
                    pa.array(ends, type=pa.int64()),
                    pa.array(tags, type=pa.string()),
                    pa.array(scores, type=pa.float64()),
                    pa.array(ncs, type=pa.int64()),
                ]
                yield pa.RecordBatch.from_arrays(
                    arrays,
                    names=keep
                    + ["main_text", "span_start", "span_end", "main_tag",
                       "score", "n_candidates"],
                )
                continue
            htmls = batch.column(html_col).to_pylist()
            idx = []
            texts, starts, ends, tags, scores, ncs = [], [], [], [], [], []
            for j, s in enumerate(htmls):
                try:
                    r = _malformed_as_valueerror(
                        select_main_content, s, "HTML"
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                idx.append(j)
                texts.append(r["text"])
                starts.append(r["start"])
                ends.append(r["end"])
                tags.append(r["tag"])
                scores.append(r["score"])
                ncs.append(r["n_candidates"])
            take = pa.array(idx, type=pa.int32())
            arrays = [batch.column(c).take(take) for c in keep]
            arrays += [
                pa.array(texts, type=pa.string()),
                pa.array(starts, type=pa.int64()),
                pa.array(ends, type=pa.int64()),
                pa.array(tags, type=pa.string()),
                pa.array(scores, type=pa.float64()),
                pa.array(ncs, type=pa.int64()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=keep
                + ["main_text", "span_start", "span_end", "main_tag",
                   "score", "n_candidates"],
            )

    src = df.select(*keep, html_col)
    fields = ", ".join(
        f"{c} {t}" for c, t in zip(keep, [dict(src.dtypes)[c] for c in keep])
    )
    return src.mapInArrow(fn, f"{fields}, {_SCHEMA_SUFFIX}")


# ---------------------------------------------------------------------------
# Deterministic page templating (driver-oracle harness)
# ---------------------------------------------------------------------------

# Three realistic page shells around the document text. In every
# variant the content block's own text dominates every decoy block by
# construction (decoy scores are constants <= 24; the content block's
# own text is >= 44-char document text + "Heading " + "read more", so
# its score stays >= ~43 for the shortest document in the test data),
# making the winner — and therefore main_text — a CLOSED FORM of the
# documents table: "Heading " || text || "read more".
_V0 = (
    '<html><head><title>page</title><style>p{margin:0}</style></head>'
    '<body><div id="nav"><a href="/">home</a><a href="/a">archive</a>'
    '<a href="/b">about us</a></div><div id="main"><h1>Heading </h1><p>',
    '</p><a href="/more">read more</a></div><div id="side">'
    '<a href="/1">one story</a><a href="/2">two story</a>'
    '<a href="/3">three story</a></div><div id="foot">'
    '<a href="/tos">terms</a></div></body></html>',
)
_V1 = (
    '<html><body><div id="side"><a href="/1">one story</a>'
    '<a href="/2">two story</a></div><section><div id="main">'
    '<h1>Heading </h1><p>',
    '</p><a href="/more">read more</a></div></section>'
    '<div id="comments">short comment thread</div>'  # 20 chars, no links
    '<div id="foot"><a href="/tos">terms</a> fineprint</div></body></html>',
)
_V2 = (
    '<html><head><script>var x=1;</script></head><body>'
    '<table><tr><td><a href="/l">left rail</a></td><td>'
    '<div id="main"><h1>Heading </h1><p>',
    '</p><a href="/more">read more</a></div></td></tr></table>'
    '<div id="foot">tiny footer text<a href="/c">contact</a></div>'
    '</body></html>',
)
MAIN_HTML_VARIANTS = (_V0, _V1, _V2)


def docs_as_variant_html(df, id_col: str = "doc_id", text_col: str = "text"):
    """Wrap each document's text in one of the three page shells
    (doc_id % 3), Spark-side with JVM string concat — no UDF."""
    from pyspark.sql import functions as F

    cases = None
    for k, (pre, post) in enumerate(MAIN_HTML_VARIANTS):
        expr = F.concat(F.lit(pre), F.col(text_col), F.lit(post))
        cond = F.col(id_col) % 3 == k
        cases = F.when(cond, expr) if cases is None else cases.when(cond, expr)
    return df.select(id_col, cases.alias(text_col))
