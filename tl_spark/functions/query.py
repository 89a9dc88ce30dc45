"""DataFrame surface for the reference's lookup/query operators
(SURVEY.md §2.C/§2.D): CSS-selector extraction, get_element_by_id,
get_elements_by_class_name — all Arrow-batch, selector compiled ONCE on
the driver and validated before shipping (a bad selector fails fast,
not per-row).

Each op is map-only; output rows may exceed input rows (one per match)
— legitimate RecordBatch expansion, same pattern as frame sampling.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from tl_spark.kernel.selector import parse_selector


def query_selector_extract(
    df,
    selector: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "inner_text",
):
    """One output row per (document, matching node).

    ``mode``: inner_text | inner_html | outer_html | raw.
    Matching follows the reference exactly, including the dead
    Descendant/Parent combinators (selector.rs:72).

    Raises ValueError on an unparseable selector (mirrors
    ``query_selector`` returning None — but at plan time, not inside
    executors).
    """
    if mode not in ("inner_text", "inner_html", "outer_html", "raw"):
        raise ValueError(f"unknown mode {mode!r}")
    ast = parse_selector(selector)
    if ast is None:
        raise ValueError(
            f"selector {selector!r} does not parse under the reference "
            "grammar (only ' ' is whitespace; attr values use the ident "
            "charset even when quoted)"
        )
    # params blob for the native DOM kernel, compiled once on the
    # driver (the AST travels pre-encoded; the Rust side only matches)
    from tl_spark.kernel import native_dom as _nd

    params = _nd.encode_params(_nd.OP_QS_EXTRACT, mode, b"", ast)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from tl_spark.kernel import native_dom
        from tl_spark.kernel.htmlparse import parse
        from tl_spark.kernel.selector import selector_matches

        for batch in batches:
            res = native_dom.dom_query_batch(batch.column(text_col), params)
            if res is not None:
                doc_idx, node_idx, _scope, start, end, text = res
                ids_np = batch.column(id_col).to_numpy()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids_np[doc_idx], type=pa.int64()),
                        pa.array(node_idx, type=pa.int32()),
                        text,
                        pa.array(start, type=pa.int32()),
                        pa.array(end, type=pa.int32()),
                    ],
                    names=[id_col, "node_idx", mode, "start", "end"],
                )
                continue
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            o_id, o_node, o_val, o_s, o_e = [], [], [], [], []
            for docid, t in zip(ids, texts):
                dom = parse(t or "")
                for h in range(len(dom.nodes)):
                    if not selector_matches(ast, dom, h):
                        continue
                    if mode == "inner_text":
                        val = dom.inner_text(h)
                    elif mode == "inner_html":
                        val = dom.inner_html(h)
                    elif mode == "outer_html":
                        val = dom.outer_html(h)
                    else:
                        val = dom.raw_bytes(h).decode("utf-8", "replace")
                    s, e = dom.boundaries(h)
                    o_id.append(docid)
                    o_node.append(h)
                    o_val.append(val)
                    o_s.append(s)
                    o_e.append(e)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_node, type=pa.int32()),
                    pa.array(o_val, type=pa.string()),
                    pa.array(o_s, type=pa.int32()),
                    pa.array(o_e, type=pa.int32()),
                ],
                names=[id_col, "node_idx", mode, "start", "end"],
            )

    narrowed = df.select(id_col, text_col)
    return narrowed.mapInArrow(
        fn,
        f"{id_col} long, node_idx int, {mode} string, start int, end int",
    )


def get_elements_by_id(
    df,
    element_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tracked: bool = False,
):
    """Per-document get_element_by_id (vdom.rs:43-63).

    ``tracked`` selects the close-time-map mode; default is the
    reference's default linear-scan mode. The two modes differ
    observably on unclosed elements (SURVEY.md §1.4) — both ship.
    Output: one row per document WITH a hit (node handle + inner_text).
    """
    from tl_spark.kernel import native_dom as _nd

    params = _nd.encode_params(
        _nd.OP_BY_ID_TRACKED if tracked else _nd.OP_BY_ID,
        key=element_id.encode("utf-8"),
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from tl_spark.kernel import native_dom
        from tl_spark.kernel.htmlparse import parse

        for batch in batches:
            res = native_dom.dom_query_batch(batch.column(text_col), params)
            if res is not None:
                doc_idx, node_idx, _scope, _s, _e, text = res
                ids_np = batch.column(id_col).to_numpy()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids_np[doc_idx], type=pa.int64()),
                        pa.array(node_idx, type=pa.int32()),
                        text,
                    ],
                    names=[id_col, "node_idx", "inner_text"],
                )
                continue
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            o_id, o_node, o_text = [], [], []
            for docid, t in zip(ids, texts):
                dom = parse(t or "", track_ids=tracked)
                h = dom.get_element_by_id(element_id)
                if h is None:
                    continue
                o_id.append(docid)
                o_node.append(h)
                o_text.append(dom.inner_text(h))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_node, type=pa.int32()),
                    pa.array(o_text, type=pa.string()),
                ],
                names=[id_col, "node_idx", "inner_text"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, node_idx int, inner_text string"
    )


def get_elements_by_class(
    df,
    class_name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tracked: bool = False,
):
    """Per-document get_elements_by_class_name (vdom.rs:66-95); one
    output row per matching element."""
    from tl_spark.kernel import native_dom as _nd

    params = _nd.encode_params(
        _nd.OP_BY_CLASS_TRACKED if tracked else _nd.OP_BY_CLASS,
        key=class_name.encode("utf-8"),
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from tl_spark.kernel import native_dom
        from tl_spark.kernel.htmlparse import parse

        for batch in batches:
            res = native_dom.dom_query_batch(batch.column(text_col), params)
            if res is not None:
                doc_idx, node_idx, _scope, _s, _e, text = res
                ids_np = batch.column(id_col).to_numpy()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids_np[doc_idx], type=pa.int64()),
                        pa.array(node_idx, type=pa.int32()),
                        text,
                    ],
                    names=[id_col, "node_idx", "inner_text"],
                )
                continue
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            o_id, o_node, o_text = [], [], []
            for docid, t in zip(ids, texts):
                dom = parse(t or "", track_classes=tracked)
                for h in dom.get_elements_by_class_name(class_name):
                    o_id.append(docid)
                    o_node.append(h)
                    o_text.append(dom.inner_text(h))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_node, type=pa.int32()),
                    pa.array(o_text, type=pa.string()),
                ],
                names=[id_col, "node_idx", "inner_text"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, node_idx int, inner_text string"
    )


def query_selector_scoped(
    df,
    scope_selector: str,
    selector: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "inner_text",
):
    """Subtree-scoped selector query: per document, take the FIRST node
    matching ``scope_selector`` (document-scope match order — what a
    reference user gets from ``query_selector(..).next()``), then match
    ``selector`` only inside that node's contiguous subtree slice
    (HTMLTag::query_selector, src/queryselector/iterable.rs:50-77 — the
    reference iterates the tag's inclusive handle range, NOT the whole
    arena).

    Output: one row per (document, subtree match): (id, scope_idx,
    node_idx, <mode>, start, end). Documents with no scope match yield
    no rows. Map-only Arrow-batch op; both selectors are compiled and
    validated once on the driver.
    """
    if mode not in ("inner_text", "inner_html", "outer_html", "raw"):
        raise ValueError(f"unknown mode {mode!r}")
    scope_ast = parse_selector(scope_selector)
    if scope_ast is None:
        raise ValueError(f"scope selector {scope_selector!r} does not parse")
    ast = parse_selector(selector)
    if ast is None:
        raise ValueError(f"selector {selector!r} does not parse")
    from tl_spark.kernel import native_dom as _nd

    params = _nd.encode_params(
        _nd.OP_QS_SCOPED, mode, b"", ast, scope_ast
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from tl_spark.kernel import native_dom
        from tl_spark.kernel.htmlparse import parse
        from tl_spark.kernel.selector import selector_matches

        for batch in batches:
            res = native_dom.dom_query_batch(batch.column(text_col), params)
            if res is not None:
                doc_idx, node_idx, scope_idx, start, end, text = res
                ids_np = batch.column(id_col).to_numpy()
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids_np[doc_idx], type=pa.int64()),
                        pa.array(scope_idx, type=pa.int32()),
                        pa.array(node_idx, type=pa.int32()),
                        text,
                        pa.array(start, type=pa.int32()),
                        pa.array(end, type=pa.int32()),
                    ],
                    names=[
                        id_col, "scope_idx", "node_idx", mode, "start", "end",
                    ],
                )
                continue
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            o_id, o_scope, o_node, o_val, o_s, o_e = [], [], [], [], [], []
            for docid, t in zip(ids, texts):
                dom = parse(t or "")
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
                hits = dom.tag_query_selector(scope, selector)
                for h in hits or []:
                    if mode == "inner_text":
                        val = dom.inner_text(h)
                    elif mode == "inner_html":
                        val = dom.inner_html(h)
                    elif mode == "outer_html":
                        val = dom.outer_html(h)
                    else:
                        val = dom.raw_bytes(h).decode("utf-8", "replace")
                    s, e = dom.boundaries(h)
                    o_id.append(docid)
                    o_scope.append(scope)
                    o_node.append(h)
                    o_val.append(val)
                    o_s.append(s)
                    o_e.append(e)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_scope, type=pa.int32()),
                    pa.array(o_node, type=pa.int32()),
                    pa.array(o_val, type=pa.string()),
                    pa.array(o_s, type=pa.int32()),
                    pa.array(o_e, type=pa.int32()),
                ],
                names=[id_col, "scope_idx", "node_idx", mode, "start", "end"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn,
        f"{id_col} long, scope_idx int, node_idx int, {mode} string, "
        "start int, end int",
    )
