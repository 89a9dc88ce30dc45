"""Arrow-batch main-content extraction over a DataFrame text column.

The kernel (tl_spark.kernel) runs inside ``mapInArrow``: whole Arrow
record batches cross the JVM->Python boundary once, the batch's text
column is materialized with one C-level ``to_pylist()`` call, each
document is parsed by the byte-level kernel, and results return as
Arrow arrays. No per-row Python UDFs anywhere (BASELINE.json
input_hint API constraint).

Scale notes (100 TB / 1000 executors):
- the op is embarrassingly parallel map-only: no shuffle is introduced;
  upstream partitioning (hash(conv_id) buckets) is preserved.
- Catalyst column-prunes the scan to exactly the passthrough columns +
  text (verify with .explain: ReadSchema contains only those).
- batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
  peak Python memory is one batch's text + its node arenas.
- plain-text turns (no '<' byte) take a memchr fast path that skips DOM
  construction entirely — on transcript corpora most turns are tag-free.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from tl_spark.kernel.htmlparse import KIND_RAW, KIND_TAG, parse

# north_star boilerplate set: script/style/nav subtrees + comments
# (comments already contribute "" to inner_text; their spans are dropped)
DEFAULT_STRIP_TAGS = frozenset((b"script", b"style", b"nav"))

EXTRACT_FIELDS = [
    pa.field("extracted_text", pa.string()),
    pa.field(
        "spans",
        pa.list_(
            pa.struct([pa.field("start", pa.int32()), pa.field("end", pa.int32())])
        ),
    ),
    pa.field("n_nodes", pa.int32()),
    pa.field("html_version", pa.string()),
    pa.field("error", pa.string()),
]


def extract_document_flat(text: str, strip_tags=DEFAULT_STRIP_TAGS):
    """Kernel-direct extraction for one document; spans as two flat
    tuples (batch fast path — no per-span dict allocation).

    Returns (extracted_text, starts, ends, n_nodes, version, error);
    start/end are INCLUSIVE byte offsets of kept top-level node raw
    spans (reference ``boundaries`` semantics, src/parser/tag.rs:
    374-381): element nodes use their raw span, text nodes their byte
    run; comments and stripped top-level elements are omitted.
    """
    if text is None:
        return (None, None, None, 0, None, None)
    buf = text.encode("utf-8")
    if b"<" not in buf:
        # fast path: the whole input is a single Raw node
        if not buf:
            return ("", (), (), 0, None, None)
        return (text, (0,), (len(buf) - 1,), 1, None, None)
    try:
        dom = parse(buf)
        nodes = dom.nodes
        starts = []
        ends = []
        parts = []
        for h in dom.ast:
            node = nodes[h]
            kind = node[0]
            if kind == KIND_TAG:
                if node[1] in strip_tags:
                    continue
                parts.append(dom.inner_text(h, strip_tags))
                s, e = node[4], node[5] - 1
            elif kind == KIND_RAW:
                parts.append(dom.inner_text(h))
                s, e = node[1], node[2] - 1
            else:  # comment
                continue
            starts.append(s)
            ends.append(e)
        return ("".join(parts), starts, ends, len(nodes), dom.version, None)
    except Exception as exc:  # kernel fault: keep the row, flag it
        return (None, None, None, 0, None, f"{type(exc).__name__}: {exc}")


def extract_document(text: str, strip_tags=DEFAULT_STRIP_TAGS):
    """Like :func:`extract_document_flat` but with spans as
    [{"start":..,"end":..}] (the public row shape)."""
    txt, starts, ends, n_nodes, ver, err = extract_document_flat(
        text, strip_tags
    )
    spans = (
        None
        if starts is None
        else [{"start": s, "end": e} for s, e in zip(starts, ends)]
    )
    return (txt, spans, n_nodes, ver, err)


def _extract_bytes_flat(buf: bytes, strip_tags):
    """Bytes-in/bytes-out extraction (Arrow fast path; input must be
    valid UTF-8, which parquet/Arrow strings guarantee).

    Uses the no-DOM single-pass scanner (kernel ``extract_scan``);
    equivalence with the DOM route is pinned by
    tests/test_extract_scan.py over the golden corpus.
    """
    if b"<" not in buf:
        if not buf:
            return (b"", (), (), 0, None)
        return (buf, (0,), (len(buf) - 1,), 1, None)
    from tl_spark.kernel.htmlparse import extract_scan

    text, spans, n_nodes, version = extract_scan(buf, strip_tags)
    starts = [s for s, _ in spans]
    ends = [e for _, e in spans]
    return (text, starts, ends, n_nodes, version)


def _extract_bytes_flat_dom(buf: bytes, strip_tags):
    """DOM-route reference implementation (kept for the equivalence
    test gating the scanner above)."""
    if b"<" not in buf:
        if not buf:
            return (b"", (), (), 0, None)
        return (buf, (0,), (len(buf) - 1,), 1, None)
    dom = parse(buf)
    nodes = dom.nodes
    starts = []
    ends = []
    parts = []
    for h in dom.ast:
        node = nodes[h]
        kind = node[0]
        if kind == KIND_TAG:
            if node[1] in strip_tags:
                continue
            parts.append(dom.inner_text_bytes(h, strip_tags))
            s, e = node[4], node[5] - 1
        elif kind == KIND_RAW:
            parts.append(buf[node[1]:node[2]])
            s, e = node[1], node[2] - 1
        else:  # comment
            continue
        starts.append(s)
        ends.append(e)
    return (b"".join(parts), starts, ends, len(nodes), dom.version)


def _native_extract_batch(col, strip_tags):
    """Native-kernel batch extraction (optional cdylib); None when the
    library isn't available. Indirection point so tests can force the
    pure-Python path."""
    from tl_spark.kernel.native import extract_batch_arrays

    return extract_batch_arrays(col, strip_tags)


def _make_arrow_fn(text_col: str, passthrough: list[str], strip_tags):
    def fast_batch(batch: pa.RecordBatch):
        """Zero-decode path: slice document bytes straight out of the
        StringArray buffers, run the kernel on bytes, and build the
        output StringArray from concatenated bytes + offsets — no
        str decode/encode round-trip anywhere. Returns None when the
        batch shape isn't eligible (nulls / non-utf8 storage type)."""
        import array as _array

        col = batch.column(text_col)
        if col.null_count != 0 or not pa.types.is_string(col.type):
            return None
        # native kernel first: same byte machine compiled (equivalence
        # pinned by tests/test_native_kernel.py); Arrow buffers go in
        # and come out zero-copy. Falls through to the Python scanner
        # whenever the cdylib is absent (e.g. --py-files zip deploys).
        try:
            native = _native_extract_batch(col, strip_tags)
        except Exception:
            native = None
        if native is not None:
            text_arr, spans_arr, n_nodes_arr, version_arr = native
            arrays = [batch.column(c) for c in passthrough]
            arrays.append(text_arr)
            arrays.append(spans_arr)
            arrays.append(n_nodes_arr)
            arrays.append(version_arr)
            arrays.append(pa.nulls(len(col), type=pa.string()))  # error col
            names = passthrough + [f.name for f in EXTRACT_FIELDS]
            return pa.RecordBatch.from_arrays(arrays, names=names)
        n = len(col)
        bufs = col.buffers()
        offs = memoryview(bufs[1]).cast("i")
        data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
        base = col.offset

        ex_nodes = [0] * n
        ex_ver = [None] * n
        out_parts = []
        out_off = _array.array("i", bytes(4 * (n + 1)))
        flat_starts: list[int] = []
        flat_ends: list[int] = []
        sp_off = _array.array("i", bytes(4 * (n + 1)))
        pos = 0
        try:
            for i in range(n):
                s = offs[base + i]
                e = offs[base + i + 1]
                doc = bytes(data[s:e])
                out, starts, ends, n_nodes, ver = _extract_bytes_flat(
                    doc, strip_tags
                )
                out_parts.append(out)
                pos += len(out)
                out_off[i + 1] = pos
                flat_starts.extend(starts)
                flat_ends.extend(ends)
                sp_off[i + 1] = len(flat_starts)
                ex_nodes[i] = n_nodes
                ex_ver[i] = ver
        except Exception:
            return None  # fall back to the row-tolerant slow path

        text_arr = pa.Array.from_buffers(
            pa.utf8(),
            n,
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(b"".join(out_parts))],
        )
        spans_arr = pa.ListArray.from_arrays(
            pa.array(sp_off.tolist(), type=pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(flat_starts, type=pa.int32()),
                    pa.array(flat_ends, type=pa.int32()),
                ],
                names=["start", "end"],
            ),
        )
        arrays = [batch.column(c) for c in passthrough]
        arrays.append(text_arr)
        arrays.append(spans_arr)
        arrays.append(pa.array(ex_nodes, type=pa.int32()))
        arrays.append(pa.array(ex_ver, type=pa.string()))
        arrays.append(pa.nulls(n, type=pa.string()))  # error column
        names = passthrough + [f.name for f in EXTRACT_FIELDS]
        return pa.RecordBatch.from_arrays(arrays, names=names)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        extract = extract_document_flat
        for batch in batches:
            fast = fast_batch(batch)
            if fast is not None:
                yield fast
                continue
            texts = batch.column(text_col).to_pylist()
            n = len(texts)
            ex_text = [None] * n
            ex_nodes = [0] * n
            ex_ver = [None] * n
            ex_err = [None] * n
            # spans built as flat start/end buffers + list offsets
            # (ListArray.from_arrays): no per-span dict objects
            flat_starts: list[int] = []
            flat_ends: list[int] = []
            offsets = [0] * (n + 1)
            null_mask = None
            for i, t in enumerate(texts):
                txt, starts, ends, n_nodes, ver, err = extract(t, strip_tags)
                ex_text[i] = txt
                ex_nodes[i] = n_nodes
                ex_ver[i] = ver
                ex_err[i] = err
                if starts is None:
                    # null spans entry (null input text): zero-length
                    # extent + validity mask bit
                    offsets[i + 1] = offsets[i]
                    if null_mask is None:
                        null_mask = [False] * n
                    null_mask[i] = True
                else:
                    flat_starts.extend(starts)
                    flat_ends.extend(ends)
                    offsets[i + 1] = len(flat_starts)
            values = pa.StructArray.from_arrays(
                [
                    pa.array(flat_starts, type=pa.int32()),
                    pa.array(flat_ends, type=pa.int32()),
                ],
                names=["start", "end"],
            )
            if null_mask is None:
                spans_arr = pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()), values
                )
            else:
                spans_arr = pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()),
                    values,
                    mask=pa.array(null_mask),
                )
            arrays = [batch.column(c) for c in passthrough]
            arrays.append(pa.array(ex_text, type=pa.string()))
            arrays.append(spans_arr)
            arrays.append(pa.array(ex_nodes, type=pa.int32()))
            arrays.append(pa.array(ex_ver, type=pa.string()))
            arrays.append(pa.array(ex_err, type=pa.string()))
            names = passthrough + [f.name for f in EXTRACT_FIELDS]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return fn


def parse_nodes(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Secondary kernel: explode each document into its node arena.

    One output row per DOM node, document order (node_idx == arena
    handle; subtrees are contiguous index ranges). ``start``/``end``
    are INCLUSIVE byte offsets (reference ``boundaries`` semantics).
    Attribute entries preserve the reference's storage order (raw map,
    then id, then class).

    This is the tooling/test surface (SURVEY.md §1.6): the main
    pipeline never materializes the DOM outside the kernel.
    """

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        from tl_spark.kernel import native_dom
        from tl_spark.kernel.htmlparse import KIND_TAG as _TAG
        from tl_spark.kernel.htmlparse import parse as _parse

        attr_type = pa.list_(
            pa.struct([pa.field("key", pa.string()), pa.field("value", pa.string())])
        )
        for batch in batches:
            res = native_dom.parse_nodes_batch(batch.column(text_col))
            if res is not None:
                m = res["n_rows"]
                na = res["n_attrs"]
                ids_np = batch.column(id_col).to_numpy()
                is_tag = res["kind"] == 0

                def _with_validity(arr, valid_mask, n_items):
                    validity = pa.py_buffer(
                        np.packbits(valid_mask, bitorder="little").tobytes()
                    )
                    bufs = arr.buffers()
                    return pa.Array.from_buffers(
                        pa.utf8(),
                        n_items,
                        [validity, bufs[1], bufs[2]],
                    )

                name_arr = _with_validity(res["name"], is_tag, m)
                val_valid = res["val_present"].astype(bool)
                value_arr = _with_validity(res["value"], val_valid, na)
                struct_arr = pa.StructArray.from_arrays(
                    [res["key"], value_arr], names=["key", "value"]
                )
                attrs_arr = pa.Array.from_buffers(
                    attr_type,
                    m,
                    [
                        pa.py_buffer(
                            np.packbits(is_tag, bitorder="little").tobytes()
                        ),
                        pa.py_buffer(res["attr_offs"].tobytes()),
                    ],
                    children=[struct_arr],
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids_np[res["doc_idx"]], type=pa.int64()),
                        pa.array(res["node_idx"], type=pa.int32()),
                        pa.array(res["kind"], type=pa.int32()),
                        name_arr,
                        pa.array(res["start"], type=pa.int32()),
                        pa.array(res["end"], type=pa.int32()),
                        pa.array(res["n_children"], type=pa.int32()),
                        pa.array(res["parent"], type=pa.int32()),
                        attrs_arr,
                    ],
                    names=[
                        id_col, "node_idx", "kind", "name", "start", "end",
                        "n_children", "parent", "attrs",
                    ],
                )
                continue
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            o_id, o_idx, o_kind, o_name = [], [], [], []
            o_start, o_end, o_nkids, o_parent, o_attrs = [], [], [], [], []
            for docid, t in zip(ids, texts):
                dom = _parse(t or "")
                parent = [-1] * len(dom.nodes)
                for h, node in enumerate(dom.nodes):
                    if node[0] == _TAG:
                        for c in node[3]:
                            parent[c] = h
                for h, node in enumerate(dom.nodes):
                    o_id.append(docid)
                    o_idx.append(h)
                    o_kind.append(node[0])
                    s, e = dom.boundaries(h)
                    o_start.append(s)
                    o_end.append(e)
                    o_parent.append(parent[h])
                    if node[0] == _TAG:
                        o_name.append(node[1].decode("utf-8", "replace"))
                        o_nkids.append(len(node[3]))
                        o_attrs.append(
                            [
                                {
                                    "key": k.decode("utf-8", "replace"),
                                    "value": None
                                    if v is None
                                    else v.decode("utf-8", "replace"),
                                }
                                for k, v in node[2].iter_all()
                            ]
                        )
                    else:
                        o_name.append(None)
                        o_nkids.append(0)
                        o_attrs.append(None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, type=pa.int64()),
                    pa.array(o_idx, type=pa.int32()),
                    pa.array(o_kind, type=pa.int32()),
                    pa.array(o_name, type=pa.string()),
                    pa.array(o_start, type=pa.int32()),
                    pa.array(o_end, type=pa.int32()),
                    pa.array(o_nkids, type=pa.int32()),
                    pa.array(o_parent, type=pa.int32()),
                    pa.array(o_attrs, type=attr_type),
                ],
                names=[
                    id_col, "node_idx", "kind", "name", "start", "end",
                    "n_children", "parent", "attrs",
                ],
            )

    narrowed = df.select(id_col, text_col)
    return narrowed.mapInArrow(
        fn,
        f"{id_col} long, node_idx int, kind int, name string, start int, "
        "end int, n_children int, parent int, "
        "attrs array<struct<key:string,value:string>>",
    )


def extract_main_content(
    df,
    text_col: str = "text",
    passthrough: list[str] | None = None,
    strip_tags=DEFAULT_STRIP_TAGS,
    jvm_fastpath: bool = True,
):
    """DataFrame -> DataFrame with extraction output columns appended.

    Only ``passthrough + [text_col]`` cross the Arrow boundary (column
    pruning reaches the scan); the result carries the passthrough
    columns plus extracted_text/spans/n_nodes/html_version/error.

    ``jvm_fastpath`` (round 8): rows whose text contains no ``<`` byte
    can never reach the parser — the kernel's own first check returns
    ``(text, [(0, octet_len - 1)], 1 node)`` without touching the DOM.
    Routing those rows through an equivalent pure-JVM projection keeps
    them off the JVM<->Python Arrow boundary entirely, which the r8
    probe measured as ~95% of the headline extraction wall (identity
    mapInArrow 21.0 s vs 1.7 s scan at sf1.0; 37% of transcript turns
    are tag-free). The kernel branch and the projection branch read
    the same source twice (cheap, column-pruned scan) and union —
    row-level outputs are byte-identical (pinned by
    tests/test_spark_extract.py::test_jvm_fastpath_parity); row ORDER
    is branch-interleaved, same as any repartitioned run — every
    deterministic consumer already sorts. Disable for single-pass
    semantics over exotic sources.
    """
    if passthrough is None:
        passthrough = [c for c in df.columns if c != text_col]
    narrowed = df.select(*passthrough, text_col)

    spark_schema = ", ".join(
        f"`{c}` {narrowed.schema[c].dataType.simpleString()}" for c in passthrough
    )
    extra = (
        "extracted_text string, "
        "spans array<struct<start:int,end:int>>, "
        "n_nodes int, html_version string, error string"
    )
    out_schema = f"{spark_schema}, {extra}" if spark_schema else extra
    fn = _make_arrow_fn(text_col, passthrough, strip_tags)
    if not jvm_fastpath:
        return narrowed.mapInArrow(fn, out_schema)
    import pyspark.sql.functions as F

    t = F.col(text_col)
    tagged = narrowed.filter(t.isNotNull() & t.contains("<"))
    kernel_out = tagged.mapInArrow(fn, out_schema)
    # mirror of kernel.extract_document_flat's no-'<' fast path:
    # null -> all-null row (0 nodes); empty -> empty text, empty
    # spans, 0 nodes; else the whole input is one Raw node with an
    # inclusive byte span [0, octet_len - 1]
    olen = F.octet_length(t)
    span_t = "array<struct<start:int,end:int>>"
    fast_out = narrowed.filter(t.isNull() | ~t.contains("<")).select(
        *passthrough,
        t.alias("extracted_text"),
        F.when(t.isNull(), F.lit(None).cast(span_t))
        .when(olen == 0, F.array().cast(span_t))
        .otherwise(
            F.array(
                F.struct(
                    F.lit(0).cast("int").alias("start"),
                    (olen - 1).cast("int").alias("end"),
                )
            )
        )
        .alias("spans"),
        F.when(t.isNull() | (olen == 0), F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("n_nodes"),
        F.lit(None).cast("string").alias("html_version"),
        F.lit(None).cast("string").alias("error"),
    )
    return kernel_out.unionByName(fast_out)
