"""Byte-exact re-implementation of the reference HTML parser semantics.

The reference (y21/tl, /root/reference) is a spec-relaxed, single-pass,
byte-level HTML parser. This module reproduces its *stable-build*
observable behavior — including the documented quirks — in pure Python,
designed so that whole Arrow batches can be parsed inside one Python
call (see tl_spark.functions.extract).

Semantics replicated (citations into /root/reference):

- identifier charset ``[0-9A-Za-z\\-_:+/]`` (src/util.rs:1-11); note
  ``/`` is an ident char so ``<br/>`` parses as tag name ``br/``.
- tag-level whitespace is ONLY space and ``\\n`` (src/parser/base.rs:76-78).
- void tags: 15-entry, case-sensitive list WITHOUT ``command``
  (src/parser/constants.rs:2-5); the serializer's void list has 16
  entries WITH ``command`` (src/parser/tag.rs:12-15).
- a tag missing its final ``>`` is silently dropped
  (src/parser/base.rs:333).
- closing tag pops only on byte-exact match with top-of-stack
  (src/parser/base.rs:218-273); id/class maps populate only at close.
- duplicate non-id/class attributes: kept while <=2 attrs (inline
  storage, first-wins on get), deduped last-wins once the map spills
  to the heap at >2 (src/inline/hashmap.rs:263-294).
- comments end at any ``--`` immediately followed by ``>``
  (src/parser/base.rs:128-150); unterminated comment => empty comment.
- only ``<!doctype html>`` (ASCII-CI) sets HTML5; any other doctype
  ident leaves version None, and the byte after the second ident is
  skipped unconditionally (doctype residue leak,
  src/parser/base.rs:296-307).
- no entity decoding, no whitespace normalization anywhere
  (see SURVEY.md §1.5).

All extraction (inner_text / inner_html / outer_html) is ITERATIVE —
the reference parser is iterative but its extraction is recursive
(src/parser/tag.rs:387-420); we must survive adversarial 10k-deep
nesting inside executors.
"""

from __future__ import annotations

import re

__all__ = [
    "parse",
    "TlDom",
    "Attrs",
    "KIND_TAG",
    "KIND_RAW",
    "KIND_COMMENT",
    "VOID_TAGS",
    "HTML_VOID_ELEMENTS",
]

# node kinds
KIND_TAG = 0
KIND_RAW = 1
KIND_COMMENT = 2

# tag-node field offsets: [kind, name, attrs, children, raw_start, raw_end]
_NAME = 1
_ATTRS = 2
_CHILDREN = 3
_RS = 4
_RE = 5
# raw/comment field offsets: [kind, start, end]
_S = 1
_E = 2

# parser's void list: 15 entries, no "command" (src/parser/constants.rs:2-5)
VOID_TAGS = frozenset(
    (
        b"area", b"base", b"br", b"col", b"embed", b"hr", b"img", b"input",
        b"keygen", b"link", b"meta", b"param", b"source", b"track", b"wbr",
    )
)
# serializer's void list: 16 entries incl. "command" (src/parser/tag.rs:12-15)
HTML_VOID_ELEMENTS = frozenset(
    (
        "area", "base", "br", "col", "command", "embed", "hr", "img", "input",
        "keygen", "link", "meta", "param", "source", "track", "wbr",
    )
)

# first byte NOT in the ident set [0-9A-Za-z\-_:+/] (src/util.rs:1-11)
_NON_IDENT = re.compile(rb"[^0-9A-Za-z\-_:+/]")
# 256-entry membership table for the same ident set (hot-loop scanning)
_IDENT_TABLE = bytes(
    1 if re.match(rb"[0-9A-Za-z\-_:+/]", bytes([c])) else 0 for c in range(256)
)
# first byte that is not space/\n (src/parser/base.rs:76-78)
_NON_WS = re.compile(rb"[^ \n]")
# unquoted attribute value terminators (src/parser/base.rs:166)
_ATTR_END4 = re.compile(rb"[ \n/>]")
# extract_scan fast path: a "benign" open tag matched in ONE regex call.
# Provably equivalent to the byte machine on its matched subset:
#  - name starts with a non-'/' ident char (the '<'-dispatch guarantees
#    the first byte is not '/', '!', or whitespace when this is tried),
#    may contain '/' afterwards (the `<br/>` name quirk);
#  - each attribute needs >=1 space/\n separator, an ident key not
#    starting with '/' ('/' always terminates the attr loop), and an
#    optionally "…"/'…' quoted value glued to '=' (no spaces around '=',
#    no unquoted values — those fall back to the exact machine);
#  - then optional space/\n, optional self-close '/', '>'.
# Anything else (tab tricks, '=' spacing, unquoted values, quote-follower
# consumption, EOF drops) does NOT match and takes the exact path.
_FAST_TAG = re.compile(
    rb"<([0-9A-Za-z\-_:+][0-9A-Za-z\-_:+/]*)"
    rb"(?:(?:[ \n]+[0-9A-Za-z\-_:+][0-9A-Za-z\-_:+/]*"
    rb"(?:=\"[^\"]*\"|='[^']*')?)*)"
    rb"[ \n]*(/?)>"
)
# Rust's str::split_ascii_whitespace set: space \t \n \f \r (no \x0b)
_ASCII_WS_SPLIT = re.compile(r"[ \t\n\x0c\r]+")

_MISSING = object()

_LT = 0x3C  # <
_GT = 0x3E  # >
_SLASH = 0x2F  # /
_BANG = 0x21  # !
_EQ = 0x3D  # =
_DQ = 0x22  # "
_SQ = 0x27  # '


class Attrs:
    """Attribute collection mirroring the reference's ``Attributes``.

    ``id`` / ``class`` live in dedicated slots (src/parser/base.rs:187-191);
    everything else goes into ``raw`` which emulates the reference's
    InlineHashMap: a plain list while <=2 entries (duplicates kept,
    first-wins on get, insertion order on iter), spilling to a dict
    (dedup last-wins) when a third entry is inserted
    (src/inline/hashmap.rs:263-294).
    """

    __slots__ = ("id", "class_", "raw")

    def __init__(self):
        self.id = None  # bytes | None
        self.class_ = None  # bytes | None
        self.raw = []  # list[(bytes, bytes|None)] or dict[bytes, bytes|None]

    def insert_raw(self, k, v):
        raw = self.raw
        if type(raw) is dict:
            raw[k] = v
        elif len(raw) >= 2:
            d = {}
            for ek, ev in raw:
                d[ek] = ev
            d[k] = v
            self.raw = d
        else:
            raw.append((k, v))

    def get(self, key):
        """Returns _MISSING if absent, None if valueless, else bytes."""
        if key == b"id":
            return self.id if self.id is not None else _MISSING
        if key == b"class":
            return self.class_ if self.class_ is not None else _MISSING
        raw = self.raw
        if type(raw) is dict:
            return raw.get(key, _MISSING)
        for k, v in raw:
            if k == key:
                return v
        return _MISSING

    def contains(self, key):
        return self.get(key) is not _MISSING

    def iter_all(self):
        """(key, value) in serialization order: raw map, then id, then class
        (src/parser/tag.rs:173-193)."""
        raw = self.raw
        if type(raw) is dict:
            yield from raw.items()
        else:
            yield from raw
        if self.id is not None:
            yield (b"id", self.id)
        if self.class_ is not None:
            yield (b"class", self.class_)

    def n_attrs(self):
        n = len(self.raw)
        if self.id is not None:
            n += 1
        if self.class_ is not None:
            n += 1
        return n

    def class_members(self):
        """Whitespace-split class tokens as bytes; [] when the class value
        is missing or not valid UTF-8 (Bytes::try_as_utf8_str gate,
        src/parser/tag.rs:206-211)."""
        if self.class_ is None:
            return []
        try:
            s = self.class_.decode("utf-8")
        except UnicodeDecodeError:
            return []
        return [t.encode("utf-8") for t in _ASCII_WS_SPLIT.split(s) if t]

    def is_class_member(self, member):
        return member in self.class_members()


class _Parser:
    __slots__ = (
        "buf", "n", "i", "nodes", "ast", "stack",
        "ids", "classes", "version", "track_ids", "track_classes",
    )

    def __init__(self, buf, track_ids=False, track_classes=False):
        self.buf = buf
        self.n = len(buf)
        self.i = 0
        self.nodes = []
        self.ast = []
        self.stack = []
        self.ids = {}
        self.classes = {}
        self.version = None
        self.track_ids = track_ids
        self.track_classes = track_classes

    # -- scanning primitives (C-speed via bytes.find / compiled regex) --

    def _skip_ws(self):
        m = _NON_WS.search(self.buf, self.i)
        self.i = m.start() if m else self.n

    def _read_ident(self):
        m = _NON_IDENT.search(self.buf, self.i)
        end = m.start() if m else self.n
        ident = self.buf[self.i:end]
        self.i = end
        return ident

    # -- parse loop --
    #
    # One monolithic loop with all scanning inlined: the naive
    # method-per-production version spent ~40% of wall time on Python
    # call dispatch (profiled). Control flow mirrors the reference
    # exactly (src/parser/base.rs:313-369); goldens referee any change.

    def parse(self):
        buf, n = self.buf, self.n
        nodes = self.nodes
        ast = self.ast
        stack = self.stack
        ident = _IDENT_TABLE
        find = buf.find
        track = self.track_ids or self.track_classes
        i = self.i
        while i < n:
            c = buf[i]
            if c != _LT:
                # text run up to the next '<' (base.rs:363-366)
                j = find(b"<", i)
                if j < 0:
                    j = n
                h = len(nodes)
                nodes.append([KIND_RAW, i, j])
                if stack:
                    nodes[stack[-1]][_CHILDREN].append(h)
                else:
                    ast.append(h)
                i = j
                continue

            # --- tag dispatch (base.rs:313-355) ---
            start = i
            i += 1  # skip <
            while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                i += 1
            if i >= n:
                break
            c = buf[i]

            if c == _SLASH:
                # closing tag (base.rs:218-273)
                i += 1
                j = find(b">", i)
                if j < 0:
                    j = n
                closing_name = buf[i:j]
                i = j
                if i < n:  # buf[i] is '>' by construction
                    i += 1
                if stack:
                    top = nodes[stack[-1]]
                    if top[_NAME] == closing_name:
                        h = stack.pop()
                        tag = nodes[h]
                        tag[_RE] = i  # raw covers <open>..</close>
                        if track:
                            self._register_close(tag, h)
                continue

            if c == _BANG:
                self.i = i
                self._read_markdown()
                i = self.i
                continue

            # open tag: name ident (charset incl. ':+/', so '<br/>'
            # parses as name 'br/')
            ns = i
            while i < n and ident[buf[i]]:
                i += 1
            name = buf[ns:i]
            while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                i += 1

            # attributes (base.rs:152-200); EOF anywhere => tag dropped
            attrs = None
            dropped = False
            while True:
                while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                    i += 1
                if i >= n:
                    dropped = True
                    break
                c = buf[i]
                if c == _SLASH or c == _GT:
                    break
                ks = i
                while i < n and ident[buf[i]]:
                    i += 1
                k = buf[ks:i]
                while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                    i += 1
                if i < n and buf[i] == _EQ:
                    i += 1
                    while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                        i += 1
                    if i < n and (buf[i] == _DQ or buf[i] == _SQ):
                        q = buf[i]
                        i += 1
                        j = find(q, i)
                        if j < 0:
                            j = n
                        v = buf[i:j]
                        i = j  # left AT the closing quote
                    else:
                        m = _ATTR_END4.search(buf, i)
                        j = m.start() if m else n
                        v = buf[i:j]
                        i = j
                else:
                    v = None
                if attrs is None:
                    attrs = Attrs()
                if k == b"id":
                    attrs.id = v
                elif k == b"class":
                    attrs.class_ = v
                else:
                    attrs.insert_raw(k, v)
                if i >= n:
                    dropped = True
                    break
                c = buf[i]
                if c != _SLASH and c != _GT:
                    i += 1
            if dropped:
                continue  # silently dropped; i == n ends the loop

            is_self_closing = False
            if buf[i] == _SLASH:  # i < n guaranteed by the break above
                is_self_closing = True
                i += 1
            if i >= n or buf[i] != _GT:
                continue  # missing '>': tag silently dropped (base.rs:333)
            i += 1

            if attrs is None:
                attrs = Attrs()
            h = len(nodes)
            nodes.append([KIND_TAG, name, attrs, [], start, i])
            if stack:
                nodes[stack[-1]][_CHILDREN].append(h)
            else:
                ast.append(h)
            if not is_self_closing and name not in VOID_TAGS:
                stack.append(h)
        self.i = i

    def _add_to_parent(self, handle):
        if self.stack:
            self.nodes[self.stack[-1]][_CHILDREN].append(handle)
        else:
            self.ast.append(handle)

    def _register_close(self, tag, handle):
        """Cold path: id/class map registration at close time
        (base.rs:248-272). Only called when tracking is enabled."""
        if self.track_classes:
            attrs = tag[_ATTRS]
            if attrs.class_ is not None:
                for cls in attrs.class_members():
                    self.classes.setdefault(cls, []).append(handle)
        if self.track_ids:
            attrs = tag[_ATTRS]
            if attrs.id is not None:
                self.ids[attrs.id] = handle  # last-writer-wins in close order

    def _read_markdown(self):
        # src/parser/base.rs:275-311
        buf, n = self.buf, self.n
        start = self.i - 1  # position of the '<' (when no ws was skipped)
        self.i += 1  # skip !
        if buf[self.i:self.i + 2] == b"--":
            span = self._skip_comment(start)
            handle = len(self.nodes)
            self.nodes.append([KIND_COMMENT, span[0], span[1]])
            self._add_to_parent(handle)
            return
        tag = self._read_ident()
        self._skip_ws()
        if len(tag) == 7 and tag.lower() == b"doctype":
            doctype = self._read_ident()
            if len(doctype) == 4 and doctype.lower() == b"html":
                self.version = "HTML5"
            self._skip_ws()
            self.i += 1  # skip '>' unconditionally (residue-leak quirk)

    def _skip_comment(self, start):
        # src/parser/base.rs:128-150: comment ends at '--' followed by '>'
        buf, n = self.buf, self.n
        i = self.i
        while True:
            j = buf.find(b"--", i)
            if j < 0:
                self.i = n
                return (0, 0)  # unterminated: empty comment
            i = j + 2
            if i < n and buf[i] == _GT:
                i += 1
                self.i = i
                return (start, i)
            if i >= n:
                self.i = n
                return (0, 0)
            i = j + 3  # '--' without '>': advance 2 then 1 (base.rs:146)


class TlDom:
    """Parsed document; mirrors the reference's ``VDom`` read API."""

    __slots__ = ("buf", "nodes", "ast", "ids", "classes", "version",
                 "track_ids", "track_classes")

    def __init__(self, parser):
        self.buf = parser.buf
        self.nodes = parser.nodes
        self.ast = parser.ast
        self.ids = parser.ids
        self.classes = parser.classes
        self.version = parser.version
        self.track_ids = parser.track_ids
        self.track_classes = parser.track_classes

    # -- structure --

    def children(self):
        return self.ast

    def node_kind(self, handle):
        return self.nodes[handle][0]

    def tag_name(self, handle):
        return self.nodes[handle][_NAME]

    def tag_attrs(self, handle):
        return self.nodes[handle][_ATTRS]

    def tag_children(self, handle):
        return self.nodes[handle][_CHILDREN]

    def raw_bytes(self, handle):
        """Source bytes of a node: tag raw span / raw text / comment."""
        node = self.nodes[handle]
        if node[0] == KIND_TAG:
            return self.buf[node[_RS]:node[_RE]]
        return self.buf[node[_S]:node[_E]]

    def boundaries(self, handle):
        """(start, end) INCLUSIVE byte offsets (src/parser/tag.rs:374-381).

        For Raw/Comment nodes the same pointer arithmetic applies to
        their text span. An empty span yields end = start - 1.
        """
        node = self.nodes[handle]
        if node[0] == KIND_TAG:
            return (node[_RS], node[_RE] - 1)
        return (node[_S], node[_E] - 1)

    def find_last_node_handle(self, handle):
        """Innermost last descendant (src/parser/tag.rs:592-606), iterative."""
        nodes = self.nodes
        node = nodes[handle]
        if node[0] != KIND_TAG or not node[_CHILDREN]:
            return None
        h = node[_CHILDREN][-1]
        while True:
            child = nodes[h]
            if child[0] == KIND_TAG and child[_CHILDREN]:
                h = child[_CHILDREN][-1]
            else:
                return h

    def subtree_range(self, handle):
        """(start, end) handle range of a tag's descendants, or None.

        Mirrors Children::boundaries (src/parser/tag.rs:536-540): start is
        the first direct child, end the innermost last descendant. The
        arena is document-ordered so the subtree is contiguous.
        """
        node = self.nodes[handle]
        if node[0] != KIND_TAG or not node[_CHILDREN]:
            return None
        return (node[_CHILDREN][0], self.find_last_node_handle(handle))

    def children_all(self, handle):
        rng = self.subtree_range(handle)
        if rng is None:
            return []
        return list(range(rng[0], rng[1] + 1))

    # -- extraction (all iterative) --

    def inner_text(self, handle, strip_tags=None):
        """Concatenated descendant Raw text (src/parser/tag.rs:387-420):
        comments contribute "", no separators, no entity decoding.

        ``strip_tags``: optional set of tag names (bytes) whose whole
        subtrees are skipped (pipeline boilerplate strip; not part of the
        reference API).
        """
        nodes = self.nodes
        buf = self.buf
        out = []
        node = nodes[handle]
        if node[0] == KIND_RAW:
            return buf[node[_S]:node[_E]].decode("utf-8", "replace")
        if node[0] == KIND_COMMENT:
            return ""
        stack = [handle]
        while stack:
            h = stack.pop()
            nd = nodes[h]
            kind = nd[0]
            if kind == KIND_RAW:
                out.append(buf[nd[_S]:nd[_E]])
            elif kind == KIND_TAG:
                if h != handle and strip_tags is not None and nd[_NAME] in strip_tags:
                    continue
                children = nd[_CHILDREN]
                for c in reversed(children):
                    stack.append(c)
        return b"".join(out).decode("utf-8", "replace")

    def inner_text_bytes(self, handle, strip_tags=None):
        """inner_text as raw bytes (no per-slice lossy decode).

        For valid-UTF-8 input this equals ``inner_text(...).encode()``:
        every tokenizer split point is an ASCII byte (<, >, quotes,
        space, \\n, =, /), so a raw-node boundary can never fall inside
        a multi-byte UTF-8 sequence. The Arrow batch path uses this to
        skip the str decode/encode round-trip (parquet strings are
        always valid UTF-8). For INVALID UTF-8, per-slice lossy decode
        (the reference's semantics) may differ — use inner_text there.
        """
        nodes = self.nodes
        buf = self.buf
        node = nodes[handle]
        if node[0] == KIND_RAW:
            return buf[node[_S]:node[_E]]
        if node[0] == KIND_COMMENT:
            return b""
        out = []
        stack = [handle]
        while stack:
            h = stack.pop()
            nd = nodes[h]
            kind = nd[0]
            if kind == KIND_RAW:
                out.append(buf[nd[_S]:nd[_E]])
            elif kind == KIND_TAG:
                if h != handle and strip_tags is not None and nd[_NAME] in strip_tags:
                    continue
                for c in reversed(nd[_CHILDREN]):
                    stack.append(c)
        return b"".join(out)

    def _open_tag_str(self, node):
        parts = ["<", node[_NAME].decode("utf-8", "replace")]
        for k, v in node[_ATTRS].iter_all():
            parts.append(" ")
            parts.append(k.decode("utf-8", "replace"))
            if v is not None:
                parts.append('="')
                parts.append(v.decode("utf-8", "replace"))
                parts.append('"')
        parts.append(">")
        return "".join(parts)

    def outer_html(self, handle):
        """Re-serialized markup (src/parser/tag.rs:293-335), iterative.

        Unclosed tags get synthesized close tags; the 16-entry void list
        (incl. ``command``) suppresses children and the close tag.
        """
        nodes = self.nodes
        buf = self.buf
        out = []
        stack = [handle]
        while stack:
            item = stack.pop()
            if type(item) is str:
                out.append(item)
                continue
            nd = nodes[item]
            kind = nd[0]
            if kind != KIND_TAG:
                out.append(buf[nd[_S]:nd[_E]].decode("utf-8", "replace"))
                continue
            name = nd[_NAME].decode("utf-8", "replace")
            out.append(self._open_tag_str(nd))
            if name in HTML_VOID_ELEMENTS:
                continue
            stack.append("</" + name + ">")
            for c in reversed(nd[_CHILDREN]):
                stack.append(c)
        return "".join(out)

    def inner_html(self, handle):
        node = self.nodes[handle]
        if node[0] != KIND_TAG:
            return self.buf[node[_S]:node[_E]].decode("utf-8", "replace")
        return "".join(self.outer_html(c) for c in node[_CHILDREN])

    def dom_outer_html(self):
        return "".join(self.outer_html(h) for h in self.ast)

    def dom_inner_text(self, strip_tags=None):
        """inner_text over all top-level nodes (pipeline flagship op).

        Unlike :meth:`inner_text` (which never strips its own root, to
        match the reference's per-tag semantics), a top-level node whose
        tag name is in ``strip_tags`` is dropped entirely.
        """
        out = []
        for h in self.ast:
            node = self.nodes[h]
            if (
                strip_tags is not None
                and node[0] == KIND_TAG
                and node[_NAME] in strip_tags
            ):
                continue
            out.append(self.inner_text(h, strip_tags))
        return "".join(out)

    def find_node(self, handle, pred):
        """First descendant (DFS pre-order over children) for which
        ``pred(dom, h)`` is truthy (Node::find_node,
        src/parser/tag.rs:655-678). Iterative.
        """
        node = self.nodes[handle]
        if node[0] != KIND_TAG:
            return None
        stack = list(reversed(node[_CHILDREN]))
        while stack:
            h = stack.pop()
            if pred(self, h):
                return h
            child = self.nodes[h]
            if child[0] == KIND_TAG:
                stack.extend(reversed(child[_CHILDREN]))
        return None

    def tag_find_node(self, handle, pred):
        """First DIRECT child matching ``pred`` (HTMLTag::find_node,
        src/parser/tag.rs:473-485 — no recursion in the reference)."""
        node = self.nodes[handle]
        if node[0] != KIND_TAG:
            return None
        for h in node[_CHILDREN]:
            if pred(self, h):
                return h
        return None

    # -- lookup --

    def get_element_by_id(self, idv):
        """src/vdom.rs:43-63 — map probe when tracking, else arena scan.

        The two modes are observably different on unclosed tags.
        """
        if isinstance(idv, str):
            idv = idv.encode("utf-8")
        if self.track_ids:
            return self.ids.get(idv)
        for h, node in enumerate(self.nodes):
            if node[0] == KIND_TAG and node[_ATTRS].id == idv:
                return h
        return None

    def get_elements_by_class_name(self, cls):
        if isinstance(cls, str):
            cls = cls.encode("utf-8")
        if self.track_classes:
            return list(self.classes.get(cls, []))
        return [
            h
            for h, node in enumerate(self.nodes)
            if node[0] == KIND_TAG and node[_ATTRS].is_class_member(cls)
        ]

    def query_selector(self, selector):
        """Document-scope selector query: lazy linear arena scan
        (src/queryselector/iter.rs:44-62). Returns None on parse failure.
        """
        from tl_spark.kernel.selector import parse_selector, selector_matches

        ast = parse_selector(selector)
        if ast is None:
            return None
        return [
            h for h in range(len(self.nodes)) if selector_matches(ast, self, h)
        ]

    def tag_query_selector(self, handle, selector):
        """Subtree-scope selector query over the contiguous handle range
        (src/queryselector/iterable.rs:50-77)."""
        from tl_spark.kernel.selector import parse_selector, selector_matches

        ast = parse_selector(selector)
        if ast is None:
            return None
        rng = self.subtree_range(handle)
        if rng is None:
            return []
        start = rng[0]
        length = rng[1] - rng[0] + 1
        n = len(self.nodes)
        return [
            h
            for h in range(start, start + length)
            if h < n and selector_matches(ast, self, h)
        ]


def extract_scan(buf, strip_tags):
    """Single-pass main-content extraction WITHOUT DOM materialization.

    Runs the identical byte machine as :class:`_Parser` (same grammar,
    same drop/close/void rules — see that class for the reference
    citations) but materializes nothing: no arena nodes, no Attrs, no
    children lists. Attributes are scanned for position only. State is
    a stack of (name, top_span_record, strips) plus a strip-depth
    counter; an unclosed stripped tag strips to end-of-document, which
    matches the contiguous-subtree semantics (its descendants are
    exactly the remaining nodes).

    Returns (text_bytes, spans, n_nodes, version), where ``spans`` is
    a list of inclusive [start, end] records in document order — equal
    to the DOM route's ``dom_inner_text``/top-level-span outputs
    (equivalence pinned by tests/test_extract_scan.py over the golden
    corpus and hypothesis inputs).
    """
    n = len(buf)
    find = buf.find
    ident = _IDENT_TABLE
    fast_tag = _FAST_TAG.match
    parts = []
    spans = []  # mutable [start, end] records, document order
    stack = []  # (name, top_rec_or_None, inc_strip)
    strip_depth = 0
    n_nodes = 0
    version = None
    i = 0
    while i < n:
        c = buf[i]
        if c != _LT:
            j = find(b"<", i)
            if j < 0:
                j = n
            n_nodes += 1
            if strip_depth == 0:
                parts.append(buf[i:j])
            if not stack:
                spans.append([i, j - 1])
            i = j
            continue

        # common-case fast path: one C-level match handles the whole tag
        m = fast_tag(buf, i)
        if m is not None:
            start = i
            i = m.end()
            n_nodes += 1
            name = m.group(1)
            strips = name in strip_tags
            rec = None
            if not stack and not strips:
                rec = [start, i - 1]
                spans.append(rec)
            if not m.group(2) and name not in VOID_TAGS:
                stack.append((name, rec, strips))
                if strips:
                    strip_depth += 1
            continue

        start = i
        i += 1
        while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
            i += 1
        if i >= n:
            break
        c = buf[i]

        if c == _SLASH:
            i += 1
            j = find(b">", i)
            if j < 0:
                j = n
            closing_name = buf[i:j]
            i = j
            if i < n:
                i += 1
            if stack and stack[-1][0] == closing_name:
                name, rec, inc = stack.pop()
                if rec is not None:
                    rec[1] = i - 1
                if inc:
                    strip_depth -= 1
            continue

        if c == _BANG:
            # comment / doctype (cold): reuse the exact machine
            i2 = i + 1
            if buf[i2:i2 + 2] == b"--":
                # comment: skip, counts as a node, contributes nothing
                p = _Parser(buf)
                p.i = i2
                p._skip_comment(start)
                i = p.i
                n_nodes += 1
                continue
            p = _Parser(buf)
            p.i = i
            p.version = version
            p._read_markdown()
            version = p.version
            i = p.i
            continue

        ns = i
        while i < n and ident[buf[i]]:
            i += 1
        name = buf[ns:i]
        while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
            i += 1

        dropped = False
        while True:
            while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                i += 1
            if i >= n:
                dropped = True
                break
            c = buf[i]
            if c == _SLASH or c == _GT:
                break
            while i < n and ident[buf[i]]:
                i += 1
            while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                i += 1
            if i < n and buf[i] == _EQ:
                i += 1
                while i < n and (buf[i] == 0x20 or buf[i] == 0x0A):
                    i += 1
                if i < n and (buf[i] == _DQ or buf[i] == _SQ):
                    q = buf[i]
                    i += 1
                    j = find(q, i)
                    i = n if j < 0 else j
                else:
                    m = _ATTR_END4.search(buf, i)
                    i = m.start() if m else n
            if i >= n:
                dropped = True
                break
            c = buf[i]
            if c != _SLASH and c != _GT:
                i += 1
        if dropped:
            continue

        is_self_closing = False
        if buf[i] == _SLASH:
            is_self_closing = True
            i += 1
        if i >= n or buf[i] != _GT:
            continue
        i += 1

        n_nodes += 1
        strips = name in strip_tags
        rec = None
        if not stack and not strips:
            rec = [start, i - 1]
            spans.append(rec)
        if not is_self_closing and name not in VOID_TAGS:
            stack.append((name, rec, strips))
            if strips:
                strip_depth += 1

    return (b"".join(parts), spans, n_nodes, version)


def parse(html, track_ids=False, track_classes=False):
    """Parse an HTML document (str or bytes) into a :class:`TlDom`.

    Mirrors ``tl::parse`` (src/lib.rs:49-53) with default options ==
    both tracking flags off.
    """
    if isinstance(html, str):
        buf = html.encode("utf-8")
    else:
        buf = bytes(html)
    p = _Parser(buf, track_ids=track_ids, track_classes=track_classes)
    p.parse()
    return TlDom(p)
