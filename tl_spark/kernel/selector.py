"""CSS-selector subset matching the reference's queryselector module.

Parser: /root/reference/src/queryselector/parser.rs (only ``' '`` is
whitespace; identifiers use the tag ident charset ``[0-9A-Za-z\\-_:+/]``
even inside quoted attribute values, so values with spaces are
unparseable — CHANGELOG #46 made ``:+/`` legal in values).

Matcher: /root/reference/src/queryselector/selector.rs. The
``Descendant`` (``a b``) and ``Parent`` (``a > b``) combinators PARSE
but always match False (selector.rs:72) — this quirk is preserved.

AST is nested tuples:
  ("tag", b) ("id", b) ("class", b) ("all",)
  ("and", l, r) ("or", l, r) ("desc", l, r) ("parent", l, r)
  ("attr", k) ("attr_eq", k, v) ("attr_ws", k, v)
  ("attr_sw", k, v) ("attr_ew", k, v) ("attr_sub", k, v)
"""

from __future__ import annotations

import re

from tl_spark.kernel import htmlparse as hp

__all__ = ["parse_selector", "selector_matches"]

_IS_IDENT = re.compile(rb"[0-9A-Za-z\-_:+/]")
_NON_IDENT = re.compile(rb"[^0-9A-Za-z\-_:+/]")


class _SelParser:
    __slots__ = ("buf", "n", "i")

    def __init__(self, buf):
        self.buf = buf
        self.n = len(buf)
        self.i = 0

    def _skip_ws(self):
        # parser.rs:18-26 — only ' ' counts
        had = False
        while self.i < self.n and self.buf[self.i] == 0x20:
            had = True
            self.i += 1
        return had

    def _read_identifier(self):
        m = _NON_IDENT.search(self.buf, self.i)
        end = m.start() if m else self.n
        ident = self.buf[self.i:end]
        self.i = end
        return ident

    def selector(self):
        # parser.rs:119-150
        self._skip_ws()
        if self.i >= self.n:
            return None
        tok = self.buf[self.i]
        if tok == 0x23:  # '#'
            self.i += 1
            left = ("id", self._read_identifier())
        elif tok == 0x2E:  # '.'
            self.i += 1
            left = ("class", self._read_identifier())
        elif tok == 0x2A:  # '*'
            self.i += 1
            left = ("all",)
        elif tok == 0x5B:  # '['
            self.i += 1
            left = self._parse_attribute()
            if left is None:
                return None
        elif _IS_IDENT.match(self.buf, self.i):
            left = ("tag", self._read_identifier())
        else:
            return None
        return self._parse_combinator(left)

    def _parse_combinator(self, left):
        # parser.rs:43-75
        has_ws = self._skip_ws()
        if self.i >= self.n:
            return left
        tok = self.buf[self.i]
        if tok == 0x2C:  # ','
            self.i += 1
            right = self.selector()
            if right is None:
                return None
            return ("or", left, right)
        if tok == 0x3E:  # '>'
            self.i += 1
            right = self.selector()
            if right is None:
                return None
            return ("parent", left, right)
        right = self.selector()
        if right is None:
            return None
        return ("desc", left, right) if has_ws else ("and", left, right)

    def _parse_attribute(self):
        # parser.rs:77-116
        key = self._read_identifier()
        if self.i >= self.n:
            return None
        c = self.buf[self.i]
        if c == 0x5D:  # ']'
            self.i += 1
            return ("attr", key)
        if c == 0x3D:  # '='
            self.i += 1
            value = self._read_quoted_value()
            if value is None:
                return None
            return ("attr_eq", key, value)
        if c in (0x7E, 0x5E, 0x24, 0x2A):  # ~ ^ $ *
            self.i += 1
            if self.i >= self.n or self.buf[self.i] != 0x3D:
                return None
            self.i += 1
            value = self._read_quoted_value()
            if value is None:
                return None
            op = {0x7E: "attr_ws", 0x5E: "attr_sw",
                  0x24: "attr_ew", 0x2A: "attr_sub"}[c]
            return (op, key, value)
        return None

    def _read_quoted_value(self):
        quote = None
        if self.i < self.n and self.buf[self.i] in (0x22, 0x27):
            quote = self.buf[self.i]
            self.i += 1
        value = self._read_identifier()
        if quote is not None:
            if self.i >= self.n or self.buf[self.i] != quote:
                return None
            self.i += 1
        if self.i >= self.n or self.buf[self.i] != 0x5D:
            return None
        self.i += 1
        return value


def parse_selector(selector):
    """Parse a selector (str or bytes) to an AST; None on failure."""
    if isinstance(selector, str):
        selector = selector.encode("utf-8")
    return _SelParser(selector).selector()


# Rust str::split_whitespace splits on the Unicode White_Space set;
# Python str.split() additionally treats U+001C..U+001F as whitespace,
# which would diverge from the reference on attribute values containing
# those separators — so split on the exact White_Space property set.
_UNICODE_WS_RE = re.compile(
    "[\t\n\x0b\x0c\r \x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)


def _split_unicode_ws(s):
    return [t for t in _UNICODE_WS_RE.split(s) if t]


def selector_matches(ast, dom, handle):
    """selector.rs:36-89 — per-node boolean predicate."""
    node = dom.nodes[handle]
    op = ast[0]
    if op == "and":
        return selector_matches(ast[1], dom, handle) and selector_matches(
            ast[2], dom, handle
        )
    if op == "or":
        return selector_matches(ast[1], dom, handle) or selector_matches(
            ast[2], dom, handle
        )
    if op == "all":
        return True
    if op in ("desc", "parent"):
        return False  # dead combinators (selector.rs:72)

    if node[0] != hp.KIND_TAG:
        return False
    attrs = node[2]
    if op == "tag":
        return node[1] == ast[1]
    if op == "id":
        return attrs.id is not None and attrs.id == ast[1]
    if op == "class":
        return attrs.is_class_member(ast[1])
    if op == "attr":
        return attrs.contains(ast[1])

    # valued attribute forms: compare lossily-decoded strings
    v = attrs.get(ast[1])
    if v is None or v is hp._MISSING:
        return False
    attr_s = v.decode("utf-8", "replace")
    val_s = ast[2].decode("utf-8", "replace")
    if op == "attr_eq":
        return attr_s == val_s
    if op == "attr_sw":
        return attr_s.startswith(val_s)
    if op == "attr_ew":
        return attr_s.endswith(val_s)
    if op == "attr_sub":
        return val_s in attr_s
    if op == "attr_ws":
        return val_s in _split_unicode_ws(attr_s)
    raise ValueError(f"unknown selector op: {op}")
