"""Parity corpus: kernel output must byte-match the reference (y21/tl).

Every case cites FIXTURES.md §3 (itself citing /root/reference/src/tests.rs
lines `T:` or probe runs `P` of the compiled reference crate).
"""

from tl_spark.kernel import KIND_COMMENT, KIND_RAW, KIND_TAG, parse


# ---------- §3.1 inner_text ----------

def test_outer_html_basic():  # T:11-23
    dom = parse("abc <p>test<span>a</span></p> def")
    p = dom.children()[1]
    assert dom.outer_html(p) == "<p>test<span>a</span></p>"


def test_nested_inner_text():  # T:171-183
    dom = parse("<p>hello <p>nested element</p></p>")
    assert dom.inner_text(dom.children()[0]) == "hello nested element"


def test_inner_text_comment_contributes_nothing():  # P
    dom = parse("<div>a<!-- c -->b<span>c</span></div>")
    assert dom.inner_text(dom.children()[0]) == "abc"


def test_no_entity_decoding():  # P
    dom = parse("<p>a &amp; b &lt;c&gt; &#65;</p>")
    assert dom.inner_text(dom.children()[0]) == "a &amp; b &lt;c&gt; &#65;"


def test_script_content_parsed_as_html():  # P
    dom = parse('<script>var x = "<div>hi</div>";</script>')
    script = dom.children()[0]
    assert dom.tag_name(script) == b"script"
    assert dom.inner_text(script) == 'var x = "hi";'
    # the inner <div> is a real element in the arena
    assert any(
        n[0] == KIND_TAG and n[1] == b"div" for n in dom.nodes
    )


def test_plain_text():  # P
    dom = parse("no tags at all")
    assert len(dom.nodes) == 1
    assert dom.nodes[0][0] == KIND_RAW
    assert dom.inner_text(0) == "no tags at all"


def test_ignored_close_never_pops():  # P
    dom = parse("<div><p>one<p>two</div>")
    div = dom.children()[0]
    assert dom.inner_text(div) == "onetwo"


# ---------- §3.2 outer_html / inner_html ----------

def test_void_elements_roundtrip():  # T:25-33
    html = '<html><head></head><body><img src=""><br><hr></body></html>'
    dom = parse(html)
    assert dom.dom_outer_html() == html


def test_inner_html():  # T:36-47
    dom = parse("abc <p>test<span>a</span></p> def")
    assert dom.inner_html(dom.children()[1]) == "test<span>a</span>"


def test_mismatched_close_synthesized():  # T:727-750
    dom = parse('<span contenteditable="true">testing</a>')
    assert dom.dom_outer_html() == '<span contenteditable="true">testing</span>'


def test_uppercase_br_not_void():  # P
    dom = parse("<BR><p>t</p>")
    assert dom.dom_outer_html() == "<BR><p>t</p></BR>"


def test_slash_in_ident_br_self():  # P
    dom = parse("<br/><p>x</p>")
    # ident charset includes '/': tag name is "br/", not void
    assert dom.dom_outer_html() == "<br/><p>x</p></br/>"


def test_unclosed_div_raw_spans():  # P
    dom = parse("<div><p>x</div></p>")
    assert dom.dom_outer_html() == "<div><p>x</p></div>"
    div, p = dom.children()[0], None
    for h, n in enumerate(dom.nodes):
        if n[0] == KIND_TAG and n[1] == b"p":
            p = h
    assert dom.raw_bytes(p) == b"<p>x</div></p>"
    assert dom.raw_bytes(div) == b"<div>"


def test_tab_is_not_whitespace():  # P
    dom = parse('<p\tid="x">t</p>')
    assert dom.dom_outer_html() == '<p  id="x">t</p>'
    assert dom.tag_attrs(dom.children()[0]).id == b"x"


def test_crlf_not_whitespace():  # P
    dom = parse('<p\r\nid="x">t</p>')
    assert dom.dom_outer_html() == '<p  id="x">t</p>'


def test_spaces_around_eq():  # P
    dom = parse('<p a = "x">t</p>')
    assert dom.dom_outer_html() == '<p a="x">t</p>'


def test_dup_attrs_inline_kept():  # P
    dom = parse('<a x="1" x="2">t</a>')
    assert dom.dom_outer_html() == '<a x="1" x="2">t</a>'
    assert dom.tag_attrs(dom.children()[0]).get(b"x") == b"1"  # first wins


def test_dup_attrs_spilled_dedup_last_wins():  # P
    dom = parse('<a p="0" q="9" x="1" x="2">t</a>')
    attrs = dom.tag_attrs(dom.children()[0])
    assert attrs.get(b"x") == b"2"  # heap mode: last wins
    got = dict(attrs.iter_all())
    assert got == {b"p": b"0", b"q": b"9", b"x": b"2"}


def test_attr_order_raw_then_id_then_class():  # ref tag.rs:173-193
    dom = parse('<a class="c" href="h" id="i">t</a>')
    assert dom.dom_outer_html() == '<a href="h" id="i" class="c">t</a>'


# ---------- §3.3 dropped / ignored markup ----------

def test_stray_lt_eats_rest():  # P
    dom = parse("a < b and c")
    assert len(dom.nodes) == 1
    assert dom.inner_text(0) == "a "


def test_stray_lt_at_end():  # P
    dom = parse("a <b")
    assert len(dom.nodes) == 1
    assert dom.inner_text(0) == "a "


def test_unquoted_value_slash_drops_tag():  # P
    dom = parse("<a href=/about>x</a>")
    assert len(dom.nodes) == 1
    assert dom.nodes[0][0] == KIND_RAW
    assert dom.inner_text(0) == "about>x"


def test_abrupt_attributes_stop():  # T:240-244
    dom = parse("<p ")
    assert len(dom.nodes) == 0


def test_bang_non_doctype():  # P
    dom = parse("<! foo><p>t</p>")
    kinds = [(n[0], dom.inner_text(h)) for h, n in enumerate(dom.nodes)]
    assert dom.nodes[0][0] == KIND_RAW
    assert dom.inner_text(0) == "foo>"
    assert dom.tag_name(dom.children()[1]) == b"p"


def test_doctype_401_residue_leak():  # P
    dom = parse('<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"><p>t</p>')
    assert dom.version == "HTML5"
    assert dom.nodes[0][0] == KIND_RAW
    assert dom.inner_text(0) == 'UBLIC "-//W3C//DTD HTML 4.01//EN">'
    assert dom.tag_name(dom.children()[1]) == b"p"


def test_unterminated_comment():  # P
    dom = parse("<!-- never ends <p>x</p>")
    assert len(dom.nodes) == 1
    assert dom.nodes[0][0] == KIND_COMMENT
    assert dom.raw_bytes(0) == b""


def test_case_sensitive_close():  # P
    dom = parse("<div>t</DIV>")
    assert dom.dom_outer_html() == "<div>t</div>"
    assert dom.raw_bytes(dom.children()[0]) == b"<div>"  # unclosed


def test_empty_input():  # P
    dom = parse("")
    assert len(dom.nodes) == 0
    assert dom.children() == []


# ---------- §3.4 comments & doctype ----------

def test_comment_node_keeps_markers():  # T:640-649
    dom = parse("<!-- test -->")
    assert len(dom.nodes) == 1
    assert dom.nodes[0][0] == KIND_COMMENT
    assert dom.raw_bytes(0) == b"<!-- test -->"
    assert dom.inner_text(0) == ""


def test_comment_inner_dashdash_space():  # P
    dom = parse("<!-- a -- b -->")
    assert len(dom.nodes) == 1
    assert dom.raw_bytes(0) == b"<!-- a -- b -->"


def test_doctype_html5():  # T:121-127
    dom = parse("<!doctype html>hello")
    assert dom.version == "HTML5"
    assert len(dom.nodes) == 1
    assert dom.inner_text(0) == "hello"


# ---------- §3.5 ids / classes / selectors ----------

def test_get_element_by_id_both_modes():  # T:59-89
    html = '<div></div><p id="test"></p><p></p>'
    for kw in ({}, {"track_ids": True}):
        dom = parse(html, **kw)
        h = dom.get_element_by_id("test")
        assert h is not None
        assert dom.tag_name(h) == b"p"


def test_unclosed_modes_diverge():  # P
    html = '<div id="u"><p class="c">x'
    tracked = parse(html, track_ids=True, track_classes=True)
    assert tracked.get_element_by_id("u") is None
    assert tracked.get_elements_by_class_name("c") == []
    scan = parse(html)
    assert scan.get_element_by_id("u") is not None
    assert len(scan.get_elements_by_class_name("c")) == 1


def test_attr_keys_case_sensitive():  # P
    dom = parse('<DIV ID="x">t</DIV>')
    assert dom.get_element_by_id("x") is None
    # ID went to the raw map, not the id slot
    assert dom.tag_attrs(dom.children()[0]).get(b"ID") == b"x"


def test_class_split():  # T:92-119
    dom = parse('<p class="a b">hey</p>')
    assert len(dom.get_elements_by_class_name("a")) == 1
    assert len(dom.get_elements_by_class_name("b")) == 1
    assert dom.get_elements_by_class_name("c") == []


def test_dead_descendant_parent_combinators():  # P
    dom = parse('<div class="a"><p class="b">x</p></div>')
    assert dom.query_selector(".a .b") == []
    assert dom.query_selector(".a > .b") == []


def test_and_or_combinators():  # P
    dom = parse('<div class="a b">x</div>')
    assert len(dom.query_selector(".a.b")) == 1
    dom2 = parse('<div class="a"><p class="b">x</p></div>')
    assert len(dom2.query_selector("#nope, .b")) == 1
    assert len(dom2.query_selector("p.b")) == 1
    assert len(dom2.query_selector("[class^=a]")) == 1


def test_selector_attr_value_with_colon():  # T:587-613
    dom = parse('<div><meta property="og:title" content="hello" /></div>')
    hits = dom.query_selector('meta[property="og:title"]')
    assert len(hits) == 1
    assert dom.tag_attrs(hits[0]).get(b"content") == b"hello"


def test_selector_bare_attribute():  # README.md:41-45
    dom = parse('<img src="cool.png" />')
    assert len(dom.query_selector("img[src]")) == 1


def test_selector_value_with_space_unparseable():  # ref parser.rs:86-92
    dom = parse('<a title="two words">x</a>')
    assert dom.query_selector('[title="two words"]') is None


# ---------- §3.6 structure / spans / ordering ----------

def test_nodes_document_order():  # T:616-638
    dom = parse("<p>test</p><div><span>test2</span></div>")
    ns = dom.nodes
    assert [n[0] for n in ns] == [KIND_TAG, KIND_RAW, KIND_TAG, KIND_TAG, KIND_RAW]
    assert ns[0][1] == b"p"
    assert ns[2][1] == b"div"
    assert ns[3][1] == b"span"


def test_boundaries_nested():  # T:718-725
    dom = parse("<div><p>haha</p></div>")
    p = next(
        h for h, n in enumerate(dom.nodes) if n[0] == KIND_TAG and n[1] == b"p"
    )
    assert dom.boundaries(p) == (5, 15)


def test_boundaries_simple():  # P
    dom = parse("<p>abcd</p>")
    assert dom.boundaries(dom.children()[0]) == (0, 10)


def test_raw_text_offsets():  # P
    dom = parse("<p>abcd</p><span>ef</span>")
    raws = [
        (n[1], n[2]) for n in dom.nodes if n[0] == KIND_RAW
    ]
    assert raws == [(3, 7), (17, 19)]


def test_truncated_close_still_matches():  # T:767-780
    dom = parse("<p>abcd</p")
    assert dom.raw_bytes(dom.children()[0]) == b"<p>abcd</p"


def test_self_closing_with_space():  # T:700-707
    dom = parse("<br /><p>test</p>")
    assert len(dom.nodes) == 3
    br = dom.children()[0]
    assert dom.tag_children(br) == []
    assert dom.raw_bytes(br) == b"<br />"


def test_children_all_subtree():  # tag.rs:548-574 doctest
    dom = parse(
        '<div id="a"><div id="b"><span>Hello</span><span>World</span>'
        "<span>!</span></div></div>"
    )
    a = dom.get_element_by_id("a")
    assert len(dom.children_all(a)) == 7


def test_lowercase_void_takes_no_children():  # P
    dom = parse('<div><img src="a.png">text</div>')
    div = dom.children()[0]
    kids = dom.tag_children(div)
    assert len(kids) == 2
    assert dom.tag_name(kids[0]) == b"img"
    assert dom.nodes[kids[1]][0] == KIND_RAW


def test_deep_nesting_terminates():  # T:259-271
    dom = parse("<p>" * 10000)
    assert len(dom.nodes) == 10000
    # extraction must be iterative too
    assert dom.dom_outer_html().startswith("<p>" * 100)
    assert dom.dom_inner_text() == ""


def test_fuzz_regressions_no_crash():  # T:259-266
    for s in ("J\x00<", "<!J", "<=/Fy<=/"):
        parse(s)


def test_tag_scope_query_selector():  # tag.rs:459-467 doctest
    dom = parse(
        '<div class="x"><div class="y"><div class="z">M</div>'
        '<div class="z">M</div><div class="z">M</div></div></div>'
        '<div class="z">N</div>'
    )
    y = dom.get_elements_by_class_name("y")[0]
    hits = dom.tag_query_selector(y, ".z")
    assert len(hits) == 3
    for h in hits:
        assert dom.inner_text(h) == "M"


def test_find_node_dfs_vs_direct():  # tag.rs:655-678 vs tag.rs:473-485
    dom = parse("<div><p>a</p><ul><li><b>deep</b></li></ul></div>")
    div = dom.children()[0]
    is_b = lambda d, h: d.nodes[h][0] == KIND_TAG and d.tag_name(h) == b"b"
    # Node::find_node recurses depth-first
    hit = dom.find_node(div, is_b)
    assert hit is not None and dom.inner_text(hit) == "deep"
    # HTMLTag::find_node checks DIRECT children only
    assert dom.tag_find_node(div, is_b) is None
    is_p = lambda d, h: d.nodes[h][0] == KIND_TAG and d.tag_name(h) == b"p"
    assert dom.tag_find_node(div, is_p) == dom.find_node(div, is_p)
