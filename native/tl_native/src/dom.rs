//! Native DOM kernel: arena parser, selector matcher, extraction and
//! serialization — the full-DOM counterpart of the extract-only scan
//! in lib.rs.
//!
//! Semantic source of truth: `tl_spark/kernel/htmlparse.py` (the arena
//! parser + TlDom read API) and `tl_spark/kernel/selector.py` (the
//! matcher); both document, with citations, the reference quirks they
//! mirror. This module is a re-expression of that Python code, NOT of
//! any reference code. Byte-for-byte equality with the Python kernel
//! is pinned by tests/test_native_dom.py (golden corpus + fuzz).
//!
//! ABI: two calls per Arrow batch.
//! - `tl_dom_query_batch`: selector extraction (document- and
//!   subtree-scoped), id/class lookups (scan + tracked modes), and
//!   whole-document outer_html, selected by a params blob (op code +
//!   mode + key + Python-compiled selector ASTs in a compact prefix
//!   encoding — the quirky selector GRAMMAR stays in Python, compiled
//!   once on the driver).
//! - `tl_parse_nodes_batch`: the node-arena explosion (one row per
//!   node: kind/name/boundaries/parent/child count/attributes in
//!   serialization order).
//!
//! All text outputs reproduce CPython's `bytes.decode("utf-8",
//! "replace")` exactly: both CPython and `String::from_utf8_lossy`
//! substitute maximal invalid subparts with one U+FFFD (verified by
//! probe; pinned by fuzz tests).

use crate::{is_void, memchr_at, take_vec, IDENT};

const KIND_TAG: u8 = 0;
const KIND_RAW: u8 = 1;
const KIND_COMMENT: u8 = 2;

type Span = (u32, u32); // byte range [start, end) into the doc

#[derive(Clone, Copy)]
struct AttrEntry {
    key: Span,
    val: Option<Span>,
}

/// Mirrors htmlparse.Attrs: id/class slots + InlineHashMap emulation
/// (plain list while <=2 entries, duplicates kept, first-wins get;
/// spills to dedup-last-wins-in-place at the 3rd insert).
struct Attrs {
    id: Option<Span>,
    class: Option<Span>,
    raw: Vec<AttrEntry>,
    spilled: bool,
}

impl Attrs {
    fn new() -> Self {
        Attrs { id: None, class: None, raw: Vec::new(), spilled: false }
    }

    fn insert_raw(&mut self, buf: &[u8], key: Span, val: Option<Span>) {
        if self.spilled {
            let kb = &buf[key.0 as usize..key.1 as usize];
            for e in self.raw.iter_mut() {
                if &buf[e.key.0 as usize..e.key.1 as usize] == kb {
                    e.val = val;
                    return;
                }
            }
            self.raw.push(AttrEntry { key, val });
        } else if self.raw.len() >= 2 {
            // spill: dedup existing (last-wins, first position kept),
            // then upsert the new entry — dict semantics
            self.spilled = true;
            let old = std::mem::take(&mut self.raw);
            for e in old {
                let kb = &buf[e.key.0 as usize..e.key.1 as usize];
                let mut replaced = false;
                for x in self.raw.iter_mut() {
                    if &buf[x.key.0 as usize..x.key.1 as usize] == kb {
                        x.val = e.val;
                        replaced = true;
                        break;
                    }
                }
                if !replaced {
                    self.raw.push(e);
                }
            }
            self.insert_raw(buf, key, val);
        } else {
            self.raw.push(AttrEntry { key, val });
        }
    }

    /// get: Some(Some(span)) valued, Some(None) valueless, None missing.
    fn get(&self, buf: &[u8], key: &[u8]) -> Option<Option<Span>> {
        if key == b"id" {
            return self.id.map(Some);
        }
        if key == b"class" {
            return self.class.map(Some);
        }
        for e in &self.raw {
            if &buf[e.key.0 as usize..e.key.1 as usize] == key {
                return Some(e.val);
            }
        }
        None
    }

    /// class tokens (byte slices) per the strict-UTF-8 +
    /// split_ascii_whitespace gate; empty when invalid UTF-8.
    fn class_members<'a>(&self, buf: &'a [u8]) -> Vec<&'a [u8]> {
        match self.class {
            None => Vec::new(),
            Some((s, e)) => {
                let v = &buf[s as usize..e as usize];
                if std::str::from_utf8(v).is_err() {
                    return Vec::new();
                }
                v.split(|b| matches!(b, b' ' | b'\t' | b'\n' | b'\x0c' | b'\r'))
                    .filter(|t| !t.is_empty())
                    .collect()
            }
        }
    }

    fn is_class_member(&self, buf: &[u8], member: &[u8]) -> bool {
        self.class_members(buf).iter().any(|t| *t == member)
    }
}

struct TagNode {
    name: Span,
    attrs: Attrs,
    children: Vec<u32>,
    rs: u32,
    re: u32,
}

enum Node {
    Tag(TagNode),
    Raw(Span),
    Comment(Span),
}

pub struct Dom<'a> {
    buf: &'a [u8],
    nodes: Vec<Node>,
    ast: Vec<u32>,
    /// tag handles in CLOSE order (populated only when `track`);
    /// tracked id lookup = last close with that id, tracked class
    /// lookup = closes in this order (htmlparse._register_close)
    close_seq: Vec<u32>,
    pub version: i8, // -1 none, 5 HTML5
}

/// Faithful port of htmlparse._Parser.parse (see that file for the
/// reference citations of every branch).
pub fn parse(buf: &[u8], track: bool) -> Dom<'_> {
    let n = buf.len();
    let mut nodes: Vec<Node> = Vec::new();
    let mut ast: Vec<u32> = Vec::new();
    let mut stack: Vec<u32> = Vec::new();
    let mut close_seq: Vec<u32> = Vec::new();
    let mut version: i8 = -1;
    let mut i = 0usize;

    macro_rules! add_to_parent {
        ($h:expr) => {
            if let Some(&top) = stack.last() {
                if let Node::Tag(t) = &mut nodes[top as usize] {
                    t.children.push($h);
                }
            } else {
                ast.push($h);
            }
        };
    }

    while i < n {
        let c = buf[i];
        if c != b'<' {
            let j = memchr_at(buf, i, b'<').unwrap_or(n);
            let h = nodes.len() as u32;
            nodes.push(Node::Raw((i as u32, j as u32)));
            add_to_parent!(h);
            i = j;
            continue;
        }

        // --- tag dispatch ---
        let start = i;
        i += 1; // skip '<'
        while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
            i += 1;
        }
        if i >= n {
            break;
        }
        let c = buf[i];

        if c == b'/' {
            // closing tag: pop only on byte-exact top-of-stack match
            i += 1;
            let j = memchr_at(buf, i, b'>').unwrap_or(n);
            let closing = &buf[i..j];
            i = j;
            if i < n {
                i += 1;
            }
            if let Some(&top) = stack.last() {
                let matches = match &nodes[top as usize] {
                    Node::Tag(t) => {
                        &buf[t.name.0 as usize..t.name.1 as usize] == closing
                    }
                    _ => false,
                };
                if matches {
                    let h = stack.pop().unwrap();
                    if let Node::Tag(t) = &mut nodes[h as usize] {
                        t.re = i as u32;
                    }
                    if track {
                        close_seq.push(h);
                    }
                }
            }
            continue;
        }

        if c == b'!' {
            // _read_markdown: comment / doctype / other bang forms
            let md_start = i.wrapping_sub(1); // '<' only when no ws skipped (quirk)
            i += 1; // skip '!'
            if buf.len() >= i + 2 && &buf[i..i + 2] == b"--" {
                // _skip_comment: ends at '--' immediately followed by '>'
                let mut ci = i;
                let span: Span;
                loop {
                    let j = find2(buf, ci, b'-', b'-');
                    match j {
                        None => {
                            i = n;
                            span = (0, 0);
                            break;
                        }
                        Some(j) => {
                            let k = j + 2;
                            if k < n && buf[k] == b'>' {
                                i = k + 1;
                                span = (md_start as u32, i as u32);
                                break;
                            }
                            if k >= n {
                                i = n;
                                span = (0, 0);
                                break;
                            }
                            ci = j + 3;
                        }
                    }
                }
                let h = nodes.len() as u32;
                nodes.push(Node::Comment(span));
                add_to_parent!(h);
                continue;
            }
            // ident, ws, doctype check
            let ts = i;
            while i < n && IDENT[buf[i] as usize] {
                i += 1;
            }
            let tag = &buf[ts..i];
            while i < n && !(buf[i] != b' ' && buf[i] != b'\n') {
                i += 1;
            }
            if tag.len() == 7 && tag.eq_ignore_ascii_case(b"doctype") {
                let ds = i;
                while i < n && IDENT[buf[i] as usize] {
                    i += 1;
                }
                let doctype = &buf[ds..i];
                if doctype.len() == 4 && doctype.eq_ignore_ascii_case(b"html") {
                    version = 5;
                }
                while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
                    i += 1;
                }
                i += 1; // skip '>' unconditionally (residue-leak quirk)
            }
            continue;
        }

        // open tag: name = ident run (charset incl. ':+/')
        let ns = i;
        while i < n && IDENT[buf[i] as usize] {
            i += 1;
        }
        let name: Span = (ns as u32, i as u32);
        while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
            i += 1;
        }

        // attributes; EOF anywhere => tag silently dropped
        let mut attrs = Attrs::new();
        let mut dropped = false;
        loop {
            while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
                i += 1;
            }
            if i >= n {
                dropped = true;
                break;
            }
            let c = buf[i];
            if c == b'/' || c == b'>' {
                break;
            }
            let ks = i;
            while i < n && IDENT[buf[i] as usize] {
                i += 1;
            }
            let k: Span = (ks as u32, i as u32);
            while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
                i += 1;
            }
            let v: Option<Span>;
            if i < n && buf[i] == b'=' {
                i += 1;
                while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
                    i += 1;
                }
                if i < n && (buf[i] == b'"' || buf[i] == b'\'') {
                    let q = buf[i];
                    i += 1;
                    let j = memchr_at(buf, i, q).unwrap_or(n);
                    v = Some((i as u32, j as u32));
                    i = j; // left AT the closing quote
                } else {
                    let mut j = i;
                    while j < n
                        && !matches!(buf[j], b' ' | b'\n' | b'/' | b'>')
                    {
                        j += 1;
                    }
                    v = Some((i as u32, j as u32));
                    i = j;
                }
            } else {
                v = None;
            }
            let kb = &buf[k.0 as usize..k.1 as usize];
            if kb == b"id" {
                attrs.id = v;
            } else if kb == b"class" {
                attrs.class = v;
            } else {
                attrs.insert_raw(buf, k, v);
            }
            if i >= n {
                dropped = true;
                break;
            }
            let c = buf[i];
            if c != b'/' && c != b'>' {
                i += 1;
            }
        }
        if dropped {
            continue;
        }

        let mut is_self_closing = false;
        if buf[i] == b'/' {
            is_self_closing = true;
            i += 1;
        }
        if i >= n || buf[i] != b'>' {
            continue; // missing '>': tag silently dropped, i NOT advanced
        }
        i += 1;

        let h = nodes.len() as u32;
        let name_bytes = &buf[name.0 as usize..name.1 as usize];
        let push_stack = !is_self_closing && !is_void(name_bytes);
        nodes.push(Node::Tag(TagNode {
            name,
            attrs,
            children: Vec::new(),
            rs: start as u32,
            re: i as u32,
        }));
        add_to_parent!(h);
        if push_stack {
            stack.push(h);
        }
    }

    Dom { buf, nodes, ast, close_seq, version }
}

/// first "ab" two-byte needle at or after `from`
#[inline]
fn find2(buf: &[u8], from: usize, a: u8, b: u8) -> Option<usize> {
    let mut i = from;
    loop {
        let j = memchr_at(buf, i, a)?;
        if j + 1 < buf.len() {
            if buf[j + 1] == b {
                return Some(j);
            }
            i = j + 1;
        } else {
            return None;
        }
    }
}

// ---------------------------------------------------------------- DOM ops

impl<'a> Dom<'a> {
    fn n_nodes(&self) -> usize {
        self.nodes.len()
    }

    /// (start, end) INCLUSIVE boundaries
    fn boundaries(&self, h: u32) -> (i32, i32) {
        match &self.nodes[h as usize] {
            Node::Tag(t) => (t.rs as i32, t.re as i32 - 1),
            Node::Raw((s, e)) | Node::Comment((s, e)) => {
                (*s as i32, *e as i32 - 1)
            }
        }
    }

    /// inner_text with caller-owned scratch buffers (hot query loop:
    /// no per-match allocation). Fragments MUST be concatenated
    /// before the lossy decode (invalid UTF-8 runs can span fragment
    /// boundaries — CPython decodes the concatenation), but the
    /// overwhelmingly common single-fragment case (<p>text</p>)
    /// decodes straight from the document buffer with zero copies.
    fn inner_text_scratch(
        &self,
        h: u32,
        out: &mut Vec<u8>,
        raw: &mut Vec<u8>,
        stack: &mut Vec<u32>,
    ) {
        match &self.nodes[h as usize] {
            Node::Raw((s, e)) => {
                push_lossy(&self.buf[*s as usize..*e as usize], out)
            }
            Node::Comment(_) => {}
            Node::Tag(_) => {
                raw.clear();
                stack.clear();
                stack.push(h);
                // defer the first fragment's copy: if it stays the
                // only one, decode it in place
                let mut first: Option<(u32, u32)> = None;
                while let Some(x) = stack.pop() {
                    match &self.nodes[x as usize] {
                        Node::Raw((s, e)) => match first {
                            None if raw.is_empty() => {
                                first = Some((*s, *e));
                            }
                            _ => {
                                if let Some((fs, fe)) = first.take() {
                                    raw.extend_from_slice(
                                        &self.buf
                                            [fs as usize..fe as usize],
                                    );
                                }
                                raw.extend_from_slice(
                                    &self.buf[*s as usize..*e as usize],
                                );
                            }
                        },
                        Node::Comment(_) => {}
                        Node::Tag(t) => {
                            for c in t.children.iter().rev() {
                                stack.push(*c);
                            }
                        }
                    }
                }
                match first {
                    Some((fs, fe)) => push_lossy(
                        &self.buf[fs as usize..fe as usize],
                        out,
                    ),
                    None => push_lossy(raw, out),
                }
            }
        }
    }

    fn open_tag(&self, t: &TagNode, out: &mut Vec<u8>) {
        out.push(b'<');
        push_lossy(&self.buf[t.name.0 as usize..t.name.1 as usize], out);
        // serialization order: raw map, then id, then class
        for e in &t.attrs.raw {
            out.push(b' ');
            push_lossy(&self.buf[e.key.0 as usize..e.key.1 as usize], out);
            if let Some((s, x)) = e.val {
                out.extend_from_slice(b"=\"");
                push_lossy(&self.buf[s as usize..x as usize], out);
                out.push(b'"');
            }
        }
        if let Some((s, x)) = t.attrs.id {
            out.extend_from_slice(b" id=\"");
            push_lossy(&self.buf[s as usize..x as usize], out);
            out.push(b'"');
        }
        if let Some((s, x)) = t.attrs.class {
            out.extend_from_slice(b" class=\"");
            push_lossy(&self.buf[s as usize..x as usize], out);
            out.push(b'"');
        }
        out.push(b'>');
    }

    /// re-serialized markup; synthesized closes; 16-entry void list
    /// (compares the LOSSY-DECODED name, like the Python kernel)
    fn outer_html(&self, h: u32, out: &mut Vec<u8>) {
        enum Item {
            Node(u32),
            Close(Vec<u8>),
        }
        let mut stack = vec![Item::Node(h)];
        while let Some(item) = stack.pop() {
            match item {
                Item::Close(s) => out.extend_from_slice(&s),
                Item::Node(x) => match &self.nodes[x as usize] {
                    Node::Raw((s, e)) | Node::Comment((s, e)) => push_lossy(
                        &self.buf[*s as usize..*e as usize],
                        out,
                    ),
                    Node::Tag(t) => {
                        let mut name_lossy = Vec::new();
                        push_lossy(
                            &self.buf[t.name.0 as usize..t.name.1 as usize],
                            &mut name_lossy,
                        );
                        self.open_tag(t, out);
                        if is_serializer_void(&name_lossy) {
                            continue;
                        }
                        let mut close = Vec::with_capacity(name_lossy.len() + 3);
                        close.extend_from_slice(b"</");
                        close.extend_from_slice(&name_lossy);
                        close.push(b'>');
                        stack.push(Item::Close(close));
                        for c in t.children.iter().rev() {
                            stack.push(Item::Node(*c));
                        }
                    }
                },
            }
        }
    }

    fn inner_html(&self, h: u32, out: &mut Vec<u8>) {
        match &self.nodes[h as usize] {
            Node::Raw((s, e)) | Node::Comment((s, e)) => {
                push_lossy(&self.buf[*s as usize..*e as usize], out)
            }
            Node::Tag(t) => {
                for c in &t.children {
                    self.outer_html(*c, out);
                }
            }
        }
    }

    fn raw_lossy(&self, h: u32, out: &mut Vec<u8>) {
        let (s, e) = match &self.nodes[h as usize] {
            Node::Tag(t) => (t.rs as usize, t.re as usize),
            Node::Raw((s, e)) | Node::Comment((s, e)) => {
                (*s as usize, *e as usize)
            }
        };
        push_lossy(&self.buf[s..e], out);
    }

    fn dom_outer_html(&self, out: &mut Vec<u8>) {
        for h in &self.ast {
            self.outer_html(*h, out);
        }
    }

    /// innermost last descendant — subtree handle range end
    fn subtree_range(&self, h: u32) -> Option<(u32, u32)> {
        let t = match &self.nodes[h as usize] {
            Node::Tag(t) if !t.children.is_empty() => t,
            _ => return None,
        };
        let first = t.children[0];
        let mut last = *t.children.last().unwrap();
        loop {
            match &self.nodes[last as usize] {
                Node::Tag(c) if !c.children.is_empty() => {
                    last = *c.children.last().unwrap();
                }
                _ => return Some((first, last)),
            }
        }
    }
}

/// serializer void list: 16 entries INCLUDING "command"
#[inline]
fn is_serializer_void(name: &[u8]) -> bool {
    matches!(
        name,
        b"area" | b"base" | b"br" | b"col" | b"command" | b"embed" | b"hr"
            | b"img" | b"input" | b"keygen" | b"link" | b"meta" | b"param"
            | b"source" | b"track" | b"wbr"
    )
}

/// CPython bytes.decode("utf-8","replace")-equivalent append (both
/// CPython and from_utf8_lossy substitute maximal invalid subparts
/// with one U+FFFD each).
fn push_lossy(bytes: &[u8], out: &mut Vec<u8>) {
    match std::str::from_utf8(bytes) {
        Ok(_) => out.extend_from_slice(bytes),
        Err(_) => {
            let s = String::from_utf8_lossy(bytes);
            out.extend_from_slice(s.as_bytes());
        }
    }
}

// ---------------------------------------------------------- selector AST

/// Compact prefix encoding produced by the Python driver (see
/// tl_spark/kernel/native_dom.py::_encode_selector). Strings are
/// length-prefixed (u16 LE).
enum Sel {
    Tag(Vec<u8>),
    Id(Vec<u8>),
    Class(Vec<u8>),
    All,
    And(Box<Sel>, Box<Sel>),
    Or(Box<Sel>, Box<Sel>),
    Dead, // Descendant / Parent: parse but never match
    Attr(Vec<u8>),
    AttrEq(Vec<u8>, Vec<u8>),
    AttrWs(Vec<u8>, Vec<u8>),
    AttrSw(Vec<u8>, Vec<u8>),
    AttrEw(Vec<u8>, Vec<u8>),
    AttrSub(Vec<u8>, Vec<u8>),
}

fn read_str(blob: &[u8], pos: &mut usize) -> Option<Vec<u8>> {
    if *pos + 2 > blob.len() {
        return None;
    }
    let n = u16::from_le_bytes([blob[*pos], blob[*pos + 1]]) as usize;
    *pos += 2;
    if *pos + n > blob.len() {
        return None;
    }
    let s = blob[*pos..*pos + n].to_vec();
    *pos += n;
    Some(s)
}

fn decode_sel(blob: &[u8], pos: &mut usize, depth: u32) -> Option<Sel> {
    if depth > 512 || *pos >= blob.len() {
        return None;
    }
    let tag = blob[*pos];
    *pos += 1;
    Some(match tag {
        0x01 => Sel::Tag(read_str(blob, pos)?),
        0x02 => Sel::Id(read_str(blob, pos)?),
        0x03 => Sel::Class(read_str(blob, pos)?),
        0x04 => Sel::All,
        0x05 => Sel::And(
            Box::new(decode_sel(blob, pos, depth + 1)?),
            Box::new(decode_sel(blob, pos, depth + 1)?),
        ),
        0x06 => Sel::Or(
            Box::new(decode_sel(blob, pos, depth + 1)?),
            Box::new(decode_sel(blob, pos, depth + 1)?),
        ),
        0x07 | 0x08 => {
            // desc/parent: consume both operands, match False
            decode_sel(blob, pos, depth + 1)?;
            decode_sel(blob, pos, depth + 1)?;
            Sel::Dead
        }
        0x09 => Sel::Attr(read_str(blob, pos)?),
        0x0A => Sel::AttrEq(read_str(blob, pos)?, read_str(blob, pos)?),
        0x0B => Sel::AttrWs(read_str(blob, pos)?, read_str(blob, pos)?),
        0x0C => Sel::AttrSw(read_str(blob, pos)?, read_str(blob, pos)?),
        0x0D => Sel::AttrEw(read_str(blob, pos)?, read_str(blob, pos)?),
        0x0E => Sel::AttrSub(read_str(blob, pos)?, read_str(blob, pos)?),
        _ => return None,
    })
}

fn lossy_owned(b: &[u8]) -> String {
    String::from_utf8_lossy(b).into_owned()
}

/// selector.py::selector_matches port
fn sel_matches(sel: &Sel, dom: &Dom, h: u32) -> bool {
    match sel {
        Sel::And(l, r) => sel_matches(l, dom, h) && sel_matches(r, dom, h),
        Sel::Or(l, r) => sel_matches(l, dom, h) || sel_matches(r, dom, h),
        Sel::All => true,
        Sel::Dead => false,
        _ => {
            let t = match &dom.nodes[h as usize] {
                Node::Tag(t) => t,
                _ => return false,
            };
            let buf = dom.buf;
            match sel {
                Sel::Tag(name) => {
                    &buf[t.name.0 as usize..t.name.1 as usize] == &name[..]
                }
                Sel::Id(v) => match t.attrs.id {
                    Some((s, e)) => &buf[s as usize..e as usize] == &v[..],
                    None => false,
                },
                Sel::Class(v) => t.attrs.is_class_member(buf, v),
                Sel::Attr(k) => t.attrs.get(buf, k).is_some(),
                Sel::AttrEq(k, v)
                | Sel::AttrWs(k, v)
                | Sel::AttrSw(k, v)
                | Sel::AttrEw(k, v)
                | Sel::AttrSub(k, v) => {
                    let got = match t.attrs.get(buf, k) {
                        Some(Some((s, e))) => {
                            &buf[s as usize..e as usize]
                        }
                        _ => return false, // valueless or missing
                    };
                    let attr_s = lossy_owned(got);
                    let val_s = lossy_owned(v);
                    match sel {
                        Sel::AttrEq(..) => attr_s == val_s,
                        Sel::AttrSw(..) => attr_s.starts_with(&val_s),
                        Sel::AttrEw(..) => attr_s.ends_with(&val_s),
                        Sel::AttrSub(..) => attr_s.contains(&val_s),
                        Sel::AttrWs(..) => {
                            // Rust str::split_whitespace = Unicode
                            // White_Space — the set selector.py pins
                            attr_s.split_whitespace().any(|t| t == val_s)
                        }
                        _ => unreachable!(),
                    }
                }
                _ => unreachable!(),
            }
        }
    }
}

// -------------------------------------------------------------- query ABI

#[repr(C)]
pub struct TlQueryOut {
    n_rows: i64,
    doc_idx: *mut i32,
    node_idx: *mut i32,
    scope_idx: *mut i32,
    start: *mut i32,
    end: *mut i32,
    text_data: *mut u8,
    text_len: i64,
    text_offs: *mut i32, // n_rows + 1
    // capacities for exact Vec reconstitution on free
    doc_cap: i64,
    node_cap: i64,
    scope_cap: i64,
    start_cap: i64,
    end_cap: i64,
    text_cap: i64,
    offs_cap: i64,
}

const OP_QS_EXTRACT: u8 = 1;
const OP_QS_SCOPED: u8 = 2;
const OP_BY_ID: u8 = 3;
const OP_BY_ID_TRACKED: u8 = 4;
const OP_BY_CLASS: u8 = 5;
const OP_BY_CLASS_TRACKED: u8 = 6;
const OP_DOC_OUTER_HTML: u8 = 7;

const MODE_INNER_TEXT: u8 = 0;
const MODE_INNER_HTML: u8 = 1;
const MODE_OUTER_HTML: u8 = 2;
const MODE_RAW: u8 = 3;

struct QueryParams {
    op: u8,
    mode: u8,
    key: Vec<u8>,
    sel: Option<Sel>,
    scope_sel: Option<Sel>,
}

fn parse_params(blob: &[u8]) -> Option<QueryParams> {
    if blob.len() < 2 {
        return None;
    }
    let op = blob[0];
    let mode = blob[1];
    if mode > MODE_RAW {
        return None;
    }
    let mut pos = 2usize;
    let key = read_str(blob, &mut pos)?;
    let read_opt_sel = |pos: &mut usize| -> Option<Option<Sel>> {
        if *pos + 4 > blob.len() {
            return None;
        }
        let n = u32::from_le_bytes(
            blob[*pos..*pos + 4].try_into().unwrap(),
        ) as usize;
        *pos += 4;
        if n == 0 {
            return Some(None);
        }
        if *pos + n > blob.len() {
            return None;
        }
        let sub = &blob[*pos..*pos + n];
        let mut sp = 0usize;
        let sel = decode_sel(sub, &mut sp, 0)?;
        if sp != sub.len() {
            return None;
        }
        *pos += n;
        Some(Some(sel))
    };
    let sel = read_opt_sel(&mut pos)?;
    let scope_sel = read_opt_sel(&mut pos)?;
    if pos != blob.len() {
        return None;
    }
    Some(QueryParams { op, mode, key, sel, scope_sel })
}

struct QueryOutBuf {
    doc: Vec<i32>,
    node: Vec<i32>,
    scope: Vec<i32>,
    start: Vec<i32>,
    end: Vec<i32>,
    text: Vec<u8>,
    offs: Vec<i32>,
    // reused across matches/docs: no per-match allocation in the
    // inner_text hot path
    scratch_raw: Vec<u8>,
    scratch_stack: Vec<u32>,
}

impl QueryOutBuf {
    fn new() -> Self {
        QueryOutBuf {
            doc: Vec::new(),
            node: Vec::new(),
            scope: Vec::new(),
            start: Vec::new(),
            end: Vec::new(),
            text: Vec::new(),
            offs: vec![0],
            scratch_raw: Vec::new(),
            scratch_stack: Vec::new(),
        }
    }

    fn push_row(
        &mut self,
        doc: i32,
        node: i32,
        scope: i32,
        se: (i32, i32),
    ) -> bool {
        self.doc.push(doc);
        self.node.push(node);
        self.scope.push(scope);
        self.start.push(se.0);
        self.end.push(se.1);
        if self.text.len() > i32::MAX as usize {
            return false;
        }
        self.offs.push(self.text.len() as i32);
        true
    }
}

fn emit_value(dom: &Dom, h: u32, mode: u8, o: &mut QueryOutBuf) {
    match mode {
        MODE_INNER_TEXT => dom.inner_text_scratch(
            h,
            &mut o.text,
            &mut o.scratch_raw,
            &mut o.scratch_stack,
        ),
        MODE_INNER_HTML => dom.inner_html(h, &mut o.text),
        MODE_OUTER_HTML => dom.outer_html(h, &mut o.text),
        _ => dom.raw_lossy(h, &mut o.text),
    }
}

fn run_query(dom: &Dom, p: &QueryParams, doc: i32, o: &mut QueryOutBuf) -> bool {
    match p.op {
        OP_QS_EXTRACT => {
            let sel = match &p.sel {
                Some(s) => s,
                None => return false,
            };
            for h in 0..dom.n_nodes() as u32 {
                if sel_matches(sel, dom, h) {
                    emit_value(dom, h, p.mode, o);
                    if !o.push_row(doc, h as i32, -1, dom.boundaries(h)) {
                        return false;
                    }
                }
            }
        }
        OP_QS_SCOPED => {
            let (sel, scope_sel) = match (&p.sel, &p.scope_sel) {
                (Some(a), Some(b)) => (a, b),
                _ => return false,
            };
            let scope = (0..dom.n_nodes() as u32)
                .find(|&h| sel_matches(scope_sel, dom, h));
            let scope = match scope {
                Some(s) => s,
                None => return true,
            };
            if let Some((first, last)) = dom.subtree_range(scope) {
                let n = dom.n_nodes() as u32;
                for h in first..=last.min(n - 1) {
                    if sel_matches(sel, dom, h) {
                        emit_value(dom, h, p.mode, o);
                        if !o.push_row(
                            doc,
                            h as i32,
                            scope as i32,
                            dom.boundaries(h),
                        ) {
                            return false;
                        }
                    }
                }
            }
        }
        OP_BY_ID | OP_BY_ID_TRACKED => {
            let hit: Option<u32> = if p.op == OP_BY_ID_TRACKED {
                // last-writer-wins in close order
                let mut found = None;
                for &h in &dom.close_seq {
                    if let Node::Tag(t) = &dom.nodes[h as usize] {
                        if let Some((s, e)) = t.attrs.id {
                            if &dom.buf[s as usize..e as usize] == &p.key[..] {
                                found = Some(h);
                            }
                        }
                    }
                }
                found
            } else {
                (0..dom.n_nodes() as u32).find(|&h| {
                    match &dom.nodes[h as usize] {
                        Node::Tag(t) => match t.attrs.id {
                            Some((s, e)) => {
                                &dom.buf[s as usize..e as usize]
                                    == &p.key[..]
                            }
                            None => false,
                        },
                        _ => false,
                    }
                })
            };
            if let Some(h) = hit {
                dom.inner_text_scratch(
                    h,
                    &mut o.text,
                    &mut o.scratch_raw,
                    &mut o.scratch_stack,
                );
                if !o.push_row(doc, h as i32, -1, dom.boundaries(h)) {
                    return false;
                }
            }
        }
        OP_BY_CLASS | OP_BY_CLASS_TRACKED => {
            let hits: Vec<u32> = if p.op == OP_BY_CLASS_TRACKED {
                dom.close_seq
                    .iter()
                    .copied()
                    .filter(|&h| match &dom.nodes[h as usize] {
                        Node::Tag(t) => {
                            t.attrs.is_class_member(dom.buf, &p.key)
                        }
                        _ => false,
                    })
                    .collect()
            } else {
                (0..dom.n_nodes() as u32)
                    .filter(|&h| match &dom.nodes[h as usize] {
                        Node::Tag(t) => {
                            t.attrs.is_class_member(dom.buf, &p.key)
                        }
                        _ => false,
                    })
                    .collect()
            };
            for h in hits {
                dom.inner_text_scratch(
                    h,
                    &mut o.text,
                    &mut o.scratch_raw,
                    &mut o.scratch_stack,
                );
                if !o.push_row(doc, h as i32, -1, dom.boundaries(h)) {
                    return false;
                }
            }
        }
        OP_DOC_OUTER_HTML => {
            dom.dom_outer_html(&mut o.text);
            if !o.push_row(doc, -1, -1, (-1, -1)) {
                return false;
            }
        }
        _ => return false,
    }
    true
}

/// # Safety
/// Same buffer contract as `tl_extract_batch` (absolute int32 Arrow
/// offsets readable to offs[base+n_docs]); `params` readable for
/// `params_len` bytes.
#[no_mangle]
pub unsafe extern "C" fn tl_dom_query_batch(
    data: *const u8,
    offs: *const i32,
    base: i64,
    n_docs: i64,
    params: *const u8,
    params_len: i64,
) -> *mut TlQueryOut {
    if n_docs < 0 || offs.is_null() || params.is_null() || params_len < 2 {
        return std::ptr::null_mut();
    }
    let n = n_docs as usize;
    let base = base as usize;
    let offs = std::slice::from_raw_parts(offs, base + n + 1);
    let total = offs[base + n] as usize;
    if total > 0 && data.is_null() {
        return std::ptr::null_mut();
    }
    let data = if total > 0 {
        std::slice::from_raw_parts(data, total)
    } else if offs[base] > 0 {
        return std::ptr::null_mut();
    } else {
        &[]
    };
    let params = std::slice::from_raw_parts(params, params_len as usize);
    let p = match parse_params(params) {
        Some(p) => p,
        None => return std::ptr::null_mut(),
    };
    let track = matches!(p.op, OP_BY_ID_TRACKED | OP_BY_CLASS_TRACKED);

    let mut o = QueryOutBuf::new();
    for d in 0..n {
        let s = offs[base + d] as usize;
        let e = offs[base + d + 1] as usize;
        let dom = parse(&data[s..e], track);
        if !run_query(&dom, &p, d as i32, &mut o) {
            return std::ptr::null_mut(); // caller falls back to Python
        }
    }

    let n_rows = o.doc.len() as i64;
    let (d_ptr, _, d_cap) = take_vec(o.doc);
    let (ni_ptr, _, ni_cap) = take_vec(o.node);
    let (sc_ptr, _, sc_cap) = take_vec(o.scope);
    let (st_ptr, _, st_cap) = take_vec(o.start);
    let (en_ptr, _, en_cap) = take_vec(o.end);
    let (t_ptr, t_len, t_cap) = take_vec(o.text);
    let (of_ptr, _, of_cap) = take_vec(o.offs);
    Box::into_raw(Box::new(TlQueryOut {
        n_rows,
        doc_idx: d_ptr,
        node_idx: ni_ptr,
        scope_idx: sc_ptr,
        start: st_ptr,
        end: en_ptr,
        text_data: t_ptr,
        text_len: t_len,
        text_offs: of_ptr,
        doc_cap: d_cap,
        node_cap: ni_cap,
        scope_cap: sc_cap,
        start_cap: st_cap,
        end_cap: en_cap,
        text_cap: t_cap,
        offs_cap: of_cap,
    }))
}

/// # Safety
/// `out` must come from `tl_dom_query_batch` and not be freed twice.
#[no_mangle]
pub unsafe extern "C" fn tl_query_free(out: *mut TlQueryOut) {
    if out.is_null() {
        return;
    }
    let o = Box::from_raw(out);
    let n = o.n_rows as usize;
    drop(Vec::from_raw_parts(o.doc_idx, n, o.doc_cap as usize));
    drop(Vec::from_raw_parts(o.node_idx, n, o.node_cap as usize));
    drop(Vec::from_raw_parts(o.scope_idx, n, o.scope_cap as usize));
    drop(Vec::from_raw_parts(o.start, n, o.start_cap as usize));
    drop(Vec::from_raw_parts(o.end, n, o.end_cap as usize));
    drop(Vec::from_raw_parts(
        o.text_data,
        o.text_len as usize,
        o.text_cap as usize,
    ));
    drop(Vec::from_raw_parts(o.text_offs, n + 1, o.offs_cap as usize));
}

// -------------------------------------------------------- parse-nodes ABI

#[repr(C)]
pub struct TlNodesOut {
    n_rows: i64,
    doc_idx: *mut i32,
    node_idx: *mut i32,
    kind: *mut i32,
    parent: *mut i32,
    n_children: *mut i32,
    start: *mut i32,
    end: *mut i32,
    name_data: *mut u8,
    name_len: i64,
    name_offs: *mut i32, // n_rows + 1 (empty for non-tag; kind gates null)
    n_attrs_total: i64,
    attr_offs: *mut i32, // n_rows + 1: attrs per node, prefix counts
    key_data: *mut u8,
    key_len: i64,
    key_offs: *mut i32, // n_attrs_total + 1
    val_data: *mut u8,
    val_len: i64,
    val_offs: *mut i32,    // n_attrs_total + 1
    val_present: *mut u8,  // n_attrs_total: 1 valued, 0 valueless
    // caps
    doc_cap: i64,
    node_cap: i64,
    kind_cap: i64,
    parent_cap: i64,
    nkids_cap: i64,
    start_cap: i64,
    end_cap: i64,
    name_cap: i64,
    name_offs_cap: i64,
    attr_offs_cap: i64,
    key_cap: i64,
    key_offs_cap: i64,
    val_cap: i64,
    val_offs_cap: i64,
    present_cap: i64,
}

/// # Safety
/// Same buffer contract as `tl_extract_batch`.
#[no_mangle]
pub unsafe extern "C" fn tl_parse_nodes_batch(
    data: *const u8,
    offs: *const i32,
    base: i64,
    n_docs: i64,
) -> *mut TlNodesOut {
    if n_docs < 0 || offs.is_null() {
        return std::ptr::null_mut();
    }
    let n = n_docs as usize;
    let base = base as usize;
    let offs = std::slice::from_raw_parts(offs, base + n + 1);
    let total = offs[base + n] as usize;
    if total > 0 && data.is_null() {
        return std::ptr::null_mut();
    }
    let data = if total > 0 {
        std::slice::from_raw_parts(data, total)
    } else if offs[base] > 0 {
        return std::ptr::null_mut();
    } else {
        &[]
    };

    let mut doc_v: Vec<i32> = Vec::new();
    let mut node_v: Vec<i32> = Vec::new();
    let mut kind_v: Vec<i32> = Vec::new();
    let mut parent_v: Vec<i32> = Vec::new();
    let mut nkids_v: Vec<i32> = Vec::new();
    let mut start_v: Vec<i32> = Vec::new();
    let mut end_v: Vec<i32> = Vec::new();
    let mut name_d: Vec<u8> = Vec::new();
    let mut name_o: Vec<i32> = vec![0];
    let mut attr_o: Vec<i32> = vec![0];
    let mut key_d: Vec<u8> = Vec::new();
    let mut key_o: Vec<i32> = vec![0];
    let mut val_d: Vec<u8> = Vec::new();
    let mut val_o: Vec<i32> = vec![0];
    let mut present: Vec<u8> = Vec::new();

    for d in 0..n {
        let s = offs[base + d] as usize;
        let e = offs[base + d + 1] as usize;
        let doc = &data[s..e];
        let dom = parse(doc, false);
        let nn = dom.nodes.len();
        let mut parents = vec![-1i32; nn];
        for (h, node) in dom.nodes.iter().enumerate() {
            if let Node::Tag(t) = node {
                for c in &t.children {
                    parents[*c as usize] = h as i32;
                }
            }
        }
        for (h, node) in dom.nodes.iter().enumerate() {
            doc_v.push(d as i32);
            node_v.push(h as i32);
            parent_v.push(parents[h]);
            let (bs, be) = dom.boundaries(h as u32);
            start_v.push(bs);
            end_v.push(be);
            match node {
                Node::Tag(t) => {
                    kind_v.push(KIND_TAG as i32);
                    nkids_v.push(t.children.len() as i32);
                    push_lossy(
                        &doc[t.name.0 as usize..t.name.1 as usize],
                        &mut name_d,
                    );
                    // attrs in serialization order: raw, id, class
                    for a in &t.attrs.raw {
                        push_lossy(
                            &doc[a.key.0 as usize..a.key.1 as usize],
                            &mut key_d,
                        );
                        key_o.push(key_d.len() as i32);
                        match a.val {
                            Some((vs, ve)) => {
                                push_lossy(
                                    &doc[vs as usize..ve as usize],
                                    &mut val_d,
                                );
                                present.push(1);
                            }
                            None => present.push(0),
                        }
                        val_o.push(val_d.len() as i32);
                    }
                    if let Some((vs, ve)) = t.attrs.id {
                        key_d.extend_from_slice(b"id");
                        key_o.push(key_d.len() as i32);
                        push_lossy(&doc[vs as usize..ve as usize], &mut val_d);
                        present.push(1);
                        val_o.push(val_d.len() as i32);
                    }
                    if let Some((vs, ve)) = t.attrs.class {
                        key_d.extend_from_slice(b"class");
                        key_o.push(key_d.len() as i32);
                        push_lossy(&doc[vs as usize..ve as usize], &mut val_d);
                        present.push(1);
                        val_o.push(val_d.len() as i32);
                    }
                }
                Node::Raw(_) => {
                    kind_v.push(KIND_RAW as i32);
                    nkids_v.push(0);
                }
                Node::Comment(_) => {
                    kind_v.push(KIND_COMMENT as i32);
                    nkids_v.push(0);
                }
            }
            name_o.push(name_d.len() as i32);
            attr_o.push(present.len() as i32);
        }
        if name_d.len() > i32::MAX as usize
            || key_d.len() > i32::MAX as usize
            || val_d.len() > i32::MAX as usize
        {
            return std::ptr::null_mut();
        }
    }

    let n_rows = doc_v.len() as i64;
    let n_attrs_total = present.len() as i64;
    let (d_ptr, _, d_cap) = take_vec(doc_v);
    let (ni_ptr, _, ni_cap) = take_vec(node_v);
    let (k_ptr, _, k_cap) = take_vec(kind_v);
    let (p_ptr, _, p_cap) = take_vec(parent_v);
    let (nk_ptr, _, nk_cap) = take_vec(nkids_v);
    let (st_ptr, _, st_cap) = take_vec(start_v);
    let (en_ptr, _, en_cap) = take_vec(end_v);
    let (nd_ptr, nd_len, nd_cap) = take_vec(name_d);
    let (no_ptr, _, no_cap) = take_vec(name_o);
    let (ao_ptr, _, ao_cap) = take_vec(attr_o);
    let (kd_ptr, kd_len, kd_cap) = take_vec(key_d);
    let (ko_ptr, _, ko_cap) = take_vec(key_o);
    let (vd_ptr, vd_len, vd_cap) = take_vec(val_d);
    let (vo_ptr, _, vo_cap) = take_vec(val_o);
    let (pr_ptr, _, pr_cap) = take_vec(present);
    Box::into_raw(Box::new(TlNodesOut {
        n_rows,
        doc_idx: d_ptr,
        node_idx: ni_ptr,
        kind: k_ptr,
        parent: p_ptr,
        n_children: nk_ptr,
        start: st_ptr,
        end: en_ptr,
        name_data: nd_ptr,
        name_len: nd_len,
        name_offs: no_ptr,
        n_attrs_total,
        attr_offs: ao_ptr,
        key_data: kd_ptr,
        key_len: kd_len,
        key_offs: ko_ptr,
        val_data: vd_ptr,
        val_len: vd_len,
        val_offs: vo_ptr,
        val_present: pr_ptr,
        doc_cap: d_cap,
        node_cap: ni_cap,
        kind_cap: k_cap,
        parent_cap: p_cap,
        nkids_cap: nk_cap,
        start_cap: st_cap,
        end_cap: en_cap,
        name_cap: nd_cap,
        name_offs_cap: no_cap,
        attr_offs_cap: ao_cap,
        key_cap: kd_cap,
        key_offs_cap: ko_cap,
        val_cap: vd_cap,
        val_offs_cap: vo_cap,
        present_cap: pr_cap,
    }))
}

/// # Safety
/// `out` must come from `tl_parse_nodes_batch` and not be freed twice.
#[no_mangle]
pub unsafe extern "C" fn tl_nodes_free(out: *mut TlNodesOut) {
    if out.is_null() {
        return;
    }
    let o = Box::from_raw(out);
    let n = o.n_rows as usize;
    let na = o.n_attrs_total as usize;
    drop(Vec::from_raw_parts(o.doc_idx, n, o.doc_cap as usize));
    drop(Vec::from_raw_parts(o.node_idx, n, o.node_cap as usize));
    drop(Vec::from_raw_parts(o.kind, n, o.kind_cap as usize));
    drop(Vec::from_raw_parts(o.parent, n, o.parent_cap as usize));
    drop(Vec::from_raw_parts(o.n_children, n, o.nkids_cap as usize));
    drop(Vec::from_raw_parts(o.start, n, o.start_cap as usize));
    drop(Vec::from_raw_parts(o.end, n, o.end_cap as usize));
    drop(Vec::from_raw_parts(
        o.name_data,
        o.name_len as usize,
        o.name_cap as usize,
    ));
    drop(Vec::from_raw_parts(o.name_offs, n + 1, o.name_offs_cap as usize));
    drop(Vec::from_raw_parts(o.attr_offs, n + 1, o.attr_offs_cap as usize));
    drop(Vec::from_raw_parts(
        o.key_data,
        o.key_len as usize,
        o.key_cap as usize,
    ));
    drop(Vec::from_raw_parts(o.key_offs, na + 1, o.key_offs_cap as usize));
    drop(Vec::from_raw_parts(
        o.val_data,
        o.val_len as usize,
        o.val_cap as usize,
    ));
    drop(Vec::from_raw_parts(o.val_offs, na + 1, o.val_offs_cap as usize));
    drop(Vec::from_raw_parts(o.val_present, na, o.present_cap as usize));
}
