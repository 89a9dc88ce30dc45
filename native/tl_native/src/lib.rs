//! Native batch extraction kernel (C ABI, std-only).
//!
//! From-scratch Rust implementation of the single-pass no-DOM HTML
//! main-content byte machine defined by this repo's Python kernel,
//! `tl_spark/kernel/htmlparse.py::extract_scan` — THAT file is the
//! semantic source of truth (it in turn documents, with citations, the
//! reference grammar it mirrors). This is not a copy of any reference
//! code: it is a line-for-line re-expression of our own Python scanner.
//!
//! ABI: one call per Arrow batch. Input is the Arrow StringArray's raw
//! data buffer + int32 offsets (zero-copy in); output is a set of
//! malloc'd arrays (concatenated text + offsets, span starts/ends +
//! offsets, node counts, version codes) that the Python side wraps as
//! Arrow buffers zero-copy and releases via `tl_batch_free`.

mod crypt;
mod doc;
mod dom;
mod entropy;
mod flac;
mod inflate;
mod pdf;
mod sha2;

/// ident charset [0-9A-Za-z\-_:+/] (htmlparse.py `_IDENT_TABLE`)
const fn make_ident() -> [bool; 256] {
    let mut t = [false; 256];
    let mut c: usize = 0;
    while c < 256 {
        let b = c as u8;
        t[c] = (b >= b'0' && b <= b'9')
            || (b >= b'A' && b <= b'Z')
            || (b >= b'a' && b <= b'z')
            || b == b'-'
            || b == b'_'
            || b == b':'
            || b == b'+'
            || b == b'/';
        c += 1;
    }
    t
}
pub(crate) static IDENT: [bool; 256] = make_ident();

/// parser void list, 15 entries (htmlparse.py `VOID_TAGS`)
#[inline]
pub(crate) fn is_void(name: &[u8]) -> bool {
    matches!(
        name,
        b"area" | b"base" | b"br" | b"col" | b"embed" | b"hr" | b"img"
            | b"input" | b"keygen" | b"link" | b"meta" | b"param"
            | b"source" | b"track" | b"wbr"
    )
}

/// SWAR memchr: first `needle` at or after `from`.
#[inline]
pub(crate) fn memchr_at(buf: &[u8], from: usize, needle: u8) -> Option<usize> {
    let b = &buf[from.min(buf.len())..];
    let n = b.len();
    let splat = (needle as u64).wrapping_mul(0x0101_0101_0101_0101);
    let mut i = 0usize;
    while i + 8 <= n {
        let w = u64::from_le_bytes(b[i..i + 8].try_into().unwrap()) ^ splat;
        let m = w.wrapping_sub(0x0101_0101_0101_0101) & !w & 0x8080_8080_8080_8080;
        if m != 0 {
            return Some(from + i + (m.trailing_zeros() / 8) as usize);
        }
        i += 8;
    }
    while i < n {
        if b[i] == needle {
            return Some(from + i);
        }
        i += 1;
    }
    None
}

/// substring search for b"--" (htmlparse.py `buf.find(b"--", i)`)
#[inline]
fn find_dashdash(buf: &[u8], mut from: usize) -> Option<usize> {
    while let Some(j) = memchr_at(buf, from, b'-') {
        if j + 1 < buf.len() {
            if buf[j + 1] == b'-' {
                return Some(j);
            }
            from = j + 1;
        } else {
            return None;
        }
    }
    None
}

/// first byte in [ \n/>] at or after `from` (htmlparse.py `_ATTR_END4`)
#[inline]
fn find_attr_end(buf: &[u8], from: usize) -> Option<usize> {
    let mut i = from;
    let n = buf.len();
    while i < n {
        let c = buf[i];
        if c == b' ' || c == b'\n' || c == b'/' || c == b'>' {
            return Some(i);
        }
        i += 1;
    }
    None
}

/// comment skip; `i` points at the byte after '!' (where "--" begins).
/// Mirrors htmlparse.py `_Parser._skip_comment` exactly.
#[inline]
fn skip_comment(buf: &[u8], start_search: usize) -> usize {
    let n = buf.len();
    let mut i = start_search;
    loop {
        match find_dashdash(buf, i) {
            None => return n,
            Some(j) => {
                let k = j + 2;
                if k < n && buf[k] == b'>' {
                    return k + 1;
                }
                if k >= n {
                    return n;
                }
                i = j + 3;
            }
        }
    }
}

/// doctype/markdown; `i` points at '!'. Returns new position, sets
/// version=5 on `<!doctype html`. Mirrors `_Parser._read_markdown`
/// (incl. the unconditional '>'-skip residue-leak quirk).
#[inline]
fn read_markdown(buf: &[u8], mut i: usize, version: &mut i8) -> usize {
    let n = buf.len();
    i += 1; // skip '!'
    let s = i;
    while i < n && IDENT[buf[i] as usize] {
        i += 1;
    }
    let tag_end = i;
    while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
        i += 1;
    }
    let tag = &buf[s..tag_end];
    if tag.len() == 7 && tag.eq_ignore_ascii_case(b"doctype") {
        let s2 = i;
        while i < n && IDENT[buf[i] as usize] {
            i += 1;
        }
        let dt = &buf[s2..i];
        if dt.len() == 4 && dt.eq_ignore_ascii_case(b"html") {
            *version = 5;
        }
        while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
            i += 1;
        }
        i += 1; // skip '>' unconditionally (residue-leak quirk)
    }
    i
}

struct DocOut<'a> {
    text: &'a mut Vec<u8>,
    span_starts: &'a mut Vec<i32>,
    span_ends: &'a mut Vec<i32>,
}

/// the extract_scan byte machine for one document
fn extract_doc(buf: &[u8], strips: &[&[u8]], out: &mut DocOut) -> (i32, i8) {
    let n = buf.len();
    // stack entries: (name byte-range, span-record index or usize::MAX, strips)
    let mut stack: Vec<((usize, usize), usize, bool)> = Vec::new();
    let mut strip_depth: u32 = 0;
    let mut n_nodes: i32 = 0;
    let mut version: i8 = -1;
    let mut i = 0usize;
    while i < n {
        let c = buf[i];
        if c != b'<' {
            // text run up to the next '<'
            let j = memchr_at(buf, i, b'<').unwrap_or(n);
            n_nodes += 1;
            if strip_depth == 0 {
                out.text.extend_from_slice(&buf[i..j]);
            }
            if stack.is_empty() {
                out.span_starts.push(i as i32);
                out.span_ends.push((j - 1) as i32);
            }
            i = j;
            continue;
        }

        let start = i;
        i += 1;
        while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
            i += 1;
        }
        if i >= n {
            break;
        }
        let c = buf[i];

        if c == b'/' {
            // closing tag: byte-exact name match against the stack top
            i += 1;
            let j = memchr_at(buf, i, b'>').unwrap_or(n);
            let closing = (i, j);
            i = j;
            if i < n {
                i += 1;
            }
            let matches_top = match stack.last() {
                Some(&((ns, ne), _, _)) => {
                    buf[ns..ne] == buf[closing.0..closing.1]
                }
                None => false,
            };
            if matches_top {
                let (_, rec, inc) = stack.pop().unwrap();
                if rec != usize::MAX {
                    out.span_ends[rec] = (i - 1) as i32;
                }
                if inc {
                    strip_depth -= 1;
                }
            }
            continue;
        }

        if c == b'!' {
            // comment only when BOTH dashes are present right after '!'
            if i + 2 < n && buf[i + 1] == b'-' && buf[i + 2] == b'-' {
                i = skip_comment(buf, i + 1);
                n_nodes += 1;
            } else {
                i = read_markdown(buf, i, &mut version);
            }
            continue;
        }

        // opening tag
        let ns = i;
        while i < n && IDENT[buf[i] as usize] {
            i += 1;
        }
        let name_r = (ns, i);
        while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
            i += 1;
        }
        // attribute scan (position only)
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
            while i < n && IDENT[buf[i] as usize] {
                i += 1;
            }
            while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
                i += 1;
            }
            if i < n && buf[i] == b'=' {
                i += 1;
                while i < n && (buf[i] == b' ' || buf[i] == b'\n') {
                    i += 1;
                }
                if i < n && (buf[i] == b'"' || buf[i] == b'\'') {
                    let q = buf[i];
                    i += 1;
                    i = memchr_at(buf, i, q).unwrap_or(n);
                } else {
                    i = find_attr_end(buf, i).unwrap_or(n);
                }
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
            continue; // silent drop: contributes nothing, counts nothing
        }
        let mut self_closing = false;
        if buf[i] == b'/' {
            self_closing = true;
            i += 1;
        }
        if i >= n || buf[i] != b'>' {
            continue;
        }
        i += 1;

        n_nodes += 1;
        let name = &buf[name_r.0..name_r.1];
        let strips_f = strips.iter().any(|s| *s == name);
        let mut rec = usize::MAX;
        if stack.is_empty() && !strips_f {
            rec = out.span_starts.len();
            out.span_starts.push(start as i32);
            out.span_ends.push((i - 1) as i32);
        }
        if !self_closing && !is_void(name) {
            stack.push((name_r, rec, strips_f));
            if strips_f {
                strip_depth += 1;
            }
        }
    }
    (n_nodes, version)
}

#[repr(C)]
pub struct TlBatchOut {
    n_docs: i64,
    text_ptr: *mut u8,
    text_len: i64,
    text_cap: i64,
    text_offs: *mut i32, // n_docs + 1
    text_offs_cap: i64,
    span_starts: *mut i32,
    span_ends: *mut i32,
    spans_len: i64,
    starts_cap: i64,
    ends_cap: i64,
    span_offs: *mut i32, // n_docs + 1 (prefix counts)
    span_offs_cap: i64,
    n_nodes: *mut i32, // n_docs
    n_nodes_cap: i64,
    version: *mut i8, // n_docs; -1 none, 5 HTML5
    version_cap: i64,
}

pub(crate) fn take_vec<T>(mut v: Vec<T>) -> (*mut T, i64, i64) {
    let ptr = v.as_mut_ptr();
    let len = v.len() as i64;
    let cap = v.capacity() as i64;
    std::mem::forget(v);
    (ptr, len, cap)
}

/// # Safety
/// `data` must be readable for `offs[base + n_docs]` bytes; `offs`
/// must hold `base + n_docs + 1` int32s; strip arrays likewise.
#[no_mangle]
pub unsafe extern "C" fn tl_extract_batch(
    data: *const u8,
    offs: *const i32,
    base: i64,
    n_docs: i64,
    strip_data: *const u8,
    strip_offs: *const i64,
    n_strips: i64,
) -> *mut TlBatchOut {
    if n_docs < 0 || (data.is_null() && n_docs > 0) || offs.is_null() {
        return std::ptr::null_mut();
    }
    let n = n_docs as usize;
    let base = base as usize;
    let offs = std::slice::from_raw_parts(offs, base + n + 1);
    let total = offs[base + n] as usize;
    let first = offs[base] as usize;
    // Offsets are absolute into the (possibly sliced) Arrow buffer, which the
    // caller guarantees readable to `total` bytes. Build the slice whenever
    // total > 0 — gating on `total > first` left `data` empty for a sliced
    // batch whose docs are all empty strings but preceded by non-empty data
    // (offs[base] == offs[base+n] > 0), and `&data[s..e]` with s=e>0 then
    // panicked across the FFI boundary, aborting the worker.
    if total > 0 && data.is_null() {
        return std::ptr::null_mut(); // caller falls back to Python
    }
    let data = if total > 0 {
        std::slice::from_raw_parts(data, total)
    } else if first > 0 {
        // Absolute offsets > 0 with a zero-length buffer is inconsistent.
        return std::ptr::null_mut();
    } else {
        &[]
    };
    let strips: Vec<&[u8]> = if n_strips > 0 {
        let so = std::slice::from_raw_parts(strip_offs, n_strips as usize + 1);
        let sd = std::slice::from_raw_parts(strip_data, so[n_strips as usize] as usize);
        (0..n_strips as usize)
            .map(|k| &sd[so[k] as usize..so[k + 1] as usize])
            .collect()
    } else {
        Vec::new()
    };

    let mut text: Vec<u8> = Vec::with_capacity(total.saturating_sub(first));
    let mut text_offs: Vec<i32> = Vec::with_capacity(n + 1);
    let mut span_starts: Vec<i32> = Vec::new();
    let mut span_ends: Vec<i32> = Vec::new();
    let mut span_offs: Vec<i32> = Vec::with_capacity(n + 1);
    let mut n_nodes: Vec<i32> = Vec::with_capacity(n);
    let mut version: Vec<i8> = Vec::with_capacity(n);
    text_offs.push(0);
    span_offs.push(0);
    for d in 0..n {
        let s = offs[base + d] as usize;
        let e = offs[base + d + 1] as usize;
        let doc = &data[s..e];
        let (nn, ver) = {
            let mut out = DocOut {
                text: &mut text,
                span_starts: &mut span_starts,
                span_ends: &mut span_ends,
            };
            extract_doc(doc, &strips, &mut out)
        };
        if text.len() > i32::MAX as usize || span_starts.len() > i32::MAX as usize {
            return std::ptr::null_mut(); // caller falls back to Python
        }
        text_offs.push(text.len() as i32);
        span_offs.push(span_starts.len() as i32);
        n_nodes.push(nn);
        version.push(ver);
    }

    let (t_ptr, t_len, t_cap) = take_vec(text);
    let (to_ptr, _, to_cap) = take_vec(text_offs);
    let (ss_ptr, ss_len, ss_cap) = take_vec(span_starts);
    let (se_ptr, _, se_cap) = take_vec(span_ends);
    let (so_ptr, _, so_cap) = take_vec(span_offs);
    let (nn_ptr, _, nn_cap) = take_vec(n_nodes);
    let (v_ptr, _, v_cap) = take_vec(version);
    Box::into_raw(Box::new(TlBatchOut {
        n_docs,
        text_ptr: t_ptr,
        text_len: t_len,
        text_cap: t_cap,
        text_offs: to_ptr,
        text_offs_cap: to_cap,
        span_starts: ss_ptr,
        span_ends: se_ptr,
        spans_len: ss_len,
        starts_cap: ss_cap,
        ends_cap: se_cap,
        span_offs: so_ptr,
        span_offs_cap: so_cap,
        n_nodes: nn_ptr,
        n_nodes_cap: nn_cap,
        version: v_ptr,
        version_cap: v_cap,
    }))
}

/// # Safety
/// `out` must come from `tl_extract_batch` and not be freed twice.
#[no_mangle]
pub unsafe extern "C" fn tl_batch_free(out: *mut TlBatchOut) {
    if out.is_null() {
        return;
    }
    let o = Box::from_raw(out);
    let n = o.n_docs as usize;
    drop(Vec::from_raw_parts(o.text_ptr, o.text_len as usize, o.text_cap as usize));
    drop(Vec::from_raw_parts(o.text_offs, n + 1, o.text_offs_cap as usize));
    drop(Vec::from_raw_parts(o.span_starts, o.spans_len as usize, o.starts_cap as usize));
    drop(Vec::from_raw_parts(o.span_ends, o.spans_len as usize, o.ends_cap as usize));
    drop(Vec::from_raw_parts(o.span_offs, n + 1, o.span_offs_cap as usize));
    drop(Vec::from_raw_parts(o.n_nodes, n, o.n_nodes_cap as usize));
    drop(Vec::from_raw_parts(o.version, n, o.version_cap as usize));
}
