//! Native whole-document PDF parser — xref chain, object store,
//! stream filters, page tree, font-closure export.
//!
//! Semantic source of truth: `tl_spark/operators/pdf.py`
//! (`PdfDocument`, `_Stream`, `_apply_filters`, `_parse_value`,
//! `pages`/`_walk_pages`/`page_content`). This is a faithful port of
//! the object/xref layer that profiling shows dominates per-document
//! time once the content interpreter is native. The contract is the
//! entropy.rs discipline, doc-grained: on ANY anomaly — parse error,
//! scan-fallback territory, /Encrypt, unsupported filter, closure cap
//! — `tl_pdf_doc_parse` returns status 1 and the caller re-runs the
//! WHOLE document through the pure-Python path, which raises the
//! precise ValueError (or succeeds via Python-only leniencies such as
//! the object-scan fallback). Native success therefore has to be
//! byte-equal to the Python path; that equivalence is pinned by
//! tests/test_native_pdf.py (whole-doc differential mutation fuzz).
//!
//! Fonts stay Python-side (they can raise ValueError from embedded
//! font programs — that must keep happening in Python): for every
//! /Font resource name this module exports a CLOSURE — the unresolved
//! root value plus every transitively referenced object, streams
//! decoded — which the Python glue materializes into `_Font` objects
//! and ships back through the existing `tl_pdf_interp_pages` blob.

use crate::crypt::a85_core;
use crate::inflate::zlib_inflate;
use crate::pdf::{LexErr, Lexer, Tok};
use std::cell::RefCell;
use std::collections::{HashMap, HashSet};
use std::rc::Rc;

pub(crate) struct Bail;

impl From<LexErr> for Bail {
    fn from(_: LexErr) -> Bail {
        Bail
    }
}

type DictVec = Vec<(Vec<u8>, FV)>;

pub(crate) struct StreamCell {
    dict: Rc<DictVec>,
    raw: Vec<u8>,
    data: RefCell<Option<Rc<Vec<u8>>>>,
    /// (objnum, gen) when this stream's bytes are encrypted
    cryptinfo: Option<(i64, i64)>,
}

#[derive(Clone)]
enum FV {
    Null,
    Bool(bool),
    Num { v: f64, is_int: bool },
    Str(Vec<u8>),
    Name(Vec<u8>),
    Kw(Vec<u8>),
    Arr(Rc<Vec<FV>>),
    Dict(Rc<DictVec>),
    Ref(i64, i64),
    Stream(Rc<StreamCell>),
    Sentinel, // bare ']'/'>>' in value position (inert, like Python's)
}

// -------------------------------------------------------- dict helpers

/// Python-dict semantics over insertion-ordered (key, value) pairs:
/// lookups see the LAST value written for a key.
fn dget<'a>(d: &'a [(Vec<u8>, FV)], k: &[u8]) -> Option<&'a FV> {
    d.iter().rev().find(|(dk, _)| dk.as_slice() == k).map(|(_, v)| v)
}

fn dhas(d: &[(Vec<u8>, FV)], k: &[u8]) -> bool {
    d.iter().any(|(dk, _)| dk.as_slice() == k)
}

/// `dict.items()` order: first-occurrence key order, last value.
fn pydict_items<'a>(d: &'a [(Vec<u8>, FV)]) -> Vec<(&'a [u8], &'a FV)> {
    let mut out: Vec<(&[u8], &FV)> = Vec::new();
    for (k, v) in d {
        match out.iter_mut().find(|(ok, _)| *ok == k.as_slice()) {
            Some(slot) => slot.1 = v,
            None => out.push((k.as_slice(), v)),
        }
    }
    out
}

/// Exact int (Python `isinstance(x, int)` contexts).
fn as_i64(fv: &FV) -> Option<i64> {
    match fv {
        FV::Num { v, is_int: true }
            if v.fract() == 0.0 && v.abs() <= 9.007199254740992e15 =>
        {
            Some(*v as i64)
        }
        _ => None,
    }
}

/// Python `int(x)` over int-or-float: truncation toward zero.
fn as_int_trunc(fv: &FV) -> Option<i64> {
    match fv {
        FV::Num { v, .. }
            if v.is_finite() && v.abs() <= 9.007199254740992e15 =>
        {
            Some(v.trunc() as i64)
        }
        _ => None,
    }
}

/// `str(x) == "<name>"` contexts: true for Name and Kw with the bytes
/// (both are str subclasses in Python whose str() is the raw text).
fn typename<'a>(fv: &'a FV) -> Option<&'a [u8]> {
    match fv {
        FV::Name(b) | FV::Kw(b) => Some(b.as_slice()),
        _ => None,
    }
}

// ---------------------------------------------------------- full parser

const PARSE_MAX_DEPTH: usize = 200;

/// Port of pdf.py `_parse_value` — but LOSSLESS (the interpreter's
/// `parse_value` in pdf.rs discards dict entries and ref numbers,
/// which the object layer needs).
fn parse_full(lx: &mut Lexer, tok: Option<Tok>, depth: usize) -> Result<FV, Bail> {
    if depth > PARSE_MAX_DEPTH {
        return Err(Bail); // "object nesting too deep"
    }
    let tok = match tok {
        Some(t) => t,
        None => lx.next()?,
    };
    match tok {
        Tok::Eof => Err(Bail), // "unexpected end of data"
        Tok::ArrOpen => {
            let mut arr = Vec::new();
            loop {
                let t = lx.next()?;
                match t {
                    Tok::ArrClose => return Ok(FV::Arr(Rc::new(arr))),
                    Tok::Eof => return Err(Bail), // unterminated array
                    other => arr.push(parse_full(lx, Some(other), depth + 1)?),
                }
            }
        }
        Tok::DictOpen => {
            let mut d: DictVec = Vec::new();
            loop {
                let t = lx.next()?;
                match t {
                    Tok::DictClose => return Ok(FV::Dict(Rc::new(d))),
                    Tok::Eof => return Err(Bail), // unterminated dict
                    Tok::Name(nm) => {
                        let v = parse_full(lx, None, depth + 1)?;
                        d.push((nm, v));
                    }
                    _ => {} // lenient: skip junk key
                }
            }
        }
        Tok::Kw(k) => Ok(match k.as_slice() {
            b"true" => FV::Bool(true),
            b"false" => FV::Bool(false),
            b"null" => FV::Null,
            _ => FV::Kw(k),
        }),
        Tok::Num { v, is_int } => {
            if is_int {
                // lookahead for "int int R"
                let t2 = lx.next()?;
                if let Tok::Num { v: v2, is_int: true } = t2 {
                    let t3 = lx.next()?;
                    if matches!(&t3, Tok::Kw(k) if k.as_slice() == b"R") {
                        // Python _Ref holds arbitrary ints; an objnum
                        // outside exact-i64 can never hit the xref →
                        // model as a number no real file uses
                        let num = if v.fract() == 0.0
                            && v.abs() <= 9.007199254740992e15
                        {
                            v as i64
                        } else {
                            i64::MIN
                        };
                        let gen = if v2.fract() == 0.0
                            && v2.abs() <= 9.007199254740992e15
                        {
                            v2 as i64
                        } else {
                            i64::MIN
                        };
                        return Ok(FV::Ref(num, gen));
                    }
                    if !matches!(t3, Tok::Eof) {
                        lx.pushback(t3);
                    }
                }
                if !matches!(t2, Tok::Eof) {
                    lx.pushback(t2);
                }
                Ok(FV::Num { v, is_int })
            } else {
                Ok(FV::Num { v, is_int })
            }
        }
        Tok::Str(s) => Ok(FV::Str(s)),
        Tok::Name(nm) => Ok(FV::Name(nm)),
        Tok::ArrClose | Tok::DictClose => Ok(FV::Sentinel),
    }
}

// ------------------------------------------------------------- filters

const MAX_DECODE_BYTES: usize = 256 * 1024 * 1024;

/// Port of `_png_predict` (incl. the adversarial /Columns row clamp).
fn png_predict(data: &[u8], colors: i64, bpc: i64, columns: i64) -> Result<Vec<u8>, Bail> {
    // Python: bpp = max(1, (colors*bpc+7)//8); rowlen from columns.
    // Negative/huge params follow Python's integer math; anything
    // that would make Python raise (negative range etc.) bails.
    let bpp_raw = colors
        .checked_mul(bpc)
        .and_then(|x| x.checked_add(7))
        .map(|x| x.div_euclid(8))
        .ok_or(Bail)?;
    let bpp = bpp_raw.max(1);
    let mut rowlen = columns
        .checked_mul(colors)
        .and_then(|x| x.checked_mul(bpc))
        .and_then(|x| x.checked_add(7))
        .map(|x| x.div_euclid(8))
        .ok_or(Bail)?;
    let cap = (data.len() as i64 - 1).max(0);
    if rowlen > cap {
        rowlen = cap;
    }
    if rowlen < 0 {
        // Python: bytearray(data[pos:pos+rowlen]) with negative rowlen
        // slices backwards to empty; row stays len<rowlen… the
        // extend() with negative count raises. Bail (fallback raises).
        return Err(Bail);
    }
    let rowlen = rowlen as usize;
    if bpp < 0 {
        return Err(Bail);
    }
    let bpp = bpp as usize;
    let mut out: Vec<u8> = Vec::new();
    let mut prev = vec![0u8; rowlen];
    let mut pos = 0usize;
    let n = data.len();
    while pos + 1 <= n {
        let ft = data[pos];
        pos += 1;
        let take = rowlen.min(n.saturating_sub(pos));
        let mut row = vec![0u8; rowlen];
        row[..take].copy_from_slice(&data[pos..pos + take]);
        // Python: pos += rowlen unconditionally (slicing past the end
        // of `data` is allowed and zero-padded above)
        pos += rowlen;
        match ft {
            0 => {}
            1 => {
                for i in bpp..rowlen {
                    row[i] = row[i].wrapping_add(row[i - bpp]);
                }
            }
            2 => {
                for i in 0..rowlen {
                    row[i] = row[i].wrapping_add(prev[i]);
                }
            }
            3 => {
                for i in 0..rowlen {
                    let left = if i >= bpp { row[i - bpp] as u16 } else { 0 };
                    row[i] = row[i]
                        .wrapping_add(((left + prev[i] as u16) >> 1) as u8);
                }
            }
            4 => {
                for i in 0..rowlen {
                    let a = if i >= bpp { row[i - bpp] as i32 } else { 0 };
                    let b = prev[i] as i32;
                    let c = if i >= bpp { prev[i - bpp] as i32 } else { 0 };
                    let p = a + b - c;
                    let (pa, pb, pc) =
                        ((p - a).abs(), (p - b).abs(), (p - c).abs());
                    let pred = if pa <= pb && pa <= pc {
                        a
                    } else if pb <= pc {
                        b
                    } else {
                        c
                    };
                    row[i] = row[i].wrapping_add(pred as u8);
                }
            }
            _ => return Err(Bail), // bad PNG predictor filter
        }
        out.extend_from_slice(&row);
        prev = row;
        if pos >= n {
            break;
        }
    }
    Ok(out)
}

/// Port of `_apply_predictor`.
fn apply_predictor(data: Vec<u8>, parms: &[(Vec<u8>, FV)]) -> Result<Vec<u8>, Bail> {
    let pred = match dget(parms, b"Predictor") {
        None => return Ok(data),
        Some(FV::Null) => return Ok(data),
        Some(FV::Num { v, .. }) => *v,
        _ => return Err(Bail), // non-numeric predictor: Python TypeError
    };
    if pred == 1.0 {
        return Ok(data);
    }
    // Colors/BitsPerComponent/Columns must be exact ints here — any
    // float/ref makes the Python row math raise (Bail = same outcome)
    let geti = |k: &[u8], dflt: i64| -> Result<i64, Bail> {
        match dget(parms, k) {
            None => Ok(dflt),
            Some(fv) => as_i64(fv).ok_or(Bail),
        }
    };
    let colors = geti(b"Colors", 1)?;
    let bpc = geti(b"BitsPerComponent", 8)?;
    let columns = geti(b"Columns", 1)?;
    if pred == 2.0 {
        if bpc != 8 {
            return Err(Bail); // TIFF predictor with bpc != 8
        }
        let rowlen_i = colors
            .checked_mul(columns)
            .ok_or(Bail)?
            .min((data.len() as i64).max(1));
        if rowlen_i < 0 || colors < 0 {
            return Err(Bail);
        }
        let rowlen = rowlen_i as usize;
        let colors = colors as usize;
        let mut out = data;
        if rowlen > 0 && out.len() >= rowlen {
            let mut r = 0usize;
            while r + rowlen <= out.len() {
                for i in colors..rowlen {
                    out[r + i] = out[r + i].wrapping_add(out[r + i - colors]);
                }
                r += rowlen;
            }
        }
        return Ok(out);
    }
    if pred >= 10.0 {
        return png_predict(&data, colors, bpc, columns);
    }
    Err(Bail) // unknown predictor
}

/// Port of `_lzw_decode` (PDF LZW: 9→12-bit MSB codes, 256=clear,
/// 257=EOD, EarlyChange widens one entry early; 256 MB output cap).
fn lzw_decode(data: &[u8], early: f64) -> Result<Vec<u8>, Bail> {
    let base = || -> Vec<Vec<u8>> {
        let mut t: Vec<Vec<u8>> = (0..256).map(|i| vec![i as u8]).collect();
        t.push(Vec::new());
        t.push(Vec::new());
        t
    };
    let mut table = base();
    let mut width: u32 = 9;
    let mut prev: Option<usize> = None; // index of prev entry in table
    let mut prev_owned: Vec<u8> = Vec::new();
    let mut acc: u64 = 0;
    let mut nbits: u32 = 0;
    let mut out: Vec<u8> = Vec::new();
    for &byte in data {
        acc = ((acc << 8) | byte as u64) & 0xffff_ffff;
        nbits += 8;
        while nbits >= width {
            let code =
                ((acc >> (nbits - width)) & ((1u64 << width) - 1)) as usize;
            nbits -= width;
            if code == 256 {
                table = base();
                width = 9;
                prev = None;
                continue;
            }
            if code == 257 {
                return Ok(out);
            }
            let entry_idx: usize;
            if prev.is_none() {
                if code >= table.len() {
                    return Err(Bail); // bad LZW start code
                }
                entry_idx = code;
            } else if code < table.len() {
                entry_idx = code;
                let mut ne = prev_owned.clone();
                if let Some(&b) = table[code].first() {
                    ne.push(b);
                }
                table.push(ne);
            } else if code == table.len() {
                let mut ne = prev_owned.clone();
                if let Some(&b) = prev_owned.first() {
                    ne.push(b);
                }
                table.push(ne);
                entry_idx = code;
            } else {
                return Err(Bail); // LZW code out of range
            }
            out.extend_from_slice(&table[entry_idx]);
            prev = Some(entry_idx);
            prev_owned = table[entry_idx].clone();
            if out.len() > MAX_DECODE_BYTES {
                return Err(Bail); // LZW output exceeds decode cap
            }
            if (table.len() as f64) >= ((1u64 << width) as f64) - early
                && width < 12
            {
                width += 1;
            }
        }
    }
    Ok(out)
}

/// Port of `_ahx_decode`: hex digits until '>', whitespace skipped,
/// odd count padded with '0'; a non-hex digit is an error
/// (`bytes.fromhex` raises → Bail).
fn ahx_decode(data: &[u8]) -> Result<Vec<u8>, Bail> {
    let mut digits: Vec<u8> = Vec::new();
    for &c in data {
        match c {
            0x00 | 0x09 | 0x0a | 0x0c | 0x0d | 0x20 => continue,
            0x3e => break, // '>'
            _ => digits.push(c),
        }
    }
    if digits.len() % 2 == 1 {
        digits.push(b'0');
    }
    let hv = |c: u8| -> Option<u8> {
        match c {
            b'0'..=b'9' => Some(c - b'0'),
            b'a'..=b'f' => Some(c - b'a' + 10),
            b'A'..=b'F' => Some(c - b'A' + 10),
            _ => None,
        }
    };
    let mut out = Vec::with_capacity(digits.len() / 2);
    for pair in digits.chunks_exact(2) {
        let h = hv(pair[0]).ok_or(Bail)?;
        let l = hv(pair[1]).ok_or(Bail)?;
        out.push((h << 4) | l);
    }
    Ok(out)
}

/// Port of `_rl_decode` (RunLengthDecode).
fn rl_decode(data: &[u8]) -> Vec<u8> {
    let mut out: Vec<u8> = Vec::new();
    let mut i = 0usize;
    let n = data.len();
    while i < n {
        let l = data[i] as usize;
        i += 1;
        if l == 128 {
            break;
        }
        if l < 128 {
            // Python: out += data[i : i+l+1] (short tail tolerated)
            let end = (i + l + 1).min(n);
            if i < n {
                out.extend_from_slice(&data[i..end]);
            }
            i += l + 1;
        } else if i < n {
            let b = data[i];
            for _ in 0..(257 - l) {
                out.push(b);
            }
            i += 1;
        }
    }
    out
}

/// Port of `_apply_filters`. `filter_fv`/`parms_fv` are the RESOLVED
/// top-level values (nested items stay unresolved, as in Python).
fn apply_filters(
    raw: Vec<u8>,
    filter_fv: &FV,
    parms_fv: &FV,
) -> Result<Vec<u8>, Bail> {
    let single_f;
    let filters: &[FV] = match filter_fv {
        FV::Null => return Ok(raw),
        FV::Arr(a) => a.as_slice(),
        other => {
            single_f = [other.clone()];
            &single_f
        }
    };
    // parms: list → zip (min length); non-list → replicated
    let empty: DictVec = Vec::new();
    enum P<'a> {
        List(&'a [FV]),
        Rep(&'a FV),
    }
    let parms = match parms_fv {
        FV::Arr(a) => P::List(a.as_slice()),
        other => P::Rep(other),
    };
    let n_apply = match &parms {
        P::List(l) => filters.len().min(l.len()),
        P::Rep(_) => filters.len(),
    };
    let mut data = raw;
    for i in 0..n_apply {
        let f = &filters[i];
        let p_fv = match &parms {
            P::List(l) => &l[i],
            P::Rep(r) => *r,
        };
        let p: &DictVec = match p_fv {
            FV::Dict(d) => d,
            _ => &empty, // incl. unresolved Refs: Python isinstance → {}
        };
        let name = typename(f).ok_or(Bail)?; // str(f) of non-name → unknown
        match name {
            b"FlateDecode" | b"Fl" => {
                data = zlib_inflate(&data, MAX_DECODE_BYTES)
                    .map_err(|_| Bail)?;
                data = apply_predictor(data, p)?;
            }
            b"LZWDecode" | b"LZW" => {
                let early = match dget(p, b"EarlyChange") {
                    None => 1.0,
                    Some(FV::Num { v, .. }) => *v,
                    // non-numeric EarlyChange: Python raises on first
                    // width check (or silently succeeds on empty
                    // input) — bail either way, the fallback replays
                    Some(_) => return Err(Bail),
                };
                data = lzw_decode(&data, early)?;
                data = apply_predictor(data, p)?;
            }
            b"ASCIIHexDecode" | b"AHx" => {
                data = ahx_decode(&data)?;
            }
            b"ASCII85Decode" | b"A85" => {
                // Python may route via base64.a85decode for inputs
                // with a '~>' terminator; a85_core is the scanner the
                // fast path is pinned against (crypt.rs / fuzz)
                data = a85_core(&data).map_err(|_| Bail)?;
            }
            b"RunLengthDecode" | b"RL" => {
                data = rl_decode(&data);
            }
            b"DCTDecode" | b"DCT" | b"JPXDecode" | b"CCITTFaxDecode" => {
                // image codecs: passthrough — Python returns the data
                // as-is WITHOUT applying the remaining filters
                return Ok(data);
            }
            _ => return Err(Bail), // Crypt / unknown filter
        }
    }
    Ok(data)
}

// ----------------------------------------------------------- document

#[derive(Clone, Copy)]
enum Ent {
    Off(i64),
    InStm(i64, i64),
    /// xref-stream row whose needed field had width 0 (Python stores
    /// None and raises at use time)
    BadAtUse,
}

struct Doc<'a> {
    buf: &'a [u8],
    xref: HashMap<i64, Ent>,
    trailer: DictVec, // setdefault semantics: first writer wins
    cache: HashMap<i64, Option<FV>>,
    objstm_cache: HashMap<i64, Rc<Vec<(i64, FV)>>>,
    inflight: HashSet<i64>,
    crypt: Option<Rc<Crypt>>,
    crypt_skip: HashSet<i64>,
}

impl<'a> Doc<'a> {
    fn new(buf: &'a [u8]) -> Doc<'a> {
        Doc {
            buf,
            xref: HashMap::new(),
            trailer: Vec::new(),
            cache: HashMap::new(),
            objstm_cache: HashMap::new(),
            inflight: HashSet::new(),
            crypt: None,
            crypt_skip: HashSet::new(),
        }
    }

    fn tset(&mut self, k: &[u8], v: FV) {
        if !dhas(&self.trailer, k) {
            self.trailer.push((k.to_vec(), v));
        }
    }

    // -- xref ---------------------------------------------------------

    fn load_xref_chain(&mut self) -> Result<(), Bail> {
        let tail_start = self.buf.len().saturating_sub(2048);
        let tail = &self.buf[tail_start..];
        let idx = find_last(tail, b"startxref").ok_or(Bail)?;
        let mut lx = Lexer::new_at(tail, idx + b"startxref".len());
        let off_fv = parse_tok_int(&mut lx)?;
        let mut off = off_fv;
        let mut seen: HashSet<i64> = HashSet::new();
        loop {
            let o = match off {
                Some(o) => o,
                None => break,
            };
            if seen.contains(&o) || o < 0 || o >= self.buf.len() as i64 {
                break;
            }
            seen.insert(o);
            off = self.load_xref_section(o)?;
        }
        Ok(())
    }

    fn load_xref_section(&mut self, off: i64) -> Result<Option<i64>, Bail> {
        let mut lx = Lexer::new_at(self.buf, off as usize);
        let tok = lx.next()?;
        if matches!(&tok, Tok::Kw(k) if k.as_slice() == b"xref") {
            return self.load_classic_xref(&mut lx);
        }
        if !matches!(&tok, Tok::Num { is_int: true, .. }) {
            return Err(Bail); // bad xref section
        }
        let (_, val) = self.parse_indirect_at(off as usize)?;
        let stream = match val {
            FV::Stream(s) => s,
            _ => return Err(Bail), // xref offset does not point at a stream
        };
        self.load_xref_stream(&stream)?;
        for (k, v) in pydict_items(&stream.dict) {
            let (k, v) = (k.to_vec(), v.clone());
            self.tset(&k, v);
        }
        // Prev: must behave like Python's int check in the chain loop
        match dget(&stream.dict, b"Prev") {
            None => Ok(None),
            Some(fv) => match as_i64(fv) {
                Some(p) => Ok(Some(p)),
                None => Err(Bail), // non-int Prev → Python TypeErrors
            },
        }
    }

    fn load_classic_xref(&mut self, lx: &mut Lexer) -> Result<Option<i64>, Bail> {
        loop {
            let tok = lx.next()?;
            if matches!(&tok, Tok::Kw(k) if k.as_slice() == b"trailer") {
                break;
            }
            let start = match &tok {
                Tok::Num { v, is_int: true } => int_exact(*v).ok_or(Bail)?,
                _ => return Err(Bail), // bad xref subsection
            };
            let cnt = match lx.next()? {
                Tok::Num { v, is_int: true } => int_exact(v).ok_or(Bail)?,
                _ => return Err(Bail), // bad xref count
            };
            if cnt < 0 || cnt > 50_000_000 {
                // Python iterates any count; a billion-entry header is
                // a bomb either way — bail (fallback replays)
                if cnt < 0 {
                    // Python: range(negative) is empty — no entries
                    continue;
                }
                return Err(Bail);
            }
            for i in 0..cnt {
                let f1 = match lx.next()? {
                    Tok::Num { v, is_int: true } => int_exact(v),
                    _ => return Err(Bail), // bad xref entry
                };
                let _f2 = match lx.next()? {
                    Tok::Num { v, is_int: true } => int_exact(v),
                    _ => return Err(Bail),
                };
                let ty = lx.next()?;
                let num = start + i;
                if matches!(&ty, Tok::Kw(k) if k.as_slice() == b"n")
                    && !self.xref.contains_key(&num)
                {
                    match f1 {
                        Some(o) => {
                            self.xref.insert(num, Ent::Off(o));
                        }
                        None => {
                            self.xref.insert(num, Ent::BadAtUse);
                        }
                    }
                }
            }
        }
        let trailer = parse_full(lx, None, 0)?;
        let tdict = match &trailer {
            FV::Dict(d) => d.clone(),
            _ => return Err(Bail), // bad trailer
        };
        // hybrid-reference: /XRefStm supplements and wins for its rows;
        // failures inside are swallowed (Python: try/except pass)
        if let Some(fv) = dget(&tdict, b"XRefStm") {
            if let Some(x) = as_i64(fv) {
                if x >= 0 {
                    let saved_cache = self.cache.clone();
                    let saved_objstm: Vec<i64> =
                        self.objstm_cache.keys().copied().collect();
                    let ok = (|| -> Result<(), Bail> {
                        let (_, val) = self.parse_indirect_at(x as usize)?;
                        if let FV::Stream(s) = val {
                            self.load_xref_stream(&s)?;
                        }
                        Ok(())
                    })();
                    if ok.is_err() {
                        // Python's except:pass keeps cache side effects;
                        // cheapest faithful behavior is to keep ours too
                        let _ = (saved_cache, saved_objstm);
                    }
                }
            }
            // non-int XRefStm: Python skips (isinstance check)
        }
        for (k, v) in pydict_items(&tdict) {
            let (k, v) = (k.to_vec(), v.clone());
            self.tset(&k, v);
        }
        match dget(&tdict, b"Prev") {
            None => Ok(None),
            Some(fv) => match as_i64(fv) {
                Some(p) => Ok(Some(p)),
                None => Err(Bail),
            },
        }
    }

    fn load_xref_stream(&mut self, stream: &Rc<StreamCell>) -> Result<(), Bail> {
        let w_fv = dget(&stream.dict, b"W").ok_or(Bail)?;
        let w: Vec<i64> = match w_fv {
            FV::Arr(a) => {
                let mut out = Vec::with_capacity(a.len());
                for x in a.iter() {
                    out.push(as_int_trunc(x).ok_or(Bail)?);
                }
                out
            }
            _ => return Err(Bail),
        };
        if w.len() < 3 {
            return Err(Bail); // bad /W
        }
        for &width in &w {
            if !(0..=8).contains(&width) {
                return Err(Bail); // Python tolerates these with garbage
                                  // results; bail → fallback replays
            }
        }
        let size = {
            let fv = dget(&stream.dict, b"Size").cloned().unwrap_or(FV::Num {
                v: 0.0,
                is_int: true,
            });
            let r = self.resolve(&fv)?;
            as_int_trunc(&r).ok_or(Bail)?
        };
        let index: Vec<i64> = match dget(&stream.dict, b"Index") {
            None => vec![0, size],
            Some(FV::Arr(a)) => {
                let mut out = Vec::with_capacity(a.len());
                for x in a.iter() {
                    out.push(as_int_trunc(x).ok_or(Bail)?);
                }
                out
            }
            Some(_) => return Err(Bail),
        };
        let data = self.stream_data(stream)?;
        let rowlen: i64 = w.iter().sum();
        if rowlen <= 0 {
            // Python: rowlen 0 → infinite loop guard is pos+rowlen>len
            // never triggering… actually pos never advances past data;
            // with rowlen 0 every row reads empty fields forever over
            // cnt entries — terminates (cnt-bounded) with ty=1,f=0
            // rows. Bail instead: fallback replays identically.
            return Err(Bail);
        }
        let rowlen = rowlen as usize;
        let mut pos = 0usize;
        let mut k = 0usize;
        while k + 1 < index.len() {
            let start = index[k];
            let cnt = index[k + 1];
            k += 2;
            if cnt < 0 {
                continue; // range(negative) is empty
            }
            for i in 0..cnt {
                if pos + rowlen > data.len() {
                    return Ok(()); // Python: return early
                }
                let row = &data[pos..pos + rowlen];
                pos += rowlen;
                let mut o = 0usize;
                let mut fields: [Option<i64>; 3] = [None, None, None];
                for (fi, &width) in w.iter().enumerate() {
                    let v = if width > 0 {
                        let wz = width as usize;
                        let mut acc: i64 = 0;
                        for &b in &row[o..o + wz] {
                            acc = (acc << 8) | b as i64;
                        }
                        o += wz;
                        Some(acc)
                    } else {
                        None
                    };
                    if fi < 3 {
                        fields[fi] = v;
                    }
                }
                let ty = if w[0] > 0 { fields[0].unwrap_or(1) } else { 1 };
                let num = start + i;
                if self.xref.contains_key(&num) {
                    continue;
                }
                if ty == 1 {
                    match fields[1] {
                        Some(f1) => {
                            self.xref.insert(num, Ent::Off(f1));
                        }
                        None => {
                            self.xref.insert(num, Ent::BadAtUse);
                        }
                    }
                } else if ty == 2 {
                    match (fields[1], fields[2]) {
                        (Some(f1), Some(f2)) => {
                            self.xref.insert(num, Ent::InStm(f1, f2));
                        }
                        _ => {
                            self.xref.insert(num, Ent::BadAtUse);
                        }
                    }
                }
                // other types (incl. 0 free): skip
            }
        }
        Ok(())
    }

    // -- objects ------------------------------------------------------

    fn parse_indirect_at(&mut self, off: usize) -> Result<(i64, FV), Bail> {
        let mut lx = Lexer::new_at(self.buf, off);
        let num = match lx.next()? {
            Tok::Num { v, is_int: true } => int_exact(v).ok_or(Bail)?,
            _ => return Err(Bail), // no indirect object at off
        };
        let gen = match lx.next()? {
            Tok::Num { v, is_int: true } => int_exact(v).ok_or(Bail)?,
            _ => return Err(Bail),
        };
        match lx.next()? {
            Tok::Kw(k) if k.as_slice() == b"obj" => {}
            _ => return Err(Bail),
        }
        let val = parse_full(&mut lx, None, 0)?;
        let tok = lx.next()?;
        let do_crypt = self.crypt.is_some() && !self.crypt_skip.contains(&num);
        if matches!(&tok, Tok::Kw(k) if k.as_slice() == b"stream") {
            let d = match &val {
                FV::Dict(d) => d.clone(),
                _ => return Err(Bail), // stream without dict
            };
            let mut p = lx.pos;
            let n = self.buf.len();
            if p + 1 < n && &self.buf[p..p + 2] == b"\r\n" {
                p += 2;
            } else if p < n && (self.buf[p] == b'\n' || self.buf[p] == b'\r') {
                p += 1;
            }
            let length_fv = dget(&d, b"Length").cloned().unwrap_or(FV::Null);
            let length = self.resolve(&length_fv)?;
            let mut raw: Option<Vec<u8>> = None;
            if let Some(l) = as_i64(&length) {
                if l >= 0 {
                    let lu = l as usize;
                    let end = (p + lu).min(n);
                    let cand = if p <= n { &self.buf[p.min(n)..end] } else { &[][..] };
                    let a_end = (p + lu + 20).min(n);
                    let after = if p + lu <= n {
                        &self.buf[p + lu..a_end]
                    } else {
                        &[][..]
                    };
                    // Python slices past the end silently; cand may be
                    // short — the `endstream in after` check then fails
                    // and the lenient path takes over
                    if cand.len() == lu && contains(after, b"endstream") {
                        raw = Some(cand.to_vec());
                    }
                }
            }
            let raw = match raw {
                Some(r) => r,
                None => {
                    let end = find_from(self.buf, b"endstream", p)
                        .ok_or(Bail)?; // unterminated stream
                    let mut r = &self.buf[p.min(n)..end];
                    if r.ends_with(b"\r\n") {
                        r = &r[..r.len() - 2];
                    } else if r.ends_with(b"\n") || r.ends_with(b"\r") {
                        r = &r[..r.len() - 1];
                    }
                    r.to_vec()
                }
            };
            let mut d = d;
            let mut cryptinfo = None;
            if do_crypt {
                let crypt = match &self.crypt {
                    Some(c) => c.clone(),
                    None => return Err(Bail), // unreachable
                };
                let dv = crypt.decrypt_value(&FV::Dict(d), num, gen)?;
                d = match dv {
                    FV::Dict(nd) => nd,
                    _ => return Err(Bail), // unreachable
                };
                // xref streams are never encrypted; /Metadata follows
                // the EncryptMetadata flag (PdfDocument._parse_indirect_at)
                let t = dget(&d, b"Type").and_then(typename).unwrap_or(b"");
                if t != b"XRef" && (t != b"Metadata" || crypt.encrypt_metadata)
                {
                    cryptinfo = Some((num, gen));
                }
            }
            return Ok((
                num,
                FV::Stream(Rc::new(StreamCell {
                    dict: d,
                    raw,
                    data: RefCell::new(None),
                    cryptinfo,
                })),
            ));
        }
        if do_crypt {
            let crypt = match &self.crypt {
                Some(c) => c.clone(),
                None => return Err(Bail), // unreachable
            };
            return Ok((num, crypt.decrypt_value(&val, num, gen)?));
        }
        Ok((num, val))
    }

    fn stream_data(&mut self, s: &Rc<StreamCell>) -> Result<Rc<Vec<u8>>, Bail> {
        if let Some(d) = s.data.borrow().as_ref() {
            return Ok(d.clone());
        }
        let filter_fv = dget(&s.dict, b"Filter").cloned().unwrap_or(FV::Null);
        let parms_fv =
            dget(&s.dict, b"DecodeParms").cloned().unwrap_or(FV::Null);
        let filter_r = self.resolve(&filter_fv)?;
        let parms_r = self.resolve(&parms_fv)?;
        let raw = match (&s.cryptinfo, &self.crypt) {
            (Some((num, gen)), Some(c)) => {
                c.clone().decrypt_stream(&s.raw, *num, *gen)?
            }
            _ => s.raw.clone(),
        };
        let out = apply_filters(raw, &filter_r, &parms_r)?;
        let rc = Rc::new(out);
        *s.data.borrow_mut() = Some(rc.clone());
        Ok(rc)
    }

    fn load_objstm(&mut self, stm_num: i64) -> Result<Rc<Vec<(i64, FV)>>, Bail> {
        if let Some(objs) = self.objstm_cache.get(&stm_num) {
            return Ok(objs.clone());
        }
        let stream = match self.get(stm_num)? {
            Some(FV::Stream(s)) => s,
            _ => return Err(Bail), // object stream missing
        };
        let data = self.stream_data(&stream)?;
        let n = {
            let fv = dget(&stream.dict, b"N").cloned().unwrap_or(FV::Num {
                v: 0.0,
                is_int: true,
            });
            let r = self.resolve(&fv)?;
            as_int_trunc(&r).ok_or(Bail)?
        };
        let first = {
            let fv =
                dget(&stream.dict, b"First").cloned().unwrap_or(FV::Num {
                    v: 0.0,
                    is_int: true,
                });
            let r = self.resolve(&fv)?;
            as_int_trunc(&r).ok_or(Bail)?
        };
        if n < 0 || n > 1_000_000 {
            if n < 0 {
                // Python: range(negative) empty → zero members
                let rc = Rc::new(Vec::new());
                self.objstm_cache.insert(stm_num, rc.clone());
                return Ok(rc);
            }
            return Err(Bail); // bomb guard; fallback replays
        }
        let mut hdr = Lexer::new(&data);
        let mut pairs: Vec<(i64, i64)> = Vec::with_capacity(n as usize);
        for _ in 0..n {
            let onum = match hdr.next()? {
                Tok::Num { v, is_int: true } => int_exact(v).ok_or(Bail)?,
                _ => return Err(Bail), // bad objstm header
            };
            let ooff = match hdr.next()? {
                Tok::Num { v, is_int: true } => int_exact(v).ok_or(Bail)?,
                _ => return Err(Bail),
            };
            pairs.push((onum, ooff));
        }
        let mut objs: Vec<(i64, FV)> = Vec::with_capacity(pairs.len());
        for (onum, ooff) in pairs {
            let at = first.checked_add(ooff).ok_or(Bail)?;
            if at < 0 {
                return Err(Bail); // Python: negative slice start → junk
            }
            let at = (at as usize).min(data.len());
            let mut lxo = Lexer::new_at(&data, at);
            let v = parse_full(&mut lxo, None, 0)?;
            objs.push((onum, v));
        }
        let rc = Rc::new(objs);
        self.objstm_cache.insert(stm_num, rc.clone());
        Ok(rc)
    }

    fn get(&mut self, num: i64) -> Result<Option<FV>, Bail> {
        if let Some(v) = self.cache.get(&num) {
            return Ok(v.clone());
        }
        let ent = match self.xref.get(&num) {
            None => {
                self.cache.insert(num, None);
                return Ok(None);
            }
            Some(e) => *e,
        };
        if self.inflight.contains(&num) {
            return Err(Bail); // circular object reference
        }
        self.inflight.insert(num);
        let res = self.get_uncached(num, ent);
        self.inflight.remove(&num);
        res
    }

    fn get_uncached(&mut self, num: i64, ent: Ent) -> Result<Option<FV>, Bail> {
        let val: Option<FV> = match ent {
            Ent::BadAtUse => return Err(Bail), // Python TypeErrors at use
            Ent::Off(off) => {
                if off < 0 || off as usize >= self.buf.len() {
                    // Python: lexer at a bad offset → "no indirect
                    // object" → lazy rescan (not ported) → Bail
                    return Err(Bail);
                }
                let (got, v) = self.parse_indirect_at(off as usize)?;
                if got != num {
                    return Err(Bail); // lazy-rescan territory → Python
                }
                Some(v)
            }
            Ent::InStm(stm_num, idx) => {
                let objs = self.load_objstm(stm_num)?;
                let mut found: Option<FV> = None;
                if idx >= 0 && (idx as usize) < objs.len() {
                    let (onum, v) = &objs[idx as usize];
                    if *onum == num {
                        found = Some(v.clone());
                    }
                }
                if found.is_none() {
                    for (onum, v) in objs.iter() {
                        if *onum == num {
                            found = Some(v.clone());
                            break;
                        }
                    }
                }
                found // not found → None (cached)
            }
        };
        self.cache.insert(num, val.clone());
        Ok(val)
    }

    fn resolve(&mut self, fv: &FV) -> Result<FV, Bail> {
        let mut cur = fv.clone();
        let mut seen = 0u32;
        while let FV::Ref(num, _) = cur {
            cur = match self.get(num)? {
                Some(v) => v,
                None => FV::Null,
            };
            seen += 1;
            if seen > 32 {
                return Err(Bail); // reference loop
            }
        }
        Ok(cur)
    }
}

// ------------------------------------------------------------ page walk

struct PageRec {
    contents_fv: FV,  // unresolved value from the page node
    resources_fv: FV, // unresolved (node's own or inherited)
}

const INHERIT: [&[u8]; 4] =
    [b"Resources", b"MediaBox", b"CropBox", b"Rotate"];

fn walk_pages(
    doc: &mut Doc,
    node_fv: &FV,
    inherited: &DictVec,
    out: &mut Vec<PageRec>,
    seen: &mut HashSet<i64>,
    depth: usize,
) -> Result<(), Bail> {
    if depth > 256 {
        return Err(Bail); // page tree too deep
    }
    // track the objnum identity of ref-resolved nodes (= Python id())
    let mut node_obj: Option<i64> = None;
    if let FV::Ref(n, _) = node_fv {
        node_obj = Some(*n);
    }
    let node = doc.resolve(node_fv)?;
    let nd = match &node {
        FV::Dict(d) => d.clone(),
        _ => return Ok(()),
    };
    if let Some(n) = node_obj {
        if seen.contains(&n) {
            return Ok(());
        }
        seen.insert(n);
    }
    if out.len() > 100_000 {
        return Ok(());
    }
    let mut inh: DictVec = inherited.clone();
    for k in INHERIT {
        if let Some(v) = dget(&nd, k) {
            // Python dict assignment: overwrite
            inh.retain(|(ik, _)| ik.as_slice() != k);
            inh.push((k.to_vec(), v.clone()));
        }
    }
    let is_page = typename(
        dget(&nd, b"Type").unwrap_or(&FV::Null),
    )
    .map(|t| t == b"Page")
    .unwrap_or(false)
        || (!dhas(&nd, b"Kids")
            && (dhas(&nd, b"Contents") || dhas(&inh, b"MediaBox")));
    if is_page {
        let contents_fv =
            dget(&nd, b"Contents").cloned().unwrap_or(FV::Null);
        // page = {**inh, **node}: Resources = node's else inherited
        let resources_fv = dget(&nd, b"Resources")
            .or_else(|| dget(&inh, b"Resources"))
            .cloned()
            .unwrap_or(FV::Null);
        out.push(PageRec { contents_fv, resources_fv });
        return Ok(());
    }
    let kids_fv = dget(&nd, b"Kids").cloned().unwrap_or(FV::Arr(Rc::new(
        Vec::new(),
    )));
    let kids = doc.resolve(&kids_fv)?;
    if let FV::Arr(a) = kids {
        for kid in a.iter() {
            walk_pages(doc, kid, &inh, out, seen, depth + 1)?;
        }
    }
    Ok(())
}

fn page_content(doc: &mut Doc, c_fv: &FV) -> Result<Vec<u8>, Bail> {
    let c = doc.resolve(c_fv)?;
    match c {
        FV::Null => Ok(Vec::new()),
        FV::Stream(s) => Ok((*doc.stream_data(&s)?).clone()),
        FV::Arr(items) => {
            let mut parts: Vec<Vec<u8>> = Vec::new();
            for part in items.iter() {
                let p = doc.resolve(part)?;
                if let FV::Stream(s) = p {
                    parts.push((*doc.stream_data(&s)?).clone());
                }
            }
            Ok(parts.join(&b"\n"[..]))
        }
        _ => Ok(Vec::new()),
    }
}

// -------------------------------------------------- closure serializer

const CLOSURE_MAX_OBJS: usize = 256;
const CLOSURE_MAX_BYTES: usize = 4 * 1024 * 1024;

fn w32(out: &mut Vec<u8>, v: usize) -> Result<(), Bail> {
    let v32: u32 = v.try_into().map_err(|_| Bail)?;
    out.extend_from_slice(&v32.to_le_bytes());
    Ok(())
}

fn wi64(out: &mut Vec<u8>, v: i64) {
    out.extend_from_slice(&v.to_le_bytes());
}

/// Serialize one value; refs found anywhere EXCEPT inside stream dicts
/// are pushed onto `queue` (the Python font builder never resolves
/// through a stream's own dict).
fn ser_value(
    doc: &mut Doc,
    fv: &FV,
    out: &mut Vec<u8>,
    queue: Option<&mut Vec<i64>>,
    depth: usize,
) -> Result<(), Bail> {
    if depth > 64 || out.len() > CLOSURE_MAX_BYTES {
        return Err(Bail);
    }
    let mut q = queue;
    match fv {
        FV::Null => out.push(0),
        FV::Bool(b) => {
            out.push(1);
            out.push(*b as u8);
        }
        FV::Num { v, is_int } => {
            if *is_int {
                let i = int_exact(*v).ok_or(Bail)?;
                out.push(2);
                wi64(out, i);
            } else {
                out.push(3);
                out.extend_from_slice(&v.to_le_bytes());
            }
        }
        FV::Str(b) => {
            out.push(4);
            w32(out, b.len())?;
            out.extend_from_slice(b);
        }
        FV::Name(b) => {
            out.push(5);
            w32(out, b.len())?;
            out.extend_from_slice(b);
        }
        FV::Kw(b) => {
            out.push(10);
            w32(out, b.len())?;
            out.extend_from_slice(b);
        }
        FV::Arr(a) => {
            out.push(6);
            w32(out, a.len())?;
            for item in a.iter() {
                ser_value(doc, item, out, q.as_deref_mut(), depth + 1)?;
            }
        }
        FV::Dict(d) => {
            out.push(7);
            let items = pydict_items(d);
            w32(out, items.len())?;
            for (k, v) in items {
                w32(out, k.len())?;
                out.extend_from_slice(k);
                ser_value(doc, v, out, q.as_deref_mut(), depth + 1)?;
            }
        }
        FV::Ref(n, g) => {
            out.push(8);
            wi64(out, *n);
            wi64(out, *g);
            if let Some(qq) = q.as_deref_mut() {
                qq.push(*n);
            }
        }
        FV::Stream(s) => {
            // decoded data; a decode failure becomes tag 11 so the
            // Python shim's .data raises ValueError lazily — exactly
            // where the Python path would raise (ToUnicode failures
            // are even swallowed there)
            match doc.stream_data(s) {
                Ok(data) => {
                    out.push(9);
                    let dd = (*s.dict).clone();
                    ser_value(
                        doc,
                        &FV::Dict(Rc::new(dd)),
                        out,
                        None,
                        depth + 1,
                    )?;
                    w32(out, data.len())?;
                    if out.len() + data.len() > CLOSURE_MAX_BYTES {
                        return Err(Bail);
                    }
                    out.extend_from_slice(&data);
                }
                Err(Bail) => {
                    out.push(11);
                    let dd = (*s.dict).clone();
                    ser_value(
                        doc,
                        &FV::Dict(Rc::new(dd)),
                        out,
                        None,
                        depth + 1,
                    )?;
                }
            }
        }
        FV::Sentinel => out.push(12),
    }
    Ok(())
}

/// The closure: root value (unresolved) + the transitive ref store.
fn ser_closure(doc: &mut Doc, root: &FV) -> Result<Vec<u8>, Bail> {
    let mut rootbuf: Vec<u8> = Vec::new();
    let mut queue: Vec<i64> = Vec::new();
    ser_value(doc, root, &mut rootbuf, Some(&mut queue), 0)?;
    let mut visited: HashSet<i64> = HashSet::new();
    let mut entries: Vec<(i64, Vec<u8>)> = Vec::new();
    let mut total = rootbuf.len();
    while let Some(n) = queue.pop() {
        if !visited.insert(n) {
            continue;
        }
        if visited.len() > CLOSURE_MAX_OBJS {
            return Err(Bail);
        }
        let obj = doc.get(n)?;
        let fv = match obj {
            None => continue, // absent from store → shim resolves to None
            Some(v) => v,
        };
        let mut b: Vec<u8> = Vec::new();
        ser_value(doc, &fv, &mut b, Some(&mut queue), 0)?;
        total += b.len() + 12;
        if total > CLOSURE_MAX_BYTES {
            return Err(Bail);
        }
        entries.push((n, b));
    }
    let mut out: Vec<u8> = Vec::new();
    w32(&mut out, entries.len())?;
    for (n, b) in entries {
        wi64(&mut out, n);
        out.extend_from_slice(&b);
    }
    out.extend_from_slice(&rootbuf);
    Ok(out)
}

// --------------------------------------------------------- blob builder

fn find_sub(hay: &[u8], needle: &[u8]) -> Option<usize> {
    if needle.is_empty() || hay.len() < needle.len() {
        return None;
    }
    hay.windows(needle.len()).position(|w| w == needle)
}

fn find_from(hay: &[u8], needle: &[u8], from: usize) -> Option<usize> {
    if from >= hay.len() {
        return None;
    }
    find_sub(&hay[from..], needle).map(|i| i + from)
}

fn find_last(hay: &[u8], needle: &[u8]) -> Option<usize> {
    if needle.is_empty() || hay.len() < needle.len() {
        return None;
    }
    (0..=hay.len() - needle.len())
        .rev()
        .find(|&i| &hay[i..i + needle.len()] == needle)
}

fn contains(hay: &[u8], needle: &[u8]) -> bool {
    find_sub(hay, needle).is_some()
}

fn int_exact(v: f64) -> Option<i64> {
    if v.fract() == 0.0 && v.abs() <= 9.007199254740992e15 {
        Some(v as i64)
    } else {
        None
    }
}

/// Parse the next token as a strict int (Python `isinstance(x, int)`).
fn parse_tok_int(lx: &mut Lexer) -> Result<Option<i64>, Bail> {
    match lx.next()? {
        Tok::Num { v, is_int: true } => {
            Ok(Some(int_exact(v).ok_or(Bail)?))
        }
        _ => Err(Bail), // bad startxref
    }
}

pub(crate) fn build_doc_blob(raw: &[u8]) -> Result<Vec<u8>, Bail> {
    // header leniency: junk before %PDF allowed up to 1024 bytes
    let buf: &[u8] = if raw.starts_with(b"%PDF") {
        raw
    } else {
        match find_sub(raw, b"%PDF") {
            Some(idx) if idx <= 1024 => &raw[idx..],
            _ => return Err(Bail), // not a PDF
        }
    };
    let mut doc = Doc::new(buf);
    doc.load_xref_chain()?; // any failure → Python's scan fallback
    if !dhas(&doc.trailer, b"Root") {
        return Err(Bail); // scan-fallback territory
    }
    let enc_fv = dget(&doc.trailer, b"Encrypt").cloned();
    match enc_fv {
        None | Some(FV::Null) => {}
        Some(enc_fv) => {
            // PdfDocument._setup_encryption: never decrypt the
            // /Encrypt dictionary's own strings
            if let FV::Ref(n, _) = &enc_fv {
                doc.crypt_skip.insert(*n);
            }
            let enc_d = match doc.resolve(&enc_fv)? {
                FV::Dict(d) => d,
                _ => return Err(Bail), // bad /Encrypt dictionary
            };
            let mut id0: Vec<u8> = Vec::new();
            let ids_fv =
                dget(&doc.trailer, b"ID").cloned().unwrap_or(FV::Null);
            if let FV::Arr(a) = doc.resolve(&ids_fv)? {
                if let Some(first) = a.first() {
                    if let FV::Str(b) = doc.resolve(first)? {
                        id0 = b;
                    }
                }
            }
            let crypt = Crypt::new(&mut doc, &enc_d, &id0)?;
            doc.crypt = Some(Rc::new(crypt));
            // objects parsed before the handler existed still hold
            // ciphertext strings/streams — re-parse on demand
            doc.cache.clear();
            doc.objstm_cache.clear();
        }
    }
    let root_fv = dget(&doc.trailer, b"Root").cloned().unwrap_or(FV::Null);
    let root = doc.resolve(&root_fv)?;
    let rd = match &root {
        FV::Dict(d) => d.clone(),
        _ => return Err(Bail), // bad catalog
    };
    let mut pages: Vec<PageRec> = Vec::new();
    if let Some(pfv) = dget(&rd, b"Pages") {
        let pfv = pfv.clone();
        walk_pages(&mut doc, &pfv, &Vec::new(), &mut pages, &mut HashSet::new(), 0)?;
    }
    // per page: content bytes + font table (name → closure idx)
    let mut contents: Vec<Vec<u8>> = Vec::with_capacity(pages.len());
    let mut page_tables: Vec<Vec<(Vec<u8>, u32)>> =
        Vec::with_capacity(pages.len());
    let mut closures: Vec<Vec<u8>> = Vec::new();
    let mut closure_idx: HashMap<Vec<u8>, u32> = HashMap::new();
    for p in &pages {
        contents.push(page_content(&mut doc, &p.contents_fv)?);
        let res = doc.resolve(&p.resources_fv)?;
        let fr = match &res {
            FV::Dict(d) => {
                let f = dget(d, b"Font").cloned().unwrap_or(FV::Null);
                doc.resolve(&f)?
            }
            _ => FV::Null,
        };
        let mut table: Vec<(Vec<u8>, u32)> = Vec::new();
        if let FV::Dict(fd) = &fr {
            for (name, val) in pydict_items(fd) {
                let cb = ser_closure(&mut doc, val)?;
                let idx = match closure_idx.get(&cb) {
                    Some(&i) => i,
                    None => {
                        let i: u32 =
                            closures.len().try_into().map_err(|_| Bail)?;
                        closures.push(cb.clone());
                        closure_idx.insert(cb, i);
                        i
                    }
                };
                table.push((name.to_vec(), idx));
            }
        }
        page_tables.push(table);
    }
    // group pages by font-table equality (content-addressed: equal
    // tables build byte-equal interp blobs)
    let mut groups: Vec<Vec<(Vec<u8>, u32)>> = Vec::new();
    let mut group_of: Vec<u32> = Vec::with_capacity(pages.len());
    {
        let mut key_to_group: HashMap<Vec<u8>, u32> = HashMap::new();
        for t in &page_tables {
            let mut key: Vec<u8> = Vec::new();
            for (nm, ix) in t {
                let _ = w32(&mut key, nm.len());
                key.extend_from_slice(nm);
                key.extend_from_slice(&ix.to_le_bytes());
            }
            let gid = match key_to_group.get(&key) {
                Some(&g) => g,
                None => {
                    let g: u32 =
                        groups.len().try_into().map_err(|_| Bail)?;
                    groups.push(t.clone());
                    key_to_group.insert(key, g);
                    g
                }
            };
            group_of.push(gid);
        }
    }
    // serialize: see kernel/native_pdf.py::doc_chunks for the reader
    let mut out: Vec<u8> = Vec::new();
    out.extend_from_slice(b"TLPD");
    w32(&mut out, 1)?; // version
    w32(&mut out, pages.len())?;
    for (i, c) in contents.iter().enumerate() {
        w32(&mut out, group_of[i] as usize)?;
        w32(&mut out, c.len())?;
        out.extend_from_slice(c);
    }
    w32(&mut out, groups.len())?;
    for g in &groups {
        w32(&mut out, g.len())?;
        for (nm, ix) in g {
            w32(&mut out, nm.len())?;
            out.extend_from_slice(nm);
            w32(&mut out, *ix as usize)?;
        }
    }
    w32(&mut out, closures.len())?;
    for c in &closures {
        w32(&mut out, c.len())?;
        out.extend_from_slice(c);
    }
    Ok(out)
}

// ----------------------------------------------------------------- FFI

/// Whole-document parse: status 0 + blob on success, status 1 = the
/// caller must run the pure-Python path. Free with `tl_bytes_free`.
///
/// # Safety
/// `data` readable for `data_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_pdf_doc_parse(
    data: *const u8,
    data_len: i64,
) -> *mut crate::crypt::TlBytesOut {
    if data_len < 0 || (data.is_null() && data_len > 0) {
        return crate::crypt::bytes_out(1, Vec::new());
    }
    let data = if data_len > 0 {
        std::slice::from_raw_parts(data, data_len as usize)
    } else {
        &[]
    };
    match build_doc_blob(data) {
        Ok(b) => crate::crypt::bytes_out(0, b),
        Err(Bail) => crate::crypt::bytes_out(1, Vec::new()),
    }
}

/// Test-only hook: raw zlib inflate with `_flate_decode` semantics
/// (256 MB cap). status 0 = success (possibly partial output for
/// truncated input, like Python), 1 = corruption → Python raises.
/// Exists so tests/test_native_pdf.py can differential-fuzz the
/// from-scratch inflate directly against CPython's zlib.
///
/// # Safety
/// `data` readable for `data_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_zlib_inflate_test(
    data: *const u8,
    data_len: i64,
) -> *mut crate::crypt::TlBytesOut {
    if data_len < 0 || (data.is_null() && data_len > 0) {
        return crate::crypt::bytes_out(1, Vec::new());
    }
    let data = if data_len > 0 {
        std::slice::from_raw_parts(data, data_len as usize)
    } else {
        &[]
    };
    match zlib_inflate(data, MAX_DECODE_BYTES) {
        Ok(b) => crate::crypt::bytes_out(0, b),
        Err(_) => crate::crypt::bytes_out(1, Vec::new()),
    }
}

// ------------------------------------------------------- decryption
//
// Port of tl_spark/operators/pdf_crypt.py StandardSecurityHandler for
// the R2-R4 family (RC4 V1/V2, V4 crypt filters with V2/AESV2) and the
// empty user/owner password — the schemes the whole-doc leg can see in
// a crawl. V5/R5-R6 (AES-256, SHA-2 hardened hash) stays Python-side:
// the doc leg bails and the pure-Python handler takes over. Every
// ValueError the Python handler can raise maps to Bail here (the
// fallback re-raises the exact message).

const MD5_T: [u32; 64] = [
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391,
];

const MD5_S: [u32; 64] = [
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21,
];

/// RFC 1321 MD5 (verified against hashlib by tests/test_native_pdf.py
/// through the encrypted-fixture parity path — a single wrong constant
/// fails key derivation and the whole leg bails, caught by the
/// "doc leg engaged on every variant" assertion).
pub(crate) fn md5(msg: &[u8]) -> [u8; 16] {
    let (mut a0, mut b0, mut c0, mut d0): (u32, u32, u32, u32) =
        (0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476);
    let ml = (msg.len() as u64).wrapping_mul(8);
    let mut padded = msg.to_vec();
    padded.push(0x80);
    while padded.len() % 64 != 56 {
        padded.push(0);
    }
    padded.extend_from_slice(&ml.to_le_bytes());
    for chunk in padded.chunks_exact(64) {
        let mut m = [0u32; 16];
        for (j, w) in m.iter_mut().enumerate() {
            *w = u32::from_le_bytes([
                chunk[4 * j],
                chunk[4 * j + 1],
                chunk[4 * j + 2],
                chunk[4 * j + 3],
            ]);
        }
        let (mut a, mut b, mut c, mut d) = (a0, b0, c0, d0);
        for i in 0..64 {
            let (f, g) = match i {
                0..=15 => ((b & c) | (!b & d), i),
                16..=31 => ((d & b) | (!d & c), (5 * i + 1) % 16),
                32..=47 => (b ^ c ^ d, (3 * i + 5) % 16),
                _ => (c ^ (b | !d), (7 * i) % 16),
            };
            let f = f
                .wrapping_add(a)
                .wrapping_add(MD5_T[i])
                .wrapping_add(m[g]);
            a = d;
            d = c;
            c = b;
            b = b.wrapping_add(f.rotate_left(MD5_S[i]));
        }
        a0 = a0.wrapping_add(a);
        b0 = b0.wrapping_add(b);
        c0 = c0.wrapping_add(c);
        d0 = d0.wrapping_add(d);
    }
    let mut out = [0u8; 16];
    out[0..4].copy_from_slice(&a0.to_le_bytes());
    out[4..8].copy_from_slice(&b0.to_le_bytes());
    out[8..12].copy_from_slice(&c0.to_le_bytes());
    out[12..16].copy_from_slice(&d0.to_le_bytes());
    out
}

const PDF_PAD: [u8; 32] = [
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
];

#[derive(Clone, Copy, PartialEq)]
enum Method {
    None,
    Rc4,
    Aes,
}

pub(crate) struct Crypt {
    key: Vec<u8>,
    stm: Method,
    strm: Method,
    encrypt_metadata: bool,
    v5: bool, // AES-256 (R5/R6): file key used directly, no salting
}

/// Python truthiness over parsed PDF values (`bool(resolve(x))`).
fn pybool(fv: &FV) -> bool {
    match fv {
        FV::Null => false,
        FV::Bool(b) => *b,
        FV::Num { v, .. } => *v != 0.0, // NaN != 0.0 → truthy, like Python
        FV::Str(b) | FV::Name(b) | FV::Kw(b) => !b.is_empty(),
        FV::Arr(a) => !a.is_empty(),
        FV::Dict(d) => !d.is_empty(),
        FV::Stream(_) | FV::Sentinel => true,
        FV::Ref(..) => true, // unreachable post-resolve
    }
}

/// ISO 32000-2 Algorithm 2.B (R6 hardened hash) / the R5 plain
/// SHA-256, shared salt+udata shape (pdf_crypt._r56_hash).
fn r56_hash(pwd: &[u8], salt: &[u8], udata: &[u8], r: i64) -> Result<Vec<u8>, Bail> {
    use crate::crypt::aes_cbc_encrypt_core;
    use crate::sha2::{sha256, sha384, sha512};

    let mut msg = pwd.to_vec();
    msg.extend_from_slice(salt);
    msg.extend_from_slice(udata);
    let mut k: Vec<u8> = sha256(&msg).to_vec();
    if r == 5 {
        return Ok(k);
    }
    let mut i: u32 = 0;
    loop {
        let mut unit = pwd.to_vec();
        unit.extend_from_slice(&k);
        unit.extend_from_slice(udata);
        let mut k1 = Vec::with_capacity(unit.len() * 64);
        for _ in 0..64 {
            k1.extend_from_slice(&unit);
        }
        let key16: [u8; 16] = k[..16].try_into().map_err(|_| Bail)?;
        let iv: [u8; 16] = k[16..32].try_into().map_err(|_| Bail)?;
        let e = aes_cbc_encrypt_core(&key16, &iv, &k1).ok_or(Bail)?;
        let sum: u32 = e[..16].iter().map(|&b| b as u32).sum();
        k = match sum % 3 {
            0 => sha256(&e).to_vec(),
            1 => sha384(&e).to_vec(),
            _ => sha512(&e).to_vec(),
        };
        i += 1;
        if i >= 64 {
            let last = *e.last().ok_or(Bail)?;
            if (last as u32) <= i - 32 {
                k.truncate(32);
                return Ok(k);
            }
        }
        if i > 100_000 {
            return Err(Bail); // cannot happen (last<=i-32 by i=287)
        }
    }
}

fn alg2_file_key(
    padded_pwd: &[u8],
    o: &[u8],
    p: u32,
    id0: &[u8],
    r: i64,
    n: usize,
    encrypt_metadata: bool,
) -> Vec<u8> {
    let mut msg = Vec::with_capacity(96);
    msg.extend_from_slice(padded_pwd);
    msg.extend_from_slice(&o[..o.len().min(32)]);
    msg.extend_from_slice(&p.to_le_bytes()); // <i of the masked P
    msg.extend_from_slice(id0);
    if !encrypt_metadata && r >= 4 {
        msg.extend_from_slice(&[0xff, 0xff, 0xff, 0xff]);
    }
    let h = md5(&msg);
    let mut key = h[..n.min(16)].to_vec();
    if r >= 3 {
        for _ in 0..50 {
            let d = md5(&key[..n.min(key.len())]);
            key = d[..n.min(16)].to_vec();
        }
    }
    key.truncate(n);
    key
}

fn alg45_user_check(key: &[u8], u: &[u8], id0: &[u8], r: i64) -> bool {
    use crate::crypt::rc4_core;

    if key.is_empty() {
        return false; // rc4 with an empty key: Python would ZeroDivision
    }
    if r == 2 {
        let x = rc4_core(key, &PDF_PAD);
        return u.len() >= 32 && x == u[..32];
    }
    let mut msg = PDF_PAD.to_vec();
    msg.extend_from_slice(id0);
    let t = md5(&msg);
    let mut x = rc4_core(key, &t);
    for i in 1u8..20 {
        let k2: Vec<u8> = key.iter().map(|b| b ^ i).collect();
        x = rc4_core(&k2, &x);
    }
    u.len() >= 16 && x[..16] == u[..16]
}

fn alg3_owner_key(owner_padded: &[u8], r: i64, n: usize) -> Vec<u8> {
    let mut h = md5(owner_padded);
    if r >= 3 {
        for _ in 0..50 {
            h = md5(&h);
        }
    }
    h[..n.min(16)].to_vec()
}

impl Crypt {
    /// Mirror of StandardSecurityHandler.__init__ + _authenticate for
    /// R2-R4. `enc` is the RESOLVED /Encrypt dict; nested values are
    /// resolved through `doc` exactly like the Python resolve hook.
    fn new(doc: &mut Doc, enc: &DictVec, id0: &[u8]) -> Result<Crypt, Bail> {
        use crate::crypt::rc4_core;

        let rsv = |doc: &mut Doc, d: &DictVec, k: &[u8]| -> Result<Option<FV>, Bail> {
            match dget(d, k) {
                None => Ok(None),
                Some(fv) => Ok(Some(doc.resolve(fv)?)),
            }
        };
        match rsv(doc, enc, b"Filter")? {
            Some(fv) if typename(&fv) == Some(b"Standard") => {}
            _ => return Err(Bail), // unsupported encryption filter
        }
        let geti = |doc: &mut Doc, d: &DictVec, k: &[u8], dflt: i64| -> Result<i64, Bail> {
            match dget(d, k) {
                None => Ok(dflt),
                Some(fv) => {
                    let r = doc.resolve(fv)?;
                    as_int_trunc(&r).ok_or(Bail)
                }
            }
        };
        let v = geti(doc, enc, b"V", 0)?;
        let r = geti(doc, enc, b"R", 0)?;
        let v5 = v == 5 && matches!(r, 5 | 6);
        if !v5 && (!matches!(v, 1 | 2 | 4) || !matches!(r, 2 | 3 | 4)) {
            // exotic V/R mixes: Python side (or its ValueError)
            return Err(Bail);
        }
        let o = match rsv(doc, enc, b"O")? {
            Some(FV::Str(b)) => b,
            _ => return Err(Bail), // bad /O
        };
        let u = match rsv(doc, enc, b"U")? {
            Some(FV::Str(b)) => b,
            _ => return Err(Bail), // bad /U
        };
        let p = (geti(doc, enc, b"P", -1)? & 0xFFFF_FFFF) as u32;
        let encrypt_metadata = match rsv(doc, enc, b"EncryptMetadata")? {
            None => true,
            Some(fv) => pybool(&fv),
        };
        let length_bits = geti(doc, enc, b"Length", 40)?;
        let mut n: i64 = if length_bits >= 40 {
            length_bits.div_euclid(8)
        } else {
            length_bits
        };
        let mut stm = Method::Rc4;
        let mut strm = Method::Rc4;
        if v == 4 {
            let cf: Rc<DictVec> = match rsv(doc, enc, b"CF")? {
                Some(FV::Dict(d)) => d,
                Some(fv) if !pybool(&fv) => Rc::new(Vec::new()),
                None => Rc::new(Vec::new()),
                Some(_) => return Err(Bail), // cf.get → AttributeError
            };
            let fname = |doc: &mut Doc, d: &DictVec, k: &[u8]| -> Result<Vec<u8>, Bail> {
                match dget(d, k) {
                    None => Ok(b"Identity".to_vec()),
                    Some(fv) => {
                        let rv = doc.resolve(fv)?;
                        typename(&rv).map(|b| b.to_vec()).ok_or(Bail)
                    }
                }
            };
            let stmf = fname(doc, enc, b"StmF")?;
            let strf = fname(doc, enc, b"StrF")?;
            let mut method = |doc: &mut Doc, name: &[u8]| -> Result<(Method, i64), Bail> {
                if name == b"Identity" {
                    return Ok((Method::None, n));
                }
                let f = match dget(&cf, name) {
                    None => return Err(Bail), // missing crypt filter
                    Some(fv) => doc.resolve(fv)?,
                };
                let fd = match &f {
                    FV::Dict(d) => d.clone(),
                    _ => return Err(Bail),
                };
                let cfm = match dget(&fd, b"CFM") {
                    None => Vec::new(),
                    Some(fv) => {
                        let rv = doc.resolve(fv)?;
                        typename(&rv).map(|b| b.to_vec()).ok_or(Bail)?
                    }
                };
                let mut ln = geti(doc, &fd, b"Length", n)?;
                if ln >= 40 {
                    ln = ln.div_euclid(8);
                }
                match cfm.as_slice() {
                    b"V2" => Ok((Method::Rc4, ln)),
                    b"AESV2" => Ok((Method::Aes, 16)),
                    _ => Err(Bail), // unsupported crypt filter method
                }
            };
            let (m1, n1) = method(doc, &stmf)?;
            let (m2, n2) = method(doc, &strf)?;
            stm = m1;
            strm = m2;
            n = n1.max(n2);
        }
        if v5 {
            // ISO 32000-2 AES-256: validation salts in /U and /O, the
            // file key wrapped in /UE //OE (empty user, then owner pwd)
            use crate::crypt::aes_cbc_core;

            let _ = n;
            if u.len() < 48 {
                return Err(Bail); // bad /U for R5/R6
            }
            let wrapped: Vec<u8>;
            let ik: Vec<u8>;
            if r56_hash(b"", &u[32..40], b"", r)?.as_slice() == &u[..32] {
                let ue = match rsv(doc, enc, b"UE")? {
                    Some(FV::Str(b)) if b.len() >= 32 => b,
                    _ => return Err(Bail), // bad /UE
                };
                ik = r56_hash(b"", &u[40..48], b"", r)?;
                wrapped = ue[..32].to_vec();
            } else if o.len() >= 48
                && r56_hash(b"", &o[32..40], &u[..48], r)?.as_slice()
                    == &o[..32]
            {
                let oe = match rsv(doc, enc, b"OE")? {
                    Some(FV::Str(b)) if b.len() >= 32 => b,
                    _ => return Err(Bail), // bad /OE
                };
                ik = r56_hash(b"", &o[40..48], &u[..48], r)?;
                wrapped = oe[..32].to_vec();
            } else {
                return Err(Bail); // password-protected (non-empty pwd)
            }
            let key =
                aes_cbc_core(&ik, &[0u8; 16], &wrapped).ok_or(Bail)?;
            return Ok(Crypt {
                key,
                stm: Method::Aes,
                strm: Method::Aes,
                encrypt_metadata,
                v5: true,
            });
        }
        let n = n.clamp(5, 16) as usize;
        // authenticate: empty USER password, then empty OWNER password
        let key = alg2_file_key(&PDF_PAD, &o, p, id0, r, n, encrypt_metadata);
        let key = if alg45_user_check(&key, &u, id0, r) {
            key
        } else {
            let okey = alg3_owner_key(&PDF_PAD, r, n);
            if okey.is_empty() {
                return Err(Bail);
            }
            let user_padded: Vec<u8> = if r == 2 {
                rc4_core(&okey, &o[..o.len().min(32)])
            } else {
                let mut d = o[..o.len().min(32)].to_vec();
                for i in (0u8..20).rev() {
                    let k2: Vec<u8> = okey.iter().map(|b| b ^ i).collect();
                    d = rc4_core(&k2, &d);
                }
                d
            };
            let key2 = alg2_file_key(
                &user_padded[..user_padded.len().min(32)],
                &o,
                p,
                id0,
                r,
                n,
                encrypt_metadata,
            );
            if !alg45_user_check(&key2, &u, id0, r) {
                return Err(Bail); // password-protected (non-empty pwd)
            }
            key2
        };
        Ok(Crypt { key, stm, strm, encrypt_metadata, v5: false })
    }

    fn obj_key(&self, num: i64, gen: i64, aes: bool) -> Vec<u8> {
        if self.v5 {
            return self.key.clone(); // AES-256: no per-object salting
        }
        let mut msg = self.key.clone();
        let nm = (num & 0xFF_FFFF) as u32;
        msg.extend_from_slice(&nm.to_le_bytes()[..3]);
        let gn = (gen & 0xFFFF) as u16;
        msg.extend_from_slice(&gn.to_le_bytes());
        if aes {
            msg.extend_from_slice(b"sAlT");
        }
        let h = md5(&msg);
        h[..(self.key.len() + 5).min(16)].to_vec()
    }

    fn apply(&self, method: Method, data: &[u8], num: i64, gen: i64) -> Result<Vec<u8>, Bail> {
        use crate::crypt::{aes_cbc_core, rc4_core};

        match method {
            Method::None => Ok(data.to_vec()),
            _ if data.is_empty() => Ok(data.to_vec()),
            Method::Rc4 => {
                let k = self.obj_key(num, gen, false);
                if k.is_empty() {
                    return Err(Bail);
                }
                Ok(rc4_core(&k, data))
            }
            Method::Aes => {
                let k = self.obj_key(num, gen, true);
                if data.len() < 16 {
                    return Err(Bail); // AES ciphertext shorter than IV
                }
                let iv: [u8; 16] = match data[..16].try_into() {
                    Ok(x) => x,
                    Err(_) => return Err(Bail),
                };
                let ct = &data[16..];
                let ct = &ct[..ct.len() - ct.len() % 16]; // ragged tail
                let pt = aes_cbc_core(&k, &iv, ct).ok_or(Bail)?;
                // lenient PKCS#7 unpad (pdf_crypt.aes_cbc_decrypt)
                if let Some(&last) = pt.last() {
                    let nn = last as usize;
                    if (1..=16).contains(&nn) && nn <= pt.len() {
                        return Ok(pt[..pt.len() - nn].to_vec());
                    }
                }
                Ok(pt)
            }
        }
    }

    fn decrypt_stream(&self, data: &[u8], num: i64, gen: i64) -> Result<Vec<u8>, Bail> {
        self.apply(self.stm, data, num, gen)
    }

    /// decrypt_object: every Str anywhere in the value tree.
    fn decrypt_value(&self, fv: &FV, num: i64, gen: i64) -> Result<FV, Bail> {
        match fv {
            FV::Str(b) => Ok(FV::Str(self.apply(self.strm, b, num, gen)?)),
            FV::Arr(a) => {
                let mut out = Vec::with_capacity(a.len());
                for v in a.iter() {
                    out.push(self.decrypt_value(v, num, gen)?);
                }
                Ok(FV::Arr(Rc::new(out)))
            }
            FV::Dict(d) => {
                let mut out: DictVec = Vec::with_capacity(d.len());
                for (k, v) in d.iter() {
                    out.push((k.clone(), self.decrypt_value(v, num, gen)?));
                }
                Ok(FV::Dict(Rc::new(out)))
            }
            other => Ok(other.clone()),
        }
    }
}

/// R5/R6 key-derivation hash as a standalone export: the Python
/// security handler AND the encrypted-fixture writer call this
/// through kernel/native_crypt.r56_hash — Algorithm 2.B's 64+ rounds
/// of dependent AES-CBC over multi-KB buffers dominate fixture
/// synthesis otherwise. Python remains source of truth + fallback;
/// parity is pinned by tests (native-vs-Python over random
/// pwd/salt/udata and by the encrypted round-trips).
///
/// # Safety
/// All pointers readable for their lengths.
#[no_mangle]
pub unsafe extern "C" fn tl_r56_hash(
    pwd: *const u8,
    pwd_len: i64,
    salt: *const u8,
    salt_len: i64,
    udata: *const u8,
    udata_len: i64,
    r: i64,
) -> *mut crate::crypt::TlBytesOut {
    let grab = |p: *const u8, n: i64| -> Option<&'static [u8]> {
        if n < 0 || (p.is_null() && n > 0) {
            None
        } else if n == 0 {
            Some(&[])
        } else {
            Some(std::slice::from_raw_parts(p, n as usize))
        }
    };
    let (pwd, salt, udata) = match (
        grab(pwd, pwd_len),
        grab(salt, salt_len),
        grab(udata, udata_len),
    ) {
        (Some(a), Some(b), Some(c)) => (a, b, c),
        _ => return crate::crypt::bytes_out(1, Vec::new()),
    };
    match r56_hash(pwd, salt, udata, r) {
        Ok(k) => crate::crypt::bytes_out(0, k),
        Err(Bail) => crate::crypt::bytes_out(1, Vec::new()),
    }
}
