//! Native PDF content-stream interpreter — the PDF kernel's hot path.
//!
//! Semantic source of truth: `tl_spark/operators/pdf.py` (`_FastLexer`,
//! `_parse_value`, `_Interp.run`, `_fix_surrogates`). This is a faithful
//! port of that Python code: token-for-token lexing (literal-string
//! escape table, hex strings, `#xx` names, the stray-delimiter skip
//! rules), the `int int R` lookahead, and the text-state machine with
//! IEEE-identical operation order, so chunk coordinates are bit-equal.
//! On ANY anomaly (lex/parse error, depth cap, output cap, a font the
//! caller didn't serialize) the call returns a non-zero status and the
//! caller falls back to the Python interpreter, which raises the
//! precise ValueError — error semantics stay Python-exact by
//! construction. Equivalence is pinned by tests/test_native_pdf.py
//! (8-variant golden corpus + mutation/differential fuzz).

use crate::take_vec;

// ---------------------------------------------------------------- tokens

const WS: [bool; 256] = {
    let mut t = [false; 256];
    t[0x00] = true;
    t[0x09] = true;
    t[0x0a] = true;
    t[0x0c] = true;
    t[0x0d] = true;
    t[0x20] = true;
    t
};

fn is_delim(c: u8) -> bool {
    matches!(
        c,
        b'(' | b')' | b'<' | b'>' | b'[' | b']' | b'{' | b'}' | b'/' | b'%'
    )
}

fn is_regular(c: u8) -> bool {
    !WS[c as usize] && !is_delim(c)
}

#[derive(Clone, Debug)]
pub(crate) enum Tok {
    Num { v: f64, is_int: bool },
    Str(Vec<u8>),
    Name(Vec<u8>),
    Kw(Vec<u8>),
    ArrOpen,
    ArrClose,
    DictOpen,
    DictClose,
    Eof,
}

pub(crate) struct Lexer<'a> {
    pub(crate) buf: &'a [u8],
    pub(crate) pos: usize,
    push: Vec<Tok>,
}

#[derive(Debug)]
pub(crate) struct LexErr; // any ValueError-class failure → caller falls back

impl<'a> Lexer<'a> {
    pub(crate) fn new(buf: &'a [u8]) -> Self {
        Lexer { buf, pos: 0, push: Vec::new() }
    }

    pub(crate) fn new_at(buf: &'a [u8], pos: usize) -> Self {
        Lexer { buf, pos, push: Vec::new() }
    }

    pub(crate) fn pushback(&mut self, t: Tok) {
        self.push.push(t);
    }

    pub(crate) fn next(&mut self) -> Result<Tok, LexErr> {
        if let Some(t) = self.push.pop() {
            return Ok(t);
        }
        let buf = self.buf;
        let n = buf.len();
        loop {
            // fold whitespace + comments (the _RUN_RE prefix)
            let mut p = self.pos;
            loop {
                while p < n && WS[buf[p] as usize] {
                    p += 1;
                }
                if p < n && buf[p] == b'%' {
                    while p < n && buf[p] != b'\r' && buf[p] != b'\n' {
                        p += 1;
                    }
                    continue;
                }
                break;
            }
            if p >= n {
                self.pos = p;
                return Ok(Tok::Eof);
            }
            let c = buf[p];
            match c {
                b'<' => {
                    if p + 1 < n && buf[p + 1] == b'<' {
                        self.pos = p + 2;
                        return Ok(Tok::DictOpen);
                    }
                    // hex token: everything to the first '>' (regex
                    // `<[^>]*>?` — inner '<' and parens stay IN)
                    let mut q = p + 1;
                    while q < n && buf[q] != b'>' {
                        q += 1;
                    }
                    let body = &buf[p + 1..q];
                    self.pos = if q < n { q + 1 } else { q };
                    let mut digits: Vec<u8> = Vec::with_capacity(body.len());
                    for &d in body {
                        if !WS[d as usize] {
                            digits.push(d);
                        }
                    }
                    if digits.len() % 2 == 1 {
                        digits.push(b'0');
                    }
                    let mut out = Vec::with_capacity(digits.len() / 2);
                    for pair in digits.chunks(2) {
                        let hi = hex_val(pair[0]).ok_or(LexErr)?;
                        let lo = hex_val(pair[1]).ok_or(LexErr)?;
                        out.push((hi << 4) | lo);
                    }
                    return Ok(Tok::Str(out));
                }
                b'(' => {
                    self.pos = p + 1;
                    return self.literal_string();
                }
                b'/' => {
                    let mut q = p + 1;
                    while q < n && is_regular(buf[q]) {
                        q += 1;
                    }
                    self.pos = q;
                    return self.name_decode(p + 1, q);
                }
                b'>' => {
                    if p + 1 < n && buf[p + 1] == b'>' {
                        self.pos = p + 2;
                        return Ok(Tok::DictClose);
                    }
                    self.pos = p + 1; // stray '>' — skip
                    continue;
                }
                b'[' => {
                    self.pos = p + 1;
                    return Ok(Tok::ArrOpen);
                }
                b']' => {
                    self.pos = p + 1;
                    return Ok(Tok::ArrClose);
                }
                b'{' | b'}' => {
                    self.pos = p + 1;
                    return Ok(Tok::Kw(vec![c]));
                }
                b')' => {
                    self.pos = p + 1; // stray ')' — always advance
                    continue;
                }
                _ => {
                    let mut q = p;
                    while q < n && is_regular(buf[q]) {
                        q += 1;
                    }
                    let word = &buf[p..q];
                    self.pos = q;
                    if let Some((v, is_int)) = parse_num(word) {
                        if is_int && !v.is_finite() {
                            // Python float(int(word)) raises
                            // OverflowError here — bail for exactness
                            return Err(LexErr);
                        }
                        return Ok(Tok::Num { v, is_int });
                    }
                    return Ok(Tok::Kw(word.to_vec()));
                }
            }
        }
    }

    /// `_Lexer._literal_string` byte-exact port (pos is just past '(')
    fn literal_string(&mut self) -> Result<Tok, LexErr> {
        let buf = self.buf;
        let n = buf.len();
        let mut p = self.pos;
        let mut out: Vec<u8> = Vec::new();
        let mut depth = 1i32;
        while p < n {
            let c = buf[p];
            if c == b'\\' {
                p += 1;
                if p >= n {
                    break;
                }
                let e = buf[p];
                match e {
                    b'n' => { out.push(10); p += 1; }
                    b'r' => { out.push(13); p += 1; }
                    b't' => { out.push(9); p += 1; }
                    b'b' => { out.push(8); p += 1; }
                    b'f' => { out.push(12); p += 1; }
                    b'(' | b')' | b'\\' => { out.push(e); p += 1; }
                    b'0'..=b'7' => {
                        let mut val = 0u32;
                        let mut k = 0;
                        while k < 3 && p < n && (b'0'..=b'7').contains(&buf[p]) {
                            val = val * 8 + (buf[p] - b'0') as u32;
                            p += 1;
                            k += 1;
                        }
                        out.push((val & 0xFF) as u8);
                    }
                    0x0d => {
                        p += 1;
                        if p < n && buf[p] == 0x0a {
                            p += 1;
                        }
                    }
                    0x0a => { p += 1; }
                    _ => { out.push(e); p += 1; }
                }
                continue;
            }
            if c == b'(' {
                depth += 1;
                out.push(c);
            } else if c == b')' {
                depth -= 1;
                if depth == 0 {
                    p += 1;
                    break;
                }
                out.push(c);
            } else if c == 0x0d {
                out.push(0x0a);
                if p + 1 < n && buf[p + 1] == 0x0a {
                    p += 1;
                }
            } else {
                out.push(c);
            }
            p += 1;
        }
        self.pos = p;
        Ok(Tok::Str(out))
    }

    /// `_Lexer._name` port over buf[start..end) (both scanners agree on
    /// the span because `#` is a regular char). The Python `int(x, 16)`
    /// is lenient (whitespace/sign) — anything beyond two plain hex
    /// digits bails to Python for exact semantics.
    fn name_decode(&mut self, start: usize, end: usize) -> Result<Tok, LexErr> {
        let buf = self.buf;
        let raw = &buf[start..end];
        if !raw.contains(&b'#') {
            return Ok(Tok::Name(raw.to_vec()));
        }
        let mut out: Vec<u8> = Vec::with_capacity(raw.len());
        let mut p = start;
        while p < end {
            let c = buf[p];
            // Python guard is `p + 2 < n` over the WHOLE buffer
            if c == b'#' && p + 2 < buf.len() {
                let (h, l) = (buf[p + 1], buf[p + 2]);
                match (hex_val(h), hex_val(l)) {
                    (Some(hv), Some(lv)) => {
                        out.push((hv << 4) | lv);
                        p += 3;
                        continue;
                    }
                    _ => {
                        // int(b, 16) also accepts ws/sign forms —
                        // rare and messy: let Python decide
                        if could_be_lenient_hex(h, l) {
                            return Err(LexErr);
                        }
                    }
                }
            }
            out.push(c);
            p += 1;
        }
        Ok(Tok::Name(out))
    }
}

fn hex_val(c: u8) -> Option<u8> {
    match c {
        b'0'..=b'9' => Some(c - b'0'),
        b'a'..=b'f' => Some(c - b'a' + 10),
        b'A'..=b'F' => Some(c - b'A' + 10),
        _ => None,
    }
}

fn could_be_lenient_hex(h: u8, l: u8) -> bool {
    // int(b"..", 16) succeeds for e.g. b" 5", b"+5", b"5 " — any mix
    // of ascii-space/sign/digit that isn't two plain hex digits
    let soft = |c: u8| {
        c.is_ascii_whitespace() || c == b'+' || c == b'-' || hex_val(c).is_some()
    };
    soft(h) && soft(l)
}

/// `_NUM_RE` = `[+-]?(?:\d+\.?\d*|\.\d+)$`; int → f64 via the same
/// correctly-rounded decimal conversion CPython uses.
fn parse_num(word: &[u8]) -> Option<(f64, bool)> {
    let mut i = 0;
    let n = word.len();
    if n == 0 {
        return None;
    }
    if word[0] == b'+' || word[0] == b'-' {
        i = 1;
    }
    let digits_start = i;
    while i < n && word[i].is_ascii_digit() {
        i += 1;
    }
    let int_digits = i - digits_start;
    let mut is_int = true;
    if i < n && word[i] == b'.' {
        is_int = false;
        i += 1;
        let frac_start = i;
        while i < n && word[i].is_ascii_digit() {
            i += 1;
        }
        if int_digits == 0 && i == frac_start {
            return None; // lone '.' / sign-dot
        }
    } else if int_digits == 0 {
        return None;
    }
    if i != n {
        return None;
    }
    let s = std::str::from_utf8(word).ok()?;
    let v: f64 = s.parse().ok()?;
    Some((v, is_int))
}

// ------------------------------------------------------------ parse_value

#[derive(Clone, Debug)]
enum Value {
    Num { v: f64, is_int: bool },
    Bool(bool),
    Null,
    Str(Vec<u8>),
    Name(Vec<u8>),
    Kw(Vec<u8>),
    Arr(Vec<Value>),
    Dict,
    Ref,
}

const PARSE_MAX_DEPTH: usize = 200;

fn parse_value(lx: &mut Lexer, tok: Option<Tok>, depth: usize) -> Result<Value, LexErr> {
    if depth > PARSE_MAX_DEPTH {
        return Err(LexErr);
    }
    let tok = match tok {
        Some(t) => t,
        None => lx.next()?,
    };
    match tok {
        Tok::Eof => Err(LexErr), // "unexpected end of data"
        Tok::ArrOpen => {
            let mut arr = Vec::new();
            loop {
                let t = lx.next()?;
                match t {
                    Tok::ArrClose => return Ok(Value::Arr(arr)),
                    Tok::Eof => return Err(LexErr), // unterminated
                    other => arr.push(parse_value(lx, Some(other), depth + 1)?),
                }
            }
        }
        Tok::DictOpen => loop {
            let t = lx.next()?;
            match t {
                Tok::DictClose => return Ok(Value::Dict),
                Tok::Eof => return Err(LexErr),
                Tok::Name(_) => {
                    parse_value(lx, None, depth + 1)?;
                }
                _ => {} // lenient: skip junk key
            }
        },
        Tok::Kw(k) => Ok(match k.as_slice() {
            b"true" => Value::Bool(true),
            b"false" => Value::Bool(false),
            b"null" => Value::Null,
            _ => Value::Kw(k),
        }),
        Tok::Num { v, is_int } => {
            if is_int {
                // lookahead for "int int R"
                let t2 = lx.next()?;
                if let Tok::Num { v: _, is_int: true } = t2 {
                    let t3 = lx.next()?;
                    if matches!(&t3, Tok::Kw(k) if k.as_slice() == b"R") {
                        return Ok(Value::Ref);
                    }
                    if !matches!(t3, Tok::Eof) {
                        lx.pushback(t3);
                    }
                }
                if !matches!(t2, Tok::Eof) {
                    lx.pushback(t2);
                }
                Ok(Value::Num { v, is_int })
            } else {
                Ok(Value::Num { v, is_int })
            }
        }
        Tok::Str(s) => Ok(Value::Str(s)),
        Tok::Name(nm) => Ok(Value::Name(nm)),
        // a bare closer in value position: Python returns the sentinel
        // object, which every op ignores — model as an inert value
        Tok::ArrClose | Tok::DictClose => Ok(Value::Dict),
    }
}

// ---------------------------------------------------------------- fonts

struct NFont {
    code_bytes: u8,
    // 1-byte: uni256 entries as code-unit sequences + widths
    uni: Vec<Vec<u32>>,
    w256: Vec<f64>,
    // 2-byte
    identity2: bool,
    default_width: f64,
    width_codes: Vec<u32>,
    width_vals: Vec<f64>,
    tu_codes: Vec<u32>,
    tu_vals: Vec<Vec<u32>>,
}

struct FontTable {
    res_names: Vec<Vec<u8>>,          // all names in the page's font resources
    fonts: Vec<(Vec<u8>, NFont)>,     // serialized fonts ("" = default)
}

struct Rd<'a> {
    b: &'a [u8],
    p: usize,
}

impl<'a> Rd<'a> {
    fn u8(&mut self) -> Result<u8, LexErr> {
        if self.p + 1 > self.b.len() {
            return Err(LexErr);
        }
        let v = self.b[self.p];
        self.p += 1;
        Ok(v)
    }
    fn u32(&mut self) -> Result<u32, LexErr> {
        if self.p + 4 > self.b.len() {
            return Err(LexErr);
        }
        let v = u32::from_le_bytes(self.b[self.p..self.p + 4].try_into().unwrap());
        self.p += 4;
        Ok(v)
    }
    fn f64(&mut self) -> Result<f64, LexErr> {
        if self.p + 8 > self.b.len() {
            return Err(LexErr);
        }
        let v = f64::from_le_bytes(self.b[self.p..self.p + 8].try_into().unwrap());
        self.p += 8;
        Ok(v)
    }
    fn bytes(&mut self, n: usize) -> Result<&'a [u8], LexErr> {
        if self.p + n > self.b.len() {
            return Err(LexErr);
        }
        let v = &self.b[self.p..self.p + n];
        self.p += n;
        Ok(v)
    }
}

/// WTF-8 (UTF-8 + surrogate triples) → code units. Python serializes
/// with `.encode("utf-8", "surrogatepass")`.
fn wtf8_units(b: &[u8]) -> Result<Vec<u32>, LexErr> {
    let mut out = Vec::with_capacity(b.len());
    let mut i = 0;
    while i < b.len() {
        let c = b[i];
        let (cp, adv) = if c < 0x80 {
            (c as u32, 1)
        } else if c & 0xE0 == 0xC0 {
            if i + 1 >= b.len() {
                return Err(LexErr);
            }
            (((c as u32 & 0x1F) << 6) | (b[i + 1] as u32 & 0x3F), 2)
        } else if c & 0xF0 == 0xE0 {
            if i + 2 >= b.len() {
                return Err(LexErr);
            }
            (
                ((c as u32 & 0x0F) << 12)
                    | ((b[i + 1] as u32 & 0x3F) << 6)
                    | (b[i + 2] as u32 & 0x3F),
                3,
            )
        } else if c & 0xF8 == 0xF0 {
            if i + 3 >= b.len() {
                return Err(LexErr);
            }
            (
                ((c as u32 & 0x07) << 18)
                    | ((b[i + 1] as u32 & 0x3F) << 12)
                    | ((b[i + 2] as u32 & 0x3F) << 6)
                    | (b[i + 3] as u32 & 0x3F),
                4,
            )
        } else {
            return Err(LexErr);
        };
        out.push(cp);
        i += adv;
    }
    Ok(out)
}

fn parse_font_blob(blob: &[u8]) -> Result<FontTable, LexErr> {
    let mut r = Rd { b: blob, p: 0 };
    let n_names = r.u32()? as usize;
    if n_names > 65536 {
        return Err(LexErr);
    }
    let mut res_names = Vec::with_capacity(n_names);
    for _ in 0..n_names {
        let ln = r.u32()? as usize;
        res_names.push(r.bytes(ln)?.to_vec());
    }
    let n_fonts = r.u32()? as usize;
    if n_fonts > 65536 {
        return Err(LexErr);
    }
    let mut fonts = Vec::with_capacity(n_fonts);
    for _ in 0..n_fonts {
        let ln = r.u32()? as usize;
        let name = r.bytes(ln)?.to_vec();
        let code_bytes = r.u8()?;
        let f = if code_bytes == 1 {
            let mut offs = [0u32; 257];
            for o in offs.iter_mut() {
                *o = r.u32()?;
            }
            let buf_len = r.u32()? as usize;
            let buf = r.bytes(buf_len)?;
            let mut uni = Vec::with_capacity(256);
            for i in 0..256 {
                let (s, e) = (offs[i] as usize, offs[i + 1] as usize);
                if s > e || e > buf.len() {
                    return Err(LexErr);
                }
                uni.push(wtf8_units(&buf[s..e])?);
            }
            let mut w256 = Vec::with_capacity(256);
            for _ in 0..256 {
                w256.push(r.f64()?);
            }
            NFont {
                code_bytes: 1,
                uni,
                w256,
                identity2: false,
                default_width: 0.0,
                width_codes: Vec::new(),
                width_vals: Vec::new(),
                tu_codes: Vec::new(),
                tu_vals: Vec::new(),
            }
        } else if code_bytes == 2 {
            let identity2 = r.u8()? != 0;
            let default_width = r.f64()?;
            let nw = r.u32()? as usize;
            if nw > 1 << 20 {
                return Err(LexErr);
            }
            let mut wc = Vec::with_capacity(nw);
            let mut wv = Vec::with_capacity(nw);
            for _ in 0..nw {
                wc.push(r.u32()?);
                wv.push(r.f64()?);
            }
            let nt = r.u32()? as usize;
            if nt > 1 << 20 {
                return Err(LexErr);
            }
            let mut tc = Vec::with_capacity(nt);
            for _ in 0..nt {
                tc.push(r.u32()?);
            }
            let mut toffs = Vec::with_capacity(nt + 1);
            for _ in 0..nt + 1 {
                toffs.push(r.u32()? as usize);
            }
            let buf_len = r.u32()? as usize;
            let buf = r.bytes(buf_len)?;
            let mut tv = Vec::with_capacity(nt);
            for i in 0..nt {
                let (s, e) = (toffs[i], toffs[i + 1]);
                if s > e || e > buf.len() {
                    return Err(LexErr);
                }
                tv.push(wtf8_units(&buf[s..e])?);
            }
            NFont {
                code_bytes: 2,
                uni: Vec::new(),
                w256: Vec::new(),
                identity2,
                default_width,
                width_codes: wc,
                width_vals: wv,
                tu_codes: tc,
                tu_vals: tv,
            }
        } else {
            return Err(LexErr);
        };
        fonts.push((name, f));
    }
    Ok(FontTable { res_names, fonts })
}

// ------------------------------------------------------------ interpreter

type Mat = [f64; 6];

const ID: Mat = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0];

#[inline]
fn mat_mul(m: &Mat, n: &Mat) -> Mat {
    let [a, b, c, d, e, f] = *m;
    let [na, nb, nc, nd, ne, nf] = *n;
    [
        a * na + b * nc,
        a * nb + b * nd,
        c * na + d * nc,
        c * nb + d * nd,
        e * na + f * nc + ne,
        e * nb + f * nd + nf,
    ]
}

struct Chunk {
    x0: f64,
    y: f64,
    x1: f64,
    size: f64,
    text: Vec<u32>, // code points (may contain surrogates pre-fix)
}

enum RunErr {
    NeedFont(Vec<u8>),
    Bail, // lex/parse/cap failure → Python fallback
}

impl From<LexErr> for RunErr {
    fn from(_: LexErr) -> Self {
        RunErr::Bail
    }
}

fn num(v: &Value, default: f64) -> f64 {
    match v {
        Value::Num { v, .. } => *v,
        _ => default,
    }
}

const MAX_TEXT_OUT: usize = 1 << 28;

fn run(content: &[u8], ft: &FontTable) -> Result<Vec<Chunk>, RunErr> {
    let mut lx = Lexer::new(content);
    let mut stack: Vec<Value> = Vec::new();
    let mut chunks: Vec<Chunk> = Vec::new();
    let mut ctm = ID;
    let mut gs_stack: Vec<Mat> = Vec::new();
    let mut tm = ID;
    let mut tlm = ID;
    let mut tf: Option<usize> = None; // index into ft.fonts
    let mut tfs = 0.0f64;
    let (mut tc, mut tw, mut ts) = (0.0f64, 0.0f64, 0.0f64);
    let mut tl = 0.0f64;
    let mut th = 1.0f64;
    let mut total_text = 0usize;

    macro_rules! show {
        ($s:expr) => {{
            let s: &[u8] = $s;
            if let Some(fi) = tf {
                let f = &ft.fonts[fi].1;
                let trm = mat_mul(&mat_mul(&[tfs * th, 0.0, 0.0, tfs, 0.0, ts], &tm), &ctm);
                let (x0, y0) = (trm[4], trm[5]);
                let size_dev = {
                    let a = trm[3].abs();
                    if a != 0.0 {
                        a
                    } else {
                        let b = trm[1].abs();
                        if b != 0.0 {
                            b
                        } else if tfs != 0.0 {
                            tfs
                        } else {
                            1.0
                        }
                    }
                };
                let (text, disp) = if f.code_bytes == 1 {
                    let mut t: Vec<u32> = Vec::new();
                    for &b in s {
                        t.extend_from_slice(&f.uni[b as usize]);
                    }
                    let mut wsum = 0.0f64;
                    for &b in s {
                        wsum += f.w256[b as usize];
                    }
                    let spaces = s.iter().filter(|&&b| b == 32).count() as f64;
                    let d = (wsum / 1000.0 * tfs
                        + s.len() as f64 * tc
                        + if tw != 0.0 { spaces * tw } else { 0.0 })
                        * th;
                    (t, d)
                } else {
                    let s = if s.len() % 2 == 1 { &s[..s.len() - 1] } else { s };
                    let n2 = (s.len() / 2) as f64;
                    let mut t: Vec<u32> = Vec::with_capacity(s.len() / 2);
                    if f.identity2 {
                        // utf-16-be decode with surrogatepass: pair
                        // valid hi+lo, pass lone surrogates through
                        let mut i = 0;
                        while i + 1 < s.len() {
                            let u = ((s[i] as u32) << 8) | s[i + 1] as u32;
                            if (0xD800..0xDC00).contains(&u) && i + 3 < s.len() {
                                let u2 = ((s[i + 2] as u32) << 8) | s[i + 3] as u32;
                                if (0xDC00..0xE000).contains(&u2) {
                                    t.push(0x10000 + ((u - 0xD800) << 10) + (u2 - 0xDC00));
                                    i += 4;
                                    continue;
                                }
                            }
                            t.push(u);
                            i += 2;
                        }
                    } else {
                        let mut i = 0;
                        while i + 1 < s.len() {
                            let code = ((s[i] as u32) << 8) | s[i + 1] as u32;
                            match f.tu_codes.binary_search(&code) {
                                Ok(k) => t.extend_from_slice(&f.tu_vals[k]),
                                Err(_) => t.push(code), // chr(code)
                            }
                            i += 2;
                        }
                    }
                    let wsum = if !f.width_codes.is_empty() {
                        let mut w = 0.0f64;
                        let mut i = 0;
                        while i + 1 < s.len() {
                            let code = ((s[i] as u32) << 8) | s[i + 1] as u32;
                            w += match f.width_codes.binary_search(&code) {
                                Ok(k) => f.width_vals[k],
                                Err(_) => f.default_width,
                            };
                            i += 2;
                        }
                        w
                    } else {
                        n2 * f.default_width
                    };
                    (t, (wsum / 1000.0 * tfs + n2 * tc) * th)
                };
                tm = mat_mul(&[1.0, 0.0, 0.0, 1.0, disp, 0.0], &tm);
                let trm2 = mat_mul(&mat_mul(&[tfs * th, 0.0, 0.0, tfs, 0.0, ts], &tm), &ctm);
                let text = fix_surrogates(text);
                if !text.is_empty() {
                    total_text += text.len() * 4;
                    if total_text > MAX_TEXT_OUT {
                        return Err(RunErr::Bail);
                    }
                    chunks.push(Chunk { x0, y: y0, x1: trm2[4], size: size_dev, text });
                }
            }
        }};
    }

    loop {
        let tok = lx.next()?;
        match tok {
            Tok::Eof => break,
            Tok::ArrOpen | Tok::DictOpen => {
                let v = parse_value(&mut lx, Some(tok), 0)?;
                stack.push(v);
                continue;
            }
            Tok::Kw(op) => {
                match op.as_slice() {
                    b"BT" => {
                        tm = ID;
                        tlm = ID;
                    }
                    b"ET" => {}
                    b"Tf" if stack.len() >= 2 => {
                        tfs = num(&stack[stack.len() - 1], 0.0);
                        if let Value::Name(nm) = &stack[stack.len() - 2] {
                            let nm_utf8 = latin1_to_utf8(nm);
                            match ft.fonts.iter().position(|(n, _)| *n == nm_utf8) {
                                Some(i) => tf = Some(i),
                                None => {
                                    if ft.res_names.iter().any(|n| *n == nm_utf8) {
                                        stack.clear();
                                        return Err(RunErr::NeedFont(nm_utf8));
                                    }
                                    // unknown resource → default font
                                    match ft.fonts.iter().position(|(n, _)| n.is_empty()) {
                                        Some(i) => tf = Some(i),
                                        None => {
                                            stack.clear();
                                            return Err(RunErr::NeedFont(Vec::new()));
                                        }
                                    }
                                }
                            }
                        }
                    }
                    b"Td" if stack.len() >= 2 => {
                        let (dx, dy) = (
                            num(&stack[stack.len() - 2], 0.0),
                            num(&stack[stack.len() - 1], 0.0),
                        );
                        tlm = mat_mul(&[1.0, 0.0, 0.0, 1.0, dx, dy], &tlm);
                        tm = tlm;
                    }
                    b"TD" if stack.len() >= 2 => {
                        let (dx, dy) = (
                            num(&stack[stack.len() - 2], 0.0),
                            num(&stack[stack.len() - 1], 0.0),
                        );
                        tl = -dy;
                        tlm = mat_mul(&[1.0, 0.0, 0.0, 1.0, dx, dy], &tlm);
                        tm = tlm;
                    }
                    b"Tm" if stack.len() >= 6 => {
                        let k = stack.len() - 6;
                        let mut m = [0.0f64; 6];
                        for i in 0..6 {
                            m[i] = num(&stack[k + i], 0.0);
                        }
                        tm = m;
                        tlm = m;
                    }
                    b"T*" => {
                        tlm = mat_mul(&[1.0, 0.0, 0.0, 1.0, 0.0, -tl], &tlm);
                        tm = tlm;
                    }
                    b"TL" if !stack.is_empty() => tl = num(&stack[stack.len() - 1], 0.0),
                    b"Tc" if !stack.is_empty() => tc = num(&stack[stack.len() - 1], 0.0),
                    b"Tw" if !stack.is_empty() => tw = num(&stack[stack.len() - 1], 0.0),
                    b"Tz" if !stack.is_empty() => {
                        th = num(&stack[stack.len() - 1], 100.0) / 100.0
                    }
                    b"Ts" if !stack.is_empty() => ts = num(&stack[stack.len() - 1], 0.0),
                    b"Tj" if !stack.is_empty() => {
                        if let Value::Str(s) = &stack[stack.len() - 1] {
                            let s = s.clone();
                            show!(&s);
                        }
                    }
                    b"'" if !stack.is_empty() => {
                        tlm = mat_mul(&[1.0, 0.0, 0.0, 1.0, 0.0, -tl], &tlm);
                        tm = tlm;
                        if let Value::Str(s) = &stack[stack.len() - 1] {
                            let s = s.clone();
                            show!(&s);
                        }
                    }
                    b"\"" if stack.len() >= 3 => {
                        tw = num(&stack[stack.len() - 3], 0.0);
                        tc = num(&stack[stack.len() - 2], 0.0);
                        tlm = mat_mul(&[1.0, 0.0, 0.0, 1.0, 0.0, -tl], &tlm);
                        tm = tlm;
                        if let Value::Str(s) = &stack[stack.len() - 1] {
                            let s = s.clone();
                            show!(&s);
                        }
                    }
                    b"TJ" if !stack.is_empty() => {
                        if let Value::Arr(arr) = &stack[stack.len() - 1] {
                            let arr = arr.clone();
                            for el in &arr {
                                match el {
                                    Value::Str(s) => show!(s),
                                    Value::Num { v, .. } => {
                                        let t = -*v / 1000.0 * tfs * th;
                                        tm = mat_mul(&[1.0, 0.0, 0.0, 1.0, t, 0.0], &tm);
                                    }
                                    // Python: isinstance(True, int) —
                                    // bools are TJ offsets there
                                    Value::Bool(b) => {
                                        let t = -(*b as i32 as f64) / 1000.0 * tfs * th;
                                        tm = mat_mul(&[1.0, 0.0, 0.0, 1.0, t, 0.0], &tm);
                                    }
                                    _ => {}
                                }
                            }
                        }
                    }
                    b"cm" if stack.len() >= 6 => {
                        let k = stack.len() - 6;
                        let mut m = [0.0f64; 6];
                        for i in 0..6 {
                            m[i] = num(&stack[k + i], 0.0);
                        }
                        ctm = mat_mul(&m, &ctm);
                    }
                    b"q" => gs_stack.push(ctm),
                    b"Q" => {
                        if let Some(m) = gs_stack.pop() {
                            ctm = m;
                        }
                    }
                    b"BI" => {
                        // skip to 'EI' bounded by the Python whitespace
                        // tuple (space/\n/\r/\t/\0 — NOT \x0c)
                        let buf = lx.buf;
                        let mut pos = find_sub(buf, b"EI", lx.pos);
                        while let Some(p) = pos {
                            if p > 0
                                && !matches!(buf[p - 1], b' ' | b'\n' | b'\r' | b'\t' | 0)
                            {
                                pos = find_sub(buf, b"EI", p + 2);
                            } else {
                                break;
                            }
                        }
                        lx.pos = match pos {
                            Some(p) if p > 0 => p + 2,
                            Some(_) => 2, // p == 0: while-guard exits, pos+2
                            None => buf.len(),
                        };
                    }
                    _ => {}
                }
                stack.clear();
            }
            // top-level scalar tokens are pushed DIRECTLY (the Python
            // main loop only routes [ and << through _parse_value — no
            // int-int-R lookahead at operand level)
            Tok::Num { v, is_int } => stack.push(Value::Num { v, is_int }),
            Tok::Str(s) => stack.push(Value::Str(s)),
            Tok::Name(nm) => stack.push(Value::Name(nm)),
            Tok::ArrClose | Tok::DictClose => stack.push(Value::Dict),
        }
    }
    Ok(chunks)
}

fn find_sub(hay: &[u8], needle: &[u8], from: usize) -> Option<usize> {
    if from >= hay.len() {
        return None;
    }
    hay[from..]
        .windows(needle.len())
        .position(|w| w == needle)
        .map(|i| i + from)
}

fn latin1_to_utf8(b: &[u8]) -> Vec<u8> {
    let mut out = Vec::with_capacity(b.len());
    for &c in b {
        if c < 0x80 {
            out.push(c);
        } else {
            out.push(0xC0 | (c >> 6));
            out.push(0x80 | (c & 0x3F));
        }
    }
    out
}

/// `_fix_surrogates` port over code points.
fn fix_surrogates(t: Vec<u32>) -> Vec<u32> {
    if !t.iter().any(|&c| (0xD800..0xE000).contains(&c)) {
        return t;
    }
    // encode utf-16 (surrogatepass) then strict decode: astral → pairs
    // → re-paired; any unpaired surrogate unit → failure
    let mut units: Vec<u32> = Vec::with_capacity(t.len() + 8);
    for &c in &t {
        if c >= 0x10000 {
            units.push(0xD800 + ((c - 0x10000) >> 10));
            units.push(0xDC00 + ((c - 0x10000) & 0x3FF));
        } else {
            units.push(c);
        }
    }
    let mut out: Vec<u32> = Vec::with_capacity(t.len());
    let mut i = 0;
    let mut ok = true;
    while i < units.len() {
        let u = units[i];
        if (0xD800..0xDC00).contains(&u) {
            if i + 1 < units.len() && (0xDC00..0xE000).contains(&units[i + 1]) {
                out.push(0x10000 + ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00));
                i += 2;
                continue;
            }
            ok = false;
            break;
        }
        if (0xDC00..0xE000).contains(&u) {
            ok = false;
            break;
        }
        out.push(u);
        i += 1;
    }
    if ok {
        return out;
    }
    // fallback: each surrogate CODE POINT in the original → U+FFFD
    t.into_iter()
        .map(|c| if (0xD800..0xE000).contains(&c) { 0xFFFD } else { c })
        .collect()
}

fn utf8_push(out: &mut Vec<u8>, cp: u32) {
    if cp < 0x80 {
        out.push(cp as u8);
    } else if cp < 0x800 {
        out.push(0xC0 | (cp >> 6) as u8);
        out.push(0x80 | (cp & 0x3F) as u8);
    } else if cp < 0x10000 {
        out.push(0xE0 | (cp >> 12) as u8);
        out.push(0x80 | ((cp >> 6) & 0x3F) as u8);
        out.push(0x80 | (cp & 0x3F) as u8);
    } else {
        out.push(0xF0 | (cp >> 18) as u8);
        out.push(0x80 | ((cp >> 12) & 0x3F) as u8);
        out.push(0x80 | ((cp >> 6) & 0x3F) as u8);
        out.push(0x80 | (cp & 0x3F) as u8);
    }
}

// ---------------------------------------------------------------- C ABI

#[repr(C)]
pub struct TlPdfOut {
    status: i64, // 0 ok; 1 need font (see need_font); 2 bail → Python
    n_chunks: i64,
    x0: *mut f64,
    y: *mut f64,
    x1: *mut f64,
    size: *mut f64,
    text_data: *mut u8,
    text_len: i64,
    text_offs: *mut i64, // n_chunks + 1
    need_font: *mut u8,
    need_font_len: i64,
    x0_cap: i64,
    y_cap: i64,
    x1_cap: i64,
    size_cap: i64,
    text_cap: i64,
    offs_cap: i64,
    nf_cap: i64,
}

fn empty_out(status: i64) -> *mut TlPdfOut {
    Box::into_raw(Box::new(TlPdfOut {
        status,
        n_chunks: 0,
        x0: std::ptr::null_mut(),
        y: std::ptr::null_mut(),
        x1: std::ptr::null_mut(),
        size: std::ptr::null_mut(),
        text_data: std::ptr::null_mut(),
        text_len: 0,
        text_offs: std::ptr::null_mut(),
        need_font: std::ptr::null_mut(),
        need_font_len: 0,
        x0_cap: 0,
        y_cap: 0,
        x1_cap: 0,
        size_cap: 0,
        text_cap: 0,
        offs_cap: 0,
        nf_cap: 0,
    }))
}

/// Interpret one decoded content stream against the serialized font
/// table. Returns a malloc'd TlPdfOut (free with `tl_pdf_free`), or
/// NULL on invalid arguments.
///
/// # Safety
/// `content` readable for `content_len`; `blob` for `blob_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_pdf_interp(
    content: *const u8,
    content_len: i64,
    blob: *const u8,
    blob_len: i64,
) -> *mut TlPdfOut {
    if content_len < 0 || blob_len < 0 || (content.is_null() && content_len > 0) {
        return std::ptr::null_mut();
    }
    let content = if content_len > 0 {
        std::slice::from_raw_parts(content, content_len as usize)
    } else {
        &[]
    };
    let blob = if blob_len > 0 {
        std::slice::from_raw_parts(blob, blob_len as usize)
    } else {
        &[]
    };
    let ft = match parse_font_blob(blob) {
        Ok(ft) => ft,
        Err(_) => return empty_out(2),
    };
    match run(content, &ft) {
        Ok(chunks) => {
            let n = chunks.len();
            let mut x0 = Vec::with_capacity(n);
            let mut y = Vec::with_capacity(n);
            let mut x1 = Vec::with_capacity(n);
            let mut size = Vec::with_capacity(n);
            let mut offs: Vec<i64> = Vec::with_capacity(n + 1);
            let mut text: Vec<u8> = Vec::new();
            offs.push(0);
            for c in &chunks {
                x0.push(c.x0);
                y.push(c.y);
                x1.push(c.x1);
                size.push(c.size);
                for &cp in &c.text {
                    utf8_push(&mut text, cp);
                }
                offs.push(text.len() as i64);
            }
            let (x0p, _, x0c) = take_vec(x0);
            let (yp, _, yc) = take_vec(y);
            let (x1p, _, x1c) = take_vec(x1);
            let (sp, _, sc) = take_vec(size);
            let (tp, tl, tc) = take_vec(text);
            let (op, _, oc) = take_vec(offs);
            Box::into_raw(Box::new(TlPdfOut {
                status: 0,
                n_chunks: n as i64,
                x0: x0p,
                y: yp,
                x1: x1p,
                size: sp,
                text_data: tp,
                text_len: tl,
                text_offs: op,
                need_font: std::ptr::null_mut(),
                need_font_len: 0,
                x0_cap: x0c,
                y_cap: yc,
                x1_cap: x1c,
                size_cap: sc,
                text_cap: tc,
                offs_cap: oc,
                nf_cap: 0,
            }))
        }
        Err(RunErr::NeedFont(nm)) => {
            let (np, nl, nc) = take_vec(nm);
            let out = empty_out(1);
            (*out).need_font = np;
            (*out).need_font_len = nl;
            (*out).nf_cap = nc;
            out
        }
        Err(RunErr::Bail) => empty_out(2),
    }
}

#[repr(C)]
pub struct TlPdfPagesOut {
    base: TlPdfOut,
    page_offs: *mut i64, // n_pages + 1 cumulative chunk counts
    n_pages: i64,
    page_offs_cap: i64,
}

/// Interpret `n_pages` content streams in ONE call against one shared
/// font table: page `i` is `content[offs[i]..offs[i+1]]` and each page
/// starts from a fresh text/graphics state, exactly as if
/// `tl_pdf_interp` had been called per page. Chunks come back
/// concatenated, with `page_offs` giving each page's chunk range.
/// Amortizes the per-call FFI + font-table parse cost for multi-page
/// documents (the dominant fixed cost on short pages). A NeedFont or
/// bail on ANY page fails the whole batch — callers fall back to the
/// per-page entry, so semantics stay bit-equal to the Python
/// interpreter. Free with `tl_pdf_pages_free`, or NULL on invalid
/// arguments (non-monotonic / out-of-range offsets included).
///
/// # Safety
/// `content` readable for `content_len`; `offs` readable for
/// `n_pages + 1` i64s; `blob` for `blob_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_pdf_interp_pages(
    content: *const u8,
    content_len: i64,
    offs: *const i64,
    n_pages: i64,
    blob: *const u8,
    blob_len: i64,
) -> *mut TlPdfPagesOut {
    if content_len < 0
        || blob_len < 0
        || n_pages < 0
        || (content.is_null() && content_len > 0)
        || (offs.is_null() && n_pages > 0)
    {
        return std::ptr::null_mut();
    }
    let content = if content_len > 0 {
        std::slice::from_raw_parts(content, content_len as usize)
    } else {
        &[]
    };
    let offs = if n_pages > 0 {
        std::slice::from_raw_parts(offs, n_pages as usize + 1)
    } else {
        &[0i64][..]
    };
    for w in offs.windows(2) {
        if w[0] > w[1] {
            return std::ptr::null_mut();
        }
    }
    if n_pages > 0 && (offs[0] < 0 || offs[n_pages as usize] > content_len) {
        return std::ptr::null_mut();
    }
    let blob = if blob_len > 0 {
        std::slice::from_raw_parts(blob, blob_len as usize)
    } else {
        &[]
    };
    fn pages_out(base: *mut TlPdfOut) -> *mut TlPdfPagesOut {
        // re-box the single-page struct into the batched layout
        unsafe {
            let b = Box::from_raw(base);
            Box::into_raw(Box::new(TlPdfPagesOut {
                base: *b,
                page_offs: std::ptr::null_mut(),
                n_pages: 0,
                page_offs_cap: 0,
            }))
        }
    }
    let ft = match parse_font_blob(blob) {
        Ok(ft) => ft,
        Err(_) => return pages_out(empty_out(2)),
    };
    let mut all: Vec<Chunk> = Vec::new();
    let mut page_offs: Vec<i64> = Vec::with_capacity(n_pages as usize + 1);
    page_offs.push(0);
    for i in 0..n_pages as usize {
        let page = &content[offs[i] as usize..offs[i + 1] as usize];
        match run(page, &ft) {
            Ok(chunks) => {
                all.extend(chunks);
                page_offs.push(all.len() as i64);
            }
            Err(RunErr::NeedFont(nm)) => {
                let (np, nl, nc) = take_vec(nm);
                let out = empty_out(1);
                (*out).need_font = np;
                (*out).need_font_len = nl;
                (*out).nf_cap = nc;
                return pages_out(out);
            }
            Err(RunErr::Bail) => return pages_out(empty_out(2)),
        }
    }
    let n = all.len();
    let mut x0 = Vec::with_capacity(n);
    let mut y = Vec::with_capacity(n);
    let mut x1 = Vec::with_capacity(n);
    let mut size = Vec::with_capacity(n);
    let mut toffs: Vec<i64> = Vec::with_capacity(n + 1);
    let mut text: Vec<u8> = Vec::new();
    toffs.push(0);
    for c in &all {
        x0.push(c.x0);
        y.push(c.y);
        x1.push(c.x1);
        size.push(c.size);
        for &cp in &c.text {
            utf8_push(&mut text, cp);
        }
        toffs.push(text.len() as i64);
    }
    let (x0p, _, x0c) = take_vec(x0);
    let (yp, _, yc) = take_vec(y);
    let (x1p, _, x1c) = take_vec(x1);
    let (sp, _, sc) = take_vec(size);
    let (tp, tl, tc) = take_vec(text);
    let (op, _, oc) = take_vec(toffs);
    let (pp, _, pc) = take_vec(page_offs);
    Box::into_raw(Box::new(TlPdfPagesOut {
        base: TlPdfOut {
            status: 0,
            n_chunks: n as i64,
            x0: x0p,
            y: yp,
            x1: x1p,
            size: sp,
            text_data: tp,
            text_len: tl,
            text_offs: op,
            need_font: std::ptr::null_mut(),
            need_font_len: 0,
            x0_cap: x0c,
            y_cap: yc,
            x1_cap: x1c,
            size_cap: sc,
            text_cap: tc,
            offs_cap: oc,
            nf_cap: 0,
        },
        page_offs: pp,
        n_pages: n_pages,
        page_offs_cap: pc,
    }))
}

/// # Safety
/// `out` must come from `tl_pdf_interp_pages` and not be freed twice.
#[no_mangle]
pub unsafe extern "C" fn tl_pdf_pages_free(out: *mut TlPdfPagesOut) {
    if out.is_null() {
        return;
    }
    let o = Box::from_raw(out);
    if !o.page_offs.is_null() {
        drop(Vec::from_raw_parts(
            o.page_offs,
            o.n_pages as usize + 1,
            o.page_offs_cap as usize,
        ));
    }
    // base owns the chunk arrays; reuse the single-page free
    tl_pdf_free(Box::into_raw(Box::new(o.base)));
}

/// # Safety
/// `out` must come from `tl_pdf_interp` and not be freed twice.
#[no_mangle]
pub unsafe extern "C" fn tl_pdf_free(out: *mut TlPdfOut) {
    if out.is_null() {
        return;
    }
    let o = Box::from_raw(out);
    let n = o.n_chunks as usize;
    if !o.x0.is_null() {
        drop(Vec::from_raw_parts(o.x0, n, o.x0_cap as usize));
        drop(Vec::from_raw_parts(o.y, n, o.y_cap as usize));
        drop(Vec::from_raw_parts(o.x1, n, o.x1_cap as usize));
        drop(Vec::from_raw_parts(o.size, n, o.size_cap as usize));
        drop(Vec::from_raw_parts(
            o.text_data,
            o.text_len as usize,
            o.text_cap as usize,
        ));
        drop(Vec::from_raw_parts(o.text_offs, n + 1, o.offs_cap as usize));
    }
    if !o.need_font.is_null() {
        drop(Vec::from_raw_parts(
            o.need_font,
            o.need_font_len as usize,
            o.nf_cap as usize,
        ));
    }
}
