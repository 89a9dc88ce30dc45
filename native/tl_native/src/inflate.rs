//! From-scratch zlib/DEFLATE decoder (RFC 1950/1951, std-only).
//!
//! Semantic source of truth: `tl_spark/operators/pdf.py::_flate_decode`,
//! which wraps CPython's `zlib.decompressobj`. The semantics that
//! matter for byte-parity with that function:
//!
//! - TRUNCATED input anywhere (mid-header, mid-block, mid-symbol,
//!   mid-trailer) returns the bytes decoded so far as SUCCESS — the
//!   Python loop breaks on an empty `unconsumed_tail` without raising.
//! - Definitive corruption (bad zlib header, FDICT set, reserved block
//!   type, over-subscribed/illegally-incomplete Huffman code, invalid
//!   symbol, distance before output start, stored-block LEN/NLEN
//!   mismatch, adler32 mismatch on a COMPLETE stream) is an error —
//!   Python raises `zlib.error` → `ValueError`, the native caller
//!   bails and the Python path re-raises it.
//! - Output is capped (`_MAX_DECODE_BYTES` = 256 MB): exceeding it is
//!   an error, mirroring the decompression-bomb guard.
//! - Trailing bytes after the adler32 trailer are ignored
//!   (`unused_data` in Python).
//!
//! Incomplete Huffman codes follow zlib's `inftrees.c` rule: allowed
//! only when the maximum code length in use is 1 (the common
//! single-distance-code case); anything else is "invalid code lengths
//! set". Decoding a code point the incomplete table does not define is
//! an error, as in zlib.
//!
//! Equivalence is pinned by tests/test_native_pdf.py: differential
//! fuzz against `zlib.decompress`/`_flate_decode` over valid, mutated,
//! and truncated streams.

pub(crate) struct InfErr; // corruption / cap — caller falls back

struct Bits<'a> {
    data: &'a [u8],
    pos: usize, // byte position
    bit: u32,   // bits consumed from data[pos]
}

enum Need {
    More,
}

impl<'a> Bits<'a> {
    fn new(data: &'a [u8]) -> Self {
        Bits { data, pos: 0, bit: 0 }
    }

    /// Read `n` bits LSB-first. `Err(Need::More)` = input exhausted.
    fn take(&mut self, n: u32) -> Result<u32, Need> {
        let mut v: u32 = 0;
        let mut got: u32 = 0;
        while got < n {
            if self.pos >= self.data.len() {
                return Err(Need::More);
            }
            let avail = 8 - self.bit;
            let want = (n - got).min(avail);
            let chunk =
                (self.data[self.pos] as u32 >> self.bit) & ((1u32 << want) - 1);
            v |= chunk << got;
            got += want;
            self.bit += want;
            if self.bit == 8 {
                self.bit = 0;
                self.pos += 1;
            }
        }
        Ok(v)
    }

    fn align_byte(&mut self) {
        if self.bit != 0 {
            self.bit = 0;
            self.pos += 1;
        }
    }
}

/// Canonical Huffman decode table: `count[len]` + symbols sorted by
/// (length, symbol) — the zlib construction.
struct Huff {
    count: [u16; 16],
    sym: Vec<u16>,
    max_len: u32,
}

type BuildErr = ();

impl Huff {
    /// `lens[i]` = code length of symbol i (0 = unused).
    /// `kind_codes`: true for the code-lengths alphabet (must be
    /// complete), false for litlen/dist (incomplete allowed only when
    /// max length == 1) — zlib inftrees.c.
    fn build(lens: &[u32], kind_codes: bool) -> Result<Huff, BuildErr> {
        let mut count = [0u16; 16];
        let mut max_len = 0u32;
        for &l in lens {
            debug_assert!(l <= 15);
            count[l as usize] += 1;
            if l > max_len {
                max_len = l;
            }
        }
        if max_len == 0 {
            // no codes at all: zlib treats this as incomplete; for
            // DISTS it is tolerated (no distance codes used), for
            // LENS/CODES it errors. Callers special-case this.
            return Ok(Huff { count, sym: Vec::new(), max_len: 0 });
        }
        // over-subscription / incompleteness check
        let mut left: i32 = 1;
        for l in 1..=15usize {
            left <<= 1;
            left -= count[l] as i32;
            if left < 0 {
                return Err(()); // over-subscribed
            }
        }
        if left > 0 && (kind_codes || max_len != 1) {
            return Err(()); // illegally incomplete
        }
        // offsets per length, then symbols sorted by (len, symbol)
        let mut offs = [0usize; 16];
        for l in 1..15usize {
            offs[l + 1] = offs[l] + count[l] as usize;
        }
        let total: usize = offs[15] + count[15] as usize;
        let mut sym = vec![0u16; total];
        for (s, &l) in lens.iter().enumerate() {
            if l != 0 {
                sym[offs[l as usize]] = s as u16;
                offs[l as usize] += 1;
            }
        }
        Ok(Huff { count, sym, max_len })
    }

    /// Decode one symbol, bit-serial canonical walk (zlib `decode()`).
    /// Ok(None) = code point not defined by an (allowed-)incomplete
    /// table → corruption.
    fn decode(&self, bits: &mut Bits) -> Result<Option<u16>, Need> {
        let mut code: u32 = 0;
        let mut first: u32 = 0;
        let mut index: u32 = 0;
        for len in 1..=self.max_len {
            code |= bits.take(1)?;
            let cnt = self.count[len as usize] as u32;
            if code < first + cnt {
                return Ok(Some(self.sym[(index + (code - first)) as usize]));
            }
            index += cnt;
            first = (first + cnt) << 1;
            code <<= 1;
        }
        Ok(None)
    }
}

const LEN_BASE: [u16; 29] = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
    67, 83, 99, 115, 131, 163, 195, 227, 258,
];
const LEN_EXTRA: [u32; 29] = [
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
    5, 5, 5, 5, 0,
];
const DIST_BASE: [u32; 30] = [
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385, 513,
    769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577,
];
const DIST_EXTRA: [u32; 30] = [
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
    11, 11, 12, 12, 13, 13,
];
const CLEN_ORDER: [usize; 19] = [
    16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15,
];

fn adler32(data: &[u8]) -> u32 {
    const MOD: u32 = 65521;
    let (mut a, mut b) = (1u32, 0u32);
    for chunk in data.chunks(5552) {
        for &x in chunk {
            a += x as u32;
            b += a;
        }
        a %= MOD;
        b %= MOD;
    }
    (b << 16) | a
}

/// Decode one DEFLATE block's payload into `out`.
/// Ok(true) = block complete; Err side distinguishes corruption from
/// input exhaustion (exhaustion = partial success at the caller).
enum Step {
    Done,
    More, // input exhausted — return partial output as success
    Bad,  // corruption
    Cap,  // output cap exceeded
}

/// Never panics (panic=abort would kill the executor): a build error
/// on these constant tables is impossible, but degrade to an empty
/// table (which errors at first decode) rather than unwrapping.
fn fixed_litlen() -> Huff {
    let mut lens = [0u32; 288];
    for (i, l) in lens.iter_mut().enumerate() {
        *l = match i {
            0..=143 => 8,
            144..=255 => 9,
            256..=279 => 7,
            _ => 8,
        };
    }
    Huff::build(&lens, false).unwrap_or(Huff {
        count: [0; 16],
        sym: Vec::new(),
        max_len: 0,
    })
}

fn fixed_dist() -> Huff {
    // all 32 five-bit codes exist in the FIXED table; 30/31 are
    // "invalid at use" (caught by the dsym > 29 check), NOT absent —
    // 30 lengths would make the table illegally incomplete
    let lens = [5u32; 32];
    Huff::build(&lens, false).unwrap_or(Huff {
        count: [0; 16],
        sym: Vec::new(),
        max_len: 0,
    })
}

fn inflate_block(
    bits: &mut Bits,
    out: &mut Vec<u8>,
    lit: &Huff,
    dist: &Option<Huff>,
    cap: usize,
) -> Step {
    loop {
        let sym = match lit.decode(bits) {
            Ok(Some(s)) => s as u32,
            Ok(None) => return Step::Bad, // undefined code point
            Err(Need::More) => return Step::More,
        };
        if sym < 256 {
            if out.len() >= cap {
                return Step::Cap;
            }
            out.push(sym as u8);
            continue;
        }
        if sym == 256 {
            return Step::Done;
        }
        if sym > 285 {
            return Step::Bad; // 286/287: invalid literal/length code
        }
        let li = (sym - 257) as usize;
        let len = match bits.take(LEN_EXTRA[li]) {
            Ok(e) => LEN_BASE[li] as usize + e as usize,
            Err(Need::More) => return Step::More,
        };
        let dh = match dist {
            Some(d) if d.max_len > 0 => d,
            // no distance codes defined but a length code appeared
            _ => return Step::Bad,
        };
        let dsym = match dh.decode(bits) {
            Ok(Some(s)) => s as usize,
            Ok(None) => return Step::Bad,
            Err(Need::More) => return Step::More,
        };
        if dsym > 29 {
            return Step::Bad; // invalid distance code
        }
        let d = match bits.take(DIST_EXTRA[dsym]) {
            Ok(e) => DIST_BASE[dsym] as usize + e as usize,
            Err(Need::More) => return Step::More,
        };
        if d > out.len() {
            return Step::Bad; // distance too far back
        }
        if out.len() + len > cap {
            return Step::Cap;
        }
        let start = out.len() - d;
        if d >= len {
            out.extend_from_within(start..start + len);
        } else {
            for k in 0..len {
                let b = out[start + k];
                out.push(b);
            }
        }
    }
}

/// zlib-wrapped inflate with `_flate_decode` semantics.
/// Err(InfErr) = corruption or cap (Python raises ValueError);
/// Ok(bytes) includes partial output for truncated input.
pub(crate) fn zlib_inflate(data: &[u8], cap: usize) -> Result<Vec<u8>, InfErr> {
    let mut out: Vec<u8> = Vec::new();
    if data.is_empty() {
        return Ok(out); // truncation at byte 0: Python returns b""
    }
    if data.len() < 2 {
        return Ok(out); // mid-header truncation: partial success
    }
    let cmf = data[0];
    let flg = data[1];
    if cmf & 0x0f != 8 || cmf >> 4 > 7 {
        return Err(InfErr); // unknown method / window too large
    }
    if ((cmf as u32) << 8 | flg as u32) % 31 != 0 {
        return Err(InfErr); // header check bits
    }
    if flg & 0x20 != 0 {
        return Err(InfErr); // FDICT: zlib raises "need dictionary"
    }
    let mut bits = Bits::new(&data[2..]);
    loop {
        let bfinal = match bits.take(1) {
            Ok(v) => v,
            Err(Need::More) => return Ok(out),
        };
        let btype = match bits.take(2) {
            Ok(v) => v,
            Err(Need::More) => return Ok(out),
        };
        let step = match btype {
            0 => {
                // stored block
                bits.align_byte();
                let b = &bits.data[bits.pos.min(bits.data.len())..];
                if b.len() < 4 {
                    return Ok(out);
                }
                let len = u16::from_le_bytes([b[0], b[1]]) as usize;
                let nlen = u16::from_le_bytes([b[2], b[3]]) as usize;
                if len ^ 0xffff != nlen {
                    return Err(InfErr);
                }
                bits.pos += 4;
                let avail = bits.data.len() - bits.pos;
                let n = len.min(avail);
                if out.len() + n > cap {
                    return Err(InfErr);
                }
                out.extend_from_slice(&bits.data[bits.pos..bits.pos + n]);
                bits.pos += n;
                if n < len {
                    return Ok(out); // truncated stored block
                }
                Step::Done
            }
            1 => {
                let lit = fixed_litlen();
                let dist = Some(fixed_dist());
                inflate_block(&mut bits, &mut out, &lit, &dist, cap)
            }
            2 => {
                // dynamic header
                let hlit = match bits.take(5) {
                    Ok(v) => v as usize + 257,
                    Err(Need::More) => return Ok(out),
                };
                let hdist = match bits.take(5) {
                    Ok(v) => v as usize + 1,
                    Err(Need::More) => return Ok(out),
                };
                let hclen = match bits.take(4) {
                    Ok(v) => v as usize + 4,
                    Err(Need::More) => return Ok(out),
                };
                if hlit > 286 || hdist > 30 {
                    return Err(InfErr); // too many symbols
                }
                let mut clens = [0u32; 19];
                for i in 0..hclen {
                    clens[CLEN_ORDER[i]] = match bits.take(3) {
                        Ok(v) => v,
                        Err(Need::More) => return Ok(out),
                    };
                }
                let ch = match Huff::build(&clens, true) {
                    Ok(h) => h,
                    Err(()) => return Err(InfErr),
                };
                if ch.max_len == 0 {
                    // zlib quirk (inftrees.c max==0 + the CODELENS
                    // reader using `val` without checking `op`): a
                    // ZERO-symbol code-lengths table consumes one bit
                    // per expected length, reads every length as 0,
                    // and only then errors "missing end-of-block".
                    // Truncated input inside that walk = partial
                    // success, like any other truncation.
                    for _ in 0..hlit + hdist {
                        if bits.take(1).is_err() {
                            return Ok(out);
                        }
                    }
                    return Err(InfErr);
                }
                let mut lens = vec![0u32; hlit + hdist];
                let mut i = 0usize;
                while i < lens.len() {
                    let s = match ch.decode(&mut bits) {
                        Ok(Some(s)) => s as u32,
                        Ok(None) => return Err(InfErr),
                        Err(Need::More) => return Ok(out),
                    };
                    match s {
                        0..=15 => {
                            lens[i] = s;
                            i += 1;
                        }
                        16 => {
                            if i == 0 {
                                return Err(InfErr); // no previous length
                            }
                            let rep = match bits.take(2) {
                                Ok(v) => v as usize + 3,
                                Err(Need::More) => return Ok(out),
                            };
                            if i + rep > lens.len() {
                                return Err(InfErr);
                            }
                            let prev = lens[i - 1];
                            for _ in 0..rep {
                                lens[i] = prev;
                                i += 1;
                            }
                        }
                        17 => {
                            let rep = match bits.take(3) {
                                Ok(v) => v as usize + 3,
                                Err(Need::More) => return Ok(out),
                            };
                            if i + rep > lens.len() {
                                return Err(InfErr);
                            }
                            i += rep;
                        }
                        _ => {
                            let rep = match bits.take(7) {
                                Ok(v) => v as usize + 11,
                                Err(Need::More) => return Ok(out),
                            };
                            if i + rep > lens.len() {
                                return Err(InfErr);
                            }
                            i += rep;
                        }
                    }
                }
                if lens[256] == 0 {
                    return Err(InfErr); // missing end-of-block code
                }
                let lit = match Huff::build(&lens[..hlit], false) {
                    Ok(h) => h,
                    Err(()) => return Err(InfErr),
                };
                let dist = match Huff::build(&lens[hlit..], false) {
                    Ok(h) => Some(h),
                    Err(()) => return Err(InfErr),
                };
                inflate_block(&mut bits, &mut out, &lit, &dist, cap)
            }
            _ => return Err(InfErr), // reserved block type
        };
        match step {
            Step::Done => {}
            Step::More => return Ok(out),
            Step::Bad => return Err(InfErr),
            Step::Cap => return Err(InfErr),
        }
        if bfinal == 1 {
            // adler32 trailer: byte-aligned big-endian; truncated
            // trailer is tolerated (Python returns without checking)
            bits.align_byte();
            let b = &bits.data[bits.pos.min(bits.data.len())..];
            if b.len() < 4 {
                return Ok(out);
            }
            let want = u32::from_be_bytes([b[0], b[1], b[2], b[3]]);
            if want != adler32(&out) {
                return Err(InfErr); // incorrect data check
            }
            return Ok(out); // trailing bytes ignored (unused_data)
        }
    }
}
