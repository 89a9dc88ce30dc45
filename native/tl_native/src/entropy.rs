//! Native entropy decoders: GIF/TIFF LZW and the JPEG Huffman scan
//! machine — the media path's former pure-Python scale ceiling.
//!
//! Semantic sources of truth: `tl_spark/operators/multimodal.py`
//! (`_lzw_decode`, `_tiff_lzw_decode`) and `tl_spark/operators/jpeg.py`
//! (`_BitReader` / `_decode_scan`, baseline + progressive per T.81
//! F.2/G.2). Every routine is a faithful port of that Python code;
//! bit/coefficient-exact equality is pinned by tests
//! (tests/test_native_entropy.py). On ANY anomaly the native call
//! returns a nonzero status and the caller falls back to the Python
//! implementation, which raises the precise ValueError — so error
//! semantics stay Python-exact by construction.

// ------------------------------------------------------------------ LZW

/// GIF-flavor LZW (LSB-first, CLEAR/EOI, 12-bit cap, late width
/// change). Writes exactly `n_pixels` bytes into `out`.
/// Status: 0 ok, 1 truncated, 2 corrupt, 3 underrun, 4 bad args.
///
/// # Safety
/// `data` readable for `data_len`; `out` writable for `n_pixels`.
#[no_mangle]
pub unsafe extern "C" fn tl_lzw_gif(
    data: *const u8,
    data_len: i64,
    min_code_size: i32,
    n_pixels: i64,
    out: *mut u8,
) -> i32 {
    if data_len < 0
        || n_pixels < 0
        || !(1..=11).contains(&min_code_size)
        || (data.is_null() && data_len > 0)
        || (out.is_null() && n_pixels > 0)
    {
        return 4;
    }
    let data = if data_len > 0 {
        std::slice::from_raw_parts(data, data_len as usize)
    } else {
        &[]
    };
    let out = if n_pixels > 0 {
        std::slice::from_raw_parts_mut(out, n_pixels as usize)
    } else {
        &mut []
    };
    lzw_gif(data, min_code_size as u32, out)
}

fn lzw_gif(data: &[u8], mcs: u32, out: &mut [u8]) -> i32 {
    let clear = 1usize << mcs;
    let eoi = clear + 1;
    let n_pixels = out.len();
    // parent-pointer dictionary (entry = parent chain + one byte)
    const CAP: usize = 4096;
    let mut parent = [0u16; CAP];
    let mut last = [0u8; CAP];
    let mut first = [0u8; CAP];
    let mut len = [0u32; CAP];
    let base = clear + 2;
    for i in 0..clear {
        parent[i] = u16::MAX;
        last[i] = i as u8;
        first[i] = i as u8;
        len[i] = 1;
    }
    let mut size = base;
    let mut width = mcs + 1;
    let mut prev: Option<usize> = None;

    let mut bitbuf: u32 = 0;
    let mut nbits: u32 = 0;
    let mut di = 0usize;
    let mut pos = 0usize;

    while pos < n_pixels {
        while nbits < width {
            if di >= data.len() {
                return 1; // truncated
            }
            bitbuf |= (data[di] as u32) << nbits;
            nbits += 8;
            di += 1;
        }
        let code = (bitbuf & ((1u32 << width) - 1)) as usize;
        bitbuf >>= width;
        nbits -= width;
        if code == clear {
            size = base;
            width = mcs + 1;
            prev = None;
            continue;
        }
        if code == eoi {
            break;
        }
        // resolve the entry to emit
        let (emit_code, kwk) = if code < size {
            (code, false)
        } else if code == size && prev.is_some() {
            (prev.unwrap(), true)
        } else {
            return 2; // corrupt
        };
        let entry_len = len[emit_code] as usize + if kwk { 1 } else { 0 };
        let entry_first = first[emit_code];
        // write entry bytes (back-walk), clipped at n_pixels
        let take = entry_len.min(n_pixels - pos);
        {
            // logical entry = chain(emit_code) [+ first byte when KwKwK]
            let mut idx = entry_len;
            if kwk {
                idx -= 1;
                if idx < take {
                    out[pos + idx] = entry_first;
                }
            }
            let mut c = emit_code;
            loop {
                idx -= 1;
                if idx < take {
                    out[pos + idx] = last[c];
                }
                if parent[c] == u16::MAX {
                    break;
                }
                c = parent[c] as usize;
            }
            if idx != 0 {
                return 2; // internal inconsistency
            }
        }
        pos += take;
        // table append: prev + first byte of entry
        if let Some(p) = prev {
            if size < CAP {
                parent[size] = p as u16;
                last[size] = entry_first;
                first[size] = first[p];
                len[size] = len[p] + 1;
                size += 1;
                if size == (1usize << width) && width < 12 {
                    width += 1;
                }
            }
        }
        prev = Some(if kwk { size - 1 } else { emit_code });
        // NOTE: for the KwKwK case the just-appended entry IS the
        // emitted entry (prev + prev[0]); when the table was full the
        // append didn't happen and prev must still be the emitted
        // string — unreachable in well-formed GIF (code==size can't
        // arrive with a full table), treat as corrupt instead.
        if kwk && size <= emit_code {
            return 2;
        }
    }
    if pos < n_pixels {
        return 3; // underrun
    }
    0
}

/// TIFF-flavor LZW (MSB-first, 9-bit start, EARLY width change).
/// Writes exactly `need` bytes. Status codes as `tl_lzw_gif`.
///
/// # Safety
/// `data` readable for `data_len`; `out` writable for `need`.
#[no_mangle]
pub unsafe extern "C" fn tl_lzw_tiff(
    data: *const u8,
    data_len: i64,
    need: i64,
    out: *mut u8,
) -> i32 {
    if data_len < 0
        || need < 0
        || (data.is_null() && data_len > 0)
        || (out.is_null() && need > 0)
    {
        return 4;
    }
    let data = if data_len > 0 {
        std::slice::from_raw_parts(data, data_len as usize)
    } else {
        &[]
    };
    let out = if need > 0 {
        std::slice::from_raw_parts_mut(out, need as usize)
    } else {
        &mut []
    };
    lzw_tiff(data, out)
}

fn lzw_tiff(data: &[u8], out: &mut [u8]) -> i32 {
    const CLEAR: usize = 256;
    const EOI: usize = 257;
    const CAP: usize = 4096;
    let need = out.len();
    let mut parent = [0u16; CAP];
    let mut last = [0u8; CAP];
    let mut first = [0u8; CAP];
    let mut len = [0u32; CAP];
    for i in 0..256 {
        parent[i] = u16::MAX;
        last[i] = i as u8;
        first[i] = i as u8;
        len[i] = 1;
    }
    // conceptual table size may exceed CAP (the Python list grows
    // unbounded); entries >= CAP are unreachable so storage stops
    let mut size = 258usize;
    let mut width: u32 = 9;
    let mut prev: Option<usize> = None;

    let mut buf: u32 = 0;
    let mut nbits: u32 = 0;
    let mut pos = 0usize;
    let mut written = 0usize;

    while written < need {
        while nbits < width {
            if pos >= data.len() {
                return 1;
            }
            buf = (buf << 8) | data[pos] as u32;
            pos += 1;
            nbits += 8;
        }
        nbits -= width;
        let code = ((buf >> nbits) & ((1u32 << width) - 1)) as usize;
        buf &= (1u32 << nbits).wrapping_sub(1);
        if code == CLEAR {
            size = 258;
            width = 9;
            prev = None;
            continue;
        }
        if code == EOI {
            break;
        }
        let (emit_code, kwk) = match prev {
            None => {
                if code >= size {
                    return 2;
                }
                (code, false)
            }
            Some(_) if code < size => (code, false),
            Some(p) if code == size => (p, true),
            Some(_) => return 2,
        };
        if emit_code >= CAP {
            return 2; // unreachable-entry reference
        }
        let entry_len = len[emit_code] as usize + if kwk { 1 } else { 0 };
        let entry_first = first[emit_code];
        // emit (clipped at `need` — the Python code slices out[:need])
        {
            let mut idx = entry_len;
            if kwk {
                idx -= 1;
                if written + idx < need {
                    out[written + idx] = entry_first;
                }
            }
            let mut c = emit_code;
            loop {
                idx -= 1;
                if written + idx < need {
                    out[written + idx] = last[c];
                }
                if parent[c] == u16::MAX {
                    break;
                }
                c = parent[c] as usize;
            }
            if idx != 0 {
                return 2;
            }
        }
        written += entry_len;
        // table append (mirrors the Python branch structure: appends
        // happen for `code < len(table)` only when prev is Some, and
        // always for the KwKwK case)
        if prev.is_some() || kwk {
            if size < CAP {
                let p = prev.unwrap();
                parent[size] = p as u16;
                last[size] = entry_first;
                first[size] = first[p];
                len[size] = len[p] + 1;
            }
            size += 1;
        }
        prev = Some(if kwk {
            if size - 1 >= CAP {
                return 2;
            }
            size - 1
        } else {
            emit_code
        });
        // EARLY change: widen one entry sooner (libtiff maxcode-1)
        if size == (1usize << width) - 2 && width < 12 {
            width += 1;
        }
    }
    if written < need {
        return 3;
    }
    0
}

// ----------------------------------------------------------------- JPEG

/// Canonical Huffman table (T.81 C.2) in mincode/maxcode form —
/// decode-equivalent to the Python {(length, code): sym} dict.
struct Huff {
    mincode: [i32; 17],
    maxcode: [i32; 17],
    valptr: [usize; 17],
    vals: Vec<u8>,
}

impl Huff {
    fn build(bits: &[u8], vals: &[u8]) -> Option<Huff> {
        let mut h = Huff {
            mincode: [0; 17],
            maxcode: [-1; 17],
            valptr: [0; 17],
            vals: vals.to_vec(),
        };
        let mut code: i64 = 0;
        let mut idx = 0usize;
        for length in 1..=16usize {
            let count = bits[length - 1] as usize;
            h.valptr[length] = idx;
            h.mincode[length] = code as i32;
            if count > 0 {
                if code + count as i64 - 1 >= (1i64 << length) {
                    return None; // overflowing table
                }
                h.maxcode[length] = (code + count as i64 - 1) as i32;
            } else {
                h.maxcode[length] = -1;
            }
            idx += count;
            code += count as i64;
            code <<= 1;
        }
        if idx != vals.len() {
            return None;
        }
        Some(h)
    }
}

/// MSB-first bit reader with 0xFF00 unstuffing; pads zeros at markers
/// and EOF (jpeg.py `_BitReader`, ported branch-for-branch).
struct BitReader<'a> {
    d: &'a [u8],
    pos: usize,
    bitbuf: u64,
    nbits: u32,
}

impl<'a> BitReader<'a> {
    fn new(d: &'a [u8], pos: usize) -> Self {
        BitReader { d, pos, bitbuf: 0, nbits: 0 }
    }

    fn fill(&mut self) {
        while self.nbits <= 24 {
            if self.pos >= self.d.len() {
                self.bitbuf <<= 8;
                self.nbits += 8;
                continue;
            }
            let b = self.d[self.pos];
            if b == 0xFF {
                let nxt = if self.pos + 1 < self.d.len() {
                    self.d[self.pos + 1]
                } else {
                    0xD9
                };
                if nxt == 0x00 {
                    self.pos += 2;
                } else {
                    // RSTn or next segment: pad zeros, don't advance
                    self.bitbuf <<= 8;
                    self.nbits += 8;
                    continue;
                }
            } else {
                self.pos += 1;
            }
            self.bitbuf = (self.bitbuf << 8) | b as u64;
            self.nbits += 8;
        }
    }

    fn bits(&mut self, n: u32) -> u32 {
        if n == 0 {
            return 0;
        }
        if self.nbits < n {
            self.fill();
        }
        self.nbits -= n;
        let out = (self.bitbuf >> self.nbits) & ((1u64 << n) - 1);
        self.bitbuf &= (1u64 << self.nbits) - 1;
        out as u32
    }

    fn huff(&mut self, t: &Huff) -> Result<u8, ()> {
        let mut code: i32 = 0;
        for length in 1..=16usize {
            code = (code << 1) | self.bits(1) as i32;
            if code >= t.mincode[length] && code <= t.maxcode[length] {
                let v = t.valptr[length] + (code - t.mincode[length]) as usize;
                return Ok(t.vals[v]);
            }
        }
        Err(())
    }

    fn restart(&mut self) -> Result<(), ()> {
        self.bitbuf = 0;
        self.nbits = 0;
        while self.pos + 1 < self.d.len() {
            if self.d[self.pos] == 0xFF
                && (0xD0..=0xD7).contains(&self.d[self.pos + 1])
            {
                self.pos += 2;
                return Ok(());
            }
            self.pos += 1;
        }
        Err(())
    }
}

/// T.81 F.12 EXTEND
#[inline]
fn extend(v: u32, s: u32) -> i64 {
    if s == 0 {
        return 0;
    }
    let v = v as i64;
    if v >= (1i64 << (s - 1)) {
        v
    } else {
        v - (1i64 << s) + 1
    }
}

const ZIGZAG: [usize; 64] = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33,
    40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50,
    43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
];

struct ScanComp {
    h: usize,
    v: usize,
    loop_bw: usize,
    loop_bh: usize,
    cols: usize,
    rows: usize,
    dc: Option<Huff>,
    ac: Option<Huff>,
    coefs: *mut i32, // (rows, cols, 64) C-contiguous
}

struct Scan<'a> {
    reader: BitReader<'a>,
    preds: Vec<i64>,
    eobrun: u32,
    progressive: bool,
    ss: usize,
    se: usize,
    ah: u32,
    al: u32,
}

impl<'a> Scan<'a> {
    /// one block; blk is the 64-coef natural-order slice
    fn decode_block(
        &mut self,
        blk: &mut [i32],
        si: usize,
        dct: &Option<Huff>,
        act: &Option<Huff>,
    ) -> Result<(), ()> {
        let r = &mut self.reader;
        if !self.progressive {
            let dct = dct.as_ref().ok_or(())?;
            let act = act.as_ref().ok_or(())?;
            let s = r.huff(dct)? as u32;
            if s > 16 {
                return Err(()); // exotic symbol: defer to Python
            }
            self.preds[si] += extend(r.bits(s), s);
            let dc = self.preds[si];
            if dc < i32::MIN as i64 || dc > i32::MAX as i64 {
                return Err(()); // Python/numpy would raise on overflow
            }
            blk[0] = dc as i32;
            let mut k = 1usize;
            while k < 64 {
                let rs = r.huff(act)? as u32;
                let (run, sz) = (rs >> 4, rs & 0x0F);
                if sz == 0 {
                    if run == 15 {
                        k += 16;
                        continue;
                    }
                    break; // EOB
                }
                k += run as usize;
                if k > 63 {
                    return Err(());
                }
                blk[ZIGZAG[k]] = extend(r.bits(sz), sz) as i32;
                k += 1;
            }
            return Ok(());
        }
        if self.ss == 0 && self.ah == 0 {
            // DC first
            let dct = dct.as_ref().ok_or(())?;
            let s = r.huff(dct)? as u32;
            if s > 16 {
                return Err(()); // exotic symbol: defer to Python
            }
            self.preds[si] += extend(r.bits(s), s);
            let dc = self.preds[si] << self.al;
            if dc < i32::MIN as i64 || dc > i32::MAX as i64 {
                return Err(());
            }
            blk[0] = dc as i32;
            return Ok(());
        }
        if self.ss == 0 {
            // DC refine: one raw bit
            if r.bits(1) != 0 {
                blk[0] |= 1 << self.al;
            }
            return Ok(());
        }
        if self.ah == 0 {
            // AC first with EOB runs
            if self.eobrun > 0 {
                self.eobrun -= 1;
                return Ok(());
            }
            let act = act.as_ref().ok_or(())?;
            let mut k = self.ss;
            while k <= self.se {
                let rs = r.huff(act)? as u32;
                let (run, sz) = (rs >> 4, rs & 0x0F);
                if sz == 0 {
                    if run == 15 {
                        k += 16;
                        continue;
                    }
                    self.eobrun = (1u32 << run) - 1;
                    if run > 0 {
                        self.eobrun += r.bits(run);
                    }
                    return Ok(());
                }
                k += run as usize;
                if k > self.se {
                    return Err(());
                }
                blk[ZIGZAG[k]] = (extend(r.bits(sz), sz) << self.al) as i32;
                k += 1;
            }
            return Ok(());
        }
        // AC refine (T.81 G.2 correction bits)
        let p1: i32 = 1 << self.al;
        let m1: i32 = -(1 << self.al);
        let act = act.as_ref().ok_or(())?;

        macro_rules! correct {
            ($pos:expr) => {{
                let pos = $pos;
                let v = blk[pos];
                if v != 0 && self.reader.bits(1) != 0 && (v & p1) == 0 {
                    blk[pos] = v + if v >= 0 { p1 } else { m1 };
                }
                v != 0
            }};
        }

        let mut k = self.ss;
        if self.eobrun == 0 {
            while k <= self.se {
                let rs = self.reader.huff(act)? as u32;
                let (mut run, sz) = (rs >> 4, rs & 0x0F);
                let newval: i32;
                if sz == 0 {
                    if run != 15 {
                        self.eobrun = 1u32 << run;
                        if run > 0 {
                            self.eobrun += self.reader.bits(run);
                        }
                        break;
                    }
                    newval = 0; // ZRL: skip 16 zero-history slots
                } else {
                    if sz != 1 {
                        return Err(());
                    }
                    newval = if self.reader.bits(1) != 0 { p1 } else { m1 };
                }
                while k <= self.se {
                    if !correct!(ZIGZAG[k]) {
                        if run == 0 {
                            break;
                        }
                        run -= 1;
                    }
                    k += 1;
                }
                if newval != 0 && k <= self.se {
                    blk[ZIGZAG[k]] = newval;
                }
                k += 1;
            }
        }
        if self.eobrun > 0 {
            while k <= self.se {
                let _ = correct!(ZIGZAG[k]);
                k += 1;
            }
            self.eobrun -= 1;
        }
        Ok(())
    }
}

fn read_u32(b: &[u8], pos: &mut usize) -> Option<u32> {
    if *pos + 4 > b.len() {
        return None;
    }
    let v = u32::from_le_bytes(b[*pos..*pos + 4].try_into().unwrap());
    *pos += 4;
    Some(v)
}

fn read_huff(b: &[u8], pos: &mut usize) -> Option<Option<Huff>> {
    if *pos >= b.len() {
        return None;
    }
    let present = b[*pos];
    *pos += 1;
    if present == 0 {
        return Some(None);
    }
    if *pos + 16 + 2 > b.len() {
        return None;
    }
    let bits = &b[*pos..*pos + 16];
    *pos += 16;
    let nvals =
        u16::from_le_bytes(b[*pos..*pos + 2].try_into().unwrap()) as usize;
    *pos += 2;
    if *pos + nvals > b.len() {
        return None;
    }
    let vals = &b[*pos..*pos + nvals];
    *pos += nvals;
    Huff::build(bits, vals).map(Some)
}

/// Decode one JPEG scan into the caller's coefficient arrays.
/// `blob` layout (LE): u8 progressive, u8 ss, u8 se, u8 ah, u8 al,
/// u32 ri, u32 mcus_x, u32 mcus_y, u32 data_at, u32 n_scan_comps,
/// then per scan comp: u32 h, v, loop_bw, loop_bh, cols, rows;
/// dc table (u8 present [+16 bits + u16 nvals + vals]); ac table.
/// `coef_ptrs`: one *mut i32 per scan comp ((rows, cols, 64) int32
/// C-contiguous, caller-owned, mutated in place).
/// Status: 0 ok; nonzero -> caller falls back to Python.
///
/// # Safety
/// `payload` readable for `payload_len`; `blob` for `blob_len`;
/// `coef_ptrs` holds n_scan_comps valid writable arrays of
/// rows*cols*64 i32.
#[no_mangle]
pub unsafe extern "C" fn tl_jpeg_scan(
    payload: *const u8,
    payload_len: i64,
    blob: *const u8,
    blob_len: i64,
    coef_ptrs: *const *mut i32,
) -> i32 {
    if payload.is_null() || blob.is_null() || coef_ptrs.is_null() {
        return 4;
    }
    if payload_len < 0 || blob_len < 10 {
        return 4;
    }
    let payload = std::slice::from_raw_parts(payload, payload_len as usize);
    let b = std::slice::from_raw_parts(blob, blob_len as usize);
    let progressive = b[0] != 0;
    let ss = b[1] as usize;
    let se = b[2] as usize;
    let ah = b[3] as u32;
    let al = b[4] as u32;
    let mut pos = 5usize;
    let (ri, mcus_x, mcus_y, data_at, n_sc) = match (
        read_u32(b, &mut pos),
        read_u32(b, &mut pos),
        read_u32(b, &mut pos),
        read_u32(b, &mut pos),
        read_u32(b, &mut pos),
    ) {
        (Some(a), Some(c), Some(d), Some(e), Some(f)) => {
            (a as usize, c as usize, d as usize, e as usize, f as usize)
        }
        _ => return 4,
    };
    if n_sc == 0 || n_sc > 4 || se > 63 || ss > 63 || al > 15 || ah > 15 {
        return 4;
    }
    let ptrs = std::slice::from_raw_parts(coef_ptrs, n_sc);
    let mut comps: Vec<ScanComp> = Vec::with_capacity(n_sc);
    for ptr in ptrs.iter().take(n_sc) {
        let h = match read_u32(b, &mut pos) {
            Some(v) => v as usize,
            None => return 4,
        };
        let v = match read_u32(b, &mut pos) {
            Some(v) => v as usize,
            None => return 4,
        };
        let loop_bw = match read_u32(b, &mut pos) {
            Some(v) => v as usize,
            None => return 4,
        };
        let loop_bh = match read_u32(b, &mut pos) {
            Some(v) => v as usize,
            None => return 4,
        };
        let cols = match read_u32(b, &mut pos) {
            Some(v) => v as usize,
            None => return 4,
        };
        let rows = match read_u32(b, &mut pos) {
            Some(v) => v as usize,
            None => return 4,
        };
        let dc = match read_huff(b, &mut pos) {
            Some(t) => t,
            None => return 4,
        };
        let ac = match read_huff(b, &mut pos) {
            Some(t) => t,
            None => return 4,
        };
        if ptr.is_null() || h == 0 || v == 0 || cols == 0 || rows == 0 {
            return 4;
        }
        comps.push(ScanComp {
            h,
            v,
            loop_bw,
            loop_bh,
            cols,
            rows,
            dc,
            ac,
            coefs: *ptr,
        });
    }
    if pos != b.len() {
        return 4;
    }
    if data_at > payload.len() {
        return 4;
    }

    let interleaved = n_sc > 1;
    // bounds pre-check: every block index the loops will touch fits
    if interleaved {
        for c in &comps {
            if mcus_y * c.v > c.rows || mcus_x * c.h > c.cols {
                return 4;
            }
        }
    } else {
        let c = &comps[0];
        if c.loop_bh > c.rows || c.loop_bw > c.cols {
            return 4;
        }
    }

    let mut scan = Scan {
        reader: BitReader::new(payload, data_at),
        preds: vec![0; n_sc],
        eobrun: 0,
        progressive,
        ss,
        se,
        ah,
        al,
    };

    macro_rules! block_at {
        ($c:expr, $y:expr, $x:expr) => {{
            let off = ($y * $c.cols + $x) * 64;
            std::slice::from_raw_parts_mut($c.coefs.add(off), 64)
        }};
    }

    let mut unit = 0usize;
    let status: Result<(), ()> = (|| {
        if interleaved {
            for my in 0..mcus_y {
                for mx in 0..mcus_x {
                    if ri != 0 && unit != 0 && unit % ri == 0 {
                        scan.reader.restart()?;
                        for p in scan.preds.iter_mut() {
                            *p = 0;
                        }
                        scan.eobrun = 0;
                    }
                    for si in 0..n_sc {
                        let c = &comps[si];
                        for by in 0..c.v {
                            for bx in 0..c.h {
                                let y = my * c.v + by;
                                let x = mx * c.h + bx;
                                let blk = block_at!(c, y, x);
                                scan.decode_block(blk, si, &c.dc, &c.ac)?;
                            }
                        }
                    }
                    unit += 1;
                }
            }
        } else {
            let c = &comps[0];
            for y in 0..c.loop_bh {
                for x in 0..c.loop_bw {
                    if ri != 0 && unit != 0 && unit % ri == 0 {
                        scan.reader.restart()?;
                        for p in scan.preds.iter_mut() {
                            *p = 0;
                        }
                        scan.eobrun = 0;
                    }
                    let blk = block_at!(c, y, x);
                    scan.decode_block(blk, 0, &c.dc, &c.ac)?;
                    unit += 1;
                }
            }
        }
        Ok(())
    })();

    match status {
        Ok(()) => 0,
        Err(()) => 2,
    }
}

// ------------------------------------------------------------------ BPE

/// Greedy BPE apply over a batch of words encoded as symbol ids
/// (the caller's codepoint/EOW-bit/product-id scheme — see
/// tl_spark/operators/bpe.py::_BatchBpe). Exact per-word greedy:
/// repeatedly merge the LEFTMOST occurrence of the lowest-rank
/// adjacent pair, byte-for-byte the same algorithm as
/// `bpe_apply_word`.
///
/// `keys` are sorted (a_id << 32 | b_id) pair keys with parallel
/// `ranks` and `prods`; `out_syms` must hold `n_syms` i64 and
/// `out_offs` `n_words + 1` i64. Returns the total output symbol
/// count, or -1 on bad args.
///
/// # Safety
/// All pointers valid for their stated lengths; `word_offs` is
/// nondecreasing with word_offs[0] == 0 and word_offs[n_words] ==
/// n_syms.
#[no_mangle]
pub unsafe extern "C" fn tl_bpe_apply(
    syms: *const i64,
    n_syms: i64,
    word_offs: *const i64,
    n_words: i64,
    keys: *const i64,
    ranks: *const i64,
    prods: *const i64,
    n_pairs: i64,
    out_syms: *mut i64,
    out_offs: *mut i64,
) -> i64 {
    if n_syms < 0
        || n_words < 0
        || n_pairs < 0
        || (syms.is_null() && n_syms > 0)
        || word_offs.is_null()
        || (keys.is_null() && n_pairs > 0)
        || (out_syms.is_null() && n_syms > 0)
        || out_offs.is_null()
    {
        return -1;
    }
    let syms = std::slice::from_raw_parts(syms, n_syms as usize);
    let offs = std::slice::from_raw_parts(word_offs, n_words as usize + 1);
    let keys = std::slice::from_raw_parts(keys, n_pairs as usize);
    let ranks = std::slice::from_raw_parts(ranks, n_pairs as usize);
    let prods = std::slice::from_raw_parts(prods, n_pairs as usize);
    let out = std::slice::from_raw_parts_mut(out_syms, n_syms as usize);
    let oo = std::slice::from_raw_parts_mut(out_offs, n_words as usize + 1);

    let lookup = |a: i64, b: i64| -> Option<(i64, i64)> {
        let k = (a << 32) | b;
        match keys.binary_search(&k) {
            Ok(i) => Some((ranks[i], prods[i])),
            Err(_) => None,
        }
    };

    let mut w: Vec<i64> = Vec::new();
    let mut total = 0usize;
    oo[0] = 0;
    for wi in 0..n_words as usize {
        let (s, e) = (offs[wi] as usize, offs[wi + 1] as usize);
        if s > e || e > syms.len() {
            return -1;
        }
        w.clear();
        w.extend_from_slice(&syms[s..e]);
        // greedy merge loop (bpe_apply_word port)
        while w.len() > 1 {
            let mut best_rank = i64::MAX;
            let mut best_i = usize::MAX;
            let mut best_prod = 0i64;
            for i in 0..w.len() - 1 {
                if let Some((r, p)) = lookup(w[i], w[i + 1]) {
                    if r < best_rank {
                        best_rank = r;
                        best_i = i;
                        best_prod = p;
                    }
                }
            }
            if best_i == usize::MAX {
                break;
            }
            w[best_i] = best_prod;
            w.remove(best_i + 1);
        }
        if total + w.len() > out.len() {
            return -1; // output can never exceed input symbols
        }
        out[total..total + w.len()].copy_from_slice(&w);
        total += w.len();
        oo[wi + 1] = total as i64;
    }
    total as i64
}
