//! Native FLAC decode leg — the hot-path twin of
//! tl_spark/operators/flac.py's `flac_decode` (the Python module's
//! docstring carries the format rationale and the round-trip /
//! integrity methodology; this file only re-implements the decode
//! walk for speed, same as the entropy.rs / doc.rs pattern).
//!
//! Contract with the glue (tl_spark/operators/flac.py `_native_decode`):
//! ANY anomaly — malformed stream, CRC/MD5 mismatch, arithmetic that
//! would leave i64 (Python promotes to big ints there), bounds —
//! returns status != 0 and the caller replays the pure-Python
//! decoder, which either produces the identical result or raises the
//! contract ValueError. Success returns status 0 and a byte payload:
//! [sample_rate: u32 LE][channels: u32 LE][n_samples: u64 LE]
//! [interleaved i16 LE samples]. Freed with `tl_bytes_free`.
//!
//! No `unwrap`/indexing without bounds checks anywhere: the cdylib is
//! built with panic=abort and a panic kills the Python worker.

use crate::crypt::{bytes_out, TlBytesOut};
use crate::doc::md5;

const MAX_UNKNOWN_TOTAL: u64 = 1 << 26;

// ---------------------------------------------------------------- bits

struct Br<'a> {
    d: &'a [u8],
    byte: usize,
    acc: u64,
    nbits: u32,
}

impl<'a> Br<'a> {
    fn new(d: &'a [u8], byte: usize) -> Self {
        Br { d, byte, acc: 0, nbits: 0 }
    }

    #[inline]
    fn fill(&mut self) {
        while self.nbits <= 56 && self.byte < self.d.len() {
            self.acc = (self.acc << 8) | self.d[self.byte] as u64;
            self.byte += 1;
            self.nbits += 8;
        }
    }

    #[inline]
    fn read(&mut self, n: u32) -> Result<u64, ()> {
        if n == 0 {
            return Ok(0);
        }
        if self.nbits < n {
            self.fill();
            if self.nbits < n {
                return Err(());
            }
        }
        self.nbits -= n;
        let v = (self.acc >> self.nbits) & ((1u64 << n) - 1);
        Ok(v)
    }

    #[inline]
    fn read_signed(&mut self, n: u32) -> Result<i64, ()> {
        if n == 0 {
            return Ok(0);
        }
        let v = self.read(n)? as i64;
        if n < 64 && v >= 1i64 << (n - 1) {
            Ok(v - (1i64 << n))
        } else {
            Ok(v)
        }
    }

    #[inline]
    fn read_unary(&mut self) -> Result<u32, ()> {
        let mut run = 0u32;
        loop {
            if self.nbits == 0 {
                self.fill();
                if self.nbits == 0 {
                    return Err(());
                }
            }
            // nbits can be 64 here (fill tops up past 56): a plain
            // (1 << nbits) - 1 mask would wrap the shift amount in
            // release builds and silently zero the window
            let window = self.acc & (u64::MAX >> (64 - self.nbits));
            if window == 0 {
                run += self.nbits;
                self.nbits = 0;
                if run > 1 << 24 {
                    return Err(()); // parity guard: bail to Python
                }
                continue;
            }
            let lead = self.nbits - (64 - window.leading_zeros());
            run += lead;
            if run > 1 << 24 {
                return Err(());
            }
            self.nbits -= lead + 1;
            return Ok(run);
        }
    }

    #[inline]
    fn bit_pos(&self) -> usize {
        self.byte * 8 - self.nbits as usize
    }

    fn align(&mut self) {
        let rem = (self.bit_pos() % 8) as u32;
        if rem != 0 {
            self.nbits -= 8 - rem;
        }
    }

    fn at_end(&self) -> bool {
        // the reader buffers ahead: bytes may be consumed into `acc`
        // while their bits are still unread, so test the BIT position
        self.bit_pos() >= self.d.len() * 8
    }
}

// ---------------------------------------------------------------- crcs

fn crc8(data: &[u8]) -> u8 {
    let mut c = 0u8;
    for &b in data {
        c ^= b;
        for _ in 0..8 {
            c = if c & 0x80 != 0 { (c << 1) ^ 0x07 } else { c << 1 };
        }
    }
    c
}

fn crc16(data: &[u8]) -> u16 {
    let mut c = 0u16;
    for &b in data {
        c ^= (b as u16) << 8;
        for _ in 0..8 {
            c = if c & 0x8000 != 0 { (c << 1) ^ 0x8005 } else { c << 1 };
        }
    }
    c
}

// ---------------------------------------------------------------- stream

struct StreamInfo {
    sample_rate: u32,
    channels: u32,
    bps: u32,
    total: u64,
    md5sum: [u8; 16],
}

fn parse_streaminfo(p: &[u8]) -> Result<(StreamInfo, usize), ()> {
    if p.len() < 4 || &p[..4] != b"fLaC" {
        return Err(());
    }
    let mut pos = 4usize;
    let mut info: Option<StreamInfo> = None;
    let mut first = true;
    loop {
        if pos + 4 > p.len() {
            return Err(());
        }
        let head = p[pos];
        let last = head & 0x80 != 0;
        let btype = head & 0x7f;
        let size = ((p[pos + 1] as usize) << 16)
            | ((p[pos + 2] as usize) << 8)
            | p[pos + 3] as usize;
        if pos + 4 + size > p.len() {
            return Err(());
        }
        if first {
            if btype != 0 || size != 34 {
                return Err(());
            }
            let b = &p[pos + 4..pos + 38];
            let sr = ((b[10] as u32) << 12)
                | ((b[11] as u32) << 4)
                | ((b[12] as u32) >> 4);
            let ch = (((b[12] >> 1) & 0x7) as u32) + 1;
            let bps = ((((b[12] & 1) as u32) << 4) | ((b[13] as u32) >> 4)) + 1;
            let total = (((b[13] & 0x0f) as u64) << 32)
                | ((b[14] as u64) << 24)
                | ((b[15] as u64) << 16)
                | ((b[16] as u64) << 8)
                | b[17] as u64;
            if sr == 0 {
                return Err(());
            }
            let mut m = [0u8; 16];
            m.copy_from_slice(&b[18..34]);
            info = Some(StreamInfo {
                sample_rate: sr,
                channels: ch,
                bps,
                total,
                md5sum: m,
            });
        } else if btype == 127 {
            return Err(());
        }
        first = false;
        pos += 4 + size;
        if last {
            break;
        }
    }
    match info {
        Some(i) => Ok((i, pos)),
        None => Err(()),
    }
}

// ---------------------------------------------------------------- frames

const FIXED_COEFS: [&[i64]; 5] =
    [&[], &[1], &[2, -1], &[3, -3, 1], &[4, -6, 4, -1]];

fn decode_residual(
    br: &mut Br,
    block: usize,
    order: usize,
    out: &mut Vec<i64>,
) -> Result<(), ()> {
    let method = br.read(2)?;
    if method > 1 {
        return Err(());
    }
    let pbits = 4 + method as u32;
    let escape = (1u64 << pbits) - 1;
    let porder = br.read(4)? as usize;
    let nparts = 1usize << porder;
    if block % nparts != 0 || (block >> porder) < order {
        return Err(());
    }
    for part in 0..nparts {
        let n = (block >> porder) - if part == 0 { order } else { 0 };
        let param = br.read(pbits)?;
        if param == escape {
            let raw = br.read(5)? as u32;
            if raw == 0 {
                for _ in 0..n {
                    out.push(0);
                }
            } else {
                for _ in 0..n {
                    out.push(br.read_signed(raw)?);
                }
            }
        } else {
            let param = param as u32;
            for _ in 0..n {
                let q = br.read_unary()? as u64;
                // parity guard: Python builds arbitrary-size ints here
                if q > (1 << 30) {
                    return Err(());
                }
                let u = (q << param) | br.read(param)?;
                out.push(((u >> 1) as i64) ^ -((u & 1) as i64));
            }
        }
    }
    Ok(())
}

fn decode_subframe(
    br: &mut Br,
    block: usize,
    bps: u32,
    samples: &mut Vec<i64>,
) -> Result<(), ()> {
    samples.clear();
    if br.read(1)? != 0 {
        return Err(());
    }
    let ftype = br.read(6)? as u32;
    let mut wasted = 0u32;
    if br.read(1)? != 0 {
        wasted = br.read_unary()? + 1;
    }
    if wasted >= bps || wasted > 32 {
        return Err(());
    }
    let eff = bps - wasted;
    if ftype == 0 {
        let v = br.read_signed(eff)?;
        samples.resize(block, v);
    } else if ftype == 1 {
        for _ in 0..block {
            samples.push(br.read_signed(eff)?);
        }
    } else if (8..=12).contains(&ftype) {
        let order = (ftype - 8) as usize;
        if order > block {
            return Err(());
        }
        for _ in 0..order {
            samples.push(br.read_signed(eff)?);
        }
        let mut resid = Vec::with_capacity(block - order);
        decode_residual(br, block, order, &mut resid)?;
        let coefs = FIXED_COEFS[order];
        for (i, r) in resid.iter().enumerate() {
            let base = i + order;
            let mut pred: i64 = 0;
            for (j, c) in coefs.iter().enumerate() {
                let term = c.checked_mul(samples[base - 1 - j]).ok_or(())?;
                pred = pred.checked_add(term).ok_or(())?;
            }
            samples.push(r.checked_add(pred).ok_or(())?);
        }
    } else if ftype >= 32 {
        let order = ((ftype & 31) + 1) as usize;
        if order > block {
            return Err(());
        }
        for _ in 0..order {
            samples.push(br.read_signed(eff)?);
        }
        let prec = br.read(4)?;
        if prec == 15 {
            return Err(());
        }
        let prec = prec as u32 + 1;
        let shift = br.read_signed(5)?;
        if shift < 0 {
            return Err(());
        }
        let shift = shift as u32;
        let mut coefs = Vec::with_capacity(order);
        for _ in 0..order {
            coefs.push(br.read_signed(prec)?);
        }
        let mut resid = Vec::with_capacity(block - order);
        decode_residual(br, block, order, &mut resid)?;
        for (i, r) in resid.iter().enumerate() {
            let base = i + order;
            let mut acc: i64 = 0;
            for (j, c) in coefs.iter().enumerate() {
                let term = c.checked_mul(samples[base - 1 - j]).ok_or(())?;
                acc = acc.checked_add(term).ok_or(())?;
            }
            samples.push(r.checked_add(acc >> shift).ok_or(())?);
        }
    } else {
        return Err(());
    }
    if wasted > 0 {
        for s in samples.iter_mut() {
            *s = s.checked_mul(1i64 << wasted).ok_or(())?;
        }
    }
    Ok(())
}

/// Decode one frame at the (byte-aligned) reader position into
/// `chans` (per-channel sample vectors). Returns the block size.
fn decode_frame(
    p: &[u8],
    br: &mut Br,
    info: &StreamInfo,
    chans: &mut [Vec<i64>],
    scratch: &mut [Vec<i64>; 2],
) -> Result<usize, ()> {
    let start = br.bit_pos();
    if start % 8 != 0 {
        return Err(());
    }
    let start = start / 8;
    if br.read(14)? != 0x3ffe {
        return Err(());
    }
    if br.read(1)? != 0 {
        return Err(());
    }
    br.read(1)?; // blocking strategy
    let bs_code = br.read(4)? as u32;
    let sr_code = br.read(4)? as u32;
    let ch_code = br.read(4)? as u32;
    let bps_code = br.read(3)? as u32;
    if br.read(1)? != 0 {
        return Err(());
    }
    // UTF-8-style coded number: walked, not used
    let b0 = br.read(8)? as u32;
    if b0 >= 0x80 {
        let mut nbytes = 0u32;
        let mut mask = 0x80u32;
        while b0 & mask != 0 {
            nbytes += 1;
            mask >>= 1;
        }
        if !(2..=7).contains(&nbytes) {
            return Err(());
        }
        for _ in 0..nbytes - 1 {
            let c = br.read(8)? as u32;
            if c & 0xc0 != 0x80 {
                return Err(());
            }
        }
    }
    let block = match bs_code {
        0 => return Err(()),
        1 => 192usize,
        2..=5 => 576usize << (bs_code - 2),
        6 => br.read(8)? as usize + 1,
        7 => br.read(16)? as usize + 1,
        _ => 256usize << (bs_code - 8),
    };
    match sr_code {
        0..=11 => {} // table codes; the stream rate comes from STREAMINFO
        12 => {
            br.read(8)?;
        }
        13 | 14 => {
            br.read(16)?;
        }
        _ => return Err(()),
    }
    let bps = match bps_code {
        0 => info.bps,
        1 => 8,
        2 => 12,
        4 => 16,
        5 => 20,
        6 => 24,
        7 => 32,
        _ => return Err(()),
    };
    let hdr_end = br.bit_pos();
    if hdr_end % 8 != 0 {
        return Err(());
    }
    let hdr_end = hdr_end / 8;
    if hdr_end > p.len() {
        return Err(());
    }
    let expect = crc8(&p[start..hdr_end]);
    if br.read(8)? as u8 != expect {
        return Err(());
    }
    let (nch, side) = match ch_code {
        0..=7 => ((ch_code + 1) as usize, 0u8),
        8 => (2, 1),  // left/side
        9 => (2, 2),  // right/side
        10 => (2, 3), // mid/side
        _ => return Err(()),
    };
    if nch != info.channels as usize {
        return Err(());
    }
    if side == 0 {
        for chan in chans.iter_mut() {
            let mut tmp = std::mem::take(&mut scratch[0]);
            decode_subframe(br, block, bps, &mut tmp)?;
            chan.extend_from_slice(&tmp);
            scratch[0] = tmp;
        }
    } else {
        let bps0 = if side == 2 { bps + 1 } else { bps };
        let bps1 = if side == 2 { bps } else { bps + 1 };
        let mut a = std::mem::take(&mut scratch[0]);
        let mut b = std::mem::take(&mut scratch[1]);
        decode_subframe(br, block, bps0, &mut a)?;
        decode_subframe(br, block, bps1, &mut b)?;
        if a.len() != b.len() {
            return Err(());
        }
        match side {
            1 => {
                // left/side: right = left - side
                for i in 0..a.len() {
                    chans[0].push(a[i]);
                    chans[1].push(a[i].checked_sub(b[i]).ok_or(())?);
                }
            }
            2 => {
                // right/side: left = right + side
                for i in 0..a.len() {
                    chans[0].push(b[i].checked_add(a[i]).ok_or(())?);
                    chans[1].push(b[i]);
                }
            }
            _ => {
                // mid/side
                for i in 0..a.len() {
                    let m2 = a[i].checked_mul(2).ok_or(())? | (b[i] & 1);
                    chans[0].push(m2.checked_add(b[i]).ok_or(())? >> 1);
                    chans[1].push(m2.checked_sub(b[i]).ok_or(())? >> 1);
                }
            }
        }
        scratch[0] = a;
        scratch[1] = b;
    }
    br.align();
    let body_end = br.bit_pos();
    if body_end % 8 != 0 {
        return Err(());
    }
    let body_end = body_end / 8;
    if body_end > p.len() {
        return Err(());
    }
    let expect16 = crc16(&p[start..body_end]);
    if br.read(16)? as u16 != expect16 {
        return Err(());
    }
    Ok(block)
}

fn decode_stream(p: &[u8], verify_md5: bool) -> Result<Vec<u8>, ()> {
    let (info, pos) = parse_streaminfo(p)?;
    let nch = info.channels as usize;
    let bps = info.bps;
    if !(1..=32).contains(&bps) {
        return Err(());
    }
    let mut br = Br::new(p, pos);
    let mut chans: Vec<Vec<i64>> = vec![Vec::new(); nch];
    let mut scratch: [Vec<i64>; 2] = [Vec::new(), Vec::new()];
    let bound = if info.total > 0 { info.total } else { MAX_UNKNOWN_TOTAL };
    let mut n_decoded: u64 = 0;
    while !br.at_end() {
        decode_frame(p, &mut br, &info, &mut chans, &mut scratch)?;
        n_decoded = chans[0].len() as u64;
        if n_decoded > bound {
            return Err(());
        }
    }
    if info.total > 0 && n_decoded != info.total {
        return Err(());
    }
    // range check against declared bps (mirrors the Python decoder)
    let limit = 1i64 << (bps - 1);
    for ch in &chans {
        for &s in ch {
            if s >= limit || s < -limit {
                return Err(());
            }
        }
    }
    let n = n_decoded as usize;
    if verify_md5 && info.md5sum != [0u8; 16] {
        let width = ((bps + 7) / 8) as usize;
        let mut pcm = Vec::with_capacity(n * nch * width);
        for i in 0..n {
            for ch in chans.iter() {
                let v = ch[i];
                for k in 0..width {
                    pcm.push(((v >> (8 * k)) & 0xff) as u8);
                }
            }
        }
        if md5(&pcm) != info.md5sum {
            return Err(());
        }
    }
    // int16 normalization (same contract as the WAV decoder)
    let mut out = Vec::with_capacity(16 + n * nch * 2);
    out.extend_from_slice(&info.sample_rate.to_le_bytes());
    out.extend_from_slice(&(info.channels).to_le_bytes());
    out.extend_from_slice(&(n as u64).to_le_bytes());
    for i in 0..n {
        for ch in chans.iter() {
            let v = ch[i];
            let v16 = if bps == 16 {
                v as i16
            } else if bps < 16 {
                (v << (16 - bps)) as i16
            } else {
                (v >> (bps - 16)) as i16
            };
            out.extend_from_slice(&v16.to_le_bytes());
        }
    }
    Ok(out)
}

/// # Safety
/// `data` must be readable for `len` bytes. Free with `tl_bytes_free`.
#[no_mangle]
pub unsafe extern "C" fn tl_flac_decode(
    data: *const u8,
    len: i64,
    verify_md5: i64,
) -> *mut TlBytesOut {
    if len < 0 || (data.is_null() && len > 0) {
        return bytes_out(1, Vec::new());
    }
    let p = if len > 0 {
        std::slice::from_raw_parts(data, len as usize)
    } else {
        &[]
    };
    match decode_stream(p, verify_md5 != 0) {
        Ok(v) => bytes_out(0, v),
        Err(()) => bytes_out(1, Vec::new()),
    }
}
