//! Native RC4 + AES-CBC decrypt — the standard-security-handler hot
//! path for encrypted-PDF crawls.
//!
//! Semantic source of truth: `tl_spark/operators/pdf_crypt.py`
//! (`rc4`, `aes_cbc_decrypt`). Both are exact bit-for-bit ciphers
//! (FIPS-197 / RC4), so equivalence is pinned by round-trip tests
//! against the Python implementation plus published test vectors
//! (tests/test_native_pdf.py). The lenient PKCS#7 unpad stays on the
//! Python side — this returns the raw CBC plaintext. On any invalid
//! argument (bad key length, unaligned ciphertext) the call returns a
//! non-zero status and the caller falls back to Python, which raises
//! the documented ValueError.

use crate::take_vec;
use std::sync::OnceLock;

#[repr(C)]
pub struct TlBytesOut {
    pub(crate) status: i64, // 0 ok; 1 invalid input → Python fallback
    data: *mut u8,
    len: i64,
    cap: i64,
}

pub(crate) fn bytes_out(status: i64, v: Vec<u8>) -> *mut TlBytesOut {
    let (p, l, c) = take_vec(v);
    Box::into_raw(Box::new(TlBytesOut { status, data: p, len: l, cap: c }))
}

/// # Safety
/// `out` must come from this module and not be freed twice.
#[no_mangle]
pub unsafe extern "C" fn tl_bytes_free(out: *mut TlBytesOut) {
    if out.is_null() {
        return;
    }
    let o = Box::from_raw(out);
    if !o.data.is_null() {
        drop(Vec::from_raw_parts(o.data, o.len as usize, o.cap as usize));
    }
}

// ------------------------------------------------------------------- RC4

/// # Safety
/// `key` readable for `key_len`, `data` for `data_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_rc4(
    key: *const u8,
    key_len: i64,
    data: *const u8,
    data_len: i64,
) -> *mut TlBytesOut {
    if key.is_null() || key_len <= 0 || data_len < 0 || (data.is_null() && data_len > 0) {
        return bytes_out(1, Vec::new());
    }
    let key = std::slice::from_raw_parts(key, key_len as usize);
    let data = if data_len > 0 {
        std::slice::from_raw_parts(data, data_len as usize)
    } else {
        &[]
    };
    bytes_out(0, rc4_core(key, data))
}

/// The RC4 cipher itself, shared with the native whole-document PDF
/// decryptor (doc.rs). `key` must be non-empty (callers check).
pub(crate) fn rc4_core(key: &[u8], data: &[u8]) -> Vec<u8> {
    let mut s: [u8; 256] = [0; 256];
    for (i, v) in s.iter_mut().enumerate() {
        *v = i as u8;
    }
    let mut j = 0usize;
    for i in 0..256 {
        j = (j + s[i] as usize + key[i % key.len()] as usize) & 0xFF;
        s.swap(i, j);
    }
    let mut out = Vec::with_capacity(data.len());
    let (mut i, mut j) = (0usize, 0usize);
    for &ch in data {
        i = (i + 1) & 0xFF;
        j = (j + s[i] as usize) & 0xFF;
        s.swap(i, j);
        out.push(ch ^ s[(s[i] as usize + s[j] as usize) & 0xFF]);
    }
    out
}

/// Raw AES-CBC (no unpad), shared with doc.rs. None on a bad key
/// length or unaligned ciphertext (callers bail to Python).
pub(crate) fn aes_cbc_core(key: &[u8], iv: &[u8; 16], ct: &[u8]) -> Option<Vec<u8>> {
    if !matches!(key.len(), 16 | 24 | 32) || ct.len() % 16 != 0 {
        return None;
    }
    let rks = expand_key(key)?;
    let mut out = vec![0u8; ct.len()];
    let mut prev: [u8; 16] = *iv;
    let mut blk = [0u8; 16];
    for (i, c) in ct.chunks_exact(16).enumerate() {
        decrypt_block(&rks, c, &mut blk);
        for k in 0..16 {
            out[16 * i + k] = blk[k] ^ prev[k];
        }
        prev.copy_from_slice(c);
    }
    Some(out)
}

// -------------------------------------------------------------- ASCII85

/// `_a85_decode_slow` port (tl_spark/operators/pdf.py): whitespace
/// skipped, `z` = four zero bytes (only between groups), `~`
/// terminates, 1-char tails and out-of-range chars are errors →
/// status 1 (Python re-runs and raises its exact exception).
///
/// # Safety
/// `data` readable for `data_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_a85_decode(
    data: *const u8,
    data_len: i64,
) -> *mut TlBytesOut {
    if data_len < 0 || (data.is_null() && data_len > 0) {
        return bytes_out(1, Vec::new());
    }
    let data = if data_len > 0 {
        std::slice::from_raw_parts(data, data_len as usize)
    } else {
        &[]
    };
    match a85_core(data) {
        Ok(out) => bytes_out(0, out),
        Err(()) => bytes_out(1, Vec::new()),
    }
}

/// The `_a85_decode_slow` scanner itself, shared with the native
/// whole-document PDF parser (doc.rs). Err = Python raises.
pub(crate) fn a85_core(data: &[u8]) -> Result<Vec<u8>, ()> {
    let mut out: Vec<u8> = Vec::with_capacity(data.len() * 4 / 5 + 8);
    let mut group = [0u32; 5];
    let mut k = 0usize;
    for &c in data {
        match c {
            0x00 | 0x09 | 0x0a | 0x0c | 0x0d | 0x20 => continue,
            0x7e => break,
            0x7a if k == 0 => out.extend_from_slice(&[0, 0, 0, 0]),
            0x21..=0x75 => {
                group[k] = (c - 0x21) as u32;
                k += 1;
                if k == 5 {
                    let mut v: u64 = 0;
                    for &g in &group {
                        v = v * 85 + g as u64;
                    }
                    if v > u32::MAX as u64 {
                        return Err(());
                    }
                    out.extend_from_slice(&(v as u32).to_be_bytes());
                    k = 0;
                }
            }
            _ => return Err(()),
        }
    }
    if k > 0 {
        if k == 1 {
            return Err(());
        }
        let mut v: u64 = 0;
        for i in 0..5 {
            v = v * 85 + if i < k { group[i] as u64 } else { 84 };
        }
        if v > u32::MAX as u64 {
            return Err(());
        }
        out.extend_from_slice(&(v as u32).to_be_bytes()[..k - 1]);
    }
    Ok(out)
}

// ------------------------------------------------------------ AES (FIPS-197)

struct AesTables {
    sbox: [u8; 256],
    inv_sbox: [u8; 256],
}

fn gf_mul(mut a: u8, mut b: u8) -> u8 {
    let mut p = 0u8;
    for _ in 0..8 {
        if b & 1 != 0 {
            p ^= a;
        }
        let hi = a & 0x80;
        a <<= 1;
        if hi != 0 {
            a ^= 0x1B;
        }
        b >>= 1;
    }
    p
}

fn tables() -> &'static AesTables {
    static T: OnceLock<AesTables> = OnceLock::new();
    T.get_or_init(|| {
        // multiplicative inverse via exponentiation tables
        let mut exp = [0u8; 256];
        let mut log = [0u8; 256];
        let mut x = 1u8;
        for i in 0..255 {
            exp[i] = x;
            log[x as usize] = i as u8;
            x = gf_mul(x, 3);
        }
        exp[255] = exp[0];
        let inv = |a: u8| -> u8 {
            if a == 0 {
                0
            } else {
                exp[(255 - log[a as usize] as usize) % 255]
            }
        };
        let mut sbox = [0u8; 256];
        for (i, sb) in sbox.iter_mut().enumerate() {
            let b = inv(i as u8);
            *sb = b
                ^ b.rotate_left(1)
                ^ b.rotate_left(2)
                ^ b.rotate_left(3)
                ^ b.rotate_left(4)
                ^ 0x63;
        }
        let mut inv_sbox = [0u8; 256];
        for (i, &v) in sbox.iter().enumerate() {
            inv_sbox[v as usize] = i as u8;
        }
        AesTables { sbox, inv_sbox }
    })
}

const RCON: [u8; 10] = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36];

/// round keys as byte blocks (nr+1 × 16)
fn expand_key(key: &[u8]) -> Option<Vec<[u8; 16]>> {
    let t = tables();
    let nk = key.len() / 4;
    if !matches!(key.len(), 16 | 24 | 32) {
        return None;
    }
    let nr = nk + 6;
    let nw = 4 * (nr + 1);
    let mut w: Vec<[u8; 4]> = Vec::with_capacity(nw);
    for c in key.chunks(4) {
        w.push([c[0], c[1], c[2], c[3]]);
    }
    for i in nk..nw {
        let mut tmp = w[i - 1];
        if i % nk == 0 {
            tmp = [
                t.sbox[tmp[1] as usize] ^ RCON[i / nk - 1],
                t.sbox[tmp[2] as usize],
                t.sbox[tmp[3] as usize],
                t.sbox[tmp[0] as usize],
            ];
        } else if nk > 6 && i % nk == 4 {
            tmp = [
                t.sbox[tmp[0] as usize],
                t.sbox[tmp[1] as usize],
                t.sbox[tmp[2] as usize],
                t.sbox[tmp[3] as usize],
            ];
        }
        let prev = w[i - nk];
        w.push([
            prev[0] ^ tmp[0],
            prev[1] ^ tmp[1],
            prev[2] ^ tmp[2],
            prev[3] ^ tmp[3],
        ]);
    }
    let mut rks = Vec::with_capacity(nr + 1);
    for r in 0..=nr {
        let mut blk = [0u8; 16];
        for c in 0..4 {
            blk[4 * c..4 * c + 4].copy_from_slice(&w[4 * r + c]);
        }
        rks.push(blk);
    }
    Some(rks)
}

const INV_SHIFT: [usize; 16] = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3];

// forward ShiftRows source map (inverse permutation of INV_SHIFT)
const FWD_SHIFT: [usize; 16] =
    [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11];

fn encrypt_block(rks: &[[u8; 16]], pt: &[u8], out: &mut [u8; 16]) {
    let t = tables();
    let nr = rks.len() - 1;
    let mut st = [0u8; 16];
    for i in 0..16 {
        st[i] = pt[i] ^ rks[0][i];
    }
    for rk in rks.iter().take(nr).skip(1) {
        // SubBytes + ShiftRows
        let mut tmp = [0u8; 16];
        for i in 0..16 {
            tmp[i] = t.sbox[st[FWD_SHIFT[i]] as usize];
        }
        // MixColumns + AddRoundKey
        for c in 0..4 {
            let (b0, b1, b2, b3) =
                (tmp[4 * c], tmp[4 * c + 1], tmp[4 * c + 2], tmp[4 * c + 3]);
            let m3 = |x: u8| xtime(x) ^ x;
            st[4 * c] = xtime(b0) ^ m3(b1) ^ b2 ^ b3 ^ rk[4 * c];
            st[4 * c + 1] = b0 ^ xtime(b1) ^ m3(b2) ^ b3 ^ rk[4 * c + 1];
            st[4 * c + 2] = b0 ^ b1 ^ xtime(b2) ^ m3(b3) ^ rk[4 * c + 2];
            st[4 * c + 3] = m3(b0) ^ b1 ^ b2 ^ xtime(b3) ^ rk[4 * c + 3];
        }
    }
    for i in 0..16 {
        out[i] = t.sbox[st[FWD_SHIFT[i]] as usize] ^ rks[nr][i];
    }
}

/// CBC encrypt WITHOUT padding (pt length must be a multiple of 16) —
/// the ISO 32000-2 Algorithm 2.B hardened-hash inner loop (doc.rs).
pub(crate) fn aes_cbc_encrypt_core(
    key: &[u8],
    iv: &[u8; 16],
    pt: &[u8],
) -> Option<Vec<u8>> {
    if !matches!(key.len(), 16 | 24 | 32) || pt.len() % 16 != 0 {
        return None;
    }
    let rks = expand_key(key)?;
    let mut out = vec![0u8; pt.len()];
    let mut prev: [u8; 16] = *iv;
    let mut blk = [0u8; 16];
    for (i, p) in pt.chunks_exact(16).enumerate() {
        let mut x = [0u8; 16];
        for k in 0..16 {
            x[k] = p[k] ^ prev[k];
        }
        encrypt_block(&rks, &x, &mut blk);
        out[16 * i..16 * i + 16].copy_from_slice(&blk);
        prev = blk;
    }
    Some(out)
}

fn xtime(a: u8) -> u8 {
    (a << 1) ^ if a & 0x80 != 0 { 0x1B } else { 0 }
}

fn mul(a: u8, b: u8) -> u8 {
    // b ∈ {9, 11, 13, 14}
    let x1 = a;
    let x2 = xtime(x1);
    let x4 = xtime(x2);
    let x8 = xtime(x4);
    match b {
        9 => x8 ^ x1,
        11 => x8 ^ x2 ^ x1,
        13 => x8 ^ x4 ^ x1,
        14 => x8 ^ x4 ^ x2,
        _ => 0,
    }
}

fn decrypt_block(rks: &[[u8; 16]], ct: &[u8], out: &mut [u8; 16]) {
    let t = tables();
    let nr = rks.len() - 1;
    let mut st = [0u8; 16];
    for i in 0..16 {
        st[i] = ct[i] ^ rks[nr][i];
    }
    for r in (1..nr).rev() {
        // InvShiftRows + InvSubBytes + AddRoundKey + InvMixColumns
        let mut tmp = [0u8; 16];
        for i in 0..16 {
            tmp[i] = t.inv_sbox[st[INV_SHIFT[i]] as usize] ^ rks[r][i];
        }
        for c in 0..4 {
            let (a0, a1, a2, a3) =
                (tmp[4 * c], tmp[4 * c + 1], tmp[4 * c + 2], tmp[4 * c + 3]);
            st[4 * c] = mul(a0, 14) ^ mul(a1, 11) ^ mul(a2, 13) ^ mul(a3, 9);
            st[4 * c + 1] = mul(a0, 9) ^ mul(a1, 14) ^ mul(a2, 11) ^ mul(a3, 13);
            st[4 * c + 2] = mul(a0, 13) ^ mul(a1, 9) ^ mul(a2, 14) ^ mul(a3, 11);
            st[4 * c + 3] = mul(a0, 11) ^ mul(a1, 13) ^ mul(a2, 9) ^ mul(a3, 14);
        }
    }
    for i in 0..16 {
        out[i] = t.inv_sbox[st[INV_SHIFT[i]] as usize] ^ rks[0][i];
    }
}

/// CBC decrypt WITHOUT unpad (Python applies the lenient PKCS#7 strip).
///
/// # Safety
/// `key` readable for `key_len`, `iv` for 16, `ct` for `ct_len`.
#[no_mangle]
pub unsafe extern "C" fn tl_aes_cbc_decrypt(
    key: *const u8,
    key_len: i64,
    iv: *const u8,
    ct: *const u8,
    ct_len: i64,
) -> *mut TlBytesOut {
    if key.is_null()
        || iv.is_null()
        || ct_len < 0
        || ct_len % 16 != 0
        || (ct.is_null() && ct_len > 0)
        || !matches!(key_len, 16 | 24 | 32)
    {
        return bytes_out(1, Vec::new());
    }
    let key = std::slice::from_raw_parts(key, key_len as usize);
    let iv = std::slice::from_raw_parts(iv, 16);
    let ct = if ct_len > 0 {
        std::slice::from_raw_parts(ct, ct_len as usize)
    } else {
        &[]
    };
    let rks = match expand_key(key) {
        Some(r) => r,
        None => return bytes_out(1, Vec::new()),
    };
    let mut out = vec![0u8; ct.len()];
    let mut prev: [u8; 16] = iv.try_into().unwrap();
    let mut blk = [0u8; 16];
    for (i, c) in ct.chunks_exact(16).enumerate() {
        decrypt_block(&rks, c, &mut blk);
        for k in 0..16 {
            out[16 * i + k] = blk[k] ^ prev[k];
        }
        prev.copy_from_slice(c);
    }
    bytes_out(0, out)
}
