"""PDF encryption (ISO 32000 §7.6 standard security handler), from scratch.

Closes the round-6 verdict's biggest silent-drop class: most "protected"
PDFs in a real crawl are encrypted with an EMPTY user password (open in
any viewer; only owner permissions are restricted), yet the kernel
dropped every ``/Encrypt`` file wholesale. This module implements the
public ISO 32000-1 §7.6 / ISO 32000-2 §7.6 standard security handler:

- ciphers, stdlib+numpy only: RC4 (the spec's §7.6.2 symmetric cipher)
  and AES-128/256 (FIPS-197, S-box and GF(2^8) tables generated at
  import, CBC per §7.6.2; the ECB-over-blocks core is numpy-vectorized
  so bulk stream decryption is not a per-byte Python loop),
- key derivation: Algorithm 2 (R2-R4, MD5 + 50-fold stretch),
  Algorithm 2.A/2.B (R6 hardened SHA-256/384/512 + AES-128-CBC loop),
- authentication: Algorithms 4/5/6/7 (user and owner, R2-R4) and the
  R5/R6 U/UE + O/OE validation-salt scheme — the empty user password
  first, then the empty owner password; anything needing a real
  password raises the kernel's contract ``ValueError``,
- crypt filters (V4/V5): /CF /StdCF /StmF /StrF with CFM V2 (RC4),
  AESV2 (AES-128-CBC), AESV3 (AES-256-CBC), Identity,
- per-object keys: Algorithm 1 (MD5 of file key + object number/gen +
  ``sAlT`` for AES); V5 uses the file key directly,
- an encryptor (:func:`encrypt_pdf`) used by the fixture generator so
  decryption is tested against REAL encrypted files this code did not
  round-trip trivially: the writer re-derives O/U/OE/UE per the spec
  algorithms, and the test suite pins the primitives against published
  FIPS-197 / RC4 vectors plus an independent hashlib recomputation of
  Algorithm 2.

No reference analog (y21/tl is HTML-only); driven by the north rule's
PDF slot + the public specs above.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "rc4",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "StandardSecurityHandler",
    "encrypt_pdf",
]

# ---------------------------------------------------------------------------
# AES (FIPS-197) — tables generated, ECB core vectorized over blocks
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _gen_sbox() -> list[int]:
    # multiplicative inverse in GF(2^8) + the affine transform
    inv = [0] * 256
    for i in range(1, 256):
        for j in range(1, 256):
            if _gf_mul(i, j) == 1:
                inv[i] = j
                break
    sbox = []
    for i in range(256):
        b = inv[i]
        s = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox.append(s ^ 0x63)
    return sbox


_SBOX_L = _gen_sbox()
assert _SBOX_L[0] == 0x63 and _SBOX_L[1] == 0x7C  # FIPS-197 table check
_SBOX = np.array(_SBOX_L, dtype=np.uint8)
_INV_SBOX = np.zeros(256, dtype=np.uint8)
_INV_SBOX[_SBOX] = np.arange(256, dtype=np.uint8)

_MUL = {
    n: np.array([_gf_mul(n, i) for i in range(256)], dtype=np.uint8)
    for n in (2, 3, 9, 11, 13, 14)
}

# flat state layout: index r + 4c (FIPS column-major order == byte order)
_SHIFT = np.array(
    [(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)]
)
_INV_SHIFT = np.array(
    [(i % 4) + 4 * (((i // 4) - (i % 4)) % 4) for i in range(16)]
)

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]

# scalar T-tables for the sequential CBC-encrypt path (one Python dict
# lookup per byte beats per-block numpy dispatch overhead ~10×; the
# R6 Algorithm 2.B KDF encrypts thousands of dependent blocks)
_TE = []
for _shift_pat in ((2, 1, 1, 3), (3, 2, 1, 1), (1, 3, 2, 1), (1, 1, 3, 2)):
    _t = []
    for _x in range(256):
        _s = _SBOX_L[_x]
        _b = [_gf_mul(m, _s) for m in _shift_pat]
        _t.append((_b[0] << 24) | (_b[1] << 16) | (_b[2] << 8) | _b[3])
    _TE.append(tuple(_t))
_TE0, _TE1, _TE2, _TE3 = _TE
_SBOX_T = tuple(_SBOX_L)


def _rk_words(rk: np.ndarray) -> list[tuple[int, int, int, int]]:
    return [
        tuple(
            int.from_bytes(bytes(rk[r, 4 * j : 4 * j + 4]), "big")
            for j in range(4)
        )
        for r in range(rk.shape[0])
    ]


def _encrypt_block_words(rkw, w0, w1, w2, w3):
    """One AES block over four 32-bit column words (scalar T-tables)."""
    k = rkw[0]
    w0 ^= k[0]; w1 ^= k[1]; w2 ^= k[2]; w3 ^= k[3]  # noqa: E702
    nr = len(rkw) - 1
    for r in range(1, nr):
        k = rkw[r]
        t0 = (
            _TE0[w0 >> 24] ^ _TE1[(w1 >> 16) & 0xFF]
            ^ _TE2[(w2 >> 8) & 0xFF] ^ _TE3[w3 & 0xFF] ^ k[0]
        )
        t1 = (
            _TE0[w1 >> 24] ^ _TE1[(w2 >> 16) & 0xFF]
            ^ _TE2[(w3 >> 8) & 0xFF] ^ _TE3[w0 & 0xFF] ^ k[1]
        )
        t2 = (
            _TE0[w2 >> 24] ^ _TE1[(w3 >> 16) & 0xFF]
            ^ _TE2[(w0 >> 8) & 0xFF] ^ _TE3[w1 & 0xFF] ^ k[2]
        )
        t3 = (
            _TE0[w3 >> 24] ^ _TE1[(w0 >> 16) & 0xFF]
            ^ _TE2[(w1 >> 8) & 0xFF] ^ _TE3[w2 & 0xFF] ^ k[3]
        )
        w0, w1, w2, w3 = t0, t1, t2, t3
    k = rkw[nr]
    s = _SBOX_T
    t0 = (
        (s[w0 >> 24] << 24) | (s[(w1 >> 16) & 0xFF] << 16)
        | (s[(w2 >> 8) & 0xFF] << 8) | s[w3 & 0xFF]
    ) ^ k[0]
    t1 = (
        (s[w1 >> 24] << 24) | (s[(w2 >> 16) & 0xFF] << 16)
        | (s[(w3 >> 8) & 0xFF] << 8) | s[w0 & 0xFF]
    ) ^ k[1]
    t2 = (
        (s[w2 >> 24] << 24) | (s[(w3 >> 16) & 0xFF] << 16)
        | (s[(w0 >> 8) & 0xFF] << 8) | s[w1 & 0xFF]
    ) ^ k[2]
    t3 = (
        (s[w3 >> 24] << 24) | (s[(w0 >> 16) & 0xFF] << 16)
        | (s[(w1 >> 8) & 0xFF] << 8) | s[w2 & 0xFF]
    ) ^ k[3]
    return t0, t1, t2, t3


def _expand_key(key: bytes) -> np.ndarray:
    """Round keys as a (nr+1, 16) uint8 array."""
    nk = len(key) // 4
    if nk not in (4, 6, 8) or len(key) % 4:
        raise ValueError("bad AES key length")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX_L[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX_L[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return np.array(w, dtype=np.uint8).reshape(nr + 1, 16)


def _mix_columns(st: np.ndarray) -> np.ndarray:
    v = st.reshape(-1, 4, 4)  # (n, column, row)
    a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    m2, m3 = _MUL[2], _MUL[3]
    out = np.empty_like(v)
    out[:, :, 0] = m2[a0] ^ m3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
    out[:, :, 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
    return out.reshape(-1, 16)


def _inv_mix_columns(st: np.ndarray) -> np.ndarray:
    v = st.reshape(-1, 4, 4)
    a0, a1, a2, a3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    out = np.empty_like(v)
    out[:, :, 0] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
    out[:, :, 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
    out[:, :, 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
    out[:, :, 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
    return out.reshape(-1, 16)


def _ecb_encrypt_blocks(rk: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    nr = rk.shape[0] - 1
    st = blocks ^ rk[0]
    for r in range(1, nr):
        st = _SBOX[st][:, _SHIFT]
        st = _mix_columns(st) ^ rk[r]
    st = _SBOX[st][:, _SHIFT] ^ rk[nr]
    return st


def _ecb_decrypt_blocks(rk: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    nr = rk.shape[0] - 1
    st = blocks ^ rk[nr]
    for r in range(nr - 1, 0, -1):
        st = _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[r]
        st = _inv_mix_columns(st)
    return _INV_SBOX[st[:, _INV_SHIFT]] ^ rk[0]


def _to_blocks(data: bytes) -> np.ndarray:
    if len(data) % 16:
        raise ValueError("AES data not block-aligned")
    return np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)


def aes_cbc_decrypt(key: bytes, iv: bytes, ct: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt. ``unpad`` strips PKCS#7 (leniently: malformed
    padding is returned as-is — real crawls contain writers that pad
    wrong, and over-stripping corrupts text)."""
    if not ct:
        return b""
    from tl_spark.kernel import native_crypt

    pt = native_crypt.aes_cbc_decrypt_raw(key, iv, ct)
    if pt is None:
        rk = _expand_key(key)
        blocks = _to_blocks(ct)
        dec = _ecb_decrypt_blocks(rk, blocks)
        prev = np.vstack(
            [np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), blocks[:-1]]
        )
        pt = (dec ^ prev).tobytes()
    if unpad and pt:
        n = pt[-1]
        if 1 <= n <= 16 and n <= len(pt):
            return pt[:-n]
    return pt


def aes_cbc_encrypt(key: bytes, iv: bytes, pt: bytes, pad: bool = True) -> bytes:
    if pad:
        n = 16 - len(pt) % 16
        pt = pt + bytes([n]) * n
    elif len(pt) % 16:
        raise ValueError("AES data not block-aligned")
    rkw = _rk_words(_expand_key(key))
    out = bytearray()
    p0 = int.from_bytes(iv[0:4], "big")
    p1 = int.from_bytes(iv[4:8], "big")
    p2 = int.from_bytes(iv[8:12], "big")
    p3 = int.from_bytes(iv[12:16], "big")
    for i in range(0, len(pt), 16):
        b = pt[i : i + 16]
        p0, p1, p2, p3 = _encrypt_block_words(
            rkw,
            p0 ^ int.from_bytes(b[0:4], "big"),
            p1 ^ int.from_bytes(b[4:8], "big"),
            p2 ^ int.from_bytes(b[8:12], "big"),
            p3 ^ int.from_bytes(b[12:16], "big"),
        )
        out += p0.to_bytes(4, "big") + p1.to_bytes(4, "big")
        out += p2.to_bytes(4, "big") + p3.to_bytes(4, "big")
    return bytes(out)


def _aes_ecb_encrypt(key: bytes, pt: bytes) -> bytes:
    rk = _expand_key(key)
    return _ecb_encrypt_blocks(rk, _to_blocks(pt)).tobytes()


def _aes_ecb_decrypt(key: bytes, ct: bytes) -> bytes:
    rk = _expand_key(key)
    return _ecb_decrypt_blocks(rk, _to_blocks(ct)).tobytes()


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    if not key:
        raise ValueError("empty RC4 key")
    from tl_spark.kernel import native_crypt

    out = native_crypt.rc4(key, data)
    if out is not None:
        return out
    S = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % kl]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, ch in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = ch ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# Standard security handler — key derivation + authentication
# ---------------------------------------------------------------------------

# ISO 32000-1 §7.6.3.3, the published 32-byte padding string
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_pwd(pwd: bytes) -> bytes:
    return (pwd + _PAD)[:32]


def _alg2_file_key(
    padded_pwd: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    n: int,
    encrypt_metadata: bool,
) -> bytes:
    """Algorithm 2: the R2-R4 file encryption key."""
    h = hashlib.md5(
        padded_pwd
        + o[:32]
        + struct.pack("<i", p if p < 2**31 else p - 2**32)
        + id0
        + (b"" if encrypt_metadata or r < 4 else b"\xff\xff\xff\xff")
    ).digest()
    key = h[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()[:n]
    return key[:n]


def _alg45_user_check(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4/5/6: does ``key`` reproduce /U?"""
    if r == 2:
        return rc4(key, _PAD) == u[:32]
    t = hashlib.md5(_PAD + id0).digest()
    x = rc4(key, t)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x[:16] == u[:16]


def _alg3_owner_key(owner_padded: bytes, r: int, n: int) -> bytes:
    h = hashlib.md5(owner_padded).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    return h[:n]


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B (R6 hardened hash, ISO 32000-2)."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r56_hash(pwd: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    if r == 5:
        return hashlib.sha256(pwd + salt + udata).digest()
    from tl_spark.kernel import native_crypt

    nk = native_crypt.r56_hash(pwd, salt, udata, r)
    if nk is not None:
        return nk  # Algorithm 2.B, native leg (parity-pinned)
    return _hash_2b(pwd, salt, udata)


class StandardSecurityHandler:
    """Decrypting handler for the empty user/owner password.

    ``enc`` is the resolved /Encrypt dictionary, ``id0`` the first
    element of the trailer /ID. Raises ``ValueError`` for a non-Standard
    filter, an unsupported V/R, or a document whose user AND owner
    passwords are both non-empty (the honest "cannot open" case).
    """

    def __init__(self, enc: dict, id0: bytes, resolve=lambda v: v):
        if str(resolve(enc.get("Filter", ""))) != "Standard":
            raise ValueError("unsupported encryption filter")
        self.v = int(resolve(enc.get("V", 0)))
        self.r = int(resolve(enc.get("R", 0)))
        if self.v not in (1, 2, 4, 5) or self.r not in (2, 3, 4, 5, 6):
            raise ValueError(f"unsupported encryption V={self.v} R={self.r}")
        o = resolve(enc.get("O"))
        u = resolve(enc.get("U"))
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise ValueError("bad /O or /U")
        self.p = int(resolve(enc.get("P", -1))) & 0xFFFFFFFF
        self.encrypt_metadata = bool(resolve(enc.get("EncryptMetadata", True)))
        length_bits = int(resolve(enc.get("Length", 40)))
        n = length_bits // 8 if length_bits >= 40 else length_bits
        # string/stream cipher methods: "rc4" | "aes" | "none"
        self.stm_method = "rc4"
        self.str_method = "rc4"
        if self.v == 4:
            cf = resolve(enc.get("CF")) or {}
            stmf = str(resolve(enc.get("StmF", "Identity")))
            strf = str(resolve(enc.get("StrF", "Identity")))

            def method(name):
                if name == "Identity":
                    return "none", n
                f = resolve(cf.get(name))
                if not isinstance(f, dict):
                    raise ValueError(f"missing crypt filter {name}")
                cfm = str(resolve(f.get("CFM", "")))
                ln = int(resolve(f.get("Length", n)))
                if ln >= 40:  # some writers put bits in /CF /Length
                    ln //= 8
                if cfm == "V2":
                    return "rc4", ln
                if cfm == "AESV2":
                    return "aes", 16
                raise ValueError(f"unsupported crypt filter method {cfm}")

            self.stm_method, n_stm = method(stmf)
            self.str_method, n_str = method(strf)
            n = max(n_stm, n_str)
        elif self.v == 5:
            self.stm_method = self.str_method = "aes"
        n = min(max(n, 5), 16) if self.v != 5 else 32
        self.key = self._authenticate(enc, o, u, id0, n, resolve)

    # -- authentication ---------------------------------------------------

    def _authenticate(self, enc, o, u, id0, n, resolve) -> bytes:
        if self.v == 5:
            if len(u) < 48:
                raise ValueError("bad /U for R5/R6")
            ue = resolve(enc.get("UE"))
            oe = resolve(enc.get("OE"))
            # empty USER password
            if _r56_hash(b"", u[32:40], b"", self.r) == u[:32]:
                if not isinstance(ue, bytes) or len(ue) < 32:
                    raise ValueError("bad /UE")
                ik = _r56_hash(b"", u[40:48], b"", self.r)
                return aes_cbc_decrypt(ik, b"\x00" * 16, ue[:32], unpad=False)
            # empty OWNER password (hash includes the 48-byte /U)
            if len(o) >= 48 and _r56_hash(b"", o[32:40], u[:48], self.r) == o[:32]:
                if not isinstance(oe, bytes) or len(oe) < 32:
                    raise ValueError("bad /OE")
                ik = _r56_hash(b"", o[40:48], u[:48], self.r)
                return aes_cbc_decrypt(ik, b"\x00" * 16, oe[:32], unpad=False)
            raise ValueError("password-protected PDF (non-empty password)")
        # R2-R4: empty user password first
        key = _alg2_file_key(
            _PAD, o, self.p, id0, self.r, n, self.encrypt_metadata
        )
        if _alg45_user_check(key, u, id0, self.r):
            return key
        # then the empty OWNER password (Algorithm 7: peel /O back to
        # the padded user password, re-derive, re-check)
        okey = _alg3_owner_key(_PAD, self.r, n)
        if self.r == 2:
            user_padded = rc4(okey, o[:32])
        else:
            d = o[:32]
            for i in range(19, -1, -1):
                d = rc4(bytes(b ^ i for b in okey), d)
            user_padded = d
        key = _alg2_file_key(
            user_padded[:32], o, self.p, id0, self.r, n, self.encrypt_metadata
        )
        if _alg45_user_check(key, u, id0, self.r):
            return key
        raise ValueError("password-protected PDF (non-empty password)")

    # -- per-object decryption --------------------------------------------

    def _obj_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.v == 5:
            return self.key
        h = hashlib.md5(
            self.key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
            + (b"sAlT" if aes else b"")
        ).digest()
        return h[: min(len(self.key) + 5, 16)]

    def _apply(self, method: str, data: bytes, num: int, gen: int, enc: bool) -> bytes:
        if method == "none" or not data:
            return data
        if method == "rc4":
            return rc4(self._obj_key(num, gen, False), data)
        key = self._obj_key(num, gen, True)
        if enc:
            iv = hashlib.md5(
                data[:64] + num.to_bytes(4, "big")
            ).digest()  # deterministic IV (writer side; any IV is valid)
            return iv + aes_cbc_encrypt(key, iv, data)
        if len(data) < 16:
            raise ValueError("AES ciphertext shorter than IV")
        ct = data[16:]
        ct = ct[: len(ct) - len(ct) % 16]  # lenient: ragged tail dropped
        return aes_cbc_decrypt(key, data[:16], ct)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_method, data, num, gen, False)

    def encrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_method, data, num, gen, True)

    def decrypt_object(self, val, num: int, gen: int):
        """Recursively decrypt every string in a parsed object."""
        if isinstance(val, bytes):
            return self._apply(self.str_method, val, num, gen, False)
        if isinstance(val, list):
            return [self.decrypt_object(v, num, gen) for v in val]
        if isinstance(val, dict):
            return {
                k: self.decrypt_object(v, num, gen) for k, v in val.items()
            }
        return val

    def encrypt_object(self, val, num: int, gen: int):
        if isinstance(val, bytes):
            return self._apply(self.str_method, val, num, gen, True)
        if isinstance(val, list):
            return [self.encrypt_object(v, num, gen) for v in val]
        if isinstance(val, dict):
            return {
                k: self.encrypt_object(v, num, gen) for k, v in val.items()
            }
        return val


# ---------------------------------------------------------------------------
# Encryptor — real encrypted fixtures for the decrypt path
# ---------------------------------------------------------------------------


def _build_encrypt_dict(
    method: str, id0: bytes, owner_pwd: bytes, user_pwd: bytes, seed: bytes
) -> tuple[dict, bytes | None]:
    """(/Encrypt dict, explicit file key or None-for-derive).

    R<=4 derives the file key from the password record; R6 picks a
    random (here: seed-deterministic) file key and wraps it in UE/OE.
    """
    p = 0xFFFFFFFC  # -4: all permission bits set
    if method in ("rc4", "aes128"):
        r = 3 if method == "rc4" else 4
        n = 16
        okey = _alg3_owner_key(_pad_pwd(owner_pwd), r, n)
        o = _pad_pwd(user_pwd)
        for i in range(20):
            o = rc4(bytes(b ^ i for b in okey), o)
        key = _alg2_file_key(_pad_pwd(user_pwd), o, p, id0, r, n, True)
        t = hashlib.md5(_PAD + id0).digest()
        u = rc4(key, t)
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16
        enc = {
            "Filter": "/Standard",
            "V": 2 if method == "rc4" else 4,
            "R": r,
            "Length": 128,
            "P": p,
            "O": o,
            "U": u,
        }
        if method == "aes128":
            enc["CF"] = {
                "StdCF": {"CFM": "/AESV2", "AuthEvent": "/DocOpen", "Length": 16}
            }
            enc["StmF"] = "/StdCF"
            enc["StrF"] = "/StdCF"
        return enc, None
    if method != "aes256":
        raise ValueError(f"unknown encryption method {method!r}")
    r = 6
    key = hashlib.sha256(seed + b"filekey").digest()
    vs_u = hashlib.sha256(seed + b"vsu").digest()[:8]
    ks_u = hashlib.sha256(seed + b"ksu").digest()[:8]
    vs_o = hashlib.sha256(seed + b"vso").digest()[:8]
    ks_o = hashlib.sha256(seed + b"kso").digest()[:8]
    u = _r56_hash(user_pwd, vs_u, b"", r) + vs_u + ks_u
    ue = aes_cbc_encrypt(
        _r56_hash(user_pwd, ks_u, b"", r), b"\x00" * 16, key, pad=False
    )
    o = _r56_hash(owner_pwd, vs_o, u, r) + vs_o + ks_o
    oe = aes_cbc_encrypt(
        _r56_hash(owner_pwd, ks_o, u, r), b"\x00" * 16, key, pad=False
    )
    perms = _aes_ecb_encrypt(
        key, struct.pack("<I", p) + b"\xff\xff\xff\xffTadb" + b"\x00" * 4
    )
    enc = {
        "Filter": "/Standard",
        "V": 5,
        "R": r,
        "Length": 256,
        "P": p,
        "O": o,
        "U": u,
        "OE": oe,
        "UE": ue,
        "Perms": perms,
        "CF": {
            "StdCF": {"CFM": "/AESV3", "AuthEvent": "/DocOpen", "Length": 32}
        },
        "StmF": "/StdCF",
        "StrF": "/StdCF",
    }
    return enc, key


def _ser(val) -> bytes:
    """Serialize a parsed PDF value back to object syntax."""
    from tl_spark.operators.pdf import _Kw, _Name, _Ref

    if val is None:
        return b"null"
    if val is True:
        return b"true"
    if val is False:
        return b"false"
    if isinstance(val, _Ref):
        return b"%d %d R" % (val.num, val.gen)
    if isinstance(val, _Name):
        out = b"/"
        for b in str(val).encode("latin-1"):
            if 0x21 <= b <= 0x7E and b not in b"#/()<>[]{}%":
                out += bytes([b])
            else:
                out += b"#%02X" % b
        return out
    if isinstance(val, _Kw):
        return str(val).encode("latin-1")
    if isinstance(val, bytes):
        return b"<" + val.hex().encode() + b">"
    if isinstance(val, int):
        return b"%d" % val
    if isinstance(val, float):
        return ("%g" % val).encode()
    if isinstance(val, str):  # a pre-formatted name like "/Standard"
        return val.encode("latin-1")
    if isinstance(val, list):
        return b"[" + b" ".join(_ser(v) for v in val) + b"]"
    if isinstance(val, dict):
        return (
            b"<< "
            + b"".join(
                b"/%s %s " % (k.encode("latin-1"), _ser(v))
                for k, v in val.items()
            )
            + b">>"
        )
    raise ValueError(f"unserializable value {type(val).__name__}")


def encrypt_pdf(
    data: bytes,
    method: str = "aes128",
    owner_pwd: bytes = b"fixture-owner",
    user_pwd: bytes = b"",
) -> bytes:
    """Re-emit ``data`` as an encrypted PDF (classic xref; strings and
    streams enciphered per the standard handler). ``method``: "rc4"
    (V2/R3), "aes128" (V4/R4 AESV2), "aes256" (V5/R6 AESV3). The
    default empty user password keeps the file openable; pass a
    non-empty ``user_pwd`` to build a genuinely locked fixture."""
    from tl_spark.operators.pdf import PdfDocument, _Ref, _Stream

    doc = PdfDocument(data)
    objs = {}
    for num in sorted(doc._xref):
        try:
            v = doc.get(num)
        except ValueError:
            continue
        if v is None:
            continue
        if isinstance(v, _Stream) and str(v.dict.get("Type", "")) in (
            "XRef",
            "ObjStm",
        ):
            continue  # re-emitted as classic xref + top-level objects
        objs[num] = v

    id0 = hashlib.md5(data).digest()
    enc_dict, explicit_key = _build_encrypt_dict(
        method, id0, owner_pwd, user_pwd, seed=id0
    )
    handler = _handler_for_writer(enc_dict, id0, explicit_key, user_pwd)

    buf = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        v = objs[num]
        offsets[num] = len(buf)
        if isinstance(v, _Stream):
            raw = handler.encrypt_stream(v.raw, num, 0)
            d = handler.encrypt_object(dict(v.dict), num, 0)
            d["Length"] = len(raw)
            buf += b"%d 0 obj\n" % num + _ser(d) + b"\nstream\n"
            buf += raw
            buf += b"\nendstream\nendobj\n"
        else:
            buf += (
                b"%d 0 obj\n" % num
                + _ser(handler.encrypt_object(v, num, 0))
                + b"\nendobj\n"
            )
    enc_num = max(objs) + 1 if objs else 1
    offsets[enc_num] = len(buf)
    buf += b"%d 0 obj\n" % enc_num + _ser(enc_dict) + b"\nendobj\n"

    xref_off = len(buf)
    size = enc_num + 1
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for num in range(1, size):
        buf += b"%010d 00000 n \n" % offsets.get(num, 0)
    trailer = {
        "Size": size,
        "Root": doc.trailer.get("Root"),
        "Encrypt": _Ref(enc_num, 0),
        "ID": [id0, id0],
    }
    info = doc.trailer.get("Info")
    if info is not None:
        trailer["Info"] = info
    buf += (
        b"trailer\n" + _ser(trailer) + b"\nstartxref\n%d\n%%%%EOF\n" % xref_off
    )
    return bytes(buf)


def _handler_for_writer(
    enc_dict: dict, id0: bytes, explicit_key: bytes | None, user_pwd: bytes
) -> StandardSecurityHandler:
    """A handler bound to the writer's key (which may belong to a
    non-empty user password the reading handler must then reject)."""
    h = StandardSecurityHandler.__new__(StandardSecurityHandler)
    v = int(enc_dict["V"])
    r = int(enc_dict["R"])
    h.v, h.r = v, r
    h.p = int(enc_dict["P"]) & 0xFFFFFFFF
    h.encrypt_metadata = True
    if v == 5:
        h.stm_method = h.str_method = "aes"
        h.key = explicit_key
    else:
        h.stm_method = h.str_method = "aes" if v == 4 else "rc4"
        h.key = _alg2_file_key(
            _pad_pwd(user_pwd), enc_dict["O"], h.p, id0, r, 16, True
        )
    return h
