"""Embedded font-program text decode for the PDF kernel.

Real-world crawled PDFs very often carry symbolic subset fonts with no
/Encoding and no /ToUnicode — the ONLY path from character codes to
Unicode is the embedded font program itself (PDF 32000-1 §9.6.6.4).
This module implements that fallback chain from the public OpenType /
CFF specs, plus deterministic fixture builders so the decode path is
testable end-to-end against real (tiny, valid) font binaries:

TrueType / OpenType (``/FontFile2``, or ``/FontFile3`` with an OTTO
sfnt wrapper):

    byte code → GID        via the ``cmap`` table ((3,0) symbol first,
                           then (1,0) Mac, then (3,1)/(0,x) Unicode;
                           subtable formats 0, 4 and 6)
    GID → glyph name       via ``post`` format 2.0 (standard Macintosh
                           glyph order for indices < 258, Pascal-string
                           names above)
    glyph name → Unicode   via the Adobe Glyph List (shared with the
                           /Differences path in pdf.py)
    GID → Unicode          fallback: inverse of a (3,1)/(0,x) Unicode
                           cmap subtable when ``post`` has no name

Bare CFF (``/FontFile3`` /Type1C):

    byte code → GID        via the embedded Encoding (formats 0 and 1
                           + supplements; offset 0 = Standard Encoding,
                           whose printable-ASCII range maps code c to
                           SID c-31 per CFF spec Appendix B)
    GID → SID              via the charset (formats 0, 1 and 2)
    SID → glyph name       via the standard strings (SID < 391) or the
                           String INDEX (SID ≥ 391)
    glyph name → Unicode   via the Adobe Glyph List

Every malformed-input failure raises ValueError (the kernel-wide
contract established by the round-6 fuzz audit); anything else is a
bug. No reference analog — y21/tl is HTML-only.
"""

from __future__ import annotations

import struct

__all__ = [
    "truetype_code_map",
    "cff_code_map",
    "fontfile_code_map",
    "build_subset_ttf",
    "build_subset_cff",
]


# ---------------------------------------------------------------------------
# Public spec data
# ---------------------------------------------------------------------------

# Adobe glyph names for the printable-ASCII range, in ASCII order.
# Doubles as CFF standard strings 1..95 (CFF spec Appendix A: SIDs
# 1..95 are exactly these, with quoteright at SID 8 / quoteleft at 91
# per the Standard Encoding quirk) and as the ASCII span of the
# Macintosh glyph order (which instead uses quotesingle and grave at
# the ASCII code points).
_ASCII_STD = (
    "space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L "
    "M N O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p "
    "q r s t u v w x y z braceleft bar braceright asciitilde"
).split()

# CFF standard strings 0..148 (spec Appendix A). SIDs beyond this
# text range (small caps / oldstyle / expert strings) decode to U+FFFD
# — subset text fonts never reference them.
CFF_STANDARD_STRINGS = (
    [".notdef"]
    + _ASCII_STD
    + (
        "exclamdown cent sterling fraction yen florin section currency "
        "quotesingle quotedblleft guillemotleft guilsinglleft "
        "guilsinglright fi fl endash dagger daggerdbl periodcentered "
        "paragraph bullet quotesinglbase quotedblbase quotedblright "
        "guillemotright ellipsis perthousand questiondown grave acute "
        "circumflex tilde macron breve dotaccent dieresis ring cedilla "
        "hungarumlaut ogonek caron emdash AE ordfeminine Lslash Oslash "
        "OE ordmasculine ae dotlessi lslash oslash oe germandbls"
    ).split()
)

_ASCII_MAC = [
    "quotesingle" if n == "quoteright" else "grave" if n == "quoteleft" else n
    for n in _ASCII_STD
]

# Standard Macintosh glyph order (TrueType spec, ``post`` format 2.0
# indices < 258).
MAC_GLYPH_ORDER = (
    [".notdef", ".null", "nonmarkingreturn"]
    + _ASCII_MAC
    + (
        "Adieresis Aring Ccedilla Eacute Ntilde Odieresis Udieresis "
        "aacute agrave acircumflex adieresis atilde aring ccedilla "
        "eacute egrave ecircumflex edieresis iacute igrave icircumflex "
        "idieresis ntilde oacute ograve ocircumflex odieresis otilde "
        "uacute ugrave ucircumflex udieresis dagger degree cent "
        "sterling section bullet paragraph germandbls registered "
        "copyright trademark acute dieresis notequal AE Oslash "
        "infinity plusminus lessequal greaterequal yen mu partialdiff "
        "summation product pi integral ordfeminine ordmasculine Omega "
        "ae oslash questiondown exclamdown logicalnot radical florin "
        "approxequal Delta guillemotleft guillemotright ellipsis space "
        "Agrave Atilde Otilde OE oe endash emdash quotedblleft "
        "quotedblright quoteleft quoteright divide lozenge ydieresis "
        "Ydieresis fraction currency guilsinglleft guilsinglright fi "
        "fl daggerdbl periodcentered quotesinglbase quotedblbase "
        "perthousand Acircumflex Ecircumflex Aacute Edieresis Egrave "
        "Iacute Icircumflex Idieresis Igrave Oacute Ocircumflex apple "
        "Ograve Uacute Ucircumflex Ugrave dotlessi circumflex tilde "
        "macron breve dotaccent ring cedilla hungarumlaut ogonek "
        "caron Lslash lslash Scaron scaron Zcaron zcaron brokenbar "
        "Eth eth Yacute yacute Thorn thorn minus multiply onesuperior "
        "twosuperior threesuperior onehalf onequarter threequarters "
        "franc Gbreve gbreve Idotaccent Scedilla scedilla Cacute "
        "cacute Ccaron ccaron dcroat"
    ).split()
)
assert len(MAC_GLYPH_ORDER) == 258


def _glyph_uni(name: str) -> str:
    from tl_spark.operators.pdf import _glyph_to_unicode

    return _glyph_to_unicode(name)


# ---------------------------------------------------------------------------
# TrueType / OpenType parsing
# ---------------------------------------------------------------------------


def _u16(b: bytes, o: int) -> int:
    if o + 2 > len(b):
        raise ValueError("font program truncated")
    return (b[o] << 8) | b[o + 1]


def _u32(b: bytes, o: int) -> int:
    if o + 4 > len(b):
        raise ValueError("font program truncated")
    return struct.unpack_from(">I", b, o)[0]


def parse_sfnt_tables(data: bytes) -> dict[bytes, bytes]:
    """sfnt table directory → {tag: table bytes}. Accepts TrueType
    (1.0 / 'true') and CFF-flavoured ('OTTO') OpenType."""
    ver = data[:4]
    if ver not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
        raise ValueError("not an sfnt font program")
    if ver == b"ttcf":  # font collection: take the first face
        if _u32(data, 8) < 1:
            raise ValueError("empty font collection")
        return parse_sfnt_tables_at(data, _u32(data, 12))
    return parse_sfnt_tables_at(data, 0)


def parse_sfnt_tables_at(data: bytes, base: int) -> dict[bytes, bytes]:
    num = _u16(data, base + 4)
    if num > 512:
        raise ValueError("implausible sfnt table count")
    out: dict[bytes, bytes] = {}
    for i in range(num):
        rec = base + 12 + 16 * i
        tag = data[rec : rec + 4]
        off, ln = _u32(data, rec + 8), _u32(data, rec + 12)
        if len(tag) < 4 or off + ln > len(data) or ln > len(data):
            raise ValueError("sfnt table record out of bounds")
        out[tag] = data[off : off + ln]
    return out


def _cmap_subtable(tb: bytes, off: int) -> dict[int, int]:
    """One cmap subtable → {code: gid}. Formats 0, 4, 6."""
    fmt = _u16(tb, off)
    out: dict[int, int] = {}
    if fmt == 0:
        if off + 262 > len(tb):
            raise ValueError("cmap format 0 truncated")
        for c in range(256):
            g = tb[off + 6 + c]
            if g:
                out[c] = g
    elif fmt == 4:
        seg2 = _u16(tb, off + 6)
        if seg2 % 2 or seg2 == 0:
            raise ValueError("bad cmap segCountX2")
        segs = seg2 // 2
        if segs > 10000:
            raise ValueError("implausible cmap segment count")
        ends = off + 14
        starts = ends + seg2 + 2
        deltas = starts + seg2
        ranges = deltas + seg2
        for s in range(segs):
            end = _u16(tb, ends + 2 * s)
            start = _u16(tb, starts + 2 * s)
            if start > end or (start == 0xFFFF and end == 0xFFFF):
                continue
            if end - start > 0x4000:
                raise ValueError("implausible cmap segment span")
            delta = _u16(tb, deltas + 2 * s)
            ro = _u16(tb, ranges + 2 * s)
            for c in range(start, end + 1):
                if ro == 0:
                    g = (c + delta) & 0xFFFF
                else:
                    gi = ranges + 2 * s + ro + 2 * (c - start)
                    g = _u16(tb, gi)
                    if g:
                        g = (g + delta) & 0xFFFF
                if g:
                    out[c] = g
    elif fmt == 6:
        first = _u16(tb, off + 6)
        cnt = _u16(tb, off + 8)
        if cnt > 0x10000:
            raise ValueError("implausible cmap format 6 count")
        for i in range(cnt):
            g = _u16(tb, off + 10 + 2 * i)
            if g:
                out[first + i] = g
    # other formats (2, 12, …) are skipped: the caller falls back
    return out


def _parse_cmap(tb: bytes) -> tuple[dict[int, int], dict[int, int]]:
    """cmap table → (code→gid for the code path, gid→unicode inverse
    from a Unicode subtable when present)."""
    n = _u16(tb, 2)
    if n > 64:
        raise ValueError("implausible cmap subtable count")
    subs: dict[tuple[int, int], dict[int, int]] = {}
    for i in range(n):
        rec = 4 + 8 * i
        pid, eid = _u16(tb, rec), _u16(tb, rec + 2)
        off = _u32(tb, rec + 4)
        if off >= len(tb):
            raise ValueError("cmap subtable offset out of bounds")
        key = (pid, eid)
        if key not in subs:
            subs[key] = _cmap_subtable(tb, off)
    code_map: dict[int, int] = {}
    for key in ((3, 0), (1, 0), (3, 1), (0, 3), (0, 4), (0, 6)):
        if subs.get(key):
            code_map = subs[key]
            break
    gid_uni: dict[int, int] = {}
    for key in ((3, 1), (0, 3), (0, 4), (0, 6)):
        if subs.get(key):
            for c, g in subs[key].items():
                gid_uni.setdefault(g, c)
            break
    return code_map, gid_uni


def _parse_post_names(tb: bytes) -> dict[int, str]:
    """post table → {gid: glyph name} (format 2.0 only; 1.0 is the
    fixed Macintosh order, 3.0 carries no names)."""
    ver = _u32(tb, 0)
    if ver == 0x00010000:
        return dict(enumerate(MAC_GLYPH_ORDER))
    if ver != 0x00020000:
        return {}
    n = _u16(tb, 32)
    if n > 0x10000:
        raise ValueError("implausible post glyph count")
    idx = [_u16(tb, 34 + 2 * i) for i in range(n)]
    names: list[str] = []
    o = 34 + 2 * n
    while o < len(tb):
        ln = tb[o]
        o += 1
        if o + ln > len(tb):
            raise ValueError("post name table truncated")
        names.append(tb[o : o + ln].decode("latin-1"))
        o += ln
    out: dict[int, str] = {}
    for gid, ix in enumerate(idx):
        if ix < 258:
            out[gid] = MAC_GLYPH_ORDER[ix]
        elif ix - 258 < len(names):
            out[gid] = names[ix - 258]
    return out


def truetype_code_map(data: bytes) -> dict[int, str]:
    """TrueType/OpenType font program → {byte code: unicode str} for
    the simple-font decode path. Symbol-convention codes (0xF000+c)
    are surfaced at both the full and the low-byte code."""
    tables = parse_sfnt_tables(data)
    if b"cmap" not in tables:
        if b"CFF " in tables:  # OTTO wrapper with no cmap: use the CFF
            return cff_code_map(tables[b"CFF "])
        raise ValueError("font program has no cmap table")
    code_gid, gid_uni = _parse_cmap(tables[b"cmap"])
    post = _parse_post_names(tables[b"post"]) if b"post" in tables else {}

    def uni_of(gid: int) -> str | None:
        name = post.get(gid)
        if name and name != ".notdef":
            u = _glyph_uni(name)
            if u != "�":
                return u
        if gid in gid_uni:
            return chr(gid_uni[gid])
        if name and name != ".notdef":
            return "�"
        return None

    out: dict[int, str] = {}
    for code, gid in code_gid.items():
        u = uni_of(gid)
        if u is None:
            continue
        out.setdefault(code, u)
        if 0xF000 <= code <= 0xF0FF:  # symbol convention
            out.setdefault(code & 0xFF, u)
    return out


# ---------------------------------------------------------------------------
# CFF parsing
# ---------------------------------------------------------------------------


def _cff_index(data: bytes, o: int) -> tuple[list[bytes], int]:
    """CFF INDEX at offset → (items, offset past the INDEX)."""
    count = _u16(data, o)
    if count == 0:
        return [], o + 2
    osz = data[o + 2] if o + 2 < len(data) else 0
    if not 1 <= osz <= 4:
        raise ValueError("bad CFF INDEX offSize")
    offs = []
    base = o + 3
    for i in range(count + 1):
        p = base + i * osz
        if p + osz > len(data):
            raise ValueError("CFF INDEX truncated")
        offs.append(int.from_bytes(data[p : p + osz], "big"))
    dstart = base + (count + 1) * osz - 1
    items = []
    for i in range(count):
        a, b = dstart + offs[i], dstart + offs[i + 1]
        if not (dstart < a <= b <= len(data) + 1) or b > len(data):
            raise ValueError("CFF INDEX item out of bounds")
        items.append(data[a:b])
    return items, dstart + offs[count]


def _cff_dict(data: bytes) -> dict[int, list]:
    """CFF DICT bytes → {op: operands}; two-byte ops keyed 1200+x."""
    out: dict[int, list] = {}
    ops: list = []
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if 32 <= b0 <= 246:
            ops.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            if i + 1 >= n:
                raise ValueError("CFF DICT truncated")
            ops.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            if i + 1 >= n:
                raise ValueError("CFF DICT truncated")
            ops.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            if i + 2 >= n:
                raise ValueError("CFF DICT truncated")
            ops.append(struct.unpack_from(">h", data, i + 1)[0])
            i += 3
        elif b0 == 29:
            if i + 4 >= n:
                raise ValueError("CFF DICT truncated")
            ops.append(struct.unpack_from(">i", data, i + 1)[0])
            i += 5
        elif b0 == 30:  # real number: skip nibbles to terminator
            i += 1
            while i < n and data[i] & 0x0F != 0x0F and data[i] >> 4 != 0x0F:
                i += 1
            i += 1
            ops.append(0.0)
        elif b0 == 12:
            if i + 1 >= n:
                raise ValueError("CFF DICT truncated")
            out[1200 + data[i + 1]] = ops
            ops = []
            i += 2
        elif b0 <= 21:
            out[b0] = ops
            ops = []
            i += 1
        else:
            raise ValueError("bad CFF DICT byte %d" % b0)
    return out


def cff_code_map(data: bytes) -> dict[int, str]:
    """Bare CFF (Type1C) font program → {byte code: unicode str}."""
    if len(data) < 4 or data[0] != 1:
        raise ValueError("not a CFF font program")
    hdr = data[2]
    if hdr < 4:
        raise ValueError("bad CFF header size")
    _, o = _cff_index(data, hdr)  # Name INDEX
    tops, o = _cff_index(data, o)  # Top DICT INDEX
    strings, o = _cff_index(data, o)  # String INDEX
    if not tops:
        raise ValueError("CFF has no Top DICT")
    top = _cff_dict(tops[0])

    cs_off = top.get(17)
    if not cs_off or not isinstance(cs_off[0], int):
        raise ValueError("CFF has no CharStrings")
    charstrings, _ = _cff_index(data, int(cs_off[0]))
    nglyphs = len(charstrings)
    if not nglyphs:
        raise ValueError("CFF has no glyphs")

    def sid_name(sid: int) -> str:
        if sid < len(CFF_STANDARD_STRINGS):
            return CFF_STANDARD_STRINGS[sid]
        k = sid - 391
        if 0 <= k < len(strings):
            return strings[k].decode("latin-1")
        return ""

    # charset: gid -> SID (gid 0 is .notdef)
    charset_off = top.get(15, [0])
    co = int(charset_off[0]) if charset_off and isinstance(charset_off[0], (int, float)) else 0
    gid_sid: dict[int, int] = {0: 0}
    if co in (0, 1, 2):  # predefined: ISOAdobe/Expert — identity SIDs
        for g in range(1, nglyphs):
            gid_sid[g] = g
    else:
        if co >= len(data):
            raise ValueError("CFF charset offset out of bounds")
        fmt = data[co]
        if fmt == 0:
            for g in range(1, nglyphs):
                gid_sid[g] = _u16(data, co + 1 + 2 * (g - 1))
        elif fmt in (1, 2):
            g = 1
            p = co + 1
            step = 3 if fmt == 1 else 4
            while g < nglyphs:
                first = _u16(data, p)
                nleft = data[p + 2] if fmt == 1 else _u16(data, p + 2)
                for k in range(nleft + 1):
                    if g >= nglyphs:
                        break
                    gid_sid[g] = first + k
                    g += 1
                p += step
        else:
            raise ValueError("bad CFF charset format %d" % fmt)

    # encoding: code -> gid
    enc_off = top.get(16, [0])
    eo = int(enc_off[0]) if enc_off and isinstance(enc_off[0], (int, float)) else 0
    code_gid: dict[int, int] = {}
    sup_sid: dict[int, int] = {}
    if eo in (0, 1):
        # Standard/Expert encoding. Standard: printable ASCII code c
        # carries SID c-31 (CFF spec Appendix B); resolve through the
        # charset's inverse to find the gid.
        sid_gid = {s: g for g, s in gid_sid.items()}
        for c in range(32, 127):
            g = sid_gid.get(c - 31)
            if g is not None:
                code_gid[c] = g
    else:
        if eo >= len(data):
            raise ValueError("CFF encoding offset out of bounds")
        fmt = data[eo]
        base_fmt = fmt & 0x7F
        p = eo + 1
        if base_fmt == 0:
            ncodes = data[p]
            for i in range(ncodes):
                code_gid[data[p + 1 + i]] = i + 1
            p += 1 + ncodes
        elif base_fmt == 1:
            nranges = data[p]
            g = 1
            q = p + 1
            for _ in range(nranges):
                first, nleft = data[q], data[q + 1]
                for k in range(nleft + 1):
                    code_gid[first + k] = g
                    g += 1
                q += 2
            p = q
        else:
            raise ValueError("bad CFF encoding format %d" % base_fmt)
        if fmt & 0x80:  # supplements: (code, SID) pairs
            nsups = data[p]
            q = p + 1
            for _ in range(nsups):
                sup_sid[data[q]] = _u16(data, q + 1)
                q += 3

    sid_gid_inv = {s: g for g, s in gid_sid.items()}
    out: dict[int, str] = {}
    for code, gid in code_gid.items():
        name = sid_name(gid_sid.get(gid, 0))
        if name and name != ".notdef":
            u = _glyph_uni(name)
            if u != "�":
                out[code] = u
    for code, sid in sup_sid.items():
        name = sid_name(sid)
        if name and name != ".notdef":
            u = _glyph_uni(name)
            if u != "�":
                out[code] = u
    return out


def fontfile_code_map(data: bytes) -> dict[int, str]:
    """Dispatch an embedded font program (FontFile2 or FontFile3
    payload) to the right parser by signature. Every malformed-input
    failure surfaces as ValueError (kernel-wide contract)."""
    try:
        if data[:4] in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
            return truetype_code_map(data)
        if data[:1] == b"\x01":
            return cff_code_map(data)
    except (IndexError, struct.error, OverflowError) as e:
        raise ValueError(f"malformed font program: {e}") from e
    raise ValueError("unrecognized embedded font program")


# ---------------------------------------------------------------------------
# Fixture builders (deterministic, valid, minimal)
# ---------------------------------------------------------------------------


def _uni_name(ch: str) -> bytes:
    """AGL-style glyph name for a code point: uniXXXX in the BMP,
    uXXXXX+ above it (both forms the AGL algorithm defines)."""
    cp = ord(ch)
    return (b"uni%04X" if cp <= 0xFFFF else b"u%05X") % cp


def _ttf_table_checksum(tb: bytes) -> int:
    pad = (-len(tb)) % 4
    tb = tb + b"\x00" * pad
    return sum(struct.unpack(">%dI" % (len(tb) // 4), tb)) & 0xFFFFFFFF


def build_subset_ttf(charmap: dict[str, int]) -> bytes:
    """A real, minimal TrueType font for the synth PDFs: empty glyph
    outlines, a (3,0) symbol cmap format 4 mapping 0xF000|code → gid,
    and a post 2.0 table naming every glyph ``uniXXXX`` — so text
    decodes ONLY through the embedded tables, like a wild symbolic
    subset font. ``charmap`` maps each character to its byte code."""
    items = sorted(charmap.items(), key=lambda kv: kv[1])
    n = len(items)
    if not n:
        raise ValueError("empty charmap")
    codes = [c for _, c in items]
    if codes != list(range(codes[0], codes[0] + n)) or codes[-1] > 0xFF:
        raise ValueError("charmap codes must be contiguous bytes")
    nglyphs = n + 1  # gid 0 = .notdef

    head = struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000, 0, 0, 0x5F0F3CF5,  # version, fontRev, csAdj, magic
        0b1011, 1000,  # flags, unitsPerEm
        0, 0,  # created, modified
        0, 0, 0, 0,  # bbox
        0, 8,  # macStyle, lowestRec
        0, 0, 0,  # fontDirectionHint, indexToLocFormat=0, glyphDataFormat
    )
    hhea = struct.pack(
        ">IhhhHhhhhhhhhhhhH",
        0x00010000, 800, -200, 0, 1000, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0,
        nglyphs,  # numberOfHMetrics
    )
    maxp = struct.pack(">IH", 0x00010000, nglyphs) + b"\x00" * 26
    hmtx = b"".join(struct.pack(">Hh", 500, 0) for _ in range(nglyphs))
    loca = b"\x00\x00" * (nglyphs + 1)  # short format, all empty
    glyf = b"\x00\x00"  # non-empty table; no glyph points at it

    first = 0xF000 | codes[0]
    last = 0xF000 | codes[-1]
    delta = (1 - first) & 0xFFFF
    seg = struct.pack(
        ">HHHHHHH",
        4, 8 + 16, 0,  # format, length (fixed below), language
        4, 4, 1, 0,  # segCountX2, searchRange, entrySelector, rangeShift
    )
    sub = (
        seg
        + struct.pack(">HH", last, 0xFFFF)  # endCode
        + b"\x00\x00"  # reservedPad
        + struct.pack(">HH", first, 0xFFFF)  # startCode
        + struct.pack(">HH", delta, 1)  # idDelta
        + struct.pack(">HH", 0, 0)  # idRangeOffset
    )
    sub = sub[:2] + struct.pack(">H", len(sub)) + sub[4:]
    cmap = struct.pack(">HHHHI", 0, 1, 3, 0, 12) + sub

    names = [_uni_name(ch) for ch, _ in items]
    post = (
        struct.pack(">IiHHIIIII", 0x00020000, 0, 0, 0, 0, 0, 0, 0, 0)
        + struct.pack(">H", nglyphs)
        + struct.pack(">H", 0)  # gid 0 -> .notdef (mac index 0)
        + b"".join(struct.pack(">H", 258 + i) for i in range(n))
        + b"".join(bytes([len(nm)]) + nm for nm in names)
    )

    return build_sfnt({
        b"cmap": cmap, b"glyf": glyf, b"head": head, b"hhea": hhea,
        b"hmtx": hmtx, b"loca": loca, b"maxp": maxp, b"post": post,
    })


def build_sfnt(tables: dict[bytes, bytes]) -> bytes:
    """Assemble an sfnt wrapper (directory + checksums) around the
    given tables; patches head.checkSumAdjustment when present."""
    tags = sorted(tables)
    num = len(tags)
    sr = 16 * (2 ** (num.bit_length() - 1))
    hdr = struct.pack(
        ">IHHHH", 0x00010000, num, sr, num.bit_length() - 1, 16 * num - sr
    )
    off = len(hdr) + 16 * num
    recs, body = [], []
    for tag in tags:
        tb = tables[tag]
        recs.append(
            struct.pack(">4sIII", tag, _ttf_table_checksum(tb), off, len(tb))
        )
        pad = (-len(tb)) % 4
        body.append(tb + b"\x00" * pad)
        off += len(tb) + pad
    font = hdr + b"".join(recs) + b"".join(body)
    if b"head" not in tables:
        return font
    adj = (0xB1B0AFBA - _ttf_table_checksum(font)) & 0xFFFFFFFF
    # patch checkSumAdjustment (head table offset + 8)
    ho = struct.unpack(">I", font[len(hdr) + 16 * tags.index(b"head") + 8 :][:4])[0]
    return font[: ho + 8] + struct.pack(">I", adj) + font[ho + 12 :]


def _cff_index_bytes(items: list[bytes]) -> bytes:
    if not items:
        return b"\x00\x00"
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    osz = 1 if offs[-1] < 256 else 2 if offs[-1] < 65536 else 4
    return (
        struct.pack(">HB", len(items), osz)
        + b"".join(o.to_bytes(osz, "big") for o in offs)
        + b"".join(items)
    )


def build_subset_cff(charmap: dict[str, int]) -> bytes:
    """A real, minimal bare-CFF (Type1C) font: custom String-INDEX
    glyph names ``uniXXXX`` (SIDs 391+), a format-0 charset and a
    format-0 embedded Encoding — text decodes only through them."""
    items = sorted(charmap.items(), key=lambda kv: kv[1])
    n = len(items)
    if not n or any(not 0 <= c <= 0xFF for _, c in items):
        raise ValueError("charmap codes must be bytes")
    header = b"\x01\x00\x04\x04"
    name_idx = _cff_index_bytes([b"TLSYNF+Synth"])
    strings = [_uni_name(ch) for ch, _ in items]
    string_idx = _cff_index_bytes(strings)
    gsubr_idx = b"\x00\x00"
    encoding = bytes([0, n]) + bytes(c for _, c in items)
    charset = b"\x00" + b"".join(
        struct.pack(">H", 391 + i) for i in range(n)
    )
    charstrings = _cff_index_bytes([b"\x0e"] * (n + 1))

    def topdict(cs_off: int, enc_off: int, chset_off: int) -> bytes:
        def op29(v: int) -> bytes:
            return b"\x1d" + struct.pack(">i", v)

        return (
            op29(chset_off) + b"\x0f"  # charset (15)
            + op29(enc_off) + b"\x10"  # Encoding (16)
            + op29(cs_off) + b"\x11"  # CharStrings (17)
        )

    td_len = len(topdict(0, 0, 0))
    top_idx_len = len(_cff_index_bytes([b"\x00" * td_len]))
    base = len(header) + len(name_idx) + top_idx_len + len(string_idx) + len(gsubr_idx)
    enc_off = base
    chset_off = enc_off + len(encoding)
    cs_off = chset_off + len(charset)
    top_idx = _cff_index_bytes([topdict(cs_off, enc_off, chset_off)])
    assert len(top_idx) == top_idx_len
    return (
        header + name_idx + top_idx + string_idx + gsubr_idx
        + encoding + charset + charstrings
    )
