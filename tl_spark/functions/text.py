"""Text-analysis operators for large-scale corpus curation.

All hot-path expressions are Spark built-ins (JVM-side, whole-stage
codegen) — no Python in the row path. Each function has an equivalent
ANSI-SQL formulation used by the DuckDB oracle in __spark_entry__.py;
keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny language-marker lexicons for the n-gram/stopword language guesser;
# deliberately simple + deterministic (heuristic lang-id, not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(col) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


# BPE-ish tokenizer regex (GPT-2-style, simplified to the feature set
# Java regex and RE2/DuckDB agree on: no lookahead, ASCII classes):
# contractions, space-prefixed letter runs, digit runs, punct runs,
# residual whitespace. Deterministic token COUNT, not a real BPE merge
# table — the count is the pre-tokenization unit a byte-pair encoder
# would start from.
BPE_ISH_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"
)


def bpe_token_count(col) -> Column:
    return F.regexp_count(col, F.lit(BPE_ISH_RE))


def char_count(col) -> Column:
    return F.length(col)


def punct_count(col) -> Column:
    return F.regexp_count(col, F.lit(r"[.,;:!?]"))


def stopword_count(col) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.array_intersect(tokens(col), sw))


def quality_score(col) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence - punctuation excess. Mirrors the SQL oracle exactly."""
    n_tok = token_count(col).cast("double")
    n_chars = char_count(col).cast("double")
    punct = punct_count(col).cast("double")
    stop = stopword_count(col).cast("double")
    score = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop / F.lit(2.0), F.lit(1.0)) * 0.3
        + F.when(n_chars > 0, 1.0 - F.least(punct / n_chars * 10, F.lit(1.0)))
        .otherwise(0.0)
        * 0.3
    )
    return F.round(score, 4)


def lang_guess(col) -> Column:
    """Argmax of per-language marker-word hits; 'und' when all zero.
    Ties break by the fixed language order en,de,fr,es."""
    toks = tokens(col)
    def _member_of(ws):
        # NB: the HOF lambda must be unary — PySpark dispatches on arity
        def pred(x):
            cond = x == ws[0]
            for w in ws[1:]:
                cond = cond | (x == w)
            return cond

        return pred

    hits = {
        lang: F.size(F.filter(toks, _member_of(list(words))))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_n = F.lit(0)
    # fold from last to first language; ">=" makes the earlier language
    # win ties (it is applied later in the fold)
    for lang in reversed(langs):
        cond = (hits[lang] > 0) & (hits[lang] >= best_n)
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return best


def fingerprint(col) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted,
    lowercased, punctuation-stripped token bag."""
    norm = F.lower(F.regexp_replace(col, r"[^a-zA-Z0-9 ]", " "))
    toks = F.array_sort(tokens(norm))
    return F.md5(F.concat_ws(" ", toks))


_FP_TABLE = None


def fingerprint_arrow(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, fp): the EXACT :func:`fingerprint` values via a vectorized
    Arrow batch kernel (round-8 optimization; equality pinned by
    tests/test_text_extra.py::test_fingerprint_arrow_matches_jvm).

    Why: Spark's ``regexp_replace`` costs ~52 us/doc for the char-class
    normalization alone (2.6 s for 50k docs on 32 cores — the measured
    bulk of the doc_fingerprint battery key), while the whole
    normalize+tokenize+sort+md5 chain is ~8 us/doc in Python over a
    byte table. Equivalence argument, valid for ALL UTF-8 input:

    - the JVM chain replaces every char outside [a-zA-Z0-9 ] with one
      space, lowercases, splits on \\s+ and drops empties. A byte-level
      256-entry table mapping A-Z->a-z, [a-z0-9 ]->self, everything
      else->space produces a DIFFERENT string (each byte of a
      multi-byte char becomes its own space; '\\t' etc. become spaces)
      but the IDENTICAL token list: ASCII bytes never occur inside
      multi-byte UTF-8 sequences, extra spaces only widen separators,
      and after the table the only whitespace byte is 0x20 so
      ``bytes.split()`` equals the Java \\s+ split.
    - Python byte-wise sort == Spark array_sort's UTF8String binary
      order (UTF-8 byte order preserves code-point order).
    - hashlib md5 hexdigest == Spark md5 (lowercase hex).
    """
    import numpy as np
    import pyarrow as pa

    global _FP_TABLE
    if _FP_TABLE is None:
        tbl = np.full(256, ord(" "), dtype=np.uint8)
        for c in b"abcdefghijklmnopqrstuvwxyz0123456789 ":
            tbl[c] = c
        for c in b"ABCDEFGHIJKLMNOPQRSTUVWXYZ":
            tbl[c] = c + 32
        _FP_TABLE = tbl

    def fn(batches):
        import hashlib

        tbl = _FP_TABLE
        empty_md5 = hashlib.md5(b"").hexdigest()
        for batch in batches:
            ids = batch.column(id_col)
            col = batch.column(text_col)
            out = []
            if col.null_count == 0 and pa.types.is_string(col.type):
                bufs = col.buffers()
                offs = np.frombuffer(bufs[1], dtype=np.int32,
                                     count=len(col) + 1 + col.offset)
                data = (
                    np.frombuffer(bufs[2], dtype=np.uint8)
                    if bufs[2] is not None
                    else np.empty(0, dtype=np.uint8)
                )
                norm = tbl[data].tobytes()
                base = col.offset
                for i in range(len(col)):
                    s, e = offs[base + i], offs[base + i + 1]
                    toks = norm[s:e].split()
                    toks.sort()
                    out.append(hashlib.md5(b" ".join(toks)).hexdigest())
            else:
                for t in col.to_pylist():
                    if t is None:
                        # concat_ws treats a null token array as empty
                        out.append(empty_md5)
                        continue
                    norm = tbl[
                        np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                    ].tobytes()
                    toks = norm.split()
                    toks.sort()
                    out.append(hashlib.md5(b" ".join(toks)).hexdigest())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.string())],
                names=[id_col, "fp"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, fp string"
    )


_rolling_fp_udf = None


def rolling_fingerprint(col, window: int = 16):
    """Rabin-Karp rolling-hash document fingerprint (Arrow-batch UDF).

    Returns the MINIMUM windowed polynomial hash over the UTF-8 bytes —
    a winnowing-style content fingerprint that is robust to appends
    (unlike whole-text hashes) and deterministic across processes.
    Vectorized: numpy cumulative polynomial evaluation per document.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    global _rolling_fp_udf
    if _rolling_fp_udf is None:

        def _impl(texts):
            import numpy as np

            # polynomial hashing mod 2^64; B is odd so B^-1 exists mod
            # 2^64 and prefix hashes become a cumsum:
            #   p[k] = sum_{i<k} d[i] B^{k-1-i} = B^{k-1} * c[k-1],
            #   c[k] = cumsum(d[i] * Binv^i)   (uint64 wrap == mod 2^64)
            # windowed hash h[j] = p[j+w] - p[j] B^w
            #              = B^{j+w-1} (c[j+w-1] - c[j-1])
            B = np.uint64(1000003)
            BINV = np.uint64(pow(1000003, -1, 1 << 64))
            w = window
            out = np.zeros(len(texts), dtype=np.uint64)
            _errstate = np.errstate(over="ignore")  # wrap IS the modulus
            _errstate.__enter__()
            for i, t in enumerate(texts):
                if not t:
                    continue
                data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(
                    np.uint64
                )
                n = len(data)
                pows = np.ones(n, dtype=np.uint64)
                pows[1:] = B
                np.cumprod(pows, out=pows)  # pows[k] = B^k (wrapping)
                invpows = np.ones(n, dtype=np.uint64)
                invpows[1:] = BINV
                np.cumprod(invpows, out=invpows)
                c = np.cumsum(data * invpows, dtype=np.uint64)
                if n <= w:
                    out[i] = pows[n - 1] * c[n - 1]
                    continue
                cw = c[w - 1:]
                cprev = np.concatenate(
                    (np.zeros(1, dtype=np.uint64), c[: n - w])
                )
                hw = pows[w - 1:] * (cw - cprev)
                out[i] = hw.min()
            _errstate.__exit__(None, None, None)
            return pd.Series(out.astype(np.int64))

        _rolling_fp_udf = pandas_udf("long")(_impl)
    return _rolling_fp_udf(col)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars_computed"),
        punct_count(c).alias("n_punct"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


# ------------------------------------------------- round-3 additions


def dup_word_frac(col) -> Column:
    """Gopher-style repetition signal: fraction of tokens that repeat
    an earlier token (1 - distinct/total; 0 for empty docs). Pure
    JVM array ops — no explode, no shuffle."""
    toks = tokens(col)
    n = F.size(toks).cast("double")
    return F.when(
        n > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6),
    ).otherwise(F.lit(0.0))


def _seg_fracs(segs):
    """(dup count fraction, dup char-mass fraction) for a segment
    array: 1 - distinct/total by count, and 1 - distinct-mass/total-
    mass by characters (one instance of each distinct segment counts
    as unique mass; every repeat is duplicate mass)."""
    n = F.size(segs).cast("double")
    dn = F.size(F.array_distinct(segs)).cast("double")
    mass = F.aggregate(
        segs, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    ).cast("double")
    dmass = F.aggregate(
        F.array_distinct(segs),
        F.lit(0).cast("long"),
        lambda a, x: a + F.length(x),
    ).cast("double")
    cnt_frac = F.when(n > 0, F.round(F.lit(1.0) - dn / n, 6)).otherwise(
        F.lit(0.0)
    )
    char_frac = F.when(
        mass > 0, F.round(F.lit(1.0) - dmass / mass, 6)
    ).otherwise(F.lit(0.0))
    return cnt_frac, char_frac


def _lines(col):
    return F.filter(F.split(col, "\n"), lambda x: x != "")


def _paragraphs(col):
    return F.filter(F.split(col, "\n{2,}"), lambda x: x != "")


def dup_line_frac(col) -> Column:
    """Gopher: fraction of (non-empty) lines that duplicate an earlier
    line. All-JVM array ops."""
    return _seg_fracs(_lines(col))[0]


def dup_line_char_frac(col) -> Column:
    """Gopher: fraction of line CHARACTERS belonging to duplicate line
    instances (repeat occurrences beyond the first)."""
    return _seg_fracs(_lines(col))[1]


def dup_paragraph_frac(col) -> Column:
    """Duplicate-paragraph fraction (paragraphs = blank-line splits)."""
    return _seg_fracs(_paragraphs(col))[0]


def dup_paragraph_char_frac(col) -> Column:
    return _seg_fracs(_paragraphs(col))[1]


def top_bigram_char_frac(col) -> Column:
    """Gopher: character coverage of the single most frequent word
    bigram — occurrences x (len(w1)+len(w2)+1) / len(text); 0 for
    docs with < 2 tokens or empty text. Ties break to the
    lexicographically smallest bigram (deterministic; the oracle
    mirrors with ORDER BY count DESC, gram ASC). Pure JVM: a fold
    over the SORTED bigram array tracks the longest equal-run."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.sort_array(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        )
    )
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("bestg"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestg"]).alias("bestg"),
        )

    top = F.aggregate(grams, zero, step)
    cov = top["best"].cast("double") * F.length(top["bestg"]) / F.length(col)
    return F.when(
        (n >= 2) & (F.length(col) > 0), F.round(cov, 6)
    ).otherwise(F.lit(0.0))


def gopher_repetition(col):
    """The full Gopher repetition battery as named columns: duplicate
    word/line/paragraph fractions (count + char-mass variants) and
    top-bigram character coverage. Every signal is a map-side JVM
    expression — no explode, no shuffle, codegen end to end."""
    return [
        dup_word_frac(col).alias("dup_word_frac"),
        dup_line_frac(col).alias("dup_line_frac"),
        dup_line_char_frac(col).alias("dup_line_char_frac"),
        dup_paragraph_frac(col).alias("dup_para_frac"),
        dup_paragraph_char_frac(col).alias("dup_para_char_frac"),
        top_bigram_char_frac(col).alias("top_bigram_char_frac"),
    ]


def pii_redact(col) -> Column:
    """Redact common PII patterns: emails -> [EMAIL], IPv4 -> [IP],
    long digit-dash-space runs -> [PHONE]. Patterns restricted to the
    regex subset Java and RE2/DuckDB agree on (no lookaround, no
    backrefs) so the DuckDB oracle is value-exact. Order matters:
    emails first (their local parts may contain digits), IPs before
    phones (dotted quads would otherwise half-match the phone rule).
    All-JVM regexp_replace chain — codegen, no Python."""
    out = F.regexp_replace(
        col,
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    )
    out = F.regexp_replace(
        out, r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"
    )
    out = F.regexp_replace(out, r"\+?\d[\d -]{7,}\d", "[PHONE]")
    return out


def pii_counts(col) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) BEFORE redaction — same patterns as
    :func:`pii_redact`, counted in the same masking order (emails
    removed before IPs are counted, etc., so overlapping matches are
    attributed exactly once, mirroring the replace chain)."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip_re = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone_re = r"\+?\d[\d -]{7,}\d"
    n_email = F.regexp_count(col, F.lit(email_re))
    after_email = F.regexp_replace(col, email_re, "[EMAIL]")
    n_ip = F.regexp_count(after_email, F.lit(ip_re))
    after_ip = F.regexp_replace(after_email, ip_re, "[IP]")
    n_phone = F.regexp_count(after_ip, F.lit(phone_re))
    return n_email, n_ip, n_phone


_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

_nfc_udf = None


def strip_controls(col) -> Column:
    """Remove C0/C1-ish control characters (keeping \\t \\n \\r) — the
    cheap JVM-side half of text normalization."""
    return F.regexp_replace(col, _CONTROL_RE, "")


def nfc_normalize(col) -> Column:
    """Unicode NFC normalization (pandas/unicodedata per Arrow batch —
    Spark SQL has no normalizer; DuckDB's nfc_normalize is the oracle
    counterpart, tests pin the two agree)."""
    global _nfc_udf
    if _nfc_udf is None:
        from pyspark.sql.functions import pandas_udf

        def _impl(s):
            # Series.str.normalize is the vectorized unicodedata wrapper
            return s.str.normalize("NFC")

        _nfc_udf = pandas_udf("string")(_impl)
    return _nfc_udf(col)


def normalize_text(col) -> Column:
    """Pipeline normalization: strip control chars (JVM regex), then
    Unicode NFC — the standard pre-tokenization cleanup for web text.
    """
    return nfc_normalize(strip_controls(col))


# Writing-system profile: Java regex Unicode script properties (also
# supported, with the same definitions for these major scripts, by
# DuckDB's RE2 — which is what makes the suite oracle possible).
SCRIPTS = ("Latin", "Cyrillic", "Han", "Arabic", "Devanagari",
           "Greek", "Hangul", "Hiragana", "Katakana")


def script_counts(col) -> Column:
    """struct<latin:long, cyrillic:long, ...> — per-script character
    counts via JVM regexp_count (one pass per script, all codegen'd).
    A multilingual-corpus signal: script mix flags mixed-language or
    transliterated documents that token-level language ID misses."""
    return F.struct(
        *[
            F.regexp_count(col, F.lit(rf"\p{{Is{s}}}")).alias(s.lower())
            for s in SCRIPTS
        ]
    )


def dominant_script(col) -> Column:
    """Name of the script with the highest character count (ties break
    by SCRIPTS order; 'none' when no scripted characters at all)."""
    counts = [
        F.regexp_count(col, F.lit(rf"\p{{Is{s}}}")) for s in SCRIPTS
    ]
    best = F.greatest(*counts)
    expr = F.lit("none")
    for s, c in reversed(list(zip(SCRIPTS, counts))):
        expr = F.when((best > 0) & (c == best), F.lit(s.lower())).otherwise(
            expr
        )
    return expr
