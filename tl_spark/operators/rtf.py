"""RTF text extraction: the legacy-office text format, parsed with a
real tokenizer (the RTF 1.x spec is public; the format is a flat
token stream — control words, control symbols, groups, text).

Semantics (exact, writer-pinned):

- control words ``\\word`` with an optional signed numeric parameter;
  the one following space is part of the control word, not text
- ``\\par``/``\\line`` → newline, ``\\tab`` → TAB, ``\\~`` →
  non-breaking space, ``\\{ \\} \\\\`` → literal braces/backslash
- ``\\'hh`` hex escapes decoded per cp1252's printable range (the
  de-facto default ANSI code page; bytes map through latin-1 where
  cp1252 is undefined)
- ``\\uN`` unicode escapes (negative N is N+65536, per spec), eating
  the following fallback character(s) per the current ``\\ucN`` skip
  count (default 1)
- destination groups ``{\\fonttbl...}`` / ``{\\*\\...}`` and the other
  non-content destinations (stylesheet, colortbl, info, pict, header,
  footer) are skipped whole — their text is metadata, not content
- group nesting saves/restores the ``\\uc`` state

Malformed payloads (no ``{\\rtf`` magic, unbalanced groups beyond the
tolerance real writers exhibit, truncated escapes) raise ValueError.

Scale posture: map-only Arrow batches, one document per row; a single
linear regex-token pass per document.

Reference parity note: no RTF surface in the reference engine; this
is LLM-training-data pipeline scope (SURVEY.md §6)."""

from __future__ import annotations

import re
from typing import Iterator

__all__ = ["rtf_text", "rtf_extract", "rtf_bytes", "synth_rtf_media"]

_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})"      # 1: hex escape
    rb"|\\u(-?\d+)\s?"            # 2: unicode escape
    rb"|\\([a-z]+)(-?\d+)? ?"     # 3,4: control word (+param)
    rb"|\\([^a-z])"               # 5: control symbol
    rb"|([{}])"                   # 6: group delimiters
    rb"|([^\\{}]+)",              # 7: plain text run
    re.S,
)

# destinations whose content is metadata, never document text
_SKIP_DESTS = frozenset(
    b"fonttbl stylesheet colortbl info pict object header footer "
    b"headerl headerr headerf footerl footerr footerf ftnsep "
    b"ftnsepc generator".split()
)


def rtf_text(payload: bytes) -> tuple[str, int]:
    """(text, n_paragraphs) from an RTF payload. ValueError for
    payloads without the ``{\\rtf`` magic or with broken structure."""
    if isinstance(payload, str):
        payload = payload.encode("latin-1", "replace")
    payload = bytes(payload)
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("missing {\\rtf magic")
    out: list[str] = []
    depth = 0
    skip_until = None  # group depth at which a skipped destination ends
    uc_stack = [1]
    pending_skip = 0  # fallback chars to eat after \uN
    n_par = 0
    first_group_char = False

    def emit(s: str):
        nonlocal pending_skip
        if skip_until is not None:
            return
        if pending_skip:
            drop = min(pending_skip, len(s))
            pending_skip -= drop
            s = s[drop:]
        if s:
            out.append(s)

    pos = 0
    end = len(payload)
    while pos < end:
        m = _TOKEN.match(payload, pos)
        if m is None:  # a lone trailing backslash
            raise ValueError("truncated RTF control sequence")
        pos = m.end()
        if m.group(6):
            if m.group(6) == b"{":
                depth += 1
                uc_stack.append(uc_stack[-1])
                first_group_char = True
                continue
            depth -= 1
            if len(uc_stack) > 1:
                uc_stack.pop()
            if depth < 0:
                raise ValueError("unbalanced RTF groups")
            if skip_until is not None and depth < skip_until:
                skip_until = None
            first_group_char = False
            continue
        was_first = first_group_char
        first_group_char = False
        if m.group(1):  # \'hh
            b = int(m.group(1), 16)
            try:
                emit(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                emit(bytes([b]).decode("latin-1"))
            continue
        if m.group(2):  # \uN
            n = int(m.group(2))
            if n < 0:
                n += 65536
            if skip_until is None:
                out.append(chr(n))
                pending_skip = uc_stack[-1]
            continue
        if m.group(3) is not None:  # control word
            word = m.group(3)
            if word == b"bin":
                # \binN: N raw bytes follow — NEVER document text, and
                # any {/} bytes inside must not disturb group tracking
                n_raw = int(m.group(4) or 0)
                if n_raw < 0 or pos + n_raw > end:
                    raise ValueError("truncated RTF \\bin run")
                pos += n_raw
            elif word == b"uc" and m.group(4) is not None:
                uc_stack[-1] = max(0, int(m.group(4)))
            elif skip_until is None:
                if was_first and word in _SKIP_DESTS:
                    skip_until = depth
                elif word in (b"par", b"line"):
                    emit("\n")
                    if word == b"par":
                        n_par += 1
                elif word == b"tab":
                    emit("\t")
            continue
        if m.group(5) is not None:  # control symbol
            sym = m.group(5)
            if sym == b"*" and was_first:
                # \* destinations are ignorable — but a nested one
                # inside an already-skipped group must not RESET the
                # skip depth (that would end the outer skip early and
                # leak its metadata into the text)
                if skip_until is None:
                    skip_until = depth
                first_group_char = False
            elif sym in (b"{", b"}", b"\\"):
                emit(sym.decode("latin-1"))
            elif sym == b"~":
                emit(" ")
            continue
        if m.group(7):
            text = m.group(7).replace(b"\r", b"").replace(b"\n", b"")
            if text:
                emit(text.decode("latin-1"))
    if depth != 0:
        raise ValueError("unbalanced RTF groups")
    return "".join(out), n_par


def rtf_extract(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
):
    """Document text per RTF row: map-only Arrow batches;
    ``on_error="skip"`` drops unrecognized/malformed payloads."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
    )

    _check_on_error(on_error)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            keep, texts, pars = [], [], []
            for i, p in zip(ids, payloads):
                try:
                    text, n = _malformed_as_valueerror(rtf_text, p, "RTF")
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                keep.append(i)
                texts.append(text)
                pars.append(n)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(texts, type=pa.string()),
                    pa.array(pars, type=pa.int64()),
                ],
                names=[id_col, "text", "n_paragraphs"],
            )

    return df.select(id_col, payload_col).mapInArrow(
        fn, f"{id_col} long, text string, n_paragraphs long"
    )


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def rtf_bytes(paragraphs: list[str], seed: int = 0) -> bytes:
    """A VALID RTF document: header with a fonttbl destination (whose
    content must NOT leak into the text), one ``\\par``-terminated
    paragraph per input. Input text must be ASCII without RTF
    specials (the closed-form oracle path); escapes are exercised by
    the unit tests."""
    body = "".join(f"{p}\\par " for p in paragraphs)
    return (
        "{\\rtf1\\ansi\\deff0"
        "{\\fonttbl{\\f0\\froman Times New Roman;}}"
        "{\\*\\generator synth " + str(seed) + ";}"
        "\\f0\\fs24 " + body + "}"
    ).encode("ascii")


def synth_rtf_media(spark, n_rows: int = 30, seed: int = 31):
    """Deterministic RTF table keyed by id: 2 + id%4 paragraphs of
    ``para {seed+id}-{k}`` — closed-form DuckDB oracle (paragraphs
    newline-joined by \\par, trailing newline included)."""
    import pyarrow as pa

    def _payload(i: int) -> bytes:
        n = 2 + i % 4
        return rtf_bytes(
            [f"para {seed + i}-{k}" for k in range(n)], seed=seed + i
        )

    def fn(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([_payload(int(i)) for i in ids], type=pa.binary()),
                ],
                names=["media_id", "payload"],
            )

    return spark.range(n_rows).mapInArrow(fn, "media_id long, payload binary")
