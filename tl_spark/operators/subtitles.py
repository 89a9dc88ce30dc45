"""Subtitle extraction: SRT and WebVTT → transcript text + timing
metadata. Video corpora carry their text as sidecar subtitle files;
at 100 TB these are the transcript source a training pipeline
actually ingests, and the gates it filters on are timing-derived
(speech duration, cue rate, gap ratio) plus the extracted text
itself.

REAL parsers for both formats (the SubRip format is de-facto public;
WebVTT is a W3C spec):

- SRT: numbered cue blocks, ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing
  lines (comma decimal separator), blank-line separated payloads.
- WebVTT: the ``WEBVTT`` magic, optional cue identifiers, dot decimal
  separator and optional hour field, cue settings after the timing
  line (dropped), NOTE/STYLE/REGION blocks (skipped), and inline
  markup tags like ``<i>``/``<c.cls>``/``<00:00:01.000>`` stripped
  from the text.

Semantics are exact and closed-form-friendly (the synth writer keys
every field off an id), so the operator carries a value-exact DuckDB
suite oracle. Malformed inputs raise ValueError (the kernel-wide
contract); a payload with zero parseable cues is malformed.

Scale posture: map-only Arrow batches (mapInArrow), zero shuffle,
pure per-row string work — linear and embarrassingly parallel.

Reference parity note: the reference engine is an HTML parser with no
subtitle surface; this is LLM-training-data pipeline scope
(SURVEY.md §6)."""

from __future__ import annotations

import re
from typing import Iterator

__all__ = [
    "parse_srt",
    "parse_vtt",
    "subtitle_payload_info",
    "subtitle_extract",
    "synth_subtitle_media",
]

_SRT_TIME = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
# WebVTT allows MM:SS.mmm (no hour field)
_VTT_TIME = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)
_VTT_TAG = re.compile(r"<[^>]*>")


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_srt(text: str) -> list[dict]:
    """Cue list [{start_ms, end_ms, text}] from SubRip. Raises
    ValueError when no cue parses (malformed-input contract)."""
    cues = []
    for block in re.split(r"\n\s*\n", text.replace("\r\n", "\n")):
        lines = [ln for ln in block.split("\n") if ln.strip() != ""]
        if not lines:
            continue
        # optional numeric counter line, then the timing line
        at = 0
        if at < len(lines) and lines[at].strip().isdigit():
            at += 1
        if at >= len(lines):
            continue
        m = _SRT_TIME.search(lines[at])
        if m is None:
            continue
        g = m.groups()
        start, end = _ms(*g[:4]), _ms(*g[4:])
        payload = "\n".join(lines[at + 1 :]).strip()
        cues.append({"start_ms": start, "end_ms": end, "text": payload})
    if not cues:
        raise ValueError("no SRT cues parsed")
    return cues


def parse_vtt(text: str) -> list[dict]:
    """Cue list from WebVTT: NOTE/STYLE/REGION blocks skipped, cue
    settings dropped, inline markup stripped. Raises ValueError for
    payloads without the WEBVTT magic or with zero cues."""
    text = text.replace("\r\n", "\n")
    if not text.startswith("WEBVTT"):
        raise ValueError("missing WEBVTT magic")
    cues = []
    blocks = re.split(r"\n\s*\n", text)
    for block in blocks[1:] if blocks and blocks[0].startswith("WEBVTT") else blocks:
        lines = [ln for ln in block.split("\n") if ln.strip() != ""]
        if not lines:
            continue
        head = lines[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue
        at = 0
        if "-->" not in lines[at]:
            at = 1  # cue identifier line
            if at >= len(lines) or "-->" not in lines[at]:
                continue
        m = _VTT_TIME.search(lines[at])
        if m is None:
            continue
        g = m.groups()
        start, end = _ms(*g[:4]), _ms(*g[4:])
        payload = "\n".join(lines[at + 1 :]).strip()
        cues.append(
            {"start_ms": start, "end_ms": end, "text": _VTT_TAG.sub("", payload)}
        )
    if not cues:
        raise ValueError("no WebVTT cues parsed")
    return cues


def subtitle_payload_info(text: str) -> dict:
    """Route one subtitle payload (WEBVTT magic else SRT) and reduce
    its cues to transcript text + the curation timing gates:

    - ``transcript``: cue texts joined with a single space (inner
      newlines collapsed to spaces)
    - ``n_cues``, ``duration_ms`` (last end), ``speech_ms`` (sum of
      cue spans), ``gap_ratio`` = 1 - speech/duration (0 when the
      duration is 0), rounded to 6 places
    """
    if not isinstance(text, str):
        raise ValueError("subtitle payload must be a string")
    # the WebVTT spec explicitly allows an optional U+FEFF before the
    # magic, and real files very commonly carry it
    text = text.lstrip("\ufeff")
    if text.startswith("WEBVTT"):
        fmt, cues = "vtt", parse_vtt(text)
    else:
        fmt, cues = "srt", parse_srt(text)
    transcript = " ".join(
        c["text"].replace("\n", " ") for c in cues if c["text"]
    )
    duration = max((c["end_ms"] for c in cues), default=0)
    speech = sum(max(0, c["end_ms"] - c["start_ms"]) for c in cues)
    return {
        "format": fmt,
        "transcript": transcript,
        "n_cues": len(cues),
        "duration_ms": duration,
        "speech_ms": speech,
        "gap_ratio": round(1.0 - speech / duration, 6) if duration else 0.0,
    }


_SCHEMA_SUFFIX = (
    "format string, transcript string, n_cues long, duration_ms long, "
    "speech_ms long, gap_ratio double"
)


def subtitle_extract(
    df,
    text_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
):
    """Transcript + timing gates per subtitle document. Map-only Arrow
    batches; ``on_error="skip"`` drops unparseable payloads."""
    import pyarrow as pa

    from tl_spark.operators.multimodal import (
        _check_on_error,
        _malformed_as_valueerror,
    )

    _check_on_error(on_error)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            keep = []
            cols = {k: [] for k in (
                "format", "transcript", "n_cues", "duration_ms",
                "speech_ms", "gap_ratio",
            )}
            for i, t in zip(ids, texts):
                try:
                    info = _malformed_as_valueerror(
                        subtitle_payload_info, t, "subtitle"
                    )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    continue
                keep.append(i)
                for k in cols:
                    cols[k].append(info[k])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keep, type=pa.int64()),
                    pa.array(cols["format"], type=pa.string()),
                    pa.array(cols["transcript"], type=pa.string()),
                    pa.array(cols["n_cues"], type=pa.int64()),
                    pa.array(cols["duration_ms"], type=pa.int64()),
                    pa.array(cols["speech_ms"], type=pa.int64()),
                    pa.array(cols["gap_ratio"], type=pa.float64()),
                ],
                names=[id_col, "format", "transcript", "n_cues",
                       "duration_ms", "speech_ms", "gap_ratio"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, {_SCHEMA_SUFFIX}"
    )


# ---------------------------------------------------------------------------
# Writer (test/oracle harness)
# ---------------------------------------------------------------------------


def _fmt_ts(ms: int, vtt: bool) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    sep = "." if vtt else ","
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def subtitle_bytes(
    n_cues: int,
    cue_ms: int = 2000,
    gap_ms: int = 500,
    vtt: bool = False,
    seed: int = 0,
) -> str:
    """A VALID subtitle document with deterministic cue text (``cue
    {seed}-{k} words``) and uniform timing — every output field of
    :func:`subtitle_payload_info` is a closed form of the args."""
    out = ["WEBVTT", ""] if vtt else []
    t = 0
    for k in range(n_cues):
        if not vtt:
            out.append(str(k + 1))
        out.append(
            f"{_fmt_ts(t, vtt)} --> {_fmt_ts(t + cue_ms, vtt)}"
            + (" align:start" if vtt and k % 2 == 0 else "")
        )
        body = f"cue {seed}-{k} words"
        if vtt and k % 3 == 0:
            body = f"<i>{body}</i>"
        out.append(body)
        out.append("")
        t += cue_ms + gap_ms
    return "\n".join(out)


def synth_subtitle_media(spark, n_rows: int = 30, seed: int = 11):
    """Deterministic subtitle table keyed by id: even ids SRT, odd ids
    WebVTT; n_cues = 3 + id%5, cue_ms = 1500 + id%4*250,
    gap_ms = 300 + id%3*100 — closed-form DuckDB oracle."""
    import pyarrow as pa

    def _payload(i: int) -> str:
        return subtitle_bytes(
            3 + i % 5,
            cue_ms=1500 + (i % 4) * 250,
            gap_ms=300 + (i % 3) * 100,
            vtt=i % 2 == 1,
            seed=seed + i,
        )

    def fn(batches):
        for batch in batches:
            ids = batch.column("id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array([_payload(int(i)) for i in ids], type=pa.string()),
                ],
                names=["media_id", "payload"],
            )

    return spark.range(n_rows).mapInArrow(fn, "media_id long, payload string")
