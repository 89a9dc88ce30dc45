"""SRT/WebVTT subtitle extraction: exact parse semantics, adversarial
shapes, the Spark operator, and a closed-form DuckDB oracle for the
synth table (tl_spark/operators/subtitles.py)."""

import duckdb
import pytest

from tl_spark.operators.subtitles import (
    parse_srt,
    parse_vtt,
    subtitle_bytes,
    subtitle_extract,
    subtitle_payload_info,
    synth_subtitle_media,
)


def test_srt_exact():
    doc = (
        "1\n00:00:00,000 --> 00:00:02,500\nHello there\n\n"
        "2\n00:00:03,000 --> 00:00:05,000\nSecond cue\nsecond line\n\n"
    )
    cues = parse_srt(doc)
    assert cues == [
        {"start_ms": 0, "end_ms": 2500, "text": "Hello there"},
        {"start_ms": 3000, "end_ms": 5000, "text": "Second cue\nsecond line"},
    ]
    info = subtitle_payload_info(doc)
    assert info["format"] == "srt"
    assert info["transcript"] == "Hello there Second cue second line"
    assert info["duration_ms"] == 5000 and info["speech_ms"] == 4500
    assert info["gap_ratio"] == round(1 - 4500 / 5000, 6)


def test_vtt_exact_with_markup_and_settings():
    doc = (
        "WEBVTT\n\n"
        "NOTE this block is skipped\n\n"
        "intro\n00:01.000 --> 00:03.000 align:start position:10%\n"
        "<i>Styled</i> <c.yellow>text</c>\n\n"
        "01:00:00.000 --> 01:00:02.000\nhour field\n"
    )
    cues = parse_vtt(doc)
    assert cues[0] == {"start_ms": 1000, "end_ms": 3000, "text": "Styled text"}
    assert cues[1]["start_ms"] == 3_600_000
    info = subtitle_payload_info(doc)
    assert info["format"] == "vtt" and info["n_cues"] == 2


def test_crlf_and_missing_counter_tolerated():
    doc = "00:00:00,000 --> 00:00:01,000\r\nline\r\n\r\n"
    assert parse_srt(doc)[0]["text"] == "line"


def test_malformed_raises():
    for bad in ("", "not subs at all", "WEBVTT\n\nno cues here"):
        with pytest.raises(ValueError):
            subtitle_payload_info(bad)
    with pytest.raises(ValueError):
        parse_vtt("00:00:00.000 --> 00:00:01.000\nno magic\n")


def test_writer_round_trip_closed_form():
    doc = subtitle_bytes(4, cue_ms=2000, gap_ms=500, vtt=True, seed=7)
    info = subtitle_payload_info(doc)
    assert info["format"] == "vtt" and info["n_cues"] == 4
    assert info["speech_ms"] == 4 * 2000
    assert info["duration_ms"] == 3 * 2500 + 2000
    assert info["transcript"] == " ".join(
        f"cue 7-{k} words" for k in range(4)
    )


def test_operator_with_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["format"], r["transcript"], r["n_cues"],
         r["duration_ms"], r["speech_ms"])
        for r in subtitle_extract(synth_subtitle_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            WITH p AS (
              SELECT id, 3 + id % 5 AS n, 1500 + (id % 4) * 250 AS cue,
                     300 + (id % 3) * 100 AS gap, 11 + id AS seed
              FROM range(30) t(id)),
            x AS (
              SELECT p.*, string_agg('cue ' || seed || '-' || k || ' words',
                                     ' ' ORDER BY k) AS transcript
              FROM p JOIN range(7) s(k) ON s.k < p.n
              GROUP BY ALL)
            SELECT id AS media_id,
                   CASE WHEN id % 2 = 1 THEN 'vtt' ELSE 'srt' END AS format,
                   transcript,
                   n AS n_cues,
                   (n - 1) * (cue + gap) + cue AS duration_ms,
                   n * cue AS speech_ms
            FROM x
            """
        ).fetchall()
    )
    assert rows == duck
    # gap_ratio checked against the Python closed form (float rounding
    # differs between DuckDB and Python at the 6th decimal on ties)
    got = {
        r["media_id"]: r["gap_ratio"]
        for r in subtitle_extract(synth_subtitle_media(spark, 30)).collect()
    }
    for i in range(30):
        n, cue, gap = 3 + i % 5, 1500 + (i % 4) * 250, 300 + (i % 3) * 100
        dur = (n - 1) * (cue + gap) + cue
        assert got[i] == round(1 - n * cue / dur, 6)


def test_on_error_policy(spark):
    bad = spark.createDataFrame(
        [(1, "WEBVTT\n\nbroken")], "media_id long, payload string"
    )
    assert subtitle_extract(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        subtitle_extract(bad, on_error="raise").collect()


def test_bom_prefixed_webvtt_routes_as_vtt():
    # W3C allows an optional U+FEFF before the magic (review finding)
    doc = "﻿WEBVTT\n\n00:01.000 --> 00:03.000\n<i>styled</i> text\n"
    info = subtitle_payload_info(doc)
    assert info["format"] == "vtt"
    assert info["transcript"] == "styled text"  # markup stripped
