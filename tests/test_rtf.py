"""RTF text extraction: tokenizer semantics (escapes, destinations,
group state), adversarial shapes, the Spark operator, and a
closed-form DuckDB oracle (tl_spark/operators/rtf.py)."""

import duckdb
import pytest

from tl_spark.operators.rtf import (
    rtf_bytes,
    rtf_extract,
    rtf_text,
    synth_rtf_media,
)


def test_basic_paragraphs_and_destination_skip():
    d = rtf_bytes(["hello world", "second para"])
    t, n = rtf_text(d)
    assert t == "hello world\nsecond para\n" and n == 2
    # fonttbl / \* destinations never leak
    assert "Times" not in t and "generator" not in t


def test_hex_unicode_tab_escapes():
    doc = rb"{\rtf1\ansi \'e9t\'e9 caf\'e9 \u233?x \tab end\par}"
    t, n = rtf_text(doc)
    assert t == "été café éx \tend\n" and n == 1


def test_uc_skip_counts_and_negative_unicode():
    # default \uc1: one fallback char eaten after \uN
    assert rtf_text(rb"{\rtf1 \u8364?EUR}")[0] == "€EUR"
    # \uc2 eats two, \uc0 eats none; negative N wraps mod 65536
    assert rtf_text(rb"{\rtf1\uc2 \u8364??x}")[0] == "€x"
    assert rtf_text(rb"{\rtf1\uc0 \u-10179\u-8704 }")[0] == (
        "\ud83d\ude00"  # surrogate halves, exactly as encoded
    )
    # group close restores the outer \uc state
    doc = rb"{\rtf1 {\uc0 \u65 }\u66?z}"
    assert rtf_text(doc)[0] == "ABz"


def test_control_symbols():
    t, _ = rtf_text(rb"{\rtf1 a\{b\}c\\d \~e}")
    assert t == "a{b}c\\d \xa0e"


def test_skipped_destinations_do_not_count_pars():
    doc = rb"{\rtf1{\header junk\par junk}body\par}"
    t, n = rtf_text(doc)
    assert t == "body\n" and n == 1


def test_malformed_contract():
    for bad in (b"", b"not rtf at all", b"{\\rtf1 unbalanced",
                b"{\\rtf1 }}"):
        with pytest.raises(ValueError):
            rtf_text(bad)


def test_operator_with_duckdb_oracle(spark):
    rows = sorted(
        (r["media_id"], r["text"], r["n_paragraphs"])
        for r in rtf_extract(synth_rtf_media(spark, 30)).collect()
    )
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            """
            WITH p AS (
              SELECT id, 2 + id % 4 AS n, 31 + id AS seed
              FROM range(30) t(id))
            SELECT p.id AS media_id,
                   string_agg('para ' || seed || '-' || k, chr(10)
                              ORDER BY k) || chr(10) AS text,
                   n AS n_paragraphs
            FROM p JOIN range(6) s(k) ON s.k < p.n
            GROUP BY ALL
            """
        ).fetchall()
    )
    assert rows == duck


def test_on_error_policy(spark):
    bad = spark.createDataFrame(
        [(4, bytearray(b"plain text"))], "media_id long, payload binary"
    )
    assert rtf_extract(bad, on_error="skip").count() == 0
    with pytest.raises(Exception):
        rtf_extract(bad, on_error="raise").collect()


def test_nested_ignorable_destination_stays_skipped():
    # a {\*...} nested inside an already-skipped {\*...} must not
    # reset the skip depth and leak the outer tail (review finding)
    doc = rb"{\rtf1 A{\*\outer metadata1 {\*\inner metadata2} metadata3 }B}"
    assert rtf_text(doc)[0] == "AB"


def test_bin_runs_never_leak_and_never_break_groups():
    # \binN raw bytes: never text, and embedded { } bytes must not
    # disturb group tracking (review finding)
    doc = b"{\\rtf1 {\\pict\\bin4 \x89}{x} after}"
    t, _ = rtf_text(doc)
    assert t == " after"
    # binary run OUTSIDE a skipped destination is still dropped
    doc = b"{\\rtf1 pre\\bin3 \x00}\x01mid}"
    assert rtf_text(doc)[0] == "premid"
    with pytest.raises(ValueError):
        rtf_text(b"{\\rtf1 \\bin99 short}")
