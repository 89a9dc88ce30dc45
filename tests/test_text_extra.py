"""Rolling-hash fingerprint + watermarked streaming aggregation."""

import pyspark.sql.functions as F


def test_rolling_fingerprint(spark):
    from tl_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [
            (1, "hello world this is a longer document for rolling"),
            (2, "prefix added " + "hello world this is a longer document for rolling"),
            (3, "totally different content with nothing shared at all!"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["rfp"]
        for r in df.select(
            "doc_id", rolling_fingerprint(F.col("text")).alias("rfp")
        ).collect()
    }
    # naive reference for doc 1
    B, M, w = 1000003, 1 << 64, 16
    t = "hello world this is a longer document for rolling".encode()

    def h(seg):
        x = 0
        for b in seg:
            x = (x * B + b) % M
        return x

    want = min(h(t[j:j + w]) for j in range(len(t) - w + 1))
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert out[1] == want
    # min-window fingerprint is append/prepend robust when the minimal
    # window is shared
    assert out[1] == out[2] or out[2] is not None
    assert out[1] != out[3]
    assert out[4] == 0


def test_streaming_watermarked_counts(spark, tmp_path):
    from tl_spark.sources.transcripts import synth_transcripts
    from tl_spark.streaming.extract_stream import streaming_turn_counts

    inp = str(tmp_path / "in")
    df = synth_transcripts(spark, n_convs=8, median_turns=6, skew_mult=2)
    df.coalesce(2).write.mode("overwrite").parquet(inp)
    schema = spark.read.parquet(inp).schema
    stream = spark.readStream.schema(schema).parquet(inp)
    agg = streaming_turn_counts(stream, lateness="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select sum(n_turns) as s from wm_counts").collect()[0]["s"]
    # append mode emits only windows closed by the watermark; with one
    # batch the open tail windows are withheld — emitted must be <= total
    total = df.count()
    assert got is None or got <= total
    # the same aggregation in batch mode (watermark is a no-op there)
    # accounts for every turn — shape & semantics check
    batch = streaming_turn_counts(spark.read.parquet(inp), "5 minutes")
    assert batch.agg(F.sum("n_turns")).collect()[0][0] == total
    assert batch.columns == ["start", "end", "conv_id", "n_turns"]


# ------------------------------------------------- round-3 additions


def test_dup_word_frac_edges(spark):
    from tl_spark.functions.text import dup_word_frac

    rows = [
        (1, "a a a a"),          # 3/4 duplicated
        (2, "all words unique"),  # 0
        (3, ""),                  # empty -> 0.0, not null
        (4, "x"),                 # single token -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", dup_word_frac(F.col("text")).alias("f")).collect()
    }
    assert got == {1: 0.75, 2: 0.0, 3: 0.0, 4: 0.0}


def test_pii_redact_patterns_and_order(spark):
    from tl_spark.functions.text import pii_counts, pii_redact

    rows = [
        (1, "mail me at jo.doe+x@sub.example.org please"),
        (2, "server at 192.168.001.1 responded"),
        (3, "call +1 555 010-99 42 now"),
        # the dotted quad must become [IP], NOT feed the phone rule
        (4, "at 10.0.0.1 tel 555 123 4567 ok"),
        (5, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_e, n_i, n_p = pii_counts(F.col("text"))
    got = {
        r["doc_id"]: (r["red"], r["e"], r["i"], r["p"])
        for r in df.select(
            "doc_id",
            pii_redact(F.col("text")).alias("red"),
            n_e.alias("e"), n_i.alias("i"), n_p.alias("p"),
        ).collect()
    }
    assert got[1] == ("mail me at [EMAIL] please", 1, 0, 0)
    assert got[2] == ("server at [IP] responded", 0, 1, 0)
    assert got[3] == ("call [PHONE] now", 0, 0, 1)
    assert got[4] == ("at [IP] tel [PHONE] ok", 0, 1, 1)
    assert got[5] == ("no pii here at all", 0, 0, 0)


def test_pii_redact_spark_duckdb_parity_on_adversarial_corpus(spark):
    """The PII oracle's value-exactness rests on Java regex and
    RE2/DuckDB agreeing on the three patterns. Pin that on 200
    deterministic adversarial strings (half-formed emails, over-long
    dotted quads, digit runs with mixed separators, pattern
    concatenations) — far nastier than the injected driver corpus.
    Whitespace is restricted to space/tab/newline (Java \\s includes
    \\x0B, RE2's does not; the tokenizer oracles share that documented
    restriction and the synthetic tables contain no vertical tabs)."""
    import duckdb

    from tl_spark.functions.text import pii_redact

    frags = [
        "a@b.co", "a@b.c", "@example.com", "user@", "u.x+y@e-f.org",
        "1.2.3.4", "999.999.999.999", "1.2.3.4.5", "10.0.0", "0.0.0.0",
        "+1 555 010 9942", "12345678", "123456789", "1-2-3-4-5-6-7-8",
        "+49 30 123456", "tel+4930123456x", "1 2 3 4 5 6 7 8 9",
        "a@b.cd 1.2.3.4", "1.2.3.4a@b.cd", "x@y.zz+1 222 333 4444",
        ".", "@", "+", "-", " ", "\t", "\n", "a", "1",
    ]
    rows = []
    for i in range(200):
        a = frags[i % len(frags)]
        b = frags[(i * 7 + 3) % len(frags)]
        c = frags[(i * 13 + 5) % len(frags)]
        rows.append((i, f"w{i} {a} m{a}{b} {b}{c} end"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", pii_redact(F.col("text")).alias("red")
        ).collect()
    }
    con = duckdb.connect()
    con.register("adv", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    import tl_spark.queries as Q

    duck = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '{Q._PII_EMAIL_RE}', '[EMAIL]', 'g'),
                     '{Q._PII_IP_RE}', '[IP]', 'g'),
                     '{Q._PII_PHONE_RE}', '[PHONE]', 'g') AS red
            FROM adv ORDER BY doc_id
            """
        ).fetchall()
    )
    assert got == duck


def test_script_profile_hand_cases_and_duckdb_parity(spark):
    """script_counts/dominant_script: hand-checked mixed-script docs,
    plus Java-regex-vs-RE2 parity on the major scripts (DuckDB counts
    the same \\p{Script} classes over the documents corpus)."""
    import duckdb
    import pyspark.sql.functions as F

    from tl_spark.functions.text import dominant_script, script_counts

    rows = [
        (1, "hello world"),
        (2, "привет мир"),
        (3, "你好世界"),
        (4, "hello привет mixed"),
        (5, "مرحبا"),
        (6, "123 !!! ..."),
        (7, "こんにちは カタカナ"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["sc"].asDict(), r["dom"])
        for r in df.select(
            "id",
            script_counts(F.col("text")).alias("sc"),
            dominant_script(F.col("text")).alias("dom"),
        ).collect()
    }
    assert got[1][1] == "latin" and got[1][0]["latin"] == 10
    assert got[2][1] == "cyrillic"
    assert got[3] == ({**{k: 0 for k in got[3][0]}, "han": 4}, "han")
    assert got[4][0]["latin"] == 10 and got[4][0]["cyrillic"] == 6
    assert got[5][1] == "arabic"
    assert got[6][1] == "none"
    assert got[7][0]["hiragana"] == 5 and got[7][0]["katakana"] == 4

    # cross-engine parity on real corpus text
    path = "/root/testdata/sf0.01/documents.parquet"
    docs = spark.read.parquet(path).filter(F.col("doc_id") < 200)
    sp = {
        r["doc_id"]: r["sc"].asDict()
        for r in docs.select(
            "doc_id", script_counts(F.col("text")).alias("sc")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    duck = con.execute(
        """
        SELECT doc_id,
               length(regexp_replace(text, '[^\\p{Latin}]', '', 'g')),
               length(regexp_replace(text, '[^\\p{Cyrillic}]', '', 'g')),
               length(regexp_replace(text, '[^\\p{Han}]', '', 'g'))
        FROM documents WHERE doc_id < 200
        """
    ).fetchall()
    for doc_id, lat, cyr, han in duck:
        assert sp[doc_id]["latin"] == lat, doc_id
        assert sp[doc_id]["cyrillic"] == cyr, doc_id
        assert sp[doc_id]["han"] == han, doc_id


GOPHER_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         list_filter(regexp_split_to_array(text, '\n{2,}'), x -> x <> '')
           AS paras,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
           AS toks
  FROM documents
), seg AS (
  SELECT doc_id, text, toks,
         CASE WHEN len(lines) > 0 THEN
           ROUND(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                 / len(lines), 6) ELSE 0.0 END AS dup_line_frac,
         CASE WHEN list_sum(list_transform(lines, x -> length(x))) > 0 THEN
           ROUND(1.0 - CAST(list_sum(list_transform(list_distinct(lines),
                 x -> length(x))) AS DOUBLE)
                 / list_sum(list_transform(lines, x -> length(x))), 6)
           ELSE 0.0 END AS dup_line_char_frac,
         CASE WHEN len(paras) > 0 THEN
           ROUND(1.0 - CAST(len(list_distinct(paras)) AS DOUBLE)
                 / len(paras), 6) ELSE 0.0 END AS dup_para_frac,
         CASE WHEN list_sum(list_transform(paras, x -> length(x))) > 0 THEN
           ROUND(1.0 - CAST(list_sum(list_transform(list_distinct(paras),
                 x -> length(x))) AS DOUBLE)
                 / list_sum(list_transform(paras, x -> length(x))), 6)
           ELSE 0.0 END AS dup_para_char_frac
  FROM t
), bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
  FROM t, UNNEST(range(1, len(toks))) AS r(i)
), topg AS (
  SELECT doc_id, gram, count(*) AS c,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY count(*) DESC, gram) AS rn
  FROM bg GROUP BY doc_id, gram
)
SELECT s.doc_id,
       s.dup_line_frac, s.dup_line_char_frac,
       s.dup_para_frac, s.dup_para_char_frac,
       COALESCE(
         CASE WHEN length(s.text) > 0 AND len(s.toks) >= 2 THEN
           ROUND(CAST(g.c AS DOUBLE) * length(g.gram) / length(s.text), 6)
         END, 0.0) AS top_bigram_char_frac
FROM seg s LEFT JOIN topg g ON g.doc_id = s.doc_id AND g.rn = 1
ORDER BY s.doc_id
"""


def test_gopher_repetition_battery_matches_duckdb(spark):
    """Suite-oracle for the full Gopher repetition battery: dup line/
    paragraph fractions (count + char-mass) and top-bigram coverage,
    exact vs the DuckDB re-expression on the sf0.01 corpus UNION
    adversarial repetition shapes."""
    import duckdb

    from tl_spark.functions.text import gopher_repetition

    extra = [
        (900001, "spam\nspam\nspam\nham"),
        (900002, "para one\n\npara one\n\n\npara two"),
        (900003, "a b a b a b a b"),
        (900004, ""),
        (900005, "single"),
        (900006, "x\n\nx\n\nx"),
        (900007, "one two one two three\none two again"),
    ]
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = base.select("doc_id", "text").unionByName(
        spark.createDataFrame(extra, "doc_id long, text string")
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in df.select("doc_id", *gopher_repetition(F.col("text")))
        .drop("dup_word_frac")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        "SELECT * FROM '/root/testdata/sf0.01/documents.parquet' "
        "UNION ALL SELECT doc_id, text, NULL lang, NULL source,"
        " NULL n_chars FROM (VALUES "
        + ",".join(
            f"({i}, '{t}')".replace("\n", "' || chr(10) || '")
            for i, t in extra
        )
        + ") v(doc_id, text)"
    )
    exp = {r[0]: tuple(r)[1:] for r in con.execute(GOPHER_SQL).fetchall()}
    assert set(got) == set(exp)
    mism = [k for k in got if got[k] != exp[k]]
    assert not mism, (mism[:3], [(got[k], exp[k]) for k in mism[:2]])


def test_fingerprint_arrow_matches_jvm(spark):
    """The round-8 Arrow fingerprint kernel must be bit-equal to the
    JVM expression chain — incl. multi-byte UTF-8 (each byte of a
    stripped char widens the separator, never a token), tabs/newlines,
    empty and punctuation-only docs."""
    from tl_spark.functions.text import fingerprint, fingerprint_arrow

    extra = [
        (900001, ""),
        (900002, "   "),
        (900003, "..!?;"),
        (900004, "Héllo wörld   mixé"),
        (900005, "tabs\tand\nnewlines\r kept?"),
        (900006, "ZEBRA apple Zebra APPLE 42 42"),
        (900007, "café 中文 token"),
    ]
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = base.select("doc_id", "text").unionByName(
        spark.createDataFrame(extra, "doc_id long, text string")
    )
    jvm = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["fp"] for r in fingerprint_arrow(df).collect()
    }
    assert jvm == arrow
