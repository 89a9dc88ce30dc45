"""In-process coverage for the spark-submit CLI mains.

The jobs are driven for real via spark-submit in verification, but
running their main() in-process (argv patched; getOrCreate reuses the
test session) pins the argument wiring and report contracts in CI.
"""

import json

import pytest

import numpy as np
import pyspark.sql.functions as F


def _run_main(monkeypatch, capsys, module, argv):
    from pyspark.sql import SparkSession

    monkeypatch.setattr("sys.argv", ["job"] + argv)
    # the jobs stop their session on exit; in-process that would kill
    # the shared test session — neutralize stop() for the call
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    module.main()
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_curate_job_main(spark, tmp_path, monkeypatch, capsys):
    import jobs.curate_job as J
    from tl_spark.sources.transcripts import (
        synth_transcripts,
        write_transcripts,
    )

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    write_transcripts(
        synth_transcripts(spark, n_convs=10, median_turns=4, skew_mult=2),
        inp,
    )
    report = _run_main(
        monkeypatch, capsys, J,
        ["--input", inp, "--output", outp,
         "--quality-min", "0.0", "--min-tokens", "1", "--normalize"],
    )
    assert report["rows_curated"] == spark.read.parquet(outp).count()
    assert report["rows_in"] == report["rows_curated"] + sum(
        report["dropped"].values()
    )


def test_index_job_main_build_and_check(spark, tmp_path, monkeypatch, capsys):
    import jobs.index_job as J

    rng = np.random.default_rng(5)
    texts = [
        " ".join(f"w{rng.integers(0, 10**9):09d}" for _ in range(20))
        for _ in range(8)
    ]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cpath = str(tmp_path / "corpus")
    corpus.write.parquet(cpath)
    idx = str(tmp_path / "idx")
    rep = _run_main(
        monkeypatch, capsys, J,
        ["build", "--input", cpath, "--index", idx],
    )
    assert rep["docs_indexed"] == 8
    inc = spark.createDataFrame(
        [(101, texts[3])], "doc_id long, text string"
    )
    ipath = str(tmp_path / "inc")
    inc.write.parquet(ipath)
    mpath = str(tmp_path / "matches")
    rep = _run_main(
        monkeypatch, capsys, J,
        ["check", "--input", ipath, "--index", idx,
         "--output", mpath, "--threshold", "0.5"],
    )
    assert rep["matches"] == 1
    m = spark.read.parquet(mpath).collect()[0]
    assert (m["id_new"], m["id_index"]) == (101, 3)


def test_crawl_job_main(spark, tmp_path, monkeypatch, capsys):
    import jobs.crawl_job as J
    from tl_spark.sources.warc import http_response_block, warc_bytes

    long = " ".join(
        f"token{i:03d} meaningful article content" for i in range(12)
    )

    def page(body):
        return http_response_block(
            (
                "<html><nav>chrome</nav><main><p>" + body
                + "</p></main></html>"
            ).encode()
        )

    recs = [
        ("response", f"http://big.example.com/p{k}", page(long + f" p{k}"))
        for k in range(4)
    ]
    recs.append(("response", "http://tiny.org/short", page("too short")))
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "c.warc.gz").write_bytes(warc_bytes(recs, gzip_members=True))
    outp = str(tmp_path / "corpus_out")
    rep = _run_main(
        monkeypatch, capsys, J,
        ["--input", str(d) + "/*.warc.gz", "--output", outp,
         "--max-per-host", "2", "--quality-min", "0.0",
         "--min-tokens", "10"],
    )
    assert rep["records_extracted"] == 5
    assert rep["corpus_rows"] == 2  # capped to 2; short page filtered
    hosts = (
        spark.read.parquet(outp)
        .select(F.try_parse_url(F.col("target_uri"), F.lit("HOST")))
        .collect()
    )
    assert all(r[0] == "big.example.com" for r in hosts)


def test_curate_job_main_with_classifier(spark, tmp_path, monkeypatch, capsys):
    """--classifier-model wires the low_score gate end to end: a
    constant-negative model drops every doc as low_score."""
    import jobs.curate_job as J
    from tl_spark.sources.transcripts import (
        synth_transcripts,
        write_transcripts,
    )

    inp = str(tmp_path / "in2")
    outp = str(tmp_path / "out2")
    write_transcripts(
        synth_transcripts(spark, n_convs=6, median_turns=3, skew_mult=2),
        inp,
    )
    model = {"w": [0.0] * 32, "b": -2.0, "dim": 32, "hash_fn": "xxhash64"}
    mpath = tmp_path / "model.json"
    mpath.write_text(json.dumps(model))
    report = _run_main(
        monkeypatch, capsys, J,
        ["--input", inp, "--output", outp,
         "--quality-min", "0.0", "--min-tokens", "1",
         "--neardup-jaccard", "1.01",
         "--classifier-model", str(mpath), "--classifier-min", "0.5"],
    )
    # sigmoid(-2) = 0.119 < 0.5 for every doc -> everything low_score
    # except exact dups (higher precedence)
    assert report["rows_curated"] == 0
    assert report["dropped"].get("low_score", 0) > 0
    assert report["rows_in"] == sum(report["dropped"].values())


def test_crawl_job_include_pdf(spark, tmp_path, monkeypatch, capsys):
    import jobs.crawl_job as J
    from tl_spark.operators.pdf import pdf_bytes
    from tl_spark.sources.warc import http_response_block, warc_bytes

    long = " ".join(
        f"token{i:03d} meaningful article content" for i in range(12)
    )
    html = http_response_block(
        ("<html><main><p>" + long + " htmlpage</p></main></html>").encode()
    )
    pdf = http_response_block(
        pdf_bytes(long + " pdfdoc", 0), content_type="application/pdf"
    )
    from tests.test_pdf import _linked_pdf

    linked = http_response_block(
        _linked_pdf(), content_type="application/pdf"
    )
    recs = [
        ("response", "http://site.example.com/page", html),
        ("response", "http://site.example.com/doc.pdf", pdf),
        ("response", "http://site.example.com/linked.pdf", linked),
    ]
    d = tmp_path / "crawlpdf"
    d.mkdir()
    (d / "c.warc.gz").write_bytes(warc_bytes(recs, gzip_members=True))
    outp = str(tmp_path / "corpus_pdf_out")
    frontier = str(tmp_path / "pdf_frontier")
    rep = _run_main(
        monkeypatch, capsys, J,
        ["--input", str(d) + "/*.warc.gz", "--output", outp,
         "--quality-min", "0.0", "--min-tokens", "10", "--include-pdf",
         "--pdf-outlinks-output", frontier],
    )
    assert rep["records_extracted"] == 3
    assert rep["corpus_rows"] == 2  # linked.pdf is too short -> filtered
    links = sorted(
        (r.target_uri, r.page_no, r.uri)
        for r in spark.read.parquet(frontier).collect()
    )
    assert links == [
        ("http://site.example.com/linked.pdf", 0, "http://ex.org/first"),
        ("http://site.example.com/linked.pdf", 0,
         "https://ex.org/chained?a=1&b=2"),
    ]
    rows = {
        r.media_type: r for r in spark.read.parquet(outp).collect()
    }
    assert set(rows) == {"html", "pdf"}
    # the PDF leg extracted real text through the ISO 32000 kernel
    assert "pdfdoc" in rows["pdf"].extracted_text
    assert rows["pdf"].n_pages >= 1
    # HTML rows carry spans; PDF rows null-fill them (and vice versa)
    assert rows["pdf"].spans is None
    assert rows["html"].n_pages is None


def test_crawl_job_outlinks_requires_include_pdf(monkeypatch, capsys):
    """--pdf-outlinks-output without --include-pdf is a usage error
    (the sidecar write lives under the PDF branch), not a silent no-op."""
    import jobs.crawl_job as J

    monkeypatch.setattr(
        "sys.argv",
        ["job", "--input", "x", "--output", "y",
         "--pdf-outlinks-output", "z"],
    )
    with pytest.raises(SystemExit) as ei:
        J.main()
    assert ei.value.code == 2
    assert "--include-pdf" in capsys.readouterr().err
