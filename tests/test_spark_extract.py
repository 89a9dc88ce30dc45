"""End-to-end Spark extraction: Arrow kernel == kernel-direct results."""

import pyspark.sql.functions as F
import pytest

from tl_spark.functions.extract import extract_document, extract_main_content
from tl_spark.pipeline import read_ledger, run_extraction_job, stable_ordered
from tl_spark.sources.transcripts import synth_transcripts, write_transcripts


@pytest.fixture(scope="module")
def transcripts(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transcripts") / "t.parquet")
    df = synth_transcripts(spark, n_convs=60, median_turns=8, skew_mult=40)
    write_transcripts(df, path)
    return path


def test_extract_matches_kernel_direct(spark, transcripts):
    df = spark.read.parquet(transcripts)
    ex = extract_main_content(df, passthrough=["conv_id", "turn_idx"])
    rows = ex.collect()
    src = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in df.select("conv_id", "turn_idx", "text").collect()
    }
    assert len(rows) == len(src) and len(rows) > 400
    for r in rows:
        text = src[(r["conv_id"], r["turn_idx"])]
        want_text, want_spans, want_n, want_ver, want_err = extract_document(text)
        assert r["extracted_text"] == want_text, (r["conv_id"], r["turn_idx"])
        got_spans = (
            None
            if r["spans"] is None
            else [{"start": s["start"], "end": s["end"]} for s in r["spans"]]
        )
        assert got_spans == want_spans
        assert r["n_nodes"] == want_n
        assert r["html_version"] == want_ver
        assert r["error"] is None


def test_boilerplate_actually_stripped(spark, transcripts):
    df = spark.read.parquet(transcripts)
    ex = extract_main_content(df, passthrough=["conv_id"])
    bad = ex.filter(
        F.col("extracted_text").contains("chrome nav")
        | F.col("extracted_text").contains("color:red")
        | F.col("extracted_text").contains("var x")
    ).count()
    assert bad == 0
    # sanity: the nav/script templates do occur in the input
    assert df.filter(F.col("text").contains("chrome nav")).count() > 0


def test_column_pruning_reaches_scan(spark, transcripts):
    df = spark.read.parquet(transcripts)
    ex = extract_main_content(df, passthrough=["conv_id", "turn_idx"])
    plan = ex._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" in read_schema and "conv_id" in read_schema
    # untouched columns must NOT be read from parquet
    assert "role" not in read_schema
    assert "ts" not in read_schema


def test_pipeline_job_and_resume(spark, transcripts, tmp_path):
    out = str(tmp_path / "extracted")
    report = run_extraction_job(
        spark,
        transcripts,
        out,
        n_buckets=8,
        salt_k=4,
        salt_threshold=50,
        bucket_group_size=4,
    )
    n_in = spark.read.parquet(transcripts).count()
    assert report["buckets_written"] == 8
    assert report["rows_written"] == n_in
    assert read_ledger(out) == set(range(8))

    got = spark.read.parquet(out)
    assert got.count() == n_in
    # per-turn equality on the skewed conversation (conv c00000000)
    skew = got.filter(F.col("conv_id") == "c00000000")
    assert skew.count() == 8 * 40
    sample = skew.orderBy("turn_idx").limit(20).collect()
    src = (
        spark.read.parquet(transcripts)
        .filter(F.col("conv_id") == "c00000000")
        .orderBy("turn_idx")
        .limit(20)
        .collect()
    )
    for got_r, src_r in zip(sample, src):
        assert got_r["turn_idx"] == src_r["turn_idx"]
        assert got_r["extracted_text"] == extract_document(src_r["text"])[0]

    # resume: everything already in the ledger -> nothing re-written
    report2 = run_extraction_job(
        spark, transcripts, out, n_buckets=8, bucket_group_size=4
    )
    assert report2["buckets_written"] == 0
    assert report2["buckets_skipped"] == 8
    assert spark.read.parquet(out).count() == n_in


def test_stable_ordering_window(spark, transcripts):
    df = spark.read.parquet(transcripts).limit(0)
    # helper shape check only (window path is for test-scale verification)
    out = stable_ordered(spark.read.parquet(transcripts))
    r = (
        out.filter(F.col("conv_id") == "c00000001")
        .orderBy("turn_seq")
        .select("turn_idx")
        .collect()
    )
    idxs = [x["turn_idx"] for x in r]
    assert idxs == sorted(idxs)


def test_pipeline_heals_incomplete_bucket(spark, transcripts, tmp_path):
    """A bucket missing from the ledger (simulated crash mid-group) is
    rewritten on resume; completed buckets are untouched."""
    import json
    from pathlib import Path

    out = str(tmp_path / "extracted2")
    run_extraction_job(
        spark, transcripts, out, n_buckets=4, bucket_group_size=2
    )
    n_total = spark.read.parquet(out).count()

    # simulate a crash: bucket 3 never made it into the ledger and its
    # files are half-written (delete them outright)
    ledger = Path(out) / "_tl_ledger.json"
    ledger.write_text(json.dumps({"completed_buckets": [0, 1, 2]}))
    import shutil

    shutil.rmtree(Path(out) / "bucket=3")
    assert spark.read.parquet(out).count() < n_total

    report = run_extraction_job(
        spark, transcripts, out, n_buckets=4, bucket_group_size=2
    )
    assert report["buckets_written"] == 1
    assert report["buckets_skipped"] == 3
    assert spark.read.parquet(out).count() == n_total


def test_salting_splits_mega_conversation(spark, tmp_path):
    """Deterministic skew evidence: without salt, the mega conversation
    lands in ONE shuffle partition; with salt it spreads over salt_k."""
    from tl_spark.pipeline import salted_repartition

    df = synth_transcripts(spark, n_convs=40, median_turns=5, skew_mult=200)
    mega = "c00000000"  # 1000 turns vs ~5 for everyone else

    unsalted = df.repartition(16, F.col("conv_id"))
    u_parts = (
        unsalted.filter(F.col("conv_id") == mega)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert u_parts == 1

    salted = salted_repartition(
        df, n_buckets=16, salt_k=8, salt_threshold=100, num_partitions=64
    )
    s_parts = (
        salted.filter(F.col("conv_id") == mega)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert s_parts >= 4  # spread across (up to) salt_k reducers
    # non-skewed conversations keep a single partition (no extra shuffle
    # fan-out for the common case)
    other = (
        salted.filter(F.col("conv_id") == "c00000007")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert other == 1


def test_kernel_fault_rows_are_flagged_not_fatal():
    """A per-row kernel fault lands in the `error` column (row kept);
    the zero-decode fast path falls back to the row-tolerant path."""
    import pyarrow as pa

    from tl_spark.functions.extract import _make_arrow_fn

    class Boom:
        def __contains__(self, _):
            raise RuntimeError("boom")

    fn = _make_arrow_fn("text", ["doc_id"], Boom())
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([1, 2], type=pa.int64()),
            pa.array(["<p>x</p>", "plain"], type=pa.string()),
        ],
        names=["doc_id", "text"],
    )
    rows = list(fn(iter([batch])))[0].to_pylist()
    assert rows[0]["error"] is not None and "boom" in rows[0]["error"]
    assert rows[0]["extracted_text"] is None
    assert rows[1]["error"] is None  # tag-free fast path unaffected
    assert rows[1]["extracted_text"] == "plain"


# ----------------------------------------------- ledger robustness (r2)

def test_ledger_tolerates_torn_and_invalid_content(tmp_path):
    """Truncated JSON, non-dict JSON, wrong key, and unreadable bytes
    are all treated as an empty ledger (idempotent rewrites make
    redo-from-scratch safe); a valid ledger round-trips."""
    from tl_spark.pipeline import _write_ledger, read_ledger

    out = str(tmp_path / "out")
    ledger = tmp_path / "out" / "_tl_ledger.json"
    ledger.parent.mkdir(parents=True)

    ledger.write_text('{"completed_buckets": [0, 1')   # torn mid-write
    assert read_ledger(out) == set()
    ledger.write_text("[1, 2, 3]")                     # non-dict JSON
    assert read_ledger(out) == set()
    ledger.write_text('{"done": [1]}')                 # missing key
    assert read_ledger(out) == set()
    ledger.write_text("")                              # empty file
    assert read_ledger(out) == set()

    _write_ledger(out, {3, 1, 2})
    assert read_ledger(out) == {1, 2, 3}


def test_ledger_remote_uri_requires_spark_session():
    import pytest as _pytest

    from tl_spark.pipeline import _write_ledger, read_ledger

    with _pytest.raises(ValueError, match="SparkSession"):
        read_ledger("s3://bucket/out")
    with _pytest.raises(ValueError, match="SparkSession"):
        _write_ledger("s3://bucket/out", {1})


def test_ledger_hadoop_fs_roundtrip(spark, tmp_path):
    """URI-schemed output paths go through the Hadoop FileSystem API
    (exercised here with file:// against the local FS): write, read
    back, overwrite, and torn-content tolerance."""
    from tl_spark.pipeline import _write_ledger, read_ledger

    out = "file://" + str(tmp_path / "hout")
    assert read_ledger(out, spark) == set()
    _write_ledger(out, {0, 5}, spark)
    assert read_ledger(out, spark) == {0, 5}
    _write_ledger(out, {0, 5, 7}, spark)
    assert read_ledger(out, spark) == {0, 5, 7}
    # torn content on the hadoop path is also treated as empty
    (tmp_path / "hout" / "_tl_ledger.json").write_text('{"completed_')
    assert read_ledger(out, spark) == set()


def test_jvm_fastpath_parity(spark):
    """The round-8 JVM fast-path branch must yield byte-identical rows
    to the kernel path for every row class it claims: null, empty,
    plain ASCII, multi-byte UTF-8 (octet spans!), and must route
    tagged rows to the kernel unchanged."""
    rows = [
        (1, None),
        (2, ""),
        (3, "plain text turn"),
        (4, "café héllo wörld"),
        (5, "<p>tagged</p>"),
        (6, "a > b still plain"),
        (7, "ends with angle <"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {
        r["doc_id"]: tuple(r)[1:]
        for r in extract_main_content(
            df, passthrough=["doc_id"]
        ).collect()
    }
    slow = {
        r["doc_id"]: tuple(r)[1:]
        for r in extract_main_content(
            df, passthrough=["doc_id"], jvm_fastpath=False
        ).collect()
    }
    assert fast == slow
