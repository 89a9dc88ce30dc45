"""Stateful streaming: state persists across micro-batches AND across
separate availableNow runs sharing a checkpoint (stream resume)."""

import pyspark.sql.functions as F


def _run_stream(spark, inp, ckpt, schema, outp):
    from tl_spark.streaming.stateful import conversation_progress

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(inp)
    out = conversation_progress(stream)
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", outp)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_state_survives_restart(spark, tmp_path):
    from tl_spark.sources.transcripts import synth_transcripts

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    df = synth_transcripts(spark, n_convs=10, median_turns=6, skew_mult=2)
    first = df.filter(F.col("turn_idx") < 3)
    rest = df.filter(F.col("turn_idx") >= 3)
    first.coalesce(4).write.mode("overwrite").parquet(inp)
    schema = spark.read.parquet(inp).schema

    outp = str(tmp_path / "out")
    _run_stream(spark, inp, ckpt, schema, outp)
    got1 = {
        r["conv_id"]: r["turns_seen"]
        for r in spark.read.parquet(outp)
        .groupBy("conv_id")
        .agg(F.max("turns_seen").alias("turns_seen"))
        .collect()
    }
    want1 = {
        r["conv_id"]: r["cnt"]
        for r in first.groupBy("conv_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got1 == want1

    # append late data, resume from the same checkpoint: counters CONTINUE
    rest.coalesce(4).write.mode("append").parquet(inp)
    _run_stream(spark, inp, ckpt, schema, outp)
    final = spark.read.parquet(outp)
    got2 = {
        r["conv_id"]: r["turns_seen"]
        for r in final.groupBy("conv_id")
        .agg(F.max("turns_seen").alias("turns_seen"))
        .collect()
    }
    want_total = {
        r["conv_id"]: r["cnt"]
        for r in df.groupBy("conv_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got2 == want_total
    # max_turn_idx reflects the full history
    mti = {
        r["conv_id"]: r["m"]
        for r in final.groupBy("conv_id")
        .agg(F.max("max_turn_idx").alias("m"))
        .collect()
    }
    want_mti = {
        r["conv_id"]: r["m"]
        for r in df.groupBy("conv_id").agg(F.max("turn_idx").alias("m")).collect()
    }
    assert mti == want_mti


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicate texts within the watermark horizon are emitted once
    (first arrival wins); distinct texts all pass through."""
    import pyspark.sql.functions as F

    from tl_spark.streaming.extract_stream import streaming_exact_dedup

    inp = str(tmp_path / "in")
    rows = [
        ("a", 1, "hello world", "2024-01-01 00:00:00"),
        ("a", 2, "hello world", "2024-01-01 00:00:30"),   # dup, in horizon
        ("b", 1, "something else", "2024-01-01 00:01:00"),
        ("b", 2, "hello world", "2024-01-01 00:02:00"),   # dup, in horizon
        ("c", 1, "third text", "2024-01-01 00:03:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts_s string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(inp)

    stream = spark.readStream.schema(
        spark.read.parquet(inp).schema
    ).parquet(inp)
    deduped = streaming_exact_dedup(stream, lateness="10 minutes")
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out).collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["hello world", "something else", "third text"]


def test_streaming_incremental_neardup_vs_index(spark, tmp_path):
    """Stream an increment against a persisted corpus MinHash index:
    the streamed matches equal the direct batch incremental_neardup
    on the same files, and re-running from the same checkpoint
    processes nothing new (no duplicate rows — the exactly-once
    shape)."""
    import pyspark.sql.functions as F

    from tl_spark.cache import unpersist_handles
    from tl_spark.operators.dedup_index import (
        incremental_neardup,
        write_minhash_index,
    )
    from tl_spark.streaming.extract_stream import (
        run_streaming_incremental_neardup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "jumping through the long afternoon sun without any rest"
    )
    corpus = spark.createDataFrame(
        [(1, base), (2, "entirely different corpus text right here")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    write_minhash_index(corpus, index_path)

    increment = spark.createDataFrame(
        [(101, base + " tail"), (102, "novel unseen content only")],
        "doc_id long, text string",
    )
    in_path = str(tmp_path / "in")
    increment.write.parquet(in_path)

    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_incremental_neardup(
        spark, in_path, index_path, out_path, ckpt, threshold=0.3
    )
    got = [
        (r["id_new"], r["id_index"], r["est_jaccard"])
        for r in spark.read.parquet(out_path)
        .orderBy("id_new", "id_index")
        .collect()
    ]
    direct = incremental_neardup(
        spark.read.parquet(in_path), index_path, threshold=0.3
    )
    exp = [
        (r["id_new"], r["id_index"], r["est_jaccard"])
        for r in direct.orderBy("id_new", "id_index").collect()
    ]
    unpersist_handles(direct)
    assert got == exp
    assert len(got) >= 1 and all(r[0] == 101 for r in got)

    # replay from the same checkpoint: availableNow finds no new
    # files; output unchanged (no duplicate appends)
    run_streaming_incremental_neardup(
        spark, in_path, index_path, out_path, ckpt, threshold=0.3
    )
    assert spark.read.parquet(out_path).count() == len(got)
