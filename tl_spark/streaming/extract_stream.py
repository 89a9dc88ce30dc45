"""Structured Streaming variant of the extraction pipeline.

The Arrow-batch kernel is stateless, so it drops into a streaming
plan unchanged: readStream -> mapInArrow -> writeStream with exactly
-once parquet sink semantics via the checkpoint. Late-data handling
for the stateful aggregation helper uses an event-time watermark on
``ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tl_spark.functions.extract import extract_main_content


def run_streaming_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    passthrough: list[str] | None = None,
) -> None:
    """Drain ``input_path`` (parquet dir) through the extraction kernel
    into ``output_path`` with availableNow semantics (batch-parity run;
    on a live stream you'd use a processingTime trigger instead)."""
    schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)
    ex = extract_main_content(
        stream,
        text_col="text",
        passthrough=passthrough or ["conv_id", "turn_idx", "role", "tool", "ts"],
    )
    q = (
        ex.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_turn_counts(stream_df: DataFrame, lateness: str = "10 minutes") -> DataFrame:
    """Windowed per-conversation turn counts with late-data watermark."""
    return (
        stream_df.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 minute").alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select("w.start", "w.end", "conv_id", "n_turns")
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each distinct
    text within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` on the 256-bit text digest —
    state holds one (digest, ts) pair per distinct text and is evicted
    once older than the watermark, so state size is bounded by the
    dedup horizon, not the stream length. That bound is what makes the
    operator viable on an unbounded 10^12-turn stream (a global
    dropDuplicates would grow state forever).
    """
    hashed = stream_df.withColumn(
        "_text_hash", F.sha2(F.col(text_col), 256)
    )
    return hashed.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["_text_hash"]
    ).drop("_text_hash")


def run_streaming_curation(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    quality_min: float = 0.2,
    min_tokens: int = 2,
    dedup_lateness: str = "10 minutes",
) -> None:
    """Streaming counterpart of the batch curation job's STATELESS +
    bounded-state stages: extract -> text stats -> exact dedup within
    the watermark horizon -> quality/length filters -> PII redaction.

    Near-dup LSH stays batch-only by design: its self-join needs the
    corpus-wide signature table, which has no bounded-state streaming
    formulation — at 10^12-turn scale the standard architecture is
    this stream for ingest-time hygiene plus a periodic batch
    :func:`tl_spark.curation.curate` compaction over the accumulated
    output (the resume-ledger pipeline makes the batch pass
    idempotent).

    Every stage is a stateless projection except the dedup, whose
    state is bounded by ``dedup_lateness`` (see
    :func:`streaming_exact_dedup`); the whole plan therefore runs
    with exactly-once parquet sink semantics from the checkpoint.
    """
    from tl_spark.functions.text import (
        lang_guess,
        pii_redact,
        quality_score,
        token_count,
    )

    schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)
    ex = extract_main_content(
        stream,
        text_col="text",
        passthrough=["conv_id", "turn_idx", "role", "ts"],
    ).withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))
    deduped = streaming_exact_dedup(
        ex, text_col="extracted_text", lateness=dedup_lateness
    )
    c = F.col("extracted_text")
    curated = (
        deduped.withColumn("n_tokens", token_count(c))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_guess", lang_guess(c))
        .filter(
            (F.col("quality") >= quality_min)
            & (F.col("n_tokens") >= min_tokens)
        )
        .withColumn("extracted_text", pii_redact(c))
    )
    q = (
        curated.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_incremental_neardup(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    output_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> None:
    """Streaming near-dup flagging against a PERSISTED corpus MinHash
    index (:mod:`tl_spark.operators.dedup_index`): every micro-batch
    is sketched and broadcast against the static on-disk index via
    ``foreachBatch``.

    This closes the gap :func:`run_streaming_curation` documents:
    WITHIN-stream near-dup has no bounded-state streaming formulation,
    but stream-vs-CORPUS near-dup does — per-batch work is
    O(batch), streaming state is ZERO (the index lives on disk), and
    the production question "is this incoming doc a dup of anything
    we already have?" is answered at ingest time.

    Idempotence under retries: matches are written with dynamic
    partition overwrite keyed by ``_batch_id`` — a replayed batch
    overwrites its own partition instead of appending duplicates
    (the same shape as the batch pipeline's bucket rewrites), so the
    sink is effectively exactly-once from the checkpoint.
    """
    schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from tl_spark.cache import unpersist_handles
        from tl_spark.operators.dedup_index import incremental_neardup

        out = incremental_neardup(
            batch_df, index_path,
            text_col=text_col, id_col=id_col, threshold=threshold,
        )
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(output_path)
        )
        unpersist_handles(out)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_pdf_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    columns: str = "off",
) -> None:
    """Streaming variant of the PDF text/layout kernel: drain a
    parquet dir of (doc_id, payload) PDF rows through
    :func:`tl_spark.operators.pdf.pdf_text_pages` into a parquet sink
    with exactly-once checkpoint semantics. The kernel is stateless
    (map-only mapInArrow), so the batch plan drops into the streaming
    plan unchanged — identical outputs to the batch op on the same
    input (batch-parity test)."""
    from tl_spark.operators.pdf import pdf_text_pages

    schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)
    out = pdf_text_pages(
        stream,
        id_col=id_col,
        payload_col=payload_col,
        on_error="skip",
        columns=columns,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
