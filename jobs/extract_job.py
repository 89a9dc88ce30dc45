"""spark-submit entrypoint for the extraction pipeline.

    spark-submit --py-files dist/tl_spark.zip jobs/extract_job.py \
        --input  /path/to/transcripts_parquet \
        --output /path/to/extracted \
        [--buckets 64] [--salt-k 8] [--salt-threshold 1000] [--no-resume]

On a cluster, add the usual --master/--num-executors flags; the job
code is identical (it only ever talks to the SparkSession). Resume
semantics: re-running with the same --output skips buckets recorded in
the ledger and idempotently rewrites incomplete ones (dynamic
partition overwrite).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--salt-k", type=int, default=8)
    ap.add_argument("--salt-threshold", type=int, default=1000)
    ap.add_argument("--bucket-group-size", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tl_spark.pipeline import run_extraction_job

    spark = SparkSession.builder.appName("tl_spark_extract").getOrCreate()
    # 50k-row Arrow batches measured best for the extraction kernel
    # (BENCH/BASELINE.md); an explicit spark-submit --conf wins
    batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    if not spark.sparkContext.getConf().contains(batch_key):
        spark.conf.set(batch_key, "50000")
    report = run_extraction_job(
        spark,
        args.input,
        args.output,
        n_buckets=args.buckets,
        salt_k=args.salt_k,
        salt_threshold=args.salt_threshold,
        bucket_group_size=args.bucket_group_size,
        resume=not args.no_resume,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
