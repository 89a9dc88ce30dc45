"""spark-submit entrypoint for WARC crawl extraction.

    spark-submit --py-files dist/tl_spark.zip jobs/warc_job.py \
        --input '/path/to/crawl/*.warc.gz' --output /path/to/extracted \
        [--on-error skip|raise]

Reads .warc / .warc.gz archives (one task per archive — the Common
Crawl unit of parallelism), keeps 200 text/html responses, runs the
Arrow-batch extraction kernel, writes parquet, and prints ONE JSON
report line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--on-error", default="skip", choices=["skip", "raise"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tl_spark.sources.warc import extract_warc_html, read_warc

    spark = SparkSession.builder.appName("tl-warc-extract").getOrCreate()
    try:
        out = extract_warc_html(spark, args.input, on_error=args.on_error)
        out.write.mode("overwrite").parquet(args.output)
        written = spark.read.parquet(args.output)
        n_rows = written.count()
        n_records = read_warc(
            spark, args.input, on_error=args.on_error
        ).count()
        print(
            json.dumps(
                {
                    "warc_records": n_records,
                    "html_extracted": n_rows,
                    "output": args.output,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
