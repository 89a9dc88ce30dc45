"""spark-submit entrypoint for the MinHash dedup index.

Build the corpus index once:

    spark-submit --py-files dist/tl_spark.zip jobs/index_job.py build \
        --input /path/to/docs_parquet --index /path/to/index \
        [--n-hashes 32] [--bands 8] [--shingle-k 5] [--sample-mod M]

Check an increment against it (O(increment) per ingest):

    spark-submit --py-files dist/tl_spark.zip jobs/index_job.py check \
        --input /path/to/new_docs_parquet --index /path/to/index \
        --output /path/to/matches [--threshold 0.8]

The input parquet needs (doc_id long, text string) columns (override
with --id-col/--text-col). Prints ONE JSON report line to stdout.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "check"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-hashes", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--sample-mod", type=int, default=None)
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"tl-index-{args.mode}").getOrCreate()
    try:
        df = spark.read.parquet(args.input)
        if args.mode == "build":
            from tl_spark.operators.dedup_index import write_minhash_index

            report = write_minhash_index(
                df,
                args.index,
                text_col=args.text_col,
                id_col=args.id_col,
                n_hashes=args.n_hashes,
                bands=args.bands,
                shingle_k=args.shingle_k,
                sample_mod=args.sample_mod,
            )
        else:
            if not args.output:
                raise SystemExit("check mode requires --output")
            from tl_spark.cache import unpersist_handles
            from tl_spark.operators.dedup_index import incremental_neardup

            out = incremental_neardup(
                df,
                args.index,
                text_col=args.text_col,
                id_col=args.id_col,
                threshold=args.threshold,
            )
            out.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
            unpersist_handles(out)
            report = {
                "matches": n,
                "threshold": args.threshold,
                "output": args.output,
            }
        print(json.dumps(report))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
