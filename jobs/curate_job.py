"""spark-submit entrypoint for the corpus-curation pipeline.

    spark-submit --py-files dist/tl_spark.zip jobs/curate_job.py \
        --input  /path/to/transcripts_parquet \
        --output /path/to/curated \
        [--quality-min 0.2] [--min-tokens 2] [--neardup-jaccard 0.85] \
        [--max-dup-word-frac F] [--lm-score-min F] [--normalize] \
        [--benchmark /path/to/benchmark_parquet] [--contamination-n 13]

Runs extract -> normalize? -> stats -> exact dedup -> MinHash near-dup
-> decontamination? -> repetition? -> LM gate? -> quality/length
filters in a single pass (shared DAG prefix cached once), writes
``--output`` (curated) and ``--output``_dropped (doc_uid +
drop_reason), and prints ONE JSON report line to stdout. On a
cluster, add the usual --master/--num-executors flags — the job only
ever talks to the SparkSession.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--quality-min", type=float, default=0.2)
    ap.add_argument("--min-tokens", type=int, default=2)
    ap.add_argument("--neardup-jaccard", type=float, default=0.85)
    ap.add_argument("--max-dup-word-frac", type=float, default=None)
    ap.add_argument("--lm-score-min", type=float, default=None)
    ap.add_argument("--substring-min-shared", type=int, default=None)
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument(
        "--neardup-mode", default="pairs", choices=["pairs", "clusters"]
    )
    ap.add_argument("--benchmark", default=None)
    ap.add_argument("--contamination-n", type=int, default=13)
    ap.add_argument(
        "--classifier-model", default=None,
        help="JSON file with a train_text_classifier model dict "
        "(enables the low_score gate)",
    )
    ap.add_argument("--classifier-min", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tl_spark.curation import run_curation_job

    spark = SparkSession.builder.appName("tl-curate").getOrCreate()
    try:
        benchmark = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        classifier_model = None
        if args.classifier_model:
            with open(args.classifier_model) as fh:
                classifier_model = json.load(fh)
        report = run_curation_job(
            spark,
            args.input,
            args.output,
            quality_min=args.quality_min,
            min_tokens=args.min_tokens,
            neardup_jaccard=args.neardup_jaccard,
            max_dup_word_frac=args.max_dup_word_frac,
            lm_score_min=args.lm_score_min,
            substring_min_shared=args.substring_min_shared,
            normalize=args.normalize,
            neardup_mode=args.neardup_mode,
            benchmark=benchmark,
            contamination_n=args.contamination_n,
            classifier_model=classifier_model,
            classifier_min=args.classifier_min,
        )
        print(json.dumps(report))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
