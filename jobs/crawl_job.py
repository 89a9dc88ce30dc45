"""spark-submit entrypoint for the full crawl-to-corpus pipeline.

    spark-submit --py-files dist/tl_spark.zip jobs/crawl_job.py \
        --input '/path/to/*.warc.gz' --output /path/to/corpus \
        [--max-per-host 1000] [--quality-min 0.2] [--min-tokens 20]

Composes the crawl-side operators end to end:
  WARC records -> 200 text/html -> extraction kernel (and, with
  --include-pdf, 200 application/pdf -> the ISO 32000 text/layout
  kernel, unioned at document grain) -> per-domain cap (C4-style
  diversity) -> exact dedup (first URL per digest) ->
  quality/length/script stats + filters -> parquet + one JSON report.

Every stage is an already-tested operator; the composition is the
"point the engine at a crawl" story. All map-only except the domain
cap (one window shuffle on host) and the dedup (one digest shuffle).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-per-host", type=int, default=1000)
    ap.add_argument("--quality-min", type=float, default=0.2)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--on-error", default="skip", choices=["skip", "raise"])
    ap.add_argument(
        "--include-pdf",
        action="store_true",
        help="also extract 200-status application/pdf responses through "
        "the ISO 32000 text/layout kernel and union them into the "
        "corpus (media_type column distinguishes html/pdf rows)",
    )
    ap.add_argument(
        "--pdf-outlinks-output",
        default=None,
        help="with --include-pdf: also write (warc_file, record_idx, "
        "target_uri, page_no, uri) PDF link annotations to this "
        "parquet path — the crawl-frontier sidecar",
    )
    ap.add_argument(
        "--keep-langs",
        default=None,
        help="comma-separated language allow-list (e.g. 'en,de'); "
        "filters on the n-gram-profile lang_id column",
    )
    args = ap.parse_args()
    if args.pdf_outlinks_output and not args.include_pdf:
        ap.error("--pdf-outlinks-output requires --include-pdf")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tl_spark.functions.text import (
        dominant_script,
        lang_guess,
        quality_score,
        token_count,
    )
    from tl_spark.operators.urls import cap_per_domain
    from tl_spark.sources.warc import extract_warc_html

    spark = SparkSession.builder.appName("tl-crawl").getOrCreate()
    try:
        ex = extract_warc_html(spark, args.input, on_error=args.on_error)
        ex = ex.withColumn("media_type", F.lit("html"))
        if args.include_pdf:
            from tl_spark.sources.warc import extract_warc_pdf

            pdf = (
                extract_warc_pdf(spark, args.input, on_error=args.on_error)
                .withColumnRenamed("text", "extracted_text")
                .withColumn("media_type", F.lit("pdf"))
            )
            # both legs are map-only; the union keeps them so —
            # missing columns (spans/n_nodes vs n_pages) null-fill
            ex = ex.unionByName(pdf, allowMissingColumns=True)
            if args.pdf_outlinks_output:
                from tl_spark.operators.pdf import pdf_outlinks
                from tl_spark.sources.warc import read_warc

                recs = read_warc(spark, args.input, on_error=args.on_error)
                pdf_payloads = recs.filter(
                    (F.col("http_status") == 200)
                    & F.col("content_type").contains("application/pdf")
                ).select(
                    F.xxhash64("warc_file", "record_idx").alias("doc_id"),
                    "warc_file", "record_idx", "target_uri", "body",
                )
                links = pdf_outlinks(
                    pdf_payloads.select(
                        "doc_id", F.col("body").alias("payload")
                    ),
                    on_error=args.on_error,
                ).join(
                    pdf_payloads.select(
                        "doc_id", "warc_file", "record_idx", "target_uri"
                    ),
                    "doc_id",
                ).select(
                    "warc_file", "record_idx", "target_uri", "page_no", "uri"
                )
                links.write.mode("overwrite").parquet(
                    args.pdf_outlinks_output
                )
        ex = ex.withColumn(
            "doc_id",
            F.xxhash64("warc_file", "record_idx"),
        )
        n_extracted = ex.count()
        capped = cap_per_domain(
            ex, args.max_per_host, url_col="target_uri", id_col="doc_id"
        )
        # exact dedup across the crawl: keep the first URL per digest
        w = Window.partitionBy(F.sha2("extracted_text", 256)).orderBy(
            "target_uri", "doc_id"
        )
        deduped = (
            capped.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .drop("_r")
        )
        from tl_spark.operators.langid import ngram_lang_id_col

        c = F.col("extracted_text")
        curated = (
            deduped.withColumn("n_tokens", token_count(c))
            .withColumn("quality", quality_score(c))
            .withColumn("lang_guess", lang_guess(c))
            # 16-language n-gram-profile classifier (map-only Arrow
            # kernel leg) — the real language signal; lang_guess stays
            # as the legacy marker heuristic column
            .withColumn("lang_id", ngram_lang_id_col(c)["lang_id"])
            .withColumn("dominant_script", dominant_script(c))
            .filter(
                (F.col("quality") >= args.quality_min)
                & (F.col("n_tokens") >= args.min_tokens)
            )
        )
        if args.keep_langs:
            keep = [s.strip() for s in args.keep_langs.split(",") if s.strip()]
            curated = curated.filter(F.col("lang_id").isin(keep))
        curated.write.mode("overwrite").parquet(args.output)
        n_out = spark.read.parquet(args.output).count()
        print(
            json.dumps(
                {
                    "records_extracted": n_extracted,
                    # legacy alias (pre-PDF name) — kept one release for
                    # existing report consumers
                    "html_extracted": n_extracted,
                    "corpus_rows": n_out,
                    "output": args.output,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
