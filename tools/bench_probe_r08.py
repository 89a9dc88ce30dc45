"""Round-8 optimization probe harness (bench.py stays FROZEN).

Times individual battery keys with bench.py's exact session config and
protocol (untimed warmup + best-of-2 via noop sink), captures
``explain("formatted")`` plans into plans/r08/, and supports sub-phase
probes for the structural rewrites. Usage:

    python tools/bench_probe_r08.py --only dedup_minhash,doc_repetition
    python tools/bench_probe_r08.py --plans before   # capture plans only
    python tools/bench_probe_r08.py --sf-dir /root/testdata/sf1.0

Numbers printed here feed OPTIMIZATION_r08.md; the driver's official
measurement still runs the round-start bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--plans", default=None, help="before|after: dump explain")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    sf_dir = args.sf_dir
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from tl_spark.plans.session import get_spark

    spark = get_spark(
        app_name="tl_spark_probe_r08",
        master=f"local[{args.cpus}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tl_spark.queries as Q
    from tl_spark.cache import unpersist_handles
    from tl_spark.functions.extract import extract_main_content

    def consume(df):
        df.write.format("noop").mode("overwrite").save()
        unpersist_handles(df)

    qs = Q.queries()
    battery = [
        "q1_pricing_summary", "q3_segment_revenue", "q5_nation_revenue",
        "top_customers_per_segment", "events_hourly", "doc_fingerprint",
        "dedup_exact", "dedup_minhash", "dedup_simhash_neardup",
        "doc_repetition", "doc_pii_redaction", "embedding_cosine_topk",
        "extract_documents_text", "selector_extract_p", "parse_nodes_docs",
        "bm25_corpus_topk", "doc_hashed_embedding",
    ]
    extra = {}

    # transcripts corpus (reuse bench.py's cached table when present)
    n_convs = max(500, int(5_000_000 * sf))
    tpath = f"/tmp/tl_bench_transcripts_v2_{n_convs}"
    if Path(tpath, "_SUCCESS").exists():
        extra["extract_transcripts"] = lambda: consume(
            extract_main_content(
                spark.read.parquet(tpath), passthrough=["conv_id", "turn_idx"]
            )
        )

    n_pages = max(1000, int(200_000 * sf))
    hpath = f"/tmp/tl_bench_realhtml_{n_pages}"
    if Path(hpath, "_SUCCESS").exists():
        def run_realhtml():
            from tl_spark.functions.query import query_selector_extract

            consume(
                query_selector_extract(
                    spark.read.parquet(hpath), "p.body", mode="inner_text"
                )
            )

        def run_main_content():
            from tl_spark.functions.readability import main_content_extract

            consume(main_content_extract(spark.read.parquet(hpath)))

        extra["selector_extract_realhtml"] = run_realhtml
        extra["main_content"] = run_main_content

    ppath = f"/tmp/tl_bench_pdf_{sf}"
    if Path(ppath, "_SUCCESS").exists():
        def run_pdf():
            from tl_spark.operators.pdf import pdf_text_pages

            consume(pdf_text_pages(spark.read.parquet(ppath)))

        extra["pdf_extract"] = run_pdf

    mpath = f"/tmp/tl_bench_media_v2_{sf}"
    if Path(mpath, "_SUCCESS").exists():
        def run_media():
            from tl_spark.operators.media_info import media_stream_info

            consume(
                media_stream_info(spark.read.parquet(mpath), id_col="doc_id")
            )

        extra["media_info"] = run_media

    dpath = f"/tmp/tl_bench_docs_{sf}"
    if Path(dpath, "_SUCCESS").exists():
        def run_docs():
            from tl_spark.operators.docrouter import document_extract

            consume(document_extract(spark.read.parquet(dpath)))

        extra["document_extract"] = run_docs

    runners: dict = {}
    for name in battery:
        runners[name] = lambda n=name: consume(qs[n](spark, sf_dir))
    runners.update(extra)

    only = args.only.split(",") if args.only else list(runners)

    if args.plans:
        outdir = REPO / "plans" / "r08"
        outdir.mkdir(parents=True, exist_ok=True)
        for name in only:
            if name in qs:
                df = qs[name](spark, sf_dir)
            elif name == "extract_transcripts":
                df = extract_main_content(
                    spark.read.parquet(tpath),
                    passthrough=["conv_id", "turn_idx"],
                )
            else:
                continue
            p = outdir / f"{name}_{args.plans}.txt"
            p.write_text(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
            unpersist_handles(df)
            print(f"wrote {p}")
        spark.stop()
        return

    timings = {}
    for name in only:
        fn = runners[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        fn()  # warmup
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 3))
        timings[name] = min(times)
        print(f"{name}: best={min(times)} all={times}", flush=True)
    print(json.dumps({"sf": sf, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
