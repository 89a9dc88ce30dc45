"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: turns/sec of main-content extraction over the
synthetic transcripts table (BASELINE.json metric), plus wall times
for representative operators from the driver battery.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_from_dir(sf_dir)

    from tl_spark.plans.session import get_spark

    # scan partitioning sized for GB-scale local inputs (the 128m
    # default would bin-pack the whole transcripts table into ~2 tasks)
    spark = get_spark(
        app_name="tl_spark_bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tl_spark.queries as Q
    from tl_spark.functions.extract import extract_main_content
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts

    # transcripts input scaled by sf (untimed synth+write; deterministic).
    # ~10 turns/conv: sf0.1 -> ~1M turns, enough to amortize the ~2.5 s
    # fixed job overhead that otherwise dominates the throughput figure.
    n_convs = max(200, int(1_000_000 * sf))
    tpath = f"/tmp/tl_bench_transcripts_{n_convs}"
    if not Path(tpath, "_SUCCESS").exists():
        write_transcripts(
            synth_transcripts(spark, n_convs=n_convs, median_turns=10, skew_mult=100),
            tpath,
            n_files=128,
        )
    n_turns = spark.read.parquet(tpath).count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    def consume(df):
        # noop sink: full materialization of every column, no pruning
        df.write.format("noop").mode("overwrite").save()

    # headline: full extraction of every turn
    def run_extract():
        df = spark.read.parquet(tpath)
        consume(extract_main_content(df, passthrough=["conv_id", "turn_idx"]))

    timed("extract_transcripts", run_extract)

    battery = [
        "q1_pricing_summary",
        "q3_segment_revenue",
        "q5_nation_revenue",
        "top_customers_per_segment",
        "events_hourly",
        "doc_fingerprint",
        "dedup_exact",
        "dedup_minhash",
        "embedding_cosine_topk",
        "extract_documents_text",
    ]
    qs = Q.queries()
    for name in battery:
        timed(name, lambda n=name: consume(qs[n](spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    turns_per_sec = round(n_turns / timings["extract_transcripts"], 1)
    print(
        json.dumps(
            {
                "metric": "turns_per_sec_extraction",
                "value": turns_per_sec,
                "unit": "turns/sec",
                "queries": timings,
                "sf": sf,
                "n_turns": n_turns,
                "total_wall_sec": total,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
