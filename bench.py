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
            "spark.sql.files.maxPartitionBytes": "8m",
            # 100k rows/batch since r4: with the native kernel the
            # per-batch Python work is tiny, so fewer/larger Arrow
            # crossings win (~+6% in the r4 sweep vs 50k)
            "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tl_spark.queries as Q
    from tl_spark.functions.extract import extract_main_content
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts

    # transcripts input scaled by sf (untimed synth+write; deterministic).
    # 5M turns at sf0.1 — large enough that the ~2 s fixed job cost is
    # <10% of the measurement (the r01 headline measured 1M turns cold
    # and came out 7x under the scale proof). File sizing matters as
    # much as row count: ~35k rows/file keeps scan tasks amortized
    # (tiny files -> one sub-10k-row task each under the 4 MB
    # open-cost, which alone halves throughput).
    n_convs = max(500, int(5_000_000 * sf))
    tpath = f"/tmp/tl_bench_transcripts_v2_{n_convs}"
    if not Path(tpath, "_SUCCESS").exists():
        write_transcripts(
            synth_transcripts(spark, n_convs=n_convs, median_turns=10, skew_mult=100),
            tpath,
            n_files=max(8, (n_convs * 10) // 35000),
        )
    n_turns = spark.read.parquet(tpath).count()

    timings: dict[str, float] = {}
    brackets: dict[str, dict] = {}

    # keys with documented round-over-round host-weather swings (the
    # BENCH_r06 dedup_minhash artifact moved 2.2x with zero code change
    # — VERDICT r6 "next round" #4). These get the dom_bracket.py
    # treatment: 5 timed reps, report the MEDIAN plus a variance row so
    # a noisy host can neither fake nor mask a regression. Other keys
    # keep warmup+best-of-2 so cross-round deltas stay comparable.
    BRACKET_KEYS = {
        "dedup_minhash",
        "dedup_simhash_neardup",
        "bm25_corpus_topk",
        "embedding_cosine_topk",
    }

    def timed(name, fn):
        # one untimed warmup (Python-worker pool spin-up, scan-cache,
        # codegen) then best-of-2 — the headline's protocol, applied to
        # every battery query. The r3 driver artifact recorded a 1.99 s
        # query at 7.72 s because the battery timed a single cold shot;
        # round-over-round deltas were worker spin-up + host weather,
        # not code (VERDICT r3 "What's wrong" #1).
        fn()
        reps = 5 if name in BRACKET_KEYS else 2
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        times.sort()
        if name in BRACKET_KEYS:
            med = times[len(times) // 2]
            timings[name] = round(med, 3)
            brackets[name] = {
                "median": round(med, 3),
                "min": round(times[0], 3),
                "max": round(times[-1], 3),
                "reps": reps,
                "rel_spread": round((times[-1] - times[0]) / med, 3),
            }
        else:
            timings[name] = round(times[0], 3)

    def consume(df):
        # noop sink: full materialization of every column, no pruning
        df.write.format("noop").mode("overwrite").save()
        # release any sketch caches the operator persisted (handle
        # protocol, tl_spark/cache.py) so queries don't inherit each
        # other's memory pressure
        from tl_spark.cache import unpersist_handles

        unpersist_handles(df)

    # headline: full extraction of every turn. Small untimed pool
    # warmup first (forks+imports the whole Python worker pool), then
    # the standard warmup+best-of-2 protocol via timed() — same as
    # tools/scale_proof.py, so the two figures are directly comparable.
    def run_extract():
        df = spark.read.parquet(tpath)
        consume(extract_main_content(df, passthrough=["conv_id", "turn_idx"]))

    warm = spark.read.parquet(tpath).limit(50_000).repartition(int(cpus) * 2)
    consume(extract_main_content(warm, passthrough=["conv_id", "turn_idx"]))
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
        "dedup_simhash_neardup",
        "doc_repetition",
        "doc_pii_redaction",
        "embedding_cosine_topk",
        "extract_documents_text",
        # round-5 additions (new keys only — earlier keys keep their
        # protocol/meaning, so cross-round deltas stay comparable):
        # two native-DOM-path queries and two fresh window operators
        "selector_extract_p",
        "parse_nodes_docs",
        "bm25_corpus_topk",
        "doc_hashed_embedding",
    ]
    qs = Q.queries()
    for name in battery:
        timed(name, lambda n=name: consume(qs[n](spark, sf_dir)))

    # round-6 addition: realistic-HTML selector extraction (VERDICT r5
    # item 3). The driver-corpus docs are tiny tag-free wrappers, so
    # the native DOM kernel's gain barely showed end-to-end; this key
    # runs the selector path over ~4 KB golden-mix-style pages (nav +
    # 40 class-attributed paragraphs + script boilerplate, content
    # varied per doc id) so the DOM leg's Spark-level throughput is
    # tracked round-over-round. Corpus synth+write is untimed.
    para = (
        '<p class="body">alpha bravo charlie delta echo foxtrot golf '
        "hotel india juliett kilo lima doc %d seg {}</p>"
    )
    page_tmpl = (
        "<html><head><title>page %d</title></head><body>"
        "<nav><ul><li>home<li>about<li>contact</ul></nav><main>"
        + "".join(para.format(i) for i in range(40))
        + '</main><script>var x = "<div>hi</div>";</script>'
        "<footer>copyright</footer></body></html>"
    )
    n_pages = max(1000, int(200_000 * sf))
    hpath = f"/tmp/tl_bench_realhtml_{n_pages}"
    if not Path(hpath, "_SUCCESS").exists():
        spark.range(n_pages).select(
            F.col("id").alias("doc_id"),
            F.format_string(page_tmpl, *([F.col("id")] * 41)).alias(
                "text"
            ),
        ).repartition(max(8, int(cpus))).write.mode("overwrite").parquet(
            hpath
        )

    def run_realhtml():
        from tl_spark.functions.query import query_selector_extract

        df = spark.read.parquet(hpath)
        consume(query_selector_extract(df, "p.body", mode="inner_text"))

    timed("selector_extract_realhtml", run_realhtml)

    # round-6 addition: PDF text/layout extraction (the north rule's
    # "PDF/layout parse" slot). Real PDFs in four structural variants
    # are pre-rendered from the documents table (synth+write untimed,
    # same protocol as the realhtml key); the timed leg is the
    # from-scratch ISO 32000 kernel — xref chain, filter cascades,
    # font/CMap decode, text-state machine, layout re-assembly.
    ppath = f"/tmp/tl_bench_pdf_{sf}"
    if not Path(ppath, "_SUCCESS").exists():
        from tl_spark.operators.pdf import synth_pdf_media

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        synth_pdf_media(docs).repartition(max(8, int(cpus))).write.mode(
            "overwrite"
        ).parquet(ppath)

    def run_pdf():
        from tl_spark.operators.pdf import pdf_text_pages

        consume(pdf_text_pages(spark.read.parquet(ppath)))

    timed("pdf_extract", run_pdf)

    # round-7 addition: the unified media metadata router (magic-byte
    # dispatch to header-only image dims / MPEG+ADTS frame walks /
    # BMFF box tree / FLAC STREAMINFO / CRC-verified Ogg page walk /
    # EBML tree). Payloads pre-rendered from the documents table —
    # EIGHT container variants since sitting 4 (path bumped to v2 so
    # stale five-variant caches can't be reused); synth+write untimed,
    # the timed leg is routing + real parsing only.
    mpath = f"/tmp/tl_bench_media_v2_{sf}"
    if not Path(mpath, "_SUCCESS").exists():
        from tl_spark.operators.media_info import synth_media_for_docs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        synth_media_for_docs(docs).repartition(max(8, int(cpus))).write.mode(
            "overwrite"
        ).parquet(mpath)

    def run_media():
        from tl_spark.operators.media_info import media_stream_info

        consume(
            media_stream_info(
                spark.read.parquet(mpath), id_col="doc_id"
            )
        )

    timed("media_info", run_media)

    # round-7 sitting-4 addition: density-based main-content selection
    # over the same ~4 KB realistic pages the selector key uses (nav +
    # <main> with 40 paragraphs + script + footer) — the DOM-heuristics
    # leg's end-to-end throughput, tracked round-over-round.
    def run_main_content():
        from tl_spark.functions.readability import main_content_extract

        consume(main_content_extract(spark.read.parquet(hpath)))

    timed("main_content", run_main_content)

    # round-7 sitting-4 addition: the unified document-text router
    # (magic-byte dispatch to the OOXML / EPUB / RTF / HTML kernels)
    # over a mixed corpus pre-rendered from the documents table
    # (synth+write untimed; the timed leg is routing + extraction).
    dpath = f"/tmp/tl_bench_docs_{sf}"
    if not Path(dpath, "_SUCCESS").exists():
        from tl_spark.operators.docrouter import synth_document_media

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id"
        )
        synth_document_media(docs).repartition(max(8, int(cpus))).write.mode(
            "overwrite"
        ).parquet(dpath)

    def run_docs():
        from tl_spark.operators.docrouter import document_extract

        consume(document_extract(spark.read.parquet(dpath)))

    timed("document_extract", run_docs)

    total = round(sum(timings.values()), 3)
    turns_per_sec = round(n_turns / timings["extract_transcripts"], 1)
    print(
        json.dumps(
            {
                "metric": "turns_per_sec_extraction",
                "value": turns_per_sec,
                "unit": "turns/sec",
                "queries": timings,
                "variance": brackets,
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
