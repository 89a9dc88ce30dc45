"""Head-to-head vs the reference crate on identical corpora.

Measures, on the SAME documents:
  - reference (Rust, as-shipped = single-threaded), via
    tools/tl_oracle --bench (parse + inner_text of top-level nodes);
  - our Python kernel, single core (same work);
  - our full Spark engine at local[32] (extract_main_content -> noop).

Two corpora: the tiny-doc template mix (~66 B/doc; stresses per-doc
overhead, flatters the reference) and a 4 KB page (realistic web-doc
size; stresses byte throughput). Appends results to
BENCH/ref_compare.json and rewrites the comparison section of
BENCH/BASELINE.md is left to the operator — this script just prints
and stores JSON.

Run: python tools/ref_compare.py
"""

from __future__ import annotations

import base64
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
ORACLE = REPO / "tools/tl_oracle/target/release/tl_oracle"

PARA = (
    '<p class="body">alpha bravo charlie delta echo foxtrot golf hotel '
    "india juliett kilo lima</p>"
)
BIG_DOC = (
    "<html><head><title>t</title></head><body><nav><ul><li>home<li>about"
    "</ul></nav><main>" + PARA * 40 +
    '</main><script>var x = "<div>hi</div>";</script></body></html>'
)
SMALL_MIX = [
    "alpha bravo charlie",
    "alpha bravo charlie delta echo foxtrot",
    "delta echo",
    '<html><body><main><p>alpha bravo</p><p id="t3">charlie delta</p>'
    '</main><nav>chrome nav</nav><script>var x = "<div>hi</div>";'
    "</script></body></html>",
    '<div class="msg"><span>alpha bravo charlie</span><!-- meta --></div>',
    "<div><p>alpha</div></p> tail",
    "<ul><li>alpha<li>bravo</ul><style>.x{color:red}</style>",
    "alpha &amp; more <b>bold</b",
]


def ref_bench(docs):
    inp = "\n".join(base64.b64encode(d.encode()).decode() for d in docs)
    r = subprocess.run(
        [str(ORACLE), "--bench"], input=inp.encode(), stdout=subprocess.PIPE,
        check=True,
    )
    return json.loads(r.stdout.decode().strip())


def kernel_bench(docs):
    from tl_spark.functions.extract import extract_document_flat

    for d in docs[:200]:
        extract_document_flat(d)
    t0 = time.time()
    for d in docs:
        extract_document_flat(d)
    dt = time.time() - t0
    nbytes = sum(len(d) for d in docs)
    return {"docs_per_sec": len(docs) / dt, "mb_per_sec": nbytes / dt / 1e6}


def native_kernel_bench(docs):
    """Single-core native cdylib over the same docs (round 4); None
    when the library isn't built."""
    import pyarrow as pa

    from tl_spark.functions.extract import DEFAULT_STRIP_TAGS
    from tl_spark.kernel.native import extract_batch_arrays, load

    if load() is None:
        return None
    col = pa.array(docs, type=pa.string())
    extract_batch_arrays(col, DEFAULT_STRIP_TAGS)  # warm
    t0 = time.time()
    extract_batch_arrays(col, DEFAULT_STRIP_TAGS)
    dt = time.time() - t0
    nbytes = sum(len(d) for d in docs)
    return {"docs_per_sec": len(docs) / dt, "mb_per_sec": nbytes / dt / 1e6}


def spark_bench(doc, n=100_000):
    import pyspark.sql.functions as F

    from tl_spark.functions.extract import extract_main_content
    from tl_spark.plans.session import get_spark

    # r2-tuned: 64 files (~6 MB each -> 64 one-file tasks = 2 full
    # waves on 32 cores) + 50k-row Arrow batches measured best in the
    # config sweep (531 vs 377 MB/s at the r01 conf of 128 files/20k)
    spark = get_spark(
        master="local[32]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit(doc).alias("text")
        )
        path = f"/tmp/tl_refcmp_{len(doc)}_{n}_64"
        if not Path(path, "_SUCCESS").exists():
            df.repartition(64).write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)
        warm = extract_main_content(
            src.limit(20000).repartition(64), passthrough=["doc_id"]
        )
        warm.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            extract_main_content(src, passthrough=["doc_id"]).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.time() - t0)
        return {
            "docs_per_sec": n / best,
            "mb_per_sec": n * len(doc) / best / 1e6,
        }
    finally:
        spark.stop()


def main():
    small = SMALL_MIX * 20000
    big = [BIG_DOC] * 2000
    # BRACKETED: the reference runs immediately before AND after the
    # Spark measurement so host drift between the two engines is
    # bounded by the bracket spread, not assumed away.
    ref_big_pre = ref_bench(big)
    spark_big = spark_bench(BIG_DOC)
    ref_big_post = ref_bench(big)
    report = {
        "small_mix_bytes_per_doc": sum(map(len, SMALL_MIX)) / len(SMALL_MIX),
        "big_doc_bytes": len(BIG_DOC),
        "reference_singlethread_small": ref_bench(small),
        "reference_singlethread_big_pre": ref_big_pre,
        "reference_singlethread_big_post": ref_big_post,
        "python_kernel_1core_small": kernel_bench(small),
        "python_kernel_1core_big": kernel_bench(big),
        "native_kernel_1core_small": native_kernel_bench(small),
        "native_kernel_1core_big": native_kernel_bench(big),
        "spark_local32_big": spark_big,
        "spark_vs_ref_bracket": [
            round(spark_big["mb_per_sec"] / ref_big_post["mb_per_sec"], 3),
            round(spark_big["mb_per_sec"] / ref_big_pre["mb_per_sec"], 3),
        ],
    }
    out = REPO / "BENCH"
    out.mkdir(exist_ok=True)
    (out / "ref_compare.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
