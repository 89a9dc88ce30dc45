"""DOM/selector path per-core bracket vs the reference crate.

Both sides do the SAME work on the SAME documents, single-threaded:
parse + document-scope query_selector("p") + inner_text of every
match. Reference = tools/tl_oracle --bench-selector p (tl crate,
src/queryselector/iter.rs loop); ours = the native DOM kernel
(tl_dom_query_batch OP_QS_EXTRACT / MODE_INNER_TEXT) called directly
via ctypes on one Arrow column — the exact hot loop the Spark
selector queries run per batch.

Two corpora (same as BENCH/COMPARISON.md round 5):
  - golden corpus x4 (~400 B/doc avg; realistic small/mixed HTML)
  - 4 KB page x500 (large uniform pages; byte-throughput stress)

Reference runs BRACKET ours (ref, ours, ref again) so host drift is
visible in the numbers. Match counts must agree or the run aborts.

Run: python tools/dom_bracket.py   (appends to BENCH/dom_bracket.json)
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


def golden_docs() -> list[str]:
    docs = []
    with open(REPO / "tests/goldens/corpus.jsonl") as f:
        for line in f:
            docs.append(json.loads(line)["html"])
    return docs * 4


def ref_bench(docs: list[str]) -> dict:
    inp = "\n".join(
        base64.b64encode(d.encode()).decode() for d in docs
    )
    r = subprocess.run(
        [str(ORACLE), "--bench-selector", "p"],
        input=inp.encode(),
        stdout=subprocess.PIPE,
        check=True,
    )
    return json.loads(r.stdout.decode().strip())


def native_bench(docs: list[str], reps: int = 5) -> dict | None:
    import pyarrow as pa

    from tl_spark.kernel.native_dom import (
        OP_QS_EXTRACT,
        dom_query_batch,
        encode_params,
        load_dom,
    )
    from tl_spark.kernel.selector import parse_selector

    if load_dom() is None:
        return None
    ast = parse_selector("p")
    params = encode_params(OP_QS_EXTRACT, "inner_text", sel_ast=ast)
    col = pa.array(docs, type=pa.string())
    out = dom_query_batch(col, params)  # warm
    matches = len(out[1])  # node_idx
    nbytes = sum(len(d.encode()) for d in docs)
    t0 = time.time()
    for _ in range(reps):
        dom_query_batch(col, params)
    dt = (time.time() - t0) / reps
    return {
        "docs_per_sec": len(docs) / dt,
        "mb_per_sec": nbytes / dt / 1e6,
        "matches": matches,
    }


def main() -> None:
    # this VM's throughput swings +/-40% with host load: interleave
    # (ref, ours) rounds and judge best-of-N vs best-of-N (transient
    # contention slows a round, never speeds one up)
    rounds = 5
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "corpora": {}}
    for name, docs in (
        ("golden_x4", golden_docs()),
        ("4kb_page_x500", [BIG_DOC] * 500),
    ):
        refs, ours_all = [], []
        matches = None
        for _ in range(rounds):
            r = ref_bench(docs)
            o = native_bench(docs)
            if o is None:
                print("native DOM kernel not built", file=sys.stderr)
                sys.exit(1)
            # --bench-selector runs 5 reps; matches is the 5x total
            assert r["matches"] == o["matches"] * 5, (
                name, r["matches"], o["matches"])
            matches = o["matches"]
            refs.append(r["mb_per_sec"])
            ours_all.append(o["mb_per_sec"])
        best_ref, best_ours = max(refs), max(ours_all)
        out["corpora"][name] = {
            "ref_mb_s_best": round(best_ref, 1),
            "ours_mb_s_best": round(best_ours, 1),
            "ratio_best": round(best_ours / best_ref, 3),
            "ref_rounds": [round(x, 1) for x in refs],
            "ours_rounds": [round(x, 1) for x in ours_all],
            "matches_per_pass": matches,
        }
        print(name, out["corpora"][name], flush=True)
    path = REPO / "BENCH/dom_bracket.json"
    hist = []
    if path.exists():
        hist = json.loads(path.read_text())
    hist.append(out)
    path.write_text(json.dumps(hist, indent=1))


if __name__ == "__main__":
    main()
