"""Run the ENTIRE oracle battery against DuckDB at any scale factor.

The driver's correctness gate runs at sf0.01; this tool repeats the
identical comparison (column-name-sorted, order-insensitive, doubles
rounded to 9 places) at an arbitrary sf directory, catching
scale-dependent breakage the fixed gate can't see — it found the
dedup_simhash_neardup cap-precondition violation at sf0.1 in round 3
(8-bit band pieces overflow their 256-value space at 5000 docs).

Run: python tools/oracle_sweep.py [--sf-dir /root/testdata/sf0.1]
     [--only name1,name2] [--cpus 16]
Prints one line per query and a final JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import duckdb

    import tl_spark.queries as Q
    from tl_spark.plans.session import get_spark

    spark = get_spark(
        app_name="oracle_sweep",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = list(Q.oracle_sql())
    if args.only:
        wanted = set(args.only.split(","))
        names = [n for n in names if n in wanted]

    fails, t0 = [], time.time()
    for i, name in enumerate(names):
        try:
            qdf = Q.queries()[name](spark, args.sf_dir)
            scols = qdf.columns
            srows = [tuple(r) for r in qdf.collect()]
            res = con.execute(Q.oracle_sql()[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and normalize(srows, scols) == normalize(drows, dcols)
            )
            err = None
        except Exception as e:  # noqa: BLE001 — sweep must not abort
            ok, err = False, f"{type(e).__name__}: {str(e)[:120]}"
        if not ok:
            fails.append(name)
        print(
            f"[{i + 1}/{len(names)}] {name}: {'OK' if ok else 'FAIL'}"
            + (f" ({err})" if err else ""),
            flush=True,
        )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "checked": len(names),
                "failed": fails,
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
