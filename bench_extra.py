#!/usr/bin/env python3
"""Per-query measurement harness for optimization work (guide §1).

NOT the driver bench — ``bench.py`` stays frozen. This tool times an
arbitrary subset of the declared contract queries with the same
methodology (``.collect()`` at local[min(8, CPUS)], best-of-N with
load/steal/probe stamps) and can additionally:

  * capture ``.explain("formatted")`` for each query into a plans dir
  * time the pure computation through the noop sink (guide §1.4)

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --plans plans/r06/tag \
      --queries text_repetition,phash_neardup [--noop] [--attempts 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from bench import contention_probe, timed_best

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--noop", action="store_true",
                    help="also time df.write.format('noop') per query")
    ap.add_argument("--plans-only", action="store_true",
                    help="capture explain output, skip timing")
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from assetdatavalidationtool_spark.contract import QUERIES
    from assetdatavalidationtool_spark.session import get_spark

    names = [n for n in args.queries.split(",") if n] or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(cores=min(8, CPUS), app_name="bench_extra",
                      driver_memory="48g")
    # identical warm-up to bench.py
    import pandas as pd

    def _noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    spark.range(0, CPUS * 4, numPartitions=CPUS).mapInPandas(_noop, "id long").count()
    spark.read.parquet(f"{args.sf}/customer.parquet").groupBy("c_mktsegment").count().collect()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    probe0 = contention_probe()
    results: dict[str, dict] = {}
    for name in names:
        cq = QUERIES[name]
        if args.plans:
            import contextlib
            import io

            df = cq.fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{args.plans}/{name}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"plan captured: {name}", file=sys.stderr)
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        r = timed_best(lambda: cq.fn(spark, args.sf).collect(),
                       attempts=args.attempts)
        entry = {"collect": r}
        if args.noop:
            rn = timed_best(
                lambda: cq.fn(spark, args.sf)
                .write.format("noop").mode("overwrite").save(),
                attempts=args.attempts,
            )
            entry["noop"] = rn
        results[name] = entry
        print(f"{name}: {r['sec']:.2f}s (all {r['all_secs']})"
              + (f" noop {entry['noop']['sec']:.2f}s" if args.noop else ""),
              file=sys.stderr)
    probe1 = contention_probe()
    report = {
        "sf_dir": args.sf,
        "probe_before_sec": probe0,
        "probe_after_sec": probe1,
        "queries": {n: round(r["collect"]["sec"], 3) for n, r in results.items()},
        "noop": {n: round(r["noop"]["sec"], 3) for n, r in results.items()
                 if "noop" in r},
        "detail": results,
    }
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
