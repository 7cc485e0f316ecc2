#!/usr/bin/env python3
"""Benchmark harness.

Default mode (what the driver runs): one JSON line with
  - per-query wall times for the contract queries at $SPARK_GRAFT_SF_DIR
  - the headline: a full rule-set validation pass over a pre-materialized
    synthetic image+caption table (images validated / sec)

Scaling mode (``python bench.py --scaling``): runs the identical image
validation job in two fresh subprocesses at N and 4N cores on the SAME
parquet input and reports throughput at both plus
``efficiency = (throughput_4N / throughput_N) / 4`` — the sandbox
proxy for the north rule's N → 4N executor criterion. The default pair
is local[1] → local[4] because this VM delivers only ~10 effective
cores however many vCPUs it advertises (see BASELINE.md); override
with SPARK_GRAFT_SCALING_CORES. Results land in
BENCH/scaling_last.json and are summarized in BENCH/BASELINE.md.

Noise protocol (both modes): this host sees multi-minute co-tenant
storms that inflate wall times up to 10x — and they are INVISIBLE to
both guest loadavg and /proc/stat steal (measured: identical 80k
passes at 20.8 / 47.4 / 205.7 s, all <=0.7% steal). Every timed unit
is best-of-2 (with extra retries while every attempt's window shows
loadavg > LOAD_RETRY or steal > STEAL_RETRY), loadavg + steal are
captured around each attempt, and ``contention_probe()`` — a fixed
multiprocess numpy workload that directly measures the window — is
recorded before/after each unit. Every run appends its full record to
``BENCH/bench_history.jsonl`` (the latest also lands in
``BENCH/bench_last.json`` / ``BENCH/scaling_last.json``), so no record
is ever lost to overwrites or driver stdout truncation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Headline input size: 80k images puts the pass well past the ~16 s of
# input-independent per-pass overhead (AQE scheduling, Catalyst
# analysis, drift/stats collect jobs) that dominated at the old 10k
# default and made the r03 headline noise-sensitive (VERDICT r03 #5) —
# at 80k the img/s number reflects kernel throughput, not scheduling.
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "80000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
# 1-min loadavg above which a timing window counts as "loaded" and the
# measurement is retried. Our own local[8] query session contributes
# ~8-10 runnable threads; a co-tenant storm stacks well beyond that.
LOAD_RETRY = float(os.environ.get("SPARK_GRAFT_LOAD_RETRY", "16"))


def loadavg_1m() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # non-Linux fallback
        return 0.0


def cpu_counters() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat. Steal is the
    TRUE co-tenant signal on this host: guest loadavg only counts our
    own runnable threads, while hypervisor CPU steal (observed 4x+ wall
    inflation) shows up exclusively here."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError):
        return 0, 0


# steal fraction of total CPU above which a timing window counts as
# storm-afflicted and the measurement is retried
STEAL_RETRY = float(os.environ.get("SPARK_GRAFT_STEAL_RETRY", "0.10"))


def _probe_worker(mb: int) -> int:
    import numpy as np

    a = np.random.default_rng(0).integers(
        0, 255, size=(mb * 1024 * 1024 // 2,), dtype=np.int16
    )
    for _ in range(3):
        b = a.astype(np.int32)
        b += 1
        np.clip(b, 0, 255, out=b)
        a = b.astype(np.int16)
    return int(a[0])


def contention_probe(workers: int = 4, mb: int = 48) -> float:
    """Seconds for a FIXED multiprocess numpy workload (int16 adds,
    clips, casts over MB-size arrays — the validation kernel's memory
    profile). This is the host-contention signal /proc/stat steal and
    guest loadavg both miss: identical 80k image passes measured 20.8 /
    47.4 / 205.7 s in one night at 0-0.7% steal and idle pre-run
    loadavg — only a direct measurement exposes such windows. Recorded
    before and after every timed unit; quiet-window baseline for
    (4 workers, 48 MB) on this host is ~2-3 s, and a probe at >2x
    baseline marks the window (and any wall time measured in it)
    storm-afflicted."""
    import multiprocessing as mp

    import numpy  # noqa: F401  (loaded pre-fork so workers inherit it)

    t0 = time.time()
    with mp.Pool(workers) as pool:
        pool.map(_probe_worker, [mb] * workers)
    return round(time.time() - t0, 2)


def timed_best(run, attempts: int = 2, max_extra: int = 2) -> dict:
    """Best-of-N timing with loadavg + CPU-steal capture. ``run`` is a
    nullary that executes the unit once. Returns wall time of the best
    attempt plus that attempt's load/steal window; retries (up to
    ``max_extra``) when every attempt so far ran under co-tenant
    pressure (loadavg > LOAD_RETRY or steal fraction > STEAL_RETRY)."""
    tries = []
    while True:
        l0 = loadavg_1m()
        s0, c0 = cpu_counters()
        t0 = time.time()
        run()
        dt = time.time() - t0
        l1 = loadavg_1m()
        s1, c1 = cpu_counters()
        steal = (s1 - s0) / max(1, c1 - c0)
        tries.append(
            {"sec": dt, "load": max(l0, l1), "steal_pct": round(100 * steal, 1)}
        )
        done_min = len(tries) >= attempts
        all_loaded = all(
            t["load"] > LOAD_RETRY or t["steal_pct"] > 100 * STEAL_RETRY
            for t in tries
        )
        if done_min and (not all_loaded or len(tries) >= attempts + max_extra):
            break
    best = min(tries, key=lambda t: t["sec"])
    return {
        "sec": best["sec"],
        "load": round(best["load"], 2),
        "steal_pct": best["steal_pct"],
        "attempts": len(tries),
        "all_secs": [round(t["sec"], 3) for t in tries],
    }


def materialize_images(spark, n: int) -> tuple[str, str]:
    """Generate the deterministic image+caption tables once and cache as
    parquet; the bench then measures validation, not generation."""
    from assetdatavalidationtool_spark.datagen import generate_captions, generate_images

    img_path = f"{CACHE_DIR}/images_n{n}"
    cap_path = f"{CACHE_DIR}/captions_n{n}"
    marker = f"{CACHE_DIR}/.done_n{n}"
    if not os.path.exists(marker):
        dups, bad, nulls = n // 1000, n // 500, n // 1000
        # Row-group discipline for a binary-heavy table: a parquet task
        # cannot split inside a row group, so ~350MB row groups (what a
        # naive write produces at ~100KB/row) serialize the whole scan.
        # Target ~2500 rows (~80MB) per file / row group.
        parts = max(32, n // 2500)
        generate_images(
            spark, n, partitions=parts,
            dup_ids=dups, bad_pixel_ids=bad, null_dim_ids=nulls,
        ).write.mode("overwrite").option("parquet.block.size", 33554432).parquet(
            img_path
        )
        generate_captions(
            spark, n, drop_ids=n // 500, alien_ids=n // 1000, mutate_ids=n // 500
        ).write.mode("overwrite").parquet(cap_path)
        open(marker, "w").write("ok")
    return img_path, cap_path


def materialize_bucketed(spark, n: int, buckets: int = 64) -> tuple[str, str]:
    """Bucket-partitioned copies of the image+caption tables
    (bucket = pmod(xxhash64(image_id), buckets) materialized as a
    physical partition column, as sources/bucketed.py's layout does) —
    the input shape where resume/incremental bucket filters become
    partition pruning."""
    from pyspark.sql import functions as F

    img_path, cap_path = materialize_images(spark, n)
    bimg = f"{CACHE_DIR}/images_b{buckets}_n{n}"
    bcap = f"{CACHE_DIR}/captions_b{buckets}_n{n}"
    marker = f"{CACHE_DIR}/.done_b{buckets}_n{n}"
    if not os.path.exists(marker):
        bkt = F.pmod(F.xxhash64(F.col("image_id")), F.lit(buckets)).cast("int")
        # write-time shuffle on the bucket: one task per bucket = one
        # file per partition dir (the last shuffle the key ever needs)
        spark.read.parquet(img_path).withColumn("bucket", bkt).repartition(
            buckets, "bucket"
        ).write.mode("overwrite").partitionBy("bucket").option(
            "parquet.block.size", 33554432
        ).parquet(bimg)
        spark.read.parquet(cap_path).withColumn("bucket", bkt).repartition(
            buckets, "bucket"
        ).write.mode("overwrite").partitionBy("bucket").parquet(bcap)
        open(marker, "w").write("ok")
    return bimg, bcap


def warm_python_workers(spark) -> None:
    """Spawn the Arrow Python workers + JIT the scan path once so the
    measured pass reflects steady-state throughput, not process spawn
    (on a real cluster executors are long-lived)."""
    import pandas as pd

    def noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    spark.range(0, CPUS * 4, numPartitions=CPUS).mapInPandas(
        noop, "id long"
    ).count()


def build_ruleset(spark, images):
    from pyspark.sql import functions as F

    from assetdatavalidationtool_spark.rules import (
        DriftRule,
        ReferentialRule,
        RowInvariantRule,
        RuleSet,
        SchemaRule,
        StatsRule,
        UniquenessRule,
    )
    from assetdatavalidationtool_spark.rules.schema import ColumnSpec

    # fixed reference histogram for fmt (the generator's weights) so the
    # drift check exercises the full path without a snapshot pre-pass
    ref_fmt = {"png": 0.5, "jpeg": 0.4, "webp": 0.1}
    return RuleSet(
        [
            SchemaRule(
                [
                    ColumnSpec("image_id", "string", nullable=False),
                    ColumnSpec("bytes", "binary", nullable=False),
                    ColumnSpec("w", "int", nullable=False, domain=F.col("w") <= 4096),
                    ColumnSpec("h", "int", nullable=False),
                    ColumnSpec(
                        "fmt", "string", nullable=False,
                        domain=F.col("fmt").isin("png", "jpeg", "webp"),
                    ),
                    ColumnSpec("caption", "string", nullable=False),
                    ColumnSpec("phash", "bigint", nullable=False),
                ]
            ),
            UniquenessRule(["image_id"]),
            UniquenessRule(["phash"], salted=True),
            ReferentialRule(),
            RowInvariantRule(),
            StatsRule(columns=["w", "h", "fmt", "phash"]),
            DriftRule(column="fmt", kind="categorical", reference=ref_fmt,
                      ks_threshold=0.5, psi_threshold=1.0),
        ]
    )


def run_validation_pass(spark, img_path: str, cap_path: str) -> dict:
    """The measured job: full rule-set pass → verdicts + violations
    materialized. Returns counts so the work can't be optimized away."""
    from assetdatavalidationtool_spark.rules import RuleContext

    images = spark.read.parquet(img_path)
    captions = spark.read.parquet(cap_path)
    ctx = RuleContext(
        spark=spark, images=images, captions=captions,
        num_buckets=max(CPUS * 4, 64), run_id="bench",
    )
    out = build_ruleset(spark, images).run(ctx)
    t0 = time.time()
    n_violations = out["violations"].count()  # materializes persisted vio
    n_verdicts = out["verdicts"].count()      # reuses persisted vio
    elapsed = time.time() - t0
    out["violations"].unpersist()
    return {
        "elapsed_sec": elapsed,
        "n_violations": n_violations,
        "n_verdict_rows": n_verdicts,
    }


def warm_page_cache(*paths: str) -> None:
    """Page-cache warm via DIRECT parallel file reads, not a Spark scan:
    at local[1] a single-threaded parquet scan of a multi-GB bytes
    column takes minutes of untimed leg wall; raw reads warm the same
    pages at IO speed regardless of the leg's core count."""
    import concurrent.futures
    import glob

    def _touch(path: str) -> None:
        with open(path, "rb", buffering=0) as f:
            while f.read(16 * 1024 * 1024):
                pass

    files = [f for p in paths for f in glob.glob(f"{p}/part-*")]
    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        list(ex.map(_touch, files))


def single_run(cores: int, n: int, repeats: int = 2) -> dict:
    """Entry for scaling subprocesses: full pass at local[cores].

    The OS page cache is warmed first (one full scan of the bytes
    column): the metric is validation-engine throughput, not this VM's
    ~35MB/s cold virtual disk. Best-of-``repeats`` guards against the
    host's noisy-neighbor CPU steal."""
    from pyspark.sql import functions as F

    from assetdatavalidationtool_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"bench_c{cores}",
                      driver_memory="48g")
    img_path, cap_path = materialize_images(spark, n)
    warm_python_workers(spark)
    warm_page_cache(img_path, cap_path)
    # REAL warm pass over a small slice (2 parquet files ≈ 5k images):
    # the noop-UDF warm doesn't heat the actual decode path — JVM C2
    # compilation of the vectorized parquet reader + codegen'd rule
    # plan needs real iterations (measured on this job: cold first
    # pass 313 s, after slice-warm 101 s, steady state 78 s at
    # local[4]/160k). On a real cluster executors are long-lived and
    # steady state is the honest metric.
    import glob

    ifiles = sorted(glob.glob(f"{img_path}/part-*"))[:2]
    cfiles = sorted(glob.glob(f"{cap_path}/part-*"))[:2]
    if ifiles and cfiles:
        from assetdatavalidationtool_spark.rules import RuleContext

        images_s = spark.read.parquet(*ifiles)
        wctx = RuleContext(
            spark=spark, images=images_s,
            captions=spark.read.parquet(*cfiles),
            num_buckets=max(cores * 4, 64), run_id="warm_slice",
        )
        wout = build_ruleset(spark, images_s).run(wctx)
        wout["violations"].count()
        wout["verdicts"].count()
        wout["violations"].unpersist()
    stats_box: dict = {}
    probe_before = contention_probe()
    r = timed_best(
        lambda: stats_box.__setitem__(
            "stats", run_validation_pass(spark, img_path, cap_path)
        ),
        attempts=repeats,
    )
    probe_after = contention_probe()
    spark.stop()
    return {"cores": cores, "n_images": n, "wall_sec": r["sec"],
            "images_per_sec": n / r["sec"], "load": r["load"],
            "steal_pct": r["steal_pct"], "attempts": r["attempts"],
            "all_walls": r["all_secs"],
            "probe_before_sec": probe_before, "probe_after_sec": probe_after,
            **stats_box["stats"]}


def incremental_demo(cores: int, n: int) -> dict:
    """Day-over-day incremental re-validation over the BUCKETED layout:
    a full materialized rule-set pass with per-bucket fingerprints
    recorded (day 1), then an incremental pass (day 2) over an input
    whose captions changed in ONE of 64 buckets — the 100-TB
    daily-churn shape. The input is bucket-partitioned parquet and the
    run sets partition_col="bucket", so the day-2 bucket filters are
    PartitionFilters: unchanged buckets' image files are never opened.
    Fingerprints are metadata-only (fingerprint_bytes=False) — the
    change detector reads the narrow columns, standing in for an
    Iceberg snapshot diff that would read nothing at all. Day 2 pays:
    one narrow fingerprint scan + the changed bucket's full pass + the
    global metadata rules; everything else is inherited."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from assetdatavalidationtool_spark.manifest import ValidationRun
    from assetdatavalidationtool_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"bench_incr_c{cores}",
                      driver_memory="48g")
    img_path, cap_path = materialize_bucketed(spark, n, buckets=64)
    warm_python_workers(spark)
    warm_page_cache(f"{img_path}/bucket=*", f"{cap_path}/bucket=*")
    images = spark.read.parquet(img_path)
    captions = spark.read.parquet(cap_path)
    out = tempfile.mkdtemp(prefix="bench_incr_")
    try:
        probe_before = contention_probe()
        t0 = time.time()
        s1 = ValidationRun(
            spark, out, build_ruleset(spark, images).rules,
            num_buckets=64, run_id="day1", partition_col="bucket",
        ).run(images, captions, record_fingerprints=True,
              fingerprint_bytes=False)
        wall_full = time.time() - t0
        # day-2: captions of bucket 0 edited (they become caption-
        # mismatch violations — realistic churn, not a synthetic no-op)
        cap2 = captions.withColumn(
            "caption",
            F.when(F.col("bucket") == 0,
                   F.concat(F.col("caption"), F.lit(" v2")))
            .otherwise(F.col("caption")),
        )
        t0 = time.time()
        s2 = ValidationRun(
            spark, out, build_ruleset(spark, images).rules,
            num_buckets=64, run_id="day2", partition_col="bucket",
        ).run(images, cap2, incremental_from="day1",
              fingerprint_bytes=False)
        wall_incr = time.time() - t0
        probe_after = contention_probe()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return {
        "cores": cores, "n_images": n, "num_buckets": 64,
        "changed_buckets": 1,
        "wall_full_sec": round(wall_full, 2),
        "wall_incremental_sec": round(wall_incr, 2),
        "speedup": round(wall_full / wall_incr, 2),
        "images_per_sec_full": round(n / wall_full, 1),
        "images_per_sec_incremental_effective": round(n / wall_incr, 1),
        "day1_rules_run": s1["rules_run"],
        "day2_rules_run": s2["rules_run"],
        "day2_buckets_inherited": s2["buckets_inherited"],
        "probe_before_sec": probe_before, "probe_after_sec": probe_after,
    }


def scaling_mode() -> None:
    """N vs 4N cores on the same input. Default pair is (1, 4): this VM
    advertises 32 vCPUs but delivers ~10 effective cores (hypervisor
    overcommit, measured with a multiprocessing burn test), so 8→32
    cannot physically show 4x. Override with SPARK_GRAFT_SCALING_CORES."""
    pair = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_CORES", "1,4").split(",")
    )
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "2"))
    # The scaling run uses a LARGER input than the headline bench: after
    # the round-2 kernel optimizations the per-image cost dropped ~2.3x,
    # so at 10k images the ~16 s of input-size-independent work per pass
    # (AQE job scheduling across the 7-rule union's exchanges, Catalyst
    # analysis, drift/stats collect jobs) dominates and masks executor
    # scaling — the regime the north rule measures is compute-dominant
    # (10^12 rows), which 160k images restores locally (fixed share ~6%
    # of the local[1] leg; solved from best-of interleaved pairs:
    # pass = S/cores + f with S≈117 s, f≈16 s at n=80k).
    n_scaling = int(os.environ.get("SPARK_GRAFT_SCALING_IMAGES", "160000"))

    # Legs run UNPINNED by default (SPARK_GRAFT_SCALING_TASKSET=1 to
    # opt in to taskset -c 0..N-1). Pinning was tried as a
    # cgroup-executor proxy and measured WORSE (efficiency 0.305, r03):
    # on an overcommitted host a pinned vcpu cannot migrate away from
    # co-tenant contention, so affinity measures the neighbors, not the
    # engine. The r03 headline (0.806, BENCH/scaling_last.json) was
    # measured unpinned. Trade-off acknowledged: unpinned, the small
    # leg's JVM feeder/GC threads spill onto extra cores (a local[1]
    # job was observed using ~1.6 cores), which slightly UNDERSTATES
    # the N→4N ratio — the conservative direction.
    use_taskset = os.environ.get("SPARK_GRAFT_SCALING_TASKSET", "0") == "1" and (
        subprocess.run(["which", "taskset"], capture_output=True).returncode == 0
    )

    def one(cores: int) -> dict:
        prefix = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] if use_taskset else []
        out = subprocess.run(
            prefix
            + [sys.executable, __file__, "--single-run", str(cores), str(n_scaling)],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ, "SPARK_GRAFT_NO_HISTORY": "1",
                 "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        print(f"local[{cores}]: {r['images_per_sec']:.1f} images/sec", file=sys.stderr)
        return r

    # Scaling efficiency is a MATCHED-CONDITIONS ratio, so the two legs
    # of a pair must see the same co-tenant load. Legs are run in
    # adjacent lo→hi pairs (rounds); each round yields its own
    # efficiency. Taking the max per LEVEL across rounds is biased low
    # under this host's multiplicative noise (pairs a lucky local[lo]
    # with an unlucky local[hi] from a different window: observed 0.84
    # per-round vs 0.63 cross-round-max on identical data) — and taking
    # the max per ROUND is biased high (best of N noisy ratios). The
    # headline is therefore the MEDIAN round efficiency (lower median
    # for even N, so it is always a real measured round), with
    # min/median/max and every round recorded for transparency in
    # BENCH/scaling_last.json.
    factor = pair[1] / pair[0]
    results = []
    rounds_out = []
    # a round is TAINTED when either leg's best attempt still ran under
    # co-tenant pressure (steal fraction above STEAL_RETRY or loadavg
    # above LOAD_RETRY); tainted rounds are kept in the record but
    # excluded from the headline, and extra rounds run in their place
    # (bounded) — an efficiency ratio between a quiet leg and a stormy
    # leg measures the storm, not the engine.
    max_rounds = rounds + int(os.environ.get("SPARK_GRAFT_SCALING_EXTRA", "2"))
    while True:
        r_lo = one(pair[0])
        r_hi = one(pair[1])
        results += [r_lo, r_hi]
        eff = (r_hi["images_per_sec"] / r_lo["images_per_sec"]) / factor
        # a round is tainted on ANY contention signal: steal, loadavg,
        # or the direct probe (PROBE_RETRY seconds; steal/loadavg
        # provably miss this host's storms — see contention_probe)
        probe_retry = float(os.environ.get("SPARK_GRAFT_PROBE_RETRY", "8"))
        tainted = any(
            r.get("steal_pct", 0) > 100 * STEAL_RETRY
            or r.get("load", 0) > LOAD_RETRY
            or r.get("probe_before_sec", 0) > probe_retry
            or r.get("probe_after_sec", 0) > probe_retry
            for r in (r_lo, r_hi)
        )
        rounds_out.append(
            {"lo": r_lo, "hi": r_hi, "efficiency": round(eff, 3), "tainted": tainted}
        )
        print(
            f"round efficiency: {eff:.3f}{' (tainted)' if tainted else ''}",
            file=sys.stderr,
        )
        clean = [r for r in rounds_out if not r["tainted"]]
        if len(clean) >= rounds or len(rounds_out) >= max_rounds:
            break
    untainted = [r for r in rounds_out if not r["tainted"]]
    clean = untainted or rounds_out
    effs = sorted(r["efficiency"] for r in clean)
    median_round = sorted(clean, key=lambda r: r["efficiency"])[(len(clean) - 1) // 2]
    report = {
        "n_images": n_scaling,
        "cores_lo": pair[0],
        "cores_hi": pair[1],
        f"local{pair[0]}_images_per_sec": round(median_round["lo"]["images_per_sec"], 2),
        f"local{pair[1]}_images_per_sec": round(median_round["hi"]["images_per_sec"], 2),
        "scaling_efficiency": median_round["efficiency"],
        "efficiency_min": effs[0],
        "efficiency_max": effs[-1],
        "round_efficiencies": [r["efficiency"] for r in rounds_out],
        "rounds_tainted": [r["tainted"] for r in rounds_out],
        # when every round is tainted the headline falls back to the
        # tainted set — say so instead of mislabeling it clean
        "headline_tainted": not untainted,
        "headline_is": (
            "median of untainted rounds"
            if untainted
            else "median of TAINTED rounds (no untainted round available "
            "within the round budget — treat as storm-afflicted)"
        )
        + " (lower median; tainted = a leg saw steal>"
        f"{100 * STEAL_RETRY:g}%, load>{LOAD_RETRY:g}, or contention "
        f"probe>{os.environ.get('SPARK_GRAFT_PROBE_RETRY', '8')}s)",
    }
    print(json.dumps(report))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_last.json", "w") as f:
        json.dump({**report, "runs": results}, f, indent=2)
    _append_history({"mode": "scaling", **report, "runs": results})


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--single-run":
        r = single_run(int(sys.argv[2]), int(sys.argv[3]))
        print(json.dumps(r))
        # standalone invocations get a durable record too; suppressed
        # for the subprocess legs of --scaling / the suite (they record
        # their own aggregated entries)
        if os.environ.get("SPARK_GRAFT_NO_HISTORY") != "1":
            _append_history({"mode": "single_run", **r})
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling_mode()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        cores = int(sys.argv[2]) if len(sys.argv) > 2 else min(8, CPUS)
        n = int(sys.argv[3]) if len(sys.argv) > 3 else N_IMAGES
        r = incremental_demo(cores, n)
        print(json.dumps(r, separators=(",", ":")))
        if os.environ.get("SPARK_GRAFT_NO_HISTORY") != "1":
            _append_history({"mode": "incremental_demo", **r})
        return

    from assetdatavalidationtool_spark.contract import QUERIES
    from assetdatavalidationtool_spark.session import get_spark

    # Contract queries run at min(8, CPUS) for the same reason as the
    # image pass (below): this VM delivers ~10 effective cores however
    # many vCPUs are advertised, and local[32] measures scheduler thrash
    # (dedup_minhash_lsh: 3.4 s steady-state at local[8] vs 8-21 s at
    # local[32] on identical data). Recorded transparently as
    # query_cores.
    query_cores = min(8, CPUS)
    spark = get_spark(cores=query_cores, app_name="bench", driver_memory="48g")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    queries: dict[str, float] = {}
    total = 0.0

    # headline: full image validation pass (materialize first, measure after)
    from pyspark.sql import functions as F

    materialize_images(spark, N_IMAGES)
    # The image pass runs in its own session at local[min(8, CPUS)]:
    # this VM delivers ~10 effective cores regardless of the 32 vCPUs
    # advertised (BENCH/BASELINE.md), and a Python-UDF job at local[N]
    # demands ~1.5N runnable threads — N>8 here only measures scheduler
    # thrash. Recorded transparently as image_pass_cores.
    image_cores = min(8, CPUS)
    out = subprocess.run(
        [sys.executable, __file__, "--single-run", str(image_cores), str(N_IMAGES)],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "SPARK_GRAFT_NO_HISTORY": "1",
             "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    img_run = json.loads(line)
    t_images = img_run["wall_sec"]
    stats = {"n_violations": img_run["n_violations"]}
    queries["image_validation_full_pass"] = round(t_images, 3)
    total += t_images

    # untimed warm-up: JIT the scan/shuffle/codegen paths + spawn the
    # Arrow workers once, so the first timed query doesn't absorb
    # session warm-up (observed +10-20 s on whichever query runs first)
    warm_python_workers(spark)
    spark.read.parquet(f"{SF_DIR}/customer.parquet").groupBy(
        "c_mktsegment"
    ).count().collect()

    # Best-of-2 per query with loadavg capture (VERDICT r2 #1): a single
    # shot under a co-tenant load storm recorded 9-27x inflated times in
    # round 2; best-of-2 + load annotation makes the record trustworthy
    # and an inflated window detectable.
    query_load: dict[str, float] = {}
    query_steal: dict[str, float] = {}
    query_attempts: dict[str, int] = {}
    for name, cq in QUERIES.items():
        r = timed_best(lambda: cq.fn(spark, SF_DIR).collect())
        queries[name] = round(r["sec"], 3)
        query_load[name] = r["load"]
        query_steal[name] = r["steal_pct"]
        query_attempts[name] = r["attempts"]
        total += r["sec"]

    record = {
                "metric": "bench_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "images_validated_per_sec": round(N_IMAGES / t_images, 2),
                "n_images": N_IMAGES,
                "image_pass_violations": stats["n_violations"],
                "image_pass_cores": image_cores,
                "image_pass_load": img_run.get("load"),
                "image_pass_steal_pct": img_run.get("steal_pct"),
                "image_pass_walls": img_run.get("all_walls"),
                "image_pass_probe_before_sec": img_run.get("probe_before_sec"),
                "image_pass_probe_after_sec": img_run.get("probe_after_sec"),
                "suite_probe_sec": contention_probe(),
                "probe_doc": "fixed 4-proc numpy workload; quiet baseline "
                "~0.8-3 s on this host; >2x baseline = storm-afflicted "
                "window invisible to steal/loadavg",
                "query_cores": query_cores,
                "cpus": CPUS,
                "timing_protocol": "best-of-2 per query; retry while every "
                f"window has loadavg>{LOAD_RETRY:g} or CPU steal>"
                f"{100 * STEAL_RETRY:g}%",
                "query_load_1m": query_load,
                "query_steal_pct": query_steal,
                "query_attempts": query_attempts,
    }
    # Persist the FULL record in-repo (VERDICT r03 #1): the driver
    # archives only a ~2KB tail of stdout, which truncated the r03 AND
    # r04 records to "parsed": null. BENCH/bench_last.json is the
    # durable copy any headline claim in BENCH/BASELINE.md must cite
    # (the scaling mode already persists BENCH/scaling_last.json).
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"),
                exist_ok=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "bench_last.json"), "w"
    ) as f:
        json.dump(record, f, indent=2)
    if os.environ.get("SPARK_GRAFT_NO_HISTORY") != "1":
        _append_history(record)
    # VERDICT r04 #2: the final stdout line is a COMPACT record that
    # fits the driver's tail capture (last 2000 chars of stdout — the
    # r1/r2 archives parse, r3/r4 don't, and the difference is exactly
    # whether the final JSON line fit). The suite is now 70 queries, so
    # the full 2-decimal map no longer fits: include the SLOWEST
    # queries first (they are the informative ones) until the budget
    # is reached, and record how many short queries were elided. The
    # headline + probe stamps always survive; per-query load/steal/
    # attempt diagnostics are file-only in BENCH/bench_last.json.
    def _compact_line(n_queries: int) -> str:
        by_time = sorted(queries, key=queries.get, reverse=True)[:n_queries]
        qd = {k: round(queries[k], 2) for k in sorted(by_time)}
        elided = len(queries) - len(by_time)
        if elided:
            qd["_fastest_queries_elided"] = elided
        d = {
            "metric": record["metric"],
            "value": record["value"],
            "unit": record["unit"],
            "queries": qd,
            "sf": record["sf"],
            # the headline + its probe stamps must survive ANY fallback:
            # they are what BENCH/BASELINE.md claims are judged against
            "images_validated_per_sec": record["images_validated_per_sec"],
            "n_images": record["n_images"],
            "image_pass_probe_before_sec": record["image_pass_probe_before_sec"],
            "image_pass_probe_after_sec": record["image_pass_probe_after_sec"],
            "suite_probe_sec": record["suite_probe_sec"],
            "full_record": "BENCH/bench_last.json",
        }
        return json.dumps(d, separators=(",", ":"))

    line = _compact_line(len(queries))
    n = len(queries)
    while len(line) > 1900 and n > 1:
        # shrink geometrically: each json.dumps is cheap but not free
        n = min(n - 1, int(n * 0.8))
        line = _compact_line(n)
    print(line)


def _append_history(record: dict) -> None:
    """One JSONL line per bench/scaling run, never overwritten — the
    cross-window spread IS the finding on this host (identical 80k
    passes: 20.8 / 47.4 / 205.7 s at 0-0.7% steal), and a single
    last-record file hides it."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "bench_history.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps({"ts": round(time.time(), 1), **record}) + "\n")


if __name__ == "__main__":
    main()
