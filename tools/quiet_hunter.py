"""Quiet-window hunter: take the two probe-clean records VERDICT r04
still wants, firing only when the host's contention probe says the
window is quiet.

Goals (in priority order, each persisted by bench.py itself):
  1. an UNTAINTED probe-stamped scaling record
     (``BENCH/scaling_last.json`` with ``headline_tainted: false`` —
     the r4 0.892 record predates the probe protocol);
  2. a fresh full-suite record at HEAD whose suite probe pair is clean
     (``BENCH/bench_last.json``).

Protocol per attempt: run the direct contention probe; only when it
lands at/below QUIET_SEC (≈ the 0.8–3 s quiet baseline, far under the
8 s taint threshold) start the measurement. A ``.hunter_busy`` flag
file next to the repo root tells interactive sessions not to launch
heavy work mid-measurement. Exits when both goals are met or the
deadline passes; safe to re-run.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

QUIET_SEC = float(os.environ.get("HUNTER_QUIET_SEC", "4.0"))
DEADLINE_H = float(os.environ.get("HUNTER_DEADLINE_H", "4.5"))
POLL_SEC = float(os.environ.get("HUNTER_POLL_SEC", "120"))
BUSY = os.path.join(REPO, ".hunter_busy")


def log(msg: str) -> None:
    print(f"[hunter {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def scaling_clean() -> bool:
    try:
        with open(os.path.join(REPO, "BENCH", "scaling_last.json")) as f:
            return json.load(f).get("headline_tainted") is False
    except Exception:
        return False


def suite_clean_at_head() -> bool:
    """Latest suite history record is at current HEAD mtime and its
    probe pair is under the taint threshold."""
    try:
        with open(os.path.join(REPO, "BENCH", "bench_history.jsonl")) as f:
            recs = [json.loads(l) for l in f if l.strip()]
    except Exception:
        return False
    suites = [r for r in recs if r.get("metric") == "bench_suite_total"]
    if not suites:
        return False
    last = suites[-1]
    # the suite record carries SCALAR probe fields (one pair around the
    # image pass + one at suite end) — collect them into a list; the
    # previous `or []` treated the scalar as an iterable and raised
    probes = [
        p
        for p in (
            last.get("image_pass_probe_before_sec"),
            last.get("image_pass_probe_after_sec"),
            last.get("suite_probe_sec"),
        )
        if p is not None
    ]
    head_ts = float(
        subprocess.run(
            ["git", "-C", REPO, "log", "-1", "--format=%ct"],
            capture_output=True, text=True,
        ).stdout.strip() or 0
    )
    return (
        last.get("ts", 0) > head_ts
        and probes
        and all(p <= 8.0 for p in probes)
    )


def run(cmd: list[str], extra_env: dict | None = None, timeout: int = 5400):
    env = {**os.environ, **(extra_env or {})}
    open(BUSY, "w").write(str(os.getpid()))
    try:
        return subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout)
    finally:
        try:
            os.remove(BUSY)
        except OSError:
            pass


def main() -> None:
    t_end = time.time() + DEADLINE_H * 3600
    while time.time() < t_end:
        need_scaling = not scaling_clean()
        need_suite = not suite_clean_at_head()
        if not (need_scaling or need_suite):
            log("both goals met — exiting")
            return
        p = bench.contention_probe()
        log(f"probe {p:.2f}s (quiet ≤ {QUIET_SEC}) — "
            f"need scaling={need_scaling} suite={need_suite}")
        if p > QUIET_SEC:
            time.sleep(POLL_SEC)
            continue
        if need_scaling:
            log("quiet window — starting scaling run (1 round + 1 retry)")
            run([sys.executable, "bench.py", "--scaling"],
                {"SPARK_GRAFT_SCALING_ROUNDS": "1",
                 "SPARK_GRAFT_SCALING_EXTRA": "1"})
            log(f"scaling attempt done — clean={scaling_clean()}")
        elif need_suite:
            log("quiet window — starting full suite at HEAD")
            run([sys.executable, "bench.py"])
            log(f"suite attempt done — clean={suite_clean_at_head()}")
        time.sleep(5)
    log("deadline reached")


if __name__ == "__main__":
    main()
