"""Isolated-JVM re-adjudication of driver-flagged bench regressions
(VERDICT r7 item 1; the guard of last resort in the r6 bench-noise
protocol): run each named query N times, each in its OWN fresh JVM via
bench.py subset mode, and report per-run seconds + calibration
fingerprints. Decision rule (ADVICE r8: same rule as bench.py's own
guard, not a private threshold): drift-normalize each run by its own
``spark_calibration_sec`` vs the committed reference, then REPRODUCED
iff ``bench.over_budget(min_normalized, budget)`` — the exact envelope
(GUARD_REL + absolute floor) a full bench run would apply. A query with
no committed budget gets a distinct 'no committed budget' verdict.

Usage: python scripts/readjudicate.py q1,q2,... [n_runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402


def run_once(q: str, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY=q,
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"{q} failed:\n{proc.stderr[-3000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    return {"sec": rec["queries"][q], "fingerprint": rec["fingerprint"]}


def main() -> None:
    queries = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    budgets = detail["queries"]
    ref_spark_cal = (detail.get("fingerprint") or {}).get(
        "spark_calibration_sec")
    out = {}
    for q in queries:
        runs = []
        for i in range(n):
            r = run_once(q, sf_dir)
            cal = (r["fingerprint"].get("calibration_sec"),
                   r["fingerprint"].get("calibration_sec_end"))
            # normalize by THIS run's multi-core probe — each fresh JVM
            # sees whatever window it landed on (bench.py r9 policy)
            r["drift_norm"] = bench.drift_factor(
                r["fingerprint"].get("spark_calibration_sec"), ref_spark_cal)
            r["sec_normalized"] = round(r["sec"] / r["drift_norm"], 3)
            print(f"[readj] {q} run {i+1}/{n}: {r['sec']:.3f}s "
                  f"(norm {r['sec_normalized']:.3f}s @ "
                  f"{r['drift_norm']:.3f}x, cal {cal[0]}/{cal[1]})",
                  flush=True)
            runs.append(r)
        secs = [r["sec"] for r in runs]
        norm_secs = [r["sec_normalized"] for r in runs]
        b = budgets.get(q)
        out[q] = {
            "runs": secs,
            "runs_normalized": norm_secs,
            "min": min(secs),
            "min_normalized": min(norm_secs),
            "budget": b,
            "fingerprints": [r["fingerprint"] for r in runs],
        }
        if b is None:
            verdict = "no committed budget (new query — next refresh budgets it)"
        elif bench.over_budget(min(norm_secs), b):
            verdict = "REPRODUCED (over bench.over_budget envelope after drift norm)"
        else:
            verdict = "noise (inside bench.over_budget envelope)"
        out[q]["verdict"] = verdict
        print(f"[readj] {q}: min {min(secs):.3f}s (norm "
              f"{min(norm_secs):.3f}s) vs budget {b} -> {verdict}",
              flush=True)
    path = os.path.join(REPO, "scaling_runs", "readjudication.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(out)  # keep prior adjudications; latest per query wins
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"[readj] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
