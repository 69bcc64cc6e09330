"""Isolated-JVM re-adjudication of driver-flagged bench regressions
(VERDICT r7 item 1; the guard of last resort in the r6 bench-noise
protocol): run each named query N times, each in its OWN fresh JVM via
bench.py subset mode, and report per-run seconds + calibration
fingerprints. Decision rule: if min-of-N is within ~20% of the committed
BENCH_DETAIL budget, the driver's shared-session reading was co-tenancy
noise — record the adjudication; if the minimum reproduces the regression,
root-cause the query.

Usage: python scripts/readjudicate.py q1,q2,... [n_runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    budgets = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))["queries"]
    out = {}
    for q in queries:
        runs = []
        for i in range(n):
            r = run_once(q, sf_dir)
            cal = (r["fingerprint"].get("calibration_sec"),
                   r["fingerprint"].get("calibration_sec_end"))
            print(f"[readj] {q} run {i+1}/{n}: {r['sec']:.3f}s "
                  f"(cal {cal[0]}/{cal[1]})", flush=True)
            runs.append(r)
        secs = [r["sec"] for r in runs]
        out[q] = {
            "runs": secs,
            "min": min(secs),
            "budget": budgets.get(q),
            "fingerprints": [r["fingerprint"] for r in runs],
        }
        b = budgets.get(q)
        verdict = ("REPRODUCED" if b and min(secs) > 1.2 * b
                   else "noise (within 20% of budget)")
        print(f"[readj] {q}: min {min(secs):.3f}s vs budget {b} -> {verdict}",
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
