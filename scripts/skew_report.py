"""Skewed-leg sweep (VERDICT r6 item 2): measure the most shuffle-heavy
queries on the uniform sf0.3 leg vs the Zipf leg (``make_scale.py
--zipf``: hot users own ~16% of events, hot parts ~14% of lineitem, hot
document sources ~18% of docs) and report per-query zipf/uniform
wall-clock ratios. The uniform sweep proves the plans scale with VOLUME;
this proves they survive the hot-KEY distribution a real 100 TB corpus
has (boilerplate-heavy sources, celebrity users) — the leg the
deliberately skew-free replicas never exercise.

Pass criterion (SCALING.md skew table): ratio <= ~2x per query, no
unbounded straggler. AQE's skew-split behavior on the real leg is
pinned separately by tests/test_scale_patterns.py::
test_aqe_skew_split_on_zipf_leg (real hot key, tuned thresholds).

Methodology mirrors the uniform sweep: bench.py subset mode (noop sink,
warm + min-of-2), each query x leg in its OWN JVM, 8g driver heap.

Usage:
    python scripts/skew_report.py            # run sweep -> skew_sweep.jsonl
    python scripts/skew_report.py --table    # print the markdown table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "dedup_family_overlap",
    "graph_pagerank",
    "graph_kcore_peel",
    "graph_link_prediction",
    "graph_rich_club",
    "j2_join_then_window_stream",
    "j3_threeway_stream_join",
    "x8_neardup_stream",
    "q_spearman_corr",
    "x4_debounce_append_stream",
]

LEGS = [
    ("uniform", "testdata_scaled/sf0.3"),
    ("zipf", "testdata_scaled/sf0.3z"),
]

OUT = os.path.join(REPO, "scaling_runs", "skew_sweep.jsonl")


def run_sweep() -> None:
    if os.path.exists(OUT):
        os.remove(OUT)
    for label, d in LEGS:
        for q in QUERIES:
            print(f"[skew] {q} @ {label}", flush=True)
            env = dict(
                os.environ,
                SPARK_GRAFT_BENCH_ONLY=q,
                SPARK_GRAFT_SF_DIR=os.path.join(REPO, d),
                SPARK_DRIVER_MEMORY="8g",
                PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell",
            )
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, cwd=REPO, capture_output=True, text=True,
                timeout=1800,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"{q}@{label} failed:\n{proc.stderr[-3000:]}")
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("{")][-1]
            rec = json.loads(line)
            with open(OUT, "a") as f:
                f.write(json.dumps(
                    {"leg": label, "query": q,
                     "sec": rec["queries"][q],
                     "fingerprint": rec.get("fingerprint", {})}) + "\n")


def table() -> None:
    recs = [json.loads(l) for l in open(OUT)]
    t: dict[str, dict[str, float]] = {}
    for r in recs:
        t.setdefault(r["query"], {})[r["leg"]] = r["sec"]
    print("| query | uniform s | zipf s | ratio |")
    print("|---|---|---|---|")
    worst = 0.0
    for q in QUERIES:
        u, z = t[q].get("uniform"), t[q].get("zipf")
        ratio = z / u if u and z else float("nan")
        worst = max(worst, ratio)
        print(f"| `{q}` | {u:.2f} | {z:.2f} | {ratio:.2f}x |")
    print(f"\nworst ratio: {worst:.2f}x")


if __name__ == "__main__":
    if "--table" in sys.argv:
        table()
    else:
        run_sweep()
        table()
