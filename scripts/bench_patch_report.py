"""Mechanical detection of mid-run contention patches in a full bench
run (the r9 refresh failure mode): a transient co-tenant lasting
minutes inflates a CONTIGUOUS run of HEADLINE-ordered queries 2-6x
while both whole-run calibration probes (which bracket the run) read
clean. This report joins a run artifact's per-query times against the
committed budgets IN HEADLINE ORDER, flags inflation streaks, and
cross-references the per-query loadavg trace the run now records.

A "patch" = >= MIN_RUN consecutive headline positions whose
budget-relative inflation exceeds PATCH_RATIO after dividing out the
run's whole-run drift factor. Isolated singletons are the ordinary
shared-session lottery (handled by the in-run isolated re-measure);
streaks are the thing min-of-2 cannot escape and the thing a refresh
must never write as budgets.

Usage: python scripts/bench_patch_report.py [BENCH_RUN.json]
Exit code 1 when a patch is found (so a refresh wrapper can gate on it).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

PATCH_RATIO = 1.6   # drift-normalized inflation that counts as "hot"
MIN_RUN = 3         # hot positions that make a patch
GAP_TOL = 2         # cool positions allowed INSIDE a patch: queries too
                    # cheap to inflate measurably (sub-0.3 s budgets) sit
                    # between hot neighbors in a real contention window —
                    # the r9 patch spanned positions 75-86 with two such
                    # cool gaps


def find_patches(times: dict[str, float], budgets: dict[str, float],
                 norm: float, order: list[str],
                 loadavg: dict[str, float] | None = None) -> list[dict]:
    """Pure core, unit-tested: near-contiguous runs of budget-relative
    inflation in HEADLINE order. ``norm`` divides measured times first
    (whole-run drift is not a patch)."""
    hot = []
    for pos, name in enumerate(order):
        t, b = times.get(name), budgets.get(name)
        if t is None or not b:
            continue
        ratio = (t / norm) / b
        if ratio > PATCH_RATIO:
            hot.append((pos, name, ratio))
    patches, streak = [], []
    for pos, name, ratio in hot:
        if streak and pos - streak[-1][0] > GAP_TOL + 1:
            if len(streak) >= MIN_RUN:
                patches.append(streak)
            streak = []
        streak.append((pos, name, ratio))
    if len(streak) >= MIN_RUN:
        patches.append(streak)
    out = []
    for p in patches:
        rec = {
            "positions": [p[0][0], p[-1][0]],
            "queries": {name: round(r, 2) for _, name, r in p},
        }
        if loadavg:
            lv = [loadavg[n] for _, n, _ in p if n in loadavg]
            if lv:
                rec["loadavg_range"] = [min(lv), max(lv)]
        out.append(rec)
    return out


def main() -> int:
    run_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "BENCH_RUN.json")
    run = json.load(open(run_path))
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    norm = run.get("drift_norm_factor") or bench.drift_factor(
        (run.get("fingerprint") or {}).get("spark_calibration_sec"),
        (detail.get("fingerprint") or {}).get("spark_calibration_sec"))
    patches = find_patches(run["queries"], detail["queries"], norm,
                           bench.HEADLINE, run.get("loadavg_by_query"))
    if not patches:
        print(f"no contention patches (drift norm {norm:.3f}x, "
              f"{len(run['queries'])} queries vs committed budgets)")
        return 0
    for p in patches:
        lo, hi = p["positions"]
        lv = p.get("loadavg_range")
        print(f"PATCH positions {lo}-{hi} ({len(p['queries'])} queries, "
              f"normalized inflation vs budget"
              + (f", loadavg {lv[0]}-{lv[1]}" if lv else "") + "):")
        for name, r in p["queries"].items():
            print(f"  {name}: {r}x")
    print("-> these readings are not budget-quality; a refresh must "
          "carry isolated re-measures for them (bench.py refresh mode "
          "does this automatically for guard-tripping members).")
    return 1


if __name__ == "__main__":
    sys.exit(main())
