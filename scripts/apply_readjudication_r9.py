"""One-shot r9 close helper: fold the isolated-JVM re-adjudication minima
(scaling_runs/readjudication.json) into BENCH_DETAIL.json for the queries
the 2026-08-16 22:44 refresh measured inside its two contaminated session
patches (HEADLINE positions 75-86 and 182-184, plus two stragglers and
one deflated budget re-checked for safety).

Policy (r8 tfidf precedent, now automated in bench.py refresh mode): a
flagged-or-patch query's committed budget is its fresh-JVM isolated
min-of-3 NORMALIZED reading (each run divided by its own
spark_calibration drift factor vs the committed 0.502 s reference — the
isolated runs landed on 1.2-3x drifted windows, so their raw minima are
not reference-window times, and every future guard comparison divides by
the measuring window's factor before the envelope test). Provenance in
refresh_adjudicated as [prior_committed_r8, contaminated_session_reading,
isolated_min_normalized].
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REMEASURED = [
    "pipeline_class_rebalance", "q_copurchase_lift", "q_decile_binning",
    "q_price_tier_join", "q_seasonality_strength", "q_snapshot_diff",
    "pipeline_negative_pairs", "corpus_datacard", "q_pareto_lorenz",
    "q_file_lineage", "q_event_debounce", "text_ttr_by_source",
    "graph_rich_club", "knn_ivf_persisted",
]
# pipeline_decontaminate was ALSO re-measured (its new budget fell to
# 0.40x the r8 value — checked from the fast side): isolated runs
# straddle its 0.764 s session reading (raw 1.08-1.41, normalized
# 0.47-0.88), so the session value stands — no replacement.

NOTE = (
    "r9 final: full REPLACE from the 22:44 clean-fingerprint run "
    "(loadavg 0.11, calibration 0.283, spark_calibration 0.502 = 1.04x "
    "ref), EXCEPT the 15 queries in refresh_adjudicated: that session "
    "carried two multi-minute contaminated patches (HEADLINE positions "
    "75-86 and 182-184; 6 queries tripped the drift-normalized guard, "
    "the rest of the patch plus graph_rich_club/knn_ivf_persisted "
    "inflated 1.6-3.2x under the envelope, pipeline_decontaminate "
    "re-checked from the fast side) that the per-query min-of-2 cannot "
    "escape — each carries its fresh-JVM isolated min-of-3 instead, "
    "drift-NORMALIZED onto this file's 0.502 s reference window because "
    "the isolated runs landed on 1.2-3x drifted windows "
    "(scaling_runs/readjudication.json has per-run fingerprints and "
    "drift factors; every one landed inside the envelope vs its r8 "
    "budget = session lottery, zero real regressions). bench.py refresh "
    "mode now adjudicates ALL flags (no cap) and writes "
    "reference-window-normalized isolated minima itself, so a future "
    "refresh cannot commit a contaminated patch."
)


def main() -> None:
    readj = json.load(open(os.path.join(REPO, "scaling_runs",
                                        "readjudication.json")))
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    r8 = json.loads(subprocess.check_output(
        ["git", "show", "HEAD:BENCH_DETAIL.json"], cwd=REPO))["queries"]

    adjudicated = {}
    for q in REMEASURED:
        rec = readj[q]
        iso_min = rec["min_normalized"]
        session = detail["queries"][q]
        detail["queries"][q] = iso_min
        adjudicated[q] = [r8.get(q), session, iso_min]
        print(f"{q:30s} r8={r8.get(q)} session={session} -> "
              f"iso_min_norm={iso_min} (raw {rec['min']})")

    detail["value"] = round(sum(detail["queries"].values()), 3)
    detail["refresh_adjudicated"] = adjudicated
    detail.pop("regressions_vs_committed", None)  # all cleared (see NOTE)
    detail["refresh_note"] = NOTE
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"\ntotal: {detail['value']}s over {len(detail['queries'])} queries")


if __name__ == "__main__":
    sys.exit(main())
