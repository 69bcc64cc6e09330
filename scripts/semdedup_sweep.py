"""SemDeDup-over-IVF scale sweep (VERDICT r8 item 3): execute the
K-proportional-to-n argument instead of asserting it.

The fixed sign quantizer (dedup_semdedup_prune, 2^SEM_B buckets) has
per-bucket pairwise work sum_b c_b*(c_b-1)/2 that is QUADRATIC in n at
fixed bucket count. The production variant (dedup_semdedup_ivf) buckets
by the persisted IVF index's trained cells, where the cell count is an
index-build knob; with K chosen proportional to n (constant target cell
occupancy), mean occupancy stays flat and total pair work grows
LINEARLY in n. This sweep measures both policies on the deterministic
replicated corpora (testdata_scaled/, 1x/3x/10x the sf0.1 embeddings =
2k/6k/20k vectors) and records, per leg:

- occupancy stats of the trained assignment (nonempty cells, max, mean),
- exact candidate-pair counts sum_b c_b*(c_b-1)/2 and pairs-per-vector,
  for BOTH fixed K=PIVF_K and K = n / CELL_TARGET,
- wall-clock of the full prune under K-proportional-to-n (warm + min of
  2, bench.py's methodology, one shared local[32] JVM — the pair counts
  are exact and deterministic; time is corroborating evidence only).

Output: scaling_runs/semdedup_sweep.json + a table on stdout for
SCALING.md. Oracle checks are out of scope at synthesized scales (the
driver grades sf0.01; the registered query is hash-matched there at the
default K).

Usage: python scripts/semdedup_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from apache_flink_datastream_api_spark.operators.annindex import (  # noqa: E402
    PIVF_K, build_ivf_index,
)
from apache_flink_datastream_api_spark.operators.dedup import (  # noqa: E402
    dedup_semdedup_ivf,
)
from apache_flink_datastream_api_spark.session import get_spark  # noqa: E402

# target mean cell occupancy under the K-proportional-to-n policy —
# matches the default index's occupancy at the 1x leg (2000 / 16 = 125),
# so the 1x row is simultaneously the fixed-K and the scaled-K anchor
CELL_TARGET = 125

LEGS = [
    ("sf0.1x", os.path.join(REPO, "testdata_scaled", "sf0.1x")),
    ("sf0.3", os.path.join(REPO, "testdata_scaled", "sf0.3")),
    ("sf1", os.path.join(REPO, "testdata_scaled", "sf1")),
]

OUT = os.path.join(REPO, "scaling_runs", "semdedup_sweep.json")


def occupancy(spark, base: str) -> dict:
    occ = (
        spark.read.parquet(os.path.join(base, "assign"))
        .groupBy("cluster_id").count()
    )
    row = occ.agg(
        F.count("*").alias("cells"),
        F.sum("count").alias("n"),
        F.max("count").alias("max_occ"),
        (F.sum(F.col("count") * (F.col("count") - 1)) / 2).alias("pairs"),
    ).collect()[0]
    return {
        "cells_nonempty": int(row.cells),
        "n": int(row.n),
        "max_occ": int(row.max_occ),
        "mean_occ": round(row.n / row.cells, 1),
        "pairs_total": int(row.pairs),
        "pairs_per_vec": round(row.pairs / row.n, 1),
    }


def main() -> None:
    spark = get_spark(app_name="semdedup_sweep",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    rows = []
    for label, d in LEGS:
        n = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        k_scaled = max(PIVF_K, round(n / CELL_TARGET))
        rec: dict = {"leg": label, "n": n, "k_fixed": PIVF_K,
                     "k_scaled": k_scaled}
        rec["fixed"] = occupancy(
            spark, build_ivf_index(spark, d, "full"))
        rec["scaled"] = occupancy(
            spark, build_ivf_index(spark, d, "full", k=k_scaled))
        # prune wall-clock under the scaled policy (warm + min of 2)
        dedup_semdedup_ivf(spark, d, k=k_scaled).count()  # warm
        runs = []
        for _ in range(2):
            t0 = time.time()
            dedup_semdedup_ivf(spark, d, k=k_scaled).count()
            runs.append(time.time() - t0)
        rec["prune_sec_scaled_k"] = round(min(runs), 3)
        rows.append(rec)
        print(f"[semdedup] {label}: n={n} | fixed K={PIVF_K}: "
              f"pairs/vec {rec['fixed']['pairs_per_vec']} | "
              f"scaled K={k_scaled}: pairs/vec "
              f"{rec['scaled']['pairs_per_vec']}, "
              f"prune {rec['prune_sec_scaled_k']}s", flush=True)

    with open(OUT, "w") as f:
        json.dump({"cell_target": CELL_TARGET, "legs": rows}, f, indent=2)
    print(f"[semdedup] wrote {OUT}")

    print("\n| leg | n | K fixed | pairs/vec fixed | K∝n | pairs/vec ∝n "
          "| max occ ∝n | prune s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['leg']} | {r['n']} | {r['k_fixed']} | "
              f"{r['fixed']['pairs_per_vec']} | {r['k_scaled']} | "
              f"{r['scaled']['pairs_per_vec']} | {r['scaled']['max_occ']} | "
              f"{r['prune_sec_scaled_k']} |")


if __name__ == "__main__":
    main()
