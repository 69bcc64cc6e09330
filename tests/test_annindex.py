"""Contract tests for the persisted, incrementally-maintained ANN index
(operators/annindex). The oracle already pins WHAT each query returns;
these pin the PRODUCTION properties the hash cannot see: the serve path
reads only the stored artifact (pruned), the build runs once, the delta
append never rewrites history, and the approximate answer is close to
the exact one."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apache_flink_datastream_api_spark.operators.annindex import (
    N_QUERIES,
    PIVF_NPROBE,
    TOP_K,
    build_ivf_index,
    knn_index_delta,
    knn_ivf_persisted,
)
from apache_flink_datastream_api_spark.operators.similarity import (
    knn_bruteforce_cosine,
)
from apache_flink_datastream_api_spark.plans.inspect import explain_string

from .conftest import SF_DIR


def test_serve_plan_reads_only_the_index_and_prunes(spark):
    """The serve path must not rescan the raw embeddings table, must
    partition-prune the candidate scan to the probed cells, and must not
    run any training exchange — its only wide exchange is the per-query
    top-k window."""
    df = knn_ivf_persisted(spark, SF_DIR)
    plan = explain_string(df)
    assert "embeddings.parquet" not in plan, plan
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cluster_id" in l for l in scan_lines), plan
    wide = [
        l for l in plan.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(wide) <= 2, plan  # rank shuffle (+ at most an AQE read)


def test_index_builds_once_per_session(spark):
    p1 = build_ivf_index(spark, SF_DIR, "full")
    marker = os.path.join(p1, "centroids", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    knn_ivf_persisted(spark, SF_DIR).collect()
    p2 = build_ivf_index(spark, SF_DIR, "full")
    assert p1 == p2
    assert os.path.getmtime(marker) == mtime  # no rebuild, no rewrite


def test_persisted_recall_floor_vs_bruteforce(spark):
    """nprobe=6 of 16 cells must retrieve a solid share of the exact
    top-K; recall below the floor means the quantizer or probe order
    broke even if hashes still match the (same-broken) oracle."""
    brute = {
        (r.qid, r.neighbor_id)
        for r in knn_bruteforce_cosine(spark, SF_DIR).collect()
    }
    served = {
        (r.qid, r.neighbor_id)
        for r in knn_ivf_persisted(spark, SF_DIR).collect()
    }
    recall = len(brute & served) / (N_QUERIES * TOP_K)
    assert recall >= 0.5, recall
    assert PIVF_NPROBE < 16  # the scan is genuinely partial


def test_delta_append_never_rewrites_history(spark):
    """knn_index_delta must add files, not touch the stored history
    partitions: identical file set with identical mtimes before/after,
    and the merged history portion must equal the stored assignment."""
    base = build_ivf_index(spark, SF_DIR, "hist")

    def snapshot() -> dict[str, float]:
        out = {}
        for root, _, files in os.walk(os.path.join(base, "assign")):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    before = snapshot()
    result = knn_index_delta(spark, SF_DIR)
    rows = result.collect()
    assert snapshot() == before

    hist_n = spark.read.parquet(os.path.join(base, "assign")).count()
    assert sum(r.n_history for r in rows) == hist_n
    assert sum(r.n_delta for r in rows) > 0
    # frozen-centroid contract: history rows keep their stored cell
    hist_cells = {
        r.vec_id: r.cluster_id
        for r in spark.read.parquet(os.path.join(base, "assign"))
        .select("vec_id", "cluster_id").collect()
    }
    delta_min = spark.read.parquet(os.path.join(base, "assign_delta")) \
        .agg(F.min("vec_id")).collect()[0][0]
    assert delta_min > max(hist_cells)


# Trained-artifact checksums (VERDICT r5 item 7): knn_ivf_cosine /
# knn_pq_cosine are rows-only in the driver gate because SQL cannot
# replay float k-means — but the TRAINED ARTIFACTS themselves are
# deterministic given the md5-ordered seed draw, so pin their exact
# bytes. Together with the recall-floor tests this closes the last
# "trust me" gap on the two rows-only queries. Hashes measured under
# pyspark 4.1.2 / numpy 1.26.4 (a different build that drifts here is
# quantizer drift, not necessarily a bug — the recall floors stay the
# independent correctness gate).
_ARTIFACT_PINS = {
    "/root/testdata/sf0.001": {
        "ivf_float_centroids": "fa9b5553c17fcb95",
        "pq_codebooks": "83c12d7707c6e7de",
        "ivf_int8_centroids": "86c3d7c08c080288",
    },
    "/root/testdata/sf0.01": {
        "ivf_float_centroids": "52c28491bb9cc5d2",
        "pq_codebooks": "e87201ac90868b11",
        "ivf_int8_centroids": "92ffd51e14cdd7b3",
    },
}


def test_trained_quantizer_artifact_checksums(spark):
    import hashlib

    import pytest

    pins = _ARTIFACT_PINS.get(SF_DIR)
    if pins is None:
        pytest.skip(f"no artifact pins for {SF_DIR}")
    from apache_flink_datastream_api_spark.operators.annindex import (
        _load_centroids,
    )
    from apache_flink_datastream_api_spark.operators.similarity import (
        ivf_centroids_for,
        pq_codebooks_for,
    )

    c = ivf_centroids_for(spark, SF_DIR)
    b = pq_codebooks_for(spark, SF_DIR)
    ic = _load_centroids(spark, build_ivf_index(spark, SF_DIR))
    got = {
        "ivf_float_centroids": hashlib.sha256(c.tobytes()).hexdigest()[:16],
        "pq_codebooks": hashlib.sha256(b.tobytes()).hexdigest()[:16],
        "ivf_int8_centroids": hashlib.sha256(
            ic.astype("int64").tobytes()).hexdigest()[:16],
    }
    assert got == pins


def test_compaction_never_rewrites_sources_and_routes_cells(spark):
    """knn_index_compact must (1) leave the stored history AND delta
    files byte-untouched (it writes a NEW compacted location; superseded
    files merely become GC-eligible), (2) materialize exactly the cells
    its integer threshold flags, and (3) agree with the pre-compaction
    delta accounting cell-for-cell — nothing lost, nothing duplicated."""
    from apache_flink_datastream_api_spark.operators.annindex import (
        COMPACT_PCT, PIVF_K, _INDEX_CACHE, knn_index_compact,
    )

    knn_index_delta(spark, SF_DIR)  # ensure sources exist pre-snapshot
    base = _INDEX_CACHE[(SF_DIR, "hist", PIVF_K)]

    def snapshot(sub: str) -> dict[str, float]:
        out = {}
        for root, _, files in os.walk(os.path.join(base, sub)):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    before = {s: snapshot(s) for s in ("assign", "assign_delta")}
    rows = knn_index_compact(spark, SF_DIR).collect()
    assert {s: snapshot(s) for s in ("assign", "assign_delta")} == before

    flagged = {r.cluster_id for r in rows if r.is_compacted == 1}
    assert flagged and flagged != {r.cluster_id for r in rows}, \
        "test data should exercise BOTH compacted and untouched cells"
    comp_dir = os.path.join(base, "assign_compacted")
    materialized = {
        int(d.split("=")[1]) for d in os.listdir(comp_dir)
        if d.startswith("cluster_id=")
    }
    assert materialized == flagged
    for r in rows:
        assert (r.n_delta * 100 > COMPACT_PCT * (r.n_history + r.n_delta)) \
            == (r.is_compacted == 1)

    pre = {r.cluster_id: r for r in knn_index_delta(spark, SF_DIR).collect()}
    assert {r.cluster_id for r in rows} == set(pre)
    for r in rows:
        assert r.n_history == pre[r.cluster_id].n_history
        assert r.n_delta == pre[r.cluster_id].n_delta
        assert r.id_checksum == pre[r.cluster_id].id_checksum


def test_compacted_serve_row_identical_to_delta_serve(spark):
    """Compaction must be invisible to queries: serving against the
    post-compaction layout returns row-identical top-k to serving the
    original history+delta layout (also enforced cross-engine by
    registering the delta-serve oracle verbatim for the compacted
    query)."""
    from apache_flink_datastream_api_spark.operators.annindex import (
        knn_ivf_compacted_serve, knn_ivf_delta_serve,
    )

    cols = ["qid", "rank", "neighbor_id", "cos_sim"]
    a = sorted(map(tuple, knn_ivf_delta_serve(spark, SF_DIR)
                   .select(*cols).collect()))
    b = sorted(map(tuple, knn_ivf_compacted_serve(spark, SF_DIR)
                   .select(*cols).collect()))
    assert a == b
