"""Recall pinning for the approximate ANN path: LSH results have no
cross-engine oracle, so correctness = (a) every returned neighbor's
cosine is exact and correctly ranked, (b) recall@k vs brute force is
bounded below. With near-random embeddings and 4-bit band buckets the
candidate sets are large, so recall is high; the floor here guards
against a broken signature/banding, not sketch noise."""

from __future__ import annotations

from collections import defaultdict

from apache_flink_datastream_api_spark.operators.similarity import (
    IVF_K,
    IVF_NPROBE,
    TOP_K,
    ivf_assignment_table,
    knn_bruteforce_arrow,
    knn_bruteforce_cosine,
    knn_ivf_cosine,
    knn_lsh_cosine,
)

from .conftest import SF_DIR


def _topk(df):
    out = defaultdict(dict)
    for r in df.collect():
        out[r.qid][r.neighbor_id] = (r.rank, r.cos_sim)
    return out


def test_lsh_recall_and_exact_rerank(spark):
    exact = _topk(knn_bruteforce_cosine(spark, SF_DIR))
    approx = _topk(knn_lsh_cosine(spark, SF_DIR))
    assert approx.keys() == exact.keys()

    total_hits = 0
    for qid, exact_nbrs in exact.items():
        got = approx[qid]
        assert len(got) <= TOP_K
        # (a) any neighbor ALSO in the exact top-k must carry the same
        # exact cosine (the re-rank stage computes true cosine, not an
        # approximation)
        for nid, (_, cos) in got.items():
            if nid in exact_nbrs:
                assert abs(cos - exact_nbrs[nid][1]) < 1e-9
        total_hits += len(set(got) & set(exact_nbrs))
    recall = total_hits / sum(len(v) for v in exact.values())
    # The testdata embeddings are near-random — the hardest case for LSH
    # (real corpora cluster, inflating recall). Broken banding/signatures
    # would collapse recall to the random-candidate rate (~4 bands / 2^4
    # ≈ 0.22 here); observed healthy recall is ~0.46. The floor separates
    # those regimes rather than chasing sketch noise.
    assert recall >= 0.35, f"recall@{TOP_K} = {recall:.2f}"


def test_arrow_scan_matches_jvm(spark):
    """The mapInArrow scan variant must be BIT-identical to the zip_with
    plan: same neighbors, same ranks, same float64 cosines to the last
    bit — the per-dimension numpy accumulation reproduces the JVM fold's
    left-to-right operation order exactly, which is what lets both
    variants share one DuckDB oracle."""
    jvm = sorted(tuple(r) for r in knn_bruteforce_cosine(spark, SF_DIR).collect())
    arrow = sorted(tuple(r) for r in knn_bruteforce_arrow(spark, SF_DIR).collect())
    assert arrow == jvm


def test_ivf_assignment_is_total_partition(spark):
    """Every vector lands in exactly one of the IVF_K cells."""
    assign = ivf_assignment_table(spark, SF_DIR)
    n_vecs = assign.count()
    assert assign.select("vec_id").distinct().count() == n_vecs
    clusters = [r.cluster_id for r in assign.select("cluster_id").distinct().collect()]
    assert set(clusters) <= set(range(1, IVF_K + 1))
    # near-random data: no cell should swallow the corpus (a degenerate
    # quantizer would send everything to one cell and kill the probe win)
    biggest = assign.groupBy("cluster_id").count().agg({"count": "max"}).first()[0]
    assert biggest < n_vecs * 0.5


def test_ivf_recall_and_exact_rerank(spark):
    exact = _topk(knn_bruteforce_cosine(spark, SF_DIR))
    approx = _topk(knn_ivf_cosine(spark, SF_DIR))
    assert approx.keys() == exact.keys()

    total_hits = 0
    for qid, exact_nbrs in exact.items():
        got = approx[qid]
        assert len(got) <= TOP_K
        for nid, (_, cos) in got.items():
            if nid in exact_nbrs:
                assert abs(cos - exact_nbrs[nid][1]) < 1e-9
        total_hits += len(set(got) & set(exact_nbrs))
    recall = total_hits / sum(len(v) for v in exact.values())
    # Probing nprobe/K of a near-random corpus blindly would land at
    # ~nprobe/K = 0.38 recall; a working coarse quantizer concentrates
    # true neighbors in probed cells (observed ~0.72 at sf0.01). The
    # floor separates working-index from random-probe regimes.
    assert recall >= 0.5, f"recall@{TOP_K} = {recall:.2f} (nprobe={IVF_NPROBE})"


def test_pq_codes_are_total_and_in_range(spark):
    """Every vector gets exactly PQ_M codes, each within [0, PQ_KS)."""
    from apache_flink_datastream_api_spark.operators.similarity import (
        PQ_KS, PQ_M, pq_codes_table,
    )

    from apache_flink_datastream_api_spark.sources.tables import load_table

    codes = pq_codes_table(spark, SF_DIR)
    rows = codes.collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n_vecs
    for r in rows:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_KS for c in r.codes)
    # codebooks must actually discriminate: no subspace collapses to one code
    from collections import Counter
    for m in range(PQ_M):
        used = Counter(r.codes[m] for r in rows)
        assert len(used) >= PQ_KS // 2, f"subspace {m} uses only {len(used)} codes"


def test_pq_recall_and_exact_rerank(spark):
    from apache_flink_datastream_api_spark.operators.similarity import (
        PQ_CAND, knn_pq_cosine,
    )

    exact = _topk(knn_bruteforce_cosine(spark, SF_DIR))
    approx = _topk(knn_pq_cosine(spark, SF_DIR))
    assert approx.keys() == exact.keys()

    total_hits = 0
    for qid, exact_nbrs in exact.items():
        got = approx[qid]
        assert len(got) <= TOP_K
        for nid, (_, cos) in got.items():
            if nid in exact_nbrs:
                assert abs(cos - exact_nbrs[nid][1]) < 1e-9
        total_hits += len(set(got) & set(exact_nbrs))
    recall = total_hits / sum(len(v) for v in exact.values())
    # A random PQ_CAND-of-corpus candidate set would land at
    # ~PQ_CAND/500 = 0.1 recall; working 8-byte codes on near-random
    # vectors measure ~0.56. The floor separates the two regimes.
    assert recall >= 0.35, f"recall@{TOP_K} = {recall:.2f} (cand={PQ_CAND})"


def test_recall_report_queries_agree_with_floors(spark):
    """The driver-visible recall report must tell the same story as the
    recall-floor tests above: per-method mean recall_ppm over the query
    set sits above the pinned floors, and every row is internally
    consistent (overlap <= retrieved <= k, recall_ppm = overlap/k)."""
    from apache_flink_datastream_api_spark.registry import all_queries
    from .conftest import SF_DIR

    rows = all_queries()["knn_recall_report"].fn(spark, SF_DIR).collect()
    rows += all_queries()["knn_recall_report_approx"].fn(spark, SF_DIR).collect()
    by_method: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_retrieved <= r.k
        assert r.recall_ppm == r.n_overlap * 1_000_000 // r.k
        by_method.setdefault(r.method, []).append(r.recall_ppm)
    # int8 scalar quantization barely perturbs cosine ranking: near-1.0
    floors = {"lsh": 350_000, "ivf": 500_000, "pq": 350_000, "int8": 850_000}
    assert set(by_method) == set(floors)
    for m, vals in by_method.items():
        mean = sum(vals) / len(vals)
        assert mean >= floors[m], f"{m}: mean recall_ppm {mean}"
