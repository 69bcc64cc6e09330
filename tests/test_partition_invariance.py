"""Partition-invariance: results must be IDENTICAL regardless of
parallelism. This is the distributed-correctness property behind every
100 TB claim — a query whose output depends on shuffle partition count
(float accumulation order, per-partition tie-breaks, rand()) would return
different answers on a 32-core box and a 1000-executor cluster.

Each representative query runs under shuffle.partitions=1 (serial
execution order) and a spiky prime (7), and the full sorted outputs must
match bit-for-bit."""

from __future__ import annotations

import pytest

from apache_flink_datastream_api_spark.registry import all_queries

from .conftest import SF_DIR

# One per family: scan-agg (decimal sums), set-op, window-analytic,
# as-of temporal, LSH dedup (hash tie-breaks), exact ANN (float ranking),
# composed pipeline (filter+dedup+sample), IO roundtrip write/read.
REPRESENTATIVES = [
    "tpch_q1_pricing_summary",
    "q_users_except",
    "q_top_order_per_customer",
    "asof_join_purchase_click",
    "dedup_minhash_lsh",
    "knn_bruteforce_cosine",
    "pipeline_clean_corpus",
    "json_source_roundtrip",
    # training-prep: sharded prefix sum + broadcast fingerprint join
    "pipeline_pack_sequences",
    "pipeline_decontaminate",
    # decimal-decomposed time-series distance + distributed top-k
    "ts_similarity_topk",
    # last-writer-wins merge through a sink roundtrip
    "merge_upsert_roundtrip",
    # exact integer-moment statistics (the order-independence claim itself)
    "q_portable_stats",
    # argmin/argmax-by-(ts,id) tie-breaks under different partitionings
    "q_ohlc_bars",
    # sharded per-source prefix sum + budget cutoff
    "pipeline_quota_sample",
    # two-level explode-agg join (repetition diagnostics)
    "text_repetition",
    # full prep flow: hash-window dedup + broadcast decontaminate + stack()
    "pipeline_pretrain_e2e",
    # iterative join+agg loop with integer-exact rank arithmetic
    "graph_pagerank",
    # value-sharded distributed rank (global rank must not depend on layout)
    "q_revenue_gini",
    # day-sharded sweep-line prefix sum (global running order)
    "q_session_concurrency",
    # one-exchange double window pass + generator fill
    "ts_forward_fill",
    # global-quantile boundaries broadcast back for binning
    "q_decile_binning",
    # value-sharded descending rank + decile bucketing
    "q_pareto_lorenz",
    # collect_list path strings must be order-deterministic via array_sort
    "q_top_journeys",
    # streaming stateful debounce through the real engine
    "x4_debounce_stream",
    # quantile-boundary quartile scores (three percentile buffers, one agg)
    "q_rfm_segmentation",
    # strict-predecessor running max over the price-point rollup
    "q_pareto_frontier",
    # recursive-CTE BFS seeded from lead() transition edges
    "q_reachable_event_types",
    # per-user sequential automaton via applyInPandas (CEP consumption)
    "q_cep_followed_by",
    # iterative centroid loop: literal-folded assignment + floor-div update
    "emb_kmeans_lloyd",
    # partition-local top-C candidate pruning must preserve the global top-C
    "knn_pq_cosine",
    # double-window argmax/argmin extremes per bucket
    "pipeline_dpo_pairs",
    # per-row-gap session merge in the session_window state machinery
    "w7_dynamic_session",
    # banded fingerprint self-join + Hamming verify over synthesized twins
    "mm_phash_dedup",
    # aligned IGNORE-NULLS carries + stale-lookback gate
    "q_attribution_last_touch",
    # forward IGNORE-NULLS absence probe + range-residual temporal join
    "q_cep_not_followed_by",
    "q_temporal_table_join",
    # 4th user of the value-sharded rank, two policies in one plan
    "pipeline_length_bucketing",
    # rounded-term DECIMAL sum (the order-independent float trick itself)
    "q_chi2_independence",
    # bigram zip + integer-lift ranking over the aggregated vocab
    "text_collocations_lift",
    # 5th sharded-rank user: tie-averaged rank sums + KS cross-products
    "q_rank_tests_ab",
    # 6th sharded-rank user: driver-located weight-crossing shard
    "q_weighted_median",
    # 7th sharded-rank user: tie-averaged x2 ranks on both join sides
    "q_spearman_corr",
    # hash-drawn Poisson replica weights + replica-mean rank pick
    "q_poisson_bootstrap_ci",
    # degree-ordered orientation + wedge closure joins
    "graph_triangle_count",
    # iterative components + per-cluster argmax keep policy
    "pipeline_canonical_docs",
    # bounds-normalized Morton sharding vs hash layout
    "layout_zorder_readout",
    # stopword-island phrases + degree/freq rollups
    "text_keyphrase_rake",
    # descending sharded cumulative shares (8th sharded-rank user)
    "q_abc_analysis",
    # 9th sharded-rank user: median of the pair-slope multiset
    "q_theil_sen_trend",
    # per-arm replica pivot + order-statistic pick over hash draws
    "q_ab_bootstrap_uplift",
    # hash-split pseudo-experiments (integer per-split means)
    "q_aa_calibration",
    # composed chunk -> chunk-BM25 -> argmax windows (float score ordering)
    "pipeline_rag_passages",
    # full-outer confusion of two derived pair sets
    "dedup_lsh_eval",
    # broadcast centroid rejoin + exact distance top-k
    "emb_centroid_outliers",
    # iterative matvec with driver rescale + in-plan final pass
    "emb_power_iteration",
    # round 2: sharded-rank stratified cut (10th user) + checksum rollup
    "pipeline_stratified_split",
    # grid cell-pair inequality join + DECIMAL pair moments
    "q_kendall_tau",
    # df-ordered prefix rank + candidate equi-join + exact verify
    "dedup_prefix_filter_join",
    # bit_or word bitmap build + broadcast probe (merge law under layout)
    "sketch_bloom_membership",
    # offset-explode kernel equi-join + DECIMAL weight sums
    "q_ewma_daily",
    # control-stream ValueState twin through the real engine
    "x6_dynamic_rules_stream",
    # fingerprint index vs delta classification window
    "dedup_incremental",
    # whole-group Arrow UDAF (group order must not matter)
    "q_pandas_udaf_median",
    # trailing-window bitmask OR (bit_or merge under any layout)
    "q_funnel_any_order",
    # real codec parse in mapInPandas (batch boundaries must not matter)
    "mm_ppm_codec_roundtrip",
    # two chained stream-stream state stores through the real engine
    "j3_threeway_stream_join",
    # decode -> integer features -> float cosine rank (exact doubles)
    "mm_ann_pipeline",
    # round 3: dup-hash cover explode + per-doc gaps-and-islands merge
    "dedup_substring_spans",
    # fingerprint dropDuplicatesWithinWatermark through the real engine
    # (kept-KEY set must not depend on which copy wins a micro-batch race)
    "x8_dedup_stream",
    # corpus-trained bigram LM: two model equi-joins + integer mean
    "text_lm_score",
    # driver-held integer model, per-epoch delta rollups (kmeans shape)
    "ml_perceptron_langid",
    # per-user sequential Holt recurrence via applyInPandas automaton
    "ts_holt_forecast",
]


def _run_sorted(spark, name, partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = all_queries()[name].fn(spark, SF_DIR)
        return sorted(map(tuple, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_partition_invariant(spark, name):
    serial = _run_sorted(spark, name, 1)
    spiky = _run_sorted(spark, name, 7)
    assert serial == spiky
