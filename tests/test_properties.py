"""Property tests (SURVEY.md §5 strategy 3): window/state invariants that
must hold for ANY event stream, checked on hypothesis-generated inputs
against independent pure-Python references.

Spark roundtrips are ~1 s each, so examples are few but adversarially
shrunk; the deterministic fixture tests cover volume, these cover shape.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window, functions as F

pytestmark = pytest.mark.filterwarnings("ignore")

# (user, ts_ms, duration) events; ts in a few-minute span with ms jitter
EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=300_000),
        st.integers(min_value=1, max_value=10),
    ),
    min_size=1,
    max_size=60,
)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, events):
    rows = [(u, ts, d, i) for i, (u, ts, d) in enumerate(events)]
    return spark.createDataFrame(
        rows, "user string, ts_ms long, duration long, event_id long"
    ).withColumn("event_ts", F.timestamp_millis("ts_ms"))


@given(events=EVENTS)
@PROP_SETTINGS
def test_tumbling_windows_partition_the_stream(spark, events):
    df = _df(spark, events)
    counts = df.groupBy(F.window("event_ts", "5 seconds")).count()
    assert sum(r["count"] for r in counts.collect()) == len(events)


@given(events=EVENTS)
@PROP_SETTINGS
def test_sliding_windows_cover_each_row_twice(spark, events):
    # size = 2 x slide => every row falls in exactly 2 windows
    df = _df(spark, events)
    counts = df.groupBy(F.window("event_ts", "10 seconds", "5 seconds")).count()
    assert sum(r["count"] for r in counts.collect()) == 2 * len(events)


@given(events=EVENTS, gap_s=st.sampled_from([3, 7]))
@PROP_SETTINGS
def test_session_windows_match_gap_reference(spark, events, gap_s):
    """Per user: number of sessions == 1 + count of gaps > gap between
    consecutive events (the definition of gap-based sessionization)."""
    df = _df(spark, events)
    got = (
        df.groupBy("user", F.session_window("event_ts", f"{gap_s} seconds"))
        .count()
        .groupBy("user")
        .count()
    )
    got_sessions = {r.user: r["count"] for r in got.collect()}

    by_user = defaultdict(list)
    for u, ts, _ in events:
        by_user[u].append(ts)
    want = {
        u: 1 + sum(
            1
            for a, b in zip(sorted(ts), sorted(ts)[1:])
            if b - a >= gap_s * 1000
        )
        for u, ts in by_user.items()
    }
    assert got_sessions == want


@given(events=EVENTS, threshold_ms=st.sampled_from([1_000, 30_000]))
@PROP_SETTINGS
def test_interval_alert_lag_analog_matches_reference(spark, events, threshold_ms):
    """X1 semantics: one alert per consecutive same-user pair closer than
    the threshold — Spark lag() analog vs a pure-Python reference."""
    df = _df(spark, events)
    w = Window.partitionBy("user").orderBy("ts_ms", "event_id")
    got = (
        df.select(
            "user",
            (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("diff"),
        )
        .where(F.col("diff").isNotNull() & (F.col("diff") < threshold_ms))
        .count()
    )

    by_user = defaultdict(list)
    for i, (u, ts, _) in enumerate(events):
        by_user[u].append((ts, i))
    want = sum(
        1
        for seq in by_user.values()
        for (a, _), (b, _) in zip(sorted(seq), sorted(seq)[1:])
        if b - a < threshold_ms
    )
    assert got == want


@given(events=EVENTS)
@PROP_SETTINGS
def test_window_join_count_identity(spark, events):
    """J1 invariant: |A join B on (user, window)| == Σ_{user,w} nA·nB."""
    df = _df(spark, events)
    bucket = F.unix_millis(F.window("event_ts", "5 seconds").getField("start"))
    a = df.select("user", bucket.alias("w"))
    b = a.selectExpr("user AS user2", "w AS w2")
    joined = a.join(
        b, (F.col("user") == F.col("user2")) & (F.col("w") == F.col("w2"))
    )
    per_group = a.groupBy("user", "w").count()
    want = sum(r["count"] ** 2 for r in per_group.collect())
    # self-join: every pair within (user, window), including self-pairs
    assert joined.count() == want


VALUES = st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                  max_size=80)


@given(values=VALUES)
@PROP_SETTINGS
def test_tie_rank2_rank_sum_invariant(spark, values):
    """The value-sharded tie-averaged rank map must satisfy the exact
    rank-sum law Σ cnt·r2 = n(n+1) (twice the sum of 1..n) for ANY
    multiset — the invariant every Spearman/Mann-Whitney consumer of
    the distributed rank machinery leans on — and reproduce a pure-
    Python tie-averaged ranking exactly."""
    from apache_flink_datastream_api_spark.operators.statistics import _tie_rank2

    df = spark.createDataFrame([(v,) for v in values], "v long")
    got = {r.v: (r.cnt, r.r2) for r in _tie_rank2(df, 37).collect()}

    n = len(values)
    assert sum(c * r2 for c, r2 in got.values()) == n * (n + 1)

    svals = sorted(values)
    for v in set(values):
        less = sum(1 for x in svals if x < v)
        tied = sum(1 for x in svals if x == v)
        assert got[v] == (tied, 2 * less + tied + 1)


def test_substring_spans_semantics(spark):
    """Substring-dedup invariants on the real corpus: every removal span
    covers at least SUB_K tokens (a span exists only because a full
    K-window of duplicated positions does), spans within a doc are
    disjoint AND non-adjacent (maximally merged islands), and every span
    lies inside its document's token range."""
    from apache_flink_datastream_api_spark.operators.dedup import (
        SUB_K, dedup_substring_spans)
    from apache_flink_datastream_api_spark.registry import all_queries  # noqa: F401
    from .conftest import SF_DIR

    rows = dedup_substring_spans(spark, SF_DIR).collect()
    assert rows, "corpus has cross-doc duplicated spans by construction"
    by_doc = {}
    for r in rows:
        assert r.n_tokens >= SUB_K
        assert r.span_end - r.span_start + 1 == r.n_tokens
        assert r.n_chars >= r.n_tokens  # >= 1 char per token + spaces
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, "adjacent/overlapping spans must merge"
