"""Reference dataflow surface (SURVEY.md §2.2-2.8) as batch analogs.

Each Flink DataStream construct is re-expressed as a deterministic DataFrame
transform over the driver's ``events`` table (FIXTURES.md §4 mapping:
user_id→user, event_type→operation/action, ts→event_ts). Streaming-parity
versions of the same transforms live in ``..streaming``; these batch analogs
are the oracle-checked correctness gate.

Operator map (event_type domain: click, error, purchase, signup, view):

- P1 parse       : quote-strip + split + positional cast (AuditTrail.java:15-30)
- P2 projection  : tuple projection with literal count
- P3 filter      : sentinel drop (StatefulOperations.java:130-144)
- U1 split       : side-output routing → two filters (StreamSplitAndCombine.java:66-103)
- U2 union       : connect/CoMap normalize+merge → unionByName (:119-144)
- A1 running sum : keyBy(0).reduce running total (KeyedStreamOperations.java:68-69)
- A2/W1 window count, A3/W3 sliding min/max, A4/W5 keyed window count
- W4 session window (gap), J1/W6 windowed equi-join
- X1 interval alert, X2 session durations: lag()-based batch analogs of the
  ValueState machines (StatefulOperations.java:84-129, CourseUseCase.java:114-180)

All window starts/ends are epoch-millis BIGINTs; all float aggregation goes
through DECIMAL. Windows here are hour-scale (the events table spans a
month) — durations are parameters, the 5 s demo values of the reference are
exercised in the streaming tests.

Scale notes: every groupBy below is a single hash-shuffle with map-side
partial aggregation; the window-bucket join (J1) shuffles both sides once on
(user_id, bucket) — at 100 TB you would pre-bucket both tables on user_id to
make it shuffle-free; the lag()-based analogs shuffle once on user_id and
sort within partitions (Spark's window exec spills if a key is huge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

HOUR_MS = 3_600_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- P1: CSV line parse ----------------------------------------------------

def p1_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build quoted CSV lines from events, then parse them back (the
    round-trip proves the parser; mirrors AuditTrail's strip-quotes → split
    → positional cast)."""
    e = _events(spark, sf_dir)
    line = F.expr(
        """concat('"', event_id, '","', user_id, '","', event_type, '","', unix_millis(ts), '"')"""
    )
    parts = F.split(F.regexp_replace(F.col("line"), '"', ""), ",")
    return (
        e.select(line.alias("line"))
        .select(
            parts.getItem(0).cast("long").alias("event_id"),
            parts.getItem(1).cast("long").alias("user_id"),
            parts.getItem(2).alias("event_type"),
            parts.getItem(3).cast("long").alias("ts_ms"),
        )
    )


P1_ORACLE = """
WITH lines AS (
  SELECT concat('"', event_id, '","', user_id, '","', event_type, '","', epoch_ms(ts), '"') AS line
  FROM events
), p AS (
  SELECT string_split(replace(line, '"', ''), ',') AS parts FROM lines
)
SELECT CAST(parts[1] AS BIGINT) AS event_id,
       CAST(parts[2] AS BIGINT) AS user_id,
       parts[3] AS event_type,
       CAST(parts[4] AS BIGINT) AS ts_ms
FROM p
"""


# --- P2: tuple projection --------------------------------------------------

def p2_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).select(
        "user_id", "value", F.lit(1).alias("one")
    )


P2_ORACLE = "SELECT user_id, value, 1 AS one FROM events"


# --- P3: filter ------------------------------------------------------------

def p3_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .where(F.col("event_type") != "error")
        .select("event_id", "user_id", "event_type")
    )


P3_ORACLE = "SELECT event_id, user_id, event_type FROM events WHERE event_type <> 'error'"


# --- U1: split via side output → two filters -------------------------------

def u1_split_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-output branch of the split: non-'purchase' events routed to a
    (user, 1) side stream (SalesRep branch of StreamSplitAndCombine)."""
    e = _events(spark, sf_dir)
    side = e.where(F.col("event_type") != "purchase").select(
        "user_id", F.lit(1).alias("one")
    )
    return side


U1_ORACLE = "SELECT user_id, 1 AS one FROM events WHERE event_type <> 'purchase'"


# --- U2: connect/CoMap → normalize + union ---------------------------------

def u2_connect_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    s1 = e.where(F.col("event_type") == "click").select(
        F.lit("Stream-1").alias("tag"), "user_id", F.lit(1).alias("one")
    )
    s2 = e.where(F.col("event_type") == "view").select(
        F.lit("Stream-2").alias("tag"), "user_id", F.lit(1).alias("one")
    )
    return s1.unionByName(s2)


U2_ORACLE = """
SELECT 'Stream-1' AS tag, user_id, 1 AS one FROM events WHERE event_type = 'click'
UNION ALL
SELECT 'Stream-2' AS tag, user_id, 1 AS one FROM events WHERE event_type = 'view'
"""


# --- A1: keyed running reduce ----------------------------------------------

def a1_running_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total of `value` — the batch analog of
    keyBy(user).reduce(sum): one row per input record carrying the
    cumulative sum at that point (deterministic order: ts, event_id)."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("running_total"),
    )


A1_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM events
"""


# --- A2/W1: global tumbling window count -----------------------------------

def a2_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_millis("w.start").alias("window_start_ms"), "cnt")
    )


A2_ORACLE = f"""
SELECT CAST(floor(epoch_ms(ts) / {HOUR_MS}) AS BIGINT) * {HOUR_MS} AS window_start_ms,
       COUNT(*) AS cnt
FROM events GROUP BY 1
"""


# --- A3/W3: sliding window count + min/max ts ------------------------------

def a3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.min(F.unix_millis("ts")).alias("min_ts_ms"),
            F.max(F.unix_millis("ts")).alias("max_ts_ms"),
        )
        .select(F.unix_millis("w.start").alias("window_start_ms"), "cnt", "min_ts_ms", "max_ts_ms")
    )


A3_ORACLE = f"""
WITH b AS (
  SELECT epoch_ms(ts) AS ms,
         CAST(floor(epoch_ms(ts) / {HOUR_MS}) AS BIGINT) * {HOUR_MS} AS bkt
  FROM events
), assigned AS (
  SELECT ms, bkt - k * {HOUR_MS} AS window_start_ms
  FROM b CROSS JOIN (VALUES (0), (1)) AS s(k)
)
SELECT window_start_ms, COUNT(*) AS cnt, MIN(ms) AS min_ts_ms, MAX(ms) AS max_ts_ms
FROM assigned GROUP BY 1
"""


# --- A4/W5: keyed tumbling window count ------------------------------------

def a4_keyed_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id", "event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("user_id", "event_type", F.unix_millis("w.start").alias("window_start_ms"), "cnt")
    )


A4_ORACLE = f"""
SELECT user_id, event_type,
       CAST(floor(epoch_ms(ts) / {HOUR_MS}) AS BIGINT) * {HOUR_MS} AS window_start_ms,
       COUNT(*) AS cnt
FROM events GROUP BY 1, 2, 3
"""


# --- W4: session windows (gap-based) ---------------------------------------

SESSION_GAP_MS = 6 * HOUR_MS


def w4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 6 h gap via Spark's session_window.

    Input timestamps are truncated to millis so the oracle (which works in
    epoch-millis) agrees bit-for-bit. Spark merges events when the next
    event starts strictly before prev_ts + gap, i.e. a new session starts
    iff diff >= gap — mirrored in the oracle's island logic.
    """
    e = _events(spark, sf_dir).withColumn("ts2", F.timestamp_millis(F.unix_millis("ts")))
    return (
        e.groupBy("user_id", F.session_window("ts2", "6 hours").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "cnt",
        )
    )


W4_ORACLE = f"""
WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
flagged AS (
  SELECT user_id, ms,
         CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
                OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) >= {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_s
  FROM e
), sessions AS (
  SELECT user_id, ms,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, MIN(ms) AS session_start_ms, MAX(ms) + {SESSION_GAP_MS} AS session_end_ms,
       COUNT(*) AS cnt
FROM sessions GROUP BY user_id, sid
"""


# --- J1/W6: windowed stream-stream equi-join -------------------------------

def j1_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-bucket equi-join (Flink's where/equalTo/window/apply): 'view'
    stream x 'purchase' stream joined on user within the same 1 h tumbling
    window; the reference emits one row per matched pair — we emit the pair
    count per (user, window), the same information without the cartesian
    blow-up in the output."""
    e = _events(spark, sf_dir)
    bucket = F.unix_millis(F.window("ts", "1 hour").getField("start"))
    a = e.where(F.col("event_type") == "view").select(
        F.col("user_id"), bucket.alias("w")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user_id"), bucket.alias("b_w")
    )
    return (
        a.join(b, (a.user_id == b.b_user_id) & (a.w == b.b_w))
        .groupBy("user_id", F.col("w").alias("window_start_ms"))
        .agg(F.count("*").alias("pair_cnt"))
    )


J1_ORACLE = f"""
WITH a AS (
  SELECT user_id, CAST(floor(epoch_ms(ts) / {HOUR_MS}) AS BIGINT) * {HOUR_MS} AS w
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, CAST(floor(epoch_ms(ts) / {HOUR_MS}) AS BIGINT) * {HOUR_MS} AS w
  FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id AS user_id, a.w AS window_start_ms, COUNT(*) AS pair_cnt
FROM a JOIN b ON a.user_id = b.user_id AND a.w = b.w
GROUP BY 1, 2
"""


# --- X1: interval alert (2 'error's < 6 h apart) ---------------------------

ALERT_THRESHOLD_MS = 6 * HOUR_MS


def x1_interval_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the ValueState last-delete alert: per user, alert on
    consecutive 'error' events closer than the threshold. The streaming
    twin (applyInPandasWithState) is `x1_stateful_stream`."""
    e = _events(spark, sf_dir).where(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.lag(F.unix_millis("ts")).over(w).alias("prev_ms"),
    )
    return (
        d.where(F.col("prev_ms").isNotNull() & (F.col("ts_ms") - F.col("prev_ms") < ALERT_THRESHOLD_MS))
        .select("user_id", "ts_ms", (F.col("ts_ms") - F.col("prev_ms")).alias("diff_ms"))
    )


X1_ORACLE = f"""
WITH d AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events WHERE event_type = 'error'
), l AS (
  SELECT user_id, ts_ms,
         lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms
  FROM d
)
SELECT user_id, ts_ms, ts_ms - prev_ms AS diff_ms
FROM l WHERE prev_ms IS NOT NULL AND ts_ms - prev_ms < {ALERT_THRESHOLD_MS}
"""


# --- X2: session durations state machine -----------------------------------

def x2_session_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the session-duration tracker: per user ordered by
    time, emit (user, prev_action, duration) for every event whose
    predecessor exists and was not a session-ending 'purchase' (the Logout
    analog; 'signup' is the Login analog — it only seeds state, which the
    lag() formulation gives for free)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.lag("event_type").over(w).alias("prev_action"),
        F.lag(F.unix_millis("ts")).over(w).alias("prev_ms"),
    )
    return (
        d.where(F.col("prev_action").isNotNull() & (F.col("prev_action") != "purchase"))
        .select(
            "user_id",
            F.col("prev_action").alias("action"),
            "ts_ms",
            (F.col("ts_ms") - F.col("prev_ms")).alias("duration_ms"),
        )
    )


X2_ORACLE = """
WITH l AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_action,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
  FROM events
)
SELECT user_id, prev_action AS action, ts_ms, ts_ms - prev_ms AS duration_ms
FROM l WHERE prev_action IS NOT NULL AND prev_action <> 'purchase'
"""


SPECS = [
    QuerySpec("p1_csv_parse", p1_csv_parse, P1_ORACLE,
              "quote-strip + split + positional cast round-trip", ("parse",)),
    QuerySpec("p2_projection", p2_projection, P2_ORACLE,
              "tuple projection with literal", ("parse",)),
    QuerySpec("p3_filter", p3_filter, P3_ORACLE, "filter", ("parse",)),
    QuerySpec("u1_split_side_output", u1_split_side_output, U1_ORACLE,
              "side-output split as filter", ("dataflow",)),
    QuerySpec("u2_connect_union", u2_connect_union, U2_ORACLE,
              "connect/CoMap as normalize+union", ("dataflow",)),
    QuerySpec("a1_running_reduce", a1_running_reduce, A1_ORACLE,
              "keyed running sum (keyBy.reduce analog)", ("agg",)),
    QuerySpec("a2_window_count", a2_window_count, A2_ORACLE,
              "global tumbling window count (W1)", ("window",)),
    QuerySpec("a3_sliding_window", a3_sliding_window, A3_ORACLE,
              "sliding window count+min+max (W3)", ("window",)),
    QuerySpec("a4_keyed_window_count", a4_keyed_window_count, A4_ORACLE,
              "keyed tumbling window count (W5)", ("window",)),
    QuerySpec("w4_session_window", w4_session_window, W4_ORACLE,
              "session windows, 6h gap", ("window",)),
    QuerySpec("j1_window_join", j1_window_join, J1_ORACLE,
              "windowed stream-stream equi-join (W6)", ("join",)),
    QuerySpec("x1_interval_alert", x1_interval_alert, X1_ORACLE,
              "ValueState interval alert, lag() analog", ("stateful",)),
    QuerySpec("x2_session_durations", x2_session_durations, X2_ORACLE,
              "session-duration state machine, lag() analog", ("stateful",)),
]


# --- W7: DYNAMIC-gap session windows ----------------------------------------
# Spark-4 surface Flink 1.9's fixed-gap sessions lack entirely
# (``chapter3/WindowingOperations.java:147-150`` hardcodes 5 s): the gap
# is a PER-ROW expression — purchases hold a session open twice as long
# as other activity. Merge rule: each event spans [ts, ts+gap(event));
# overlapping spans per key coalesce. The oracle mirrors it as an
# islands computation whose boundary is a STRICT-PRECEDING RUNNING MAX
# of span ends (a plain lag() is wrong here: a long early span can
# swallow several short later ones).

W7_GAP_DEFAULT_MS = 6 * HOUR_MS
W7_GAP_PURCHASE_MS = 12 * HOUR_MS


def w7_dynamic_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).withColumn(
        "ts2", F.timestamp_millis(F.unix_millis("ts"))
    )
    gap = F.when(F.col("event_type") == "purchase", F.lit("12 hours")).otherwise(
        F.lit("6 hours")
    )
    return (
        e.groupBy("user_id", F.session_window("ts2", gap).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "cnt",
        )
    )


W7_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id,
         CASE WHEN event_type = 'purchase' THEN {W7_GAP_PURCHASE_MS}
              ELSE {W7_GAP_DEFAULT_MS} END AS gap
  FROM events
), m AS (
  SELECT user_id, ms, event_id, gap,
         MAX(ms + gap) OVER (PARTITION BY user_id ORDER BY ms, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_end
  FROM e
), f AS (
  SELECT user_id, ms, event_id, gap,
         CASE WHEN prev_end IS NULL OR ms >= prev_end THEN 1 ELSE 0 END AS ns
  FROM m
), s AS (
  SELECT user_id, ms, gap,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f
)
SELECT user_id, MIN(ms) AS session_start_ms, MAX(ms + gap) AS session_end_ms,
       COUNT(*) AS cnt
FROM s GROUP BY user_id, sid
"""


SPECS += [
    QuerySpec("w7_dynamic_session", w7_dynamic_session, W7_ORACLE,
              "dynamic per-row-gap session windows (purchases hold 2x longer)",
              ("window", "spark4")),
]


# --- W8: COUNT windows (Flink countWindow family) ----------------------------
# The DataStream API's other window family (``countWindow(N)``): per-key
# tumbling windows of N EVENTS, firing only when full — the trailing
# partial window stays open (Flink semantics; the streaming twin keeps
# it in state). Batch analog: (row_number - 1) div N over the keyed
# event order, full windows only. Exact value sums in integer cents.

COUNT_WINDOW_N = 10


def w8_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).selectExpr(
        "user_id", "unix_millis(ts) AS ts_ms", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("win_idx", F.expr(f"(rn - 1) div {COUNT_WINDOW_N}"))
        .groupBy("user_id", "win_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_ms").alias("start_ts_ms"),
            F.max("ts_ms").alias("end_ts_ms"),
            F.sum(F.expr("CAST(cents AS DECIMAL(18,0))")).cast("long").alias("sum_cents"),
        )
        .where(F.col("n_events") == COUNT_WINDOW_N)
    )


W8_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) - 1)
              // {COUNT_WINDOW_N} AS win_idx
  FROM events
)
SELECT user_id, win_idx, COUNT(*) AS n_events,
       MIN(ts_ms) AS start_ts_ms, MAX(ts_ms) AS end_ts_ms,
       CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS sum_cents
FROM e GROUP BY user_id, win_idx
HAVING COUNT(*) = {COUNT_WINDOW_N}
"""


SPECS += [
    QuerySpec("w8_count_window", w8_count_window, W8_ORACLE,
              "per-key tumbling COUNT windows of 10 events, full windows only",
              ("window", "count")),
]


# --- U2/X: control-stream-configured filtering (broadcast-state family) ------
# Flink's remaining connect() idiom: a CONTROL stream updates per-key rules
# that a data stream is evaluated against (KeyedBroadcastProcessFunction /
# CoProcessFunction-with-state — the dynamic-fraud-rules shape). Control
# rows ride the same source here (every RULE_MOD-th event re-arms its
# event_type's alert threshold to that event's cents); data rows alert
# when cents >= the threshold current AT THEIR POSITION in (ts, event_id)
# order. Batch form: the rule carry is one aligned IGNORE-NULLS window —
# a single event_type exchange, no join. The streaming twin
# (x6_dynamic_rules_stream) holds the threshold in per-key ValueState so
# rule updates late in batch N bind data rows early in batch N+1.

RULE_MOD = 50
RULE_DEFAULT_CENTS = 9000


def q_dynamic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "unix_millis(ts) AS ts_ms", "event_id",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        f"event_id % {RULE_MOD} = 0 AS is_rule",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rule_c = F.expr("CASE WHEN is_rule THEN cents END")
    thr = F.coalesce(
        F.last(rule_c, ignorenulls=True).over(w),
        F.lit(RULE_DEFAULT_CENTS).cast("long"),
    )
    return (
        ev.withColumn("threshold_cents", thr)
        .where("NOT is_rule")
        .where(F.col("cents") >= F.col("threshold_cents"))
        .select("event_type", "ts_ms", "event_id", "cents", "threshold_cents")
    )


Q_DYNAMIC_RULES_ORACLE = f"""
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ts_ms, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         event_id % {RULE_MOD} = 0 AS is_rule
  FROM events
), c AS (
  SELECT event_type, ts_ms, event_id, cents, is_rule,
         coalesce(last_value(CASE WHEN is_rule THEN cents END IGNORE NULLS)
                    OVER (PARTITION BY event_type ORDER BY ts_ms, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  {RULE_DEFAULT_CENTS}) AS threshold_cents
  FROM e
)
SELECT event_type, ts_ms, event_id, cents, threshold_cents
FROM c WHERE NOT is_rule AND cents >= threshold_cents
"""


SPECS += [
    QuerySpec("q_dynamic_rules", q_dynamic_rules, Q_DYNAMIC_RULES_ORACLE,
              "control-stream rule updates filtering a keyed data stream",
              ("dataflow", "connect", "stateful")),
]
