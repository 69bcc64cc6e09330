"""Python user-defined table functions (Spark 4 UDTF API).

The declarative gap-sessionizer (``operators/temporal.py``, lag + running
sum) is the production path — whole-stage-codegen, no Python. This module
carries the UDTF form of the same operator: a per-partition-key streaming
fold over ``TABLE(...) PARTITION BY user ORDER BY ts`` input — the Spark
surface for custom table-valued operators whose per-row logic genuinely
can't be expressed as column algebra (the reference's
``RichMapFunction``-with-state shape, SURVEY.md §2.8, but batch).

Engine contract exercised: one UDTF instance per partition key, ``eval``
called in ORDER BY order, ``terminate`` flushes the open session — i.e.
exactly Flink's keyed-operator lifecycle (open/processElement/close)
mapped onto Spark's batch engine. Output is hash-checked against the
same DuckDB oracle as the declarative form.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from ..operators.temporal import SESSION_GAP_MS


class _GapSessionize:
    """Fold ordered (user_id, ts_ms) rows into gap-delimited sessions."""

    def __init__(self):
        self._user = None
        self._start = None
        self._last = None
        self._n = 0

    def eval(self, row):
        user, ts = row.user_id, row.ts_ms
        if self._user is not None and ts - self._last > SESSION_GAP_MS:
            yield self._user, self._start, self._last, self._n
            self._start, self._n = ts, 0
        if self._user is None:
            self._start = ts
        self._user, self._last = user, ts
        self._n += 1

    def terminate(self):
        if self._user is not None:
            yield self._user, self._start, self._last, self._n


GapSessionize = udtf(
    _GapSessionize,
    returnType=(
        "user_id bigint, session_start_ms bigint, "
        "session_end_ms bigint, n_events bigint"
    ),
)


def register_udtfs(spark) -> None:
    spark.udtf.register("gap_sessionize", GapSessionize)
