"""Query corpus registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
extensions) is exposed as a named query: a Spark callable
``(SparkSession, sf_dir) -> DataFrame`` paired with an equivalent DuckDB
oracle SQL string. The driver hash-compares the two at sf=0.01
(order-insensitive, columns sorted by name), so:

- output column names are identical on both sides,
- doubles are produced from exact DECIMAL arithmetic (order-independent)
  or rounded, never from raw float accumulation,
- timestamps are emitted as epoch-millis BIGINTs (``unix_millis`` ≡
  DuckDB ``epoch_ms``), never as raw timestamps.

Queries with ``oracle=None`` are genuinely non-SQL-expressible and get
the driver's weaker rows-only check. Exactly TWO remain —
``knn_ivf_cosine`` / ``knn_pq_cosine`` (float-trained numpy quantizers:
the k-means reduction order is not SQL-replayable) — and both are
covered three independent ways instead: recall-floor tests vs exact
brute force (tests/test_similarity.py), a hash-checked recall REPORT
(``knn_recall_report_approx``), and byte-exact checksums of the trained
centroid/codebook artifacts themselves
(tests/test_annindex.py::test_trained_quantizer_artifact_checksums).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def _collect() -> dict[str, QuerySpec]:
    from .operators import (
        analytics, annindex, behavior, dataflow, dedup, io_roundtrip,
        multimodal, partsupp, pipeline, profile, relational, similarity,
        sketches, skew, statistics, temporal, textops, trainprep,
    )
    from .sources import pydatasource
    from .streaming import queries as streaming_queries

    specs: dict[str, QuerySpec] = {}
    for mod in (relational, partsupp, analytics, behavior, dataflow, dedup,
                similarity, annindex, textops, multimodal, skew, temporal,
                sketches, pipeline, trainprep, profile, io_roundtrip,
                statistics, streaming_queries, pydatasource):
        for spec in mod.SPECS:
            assert spec.name not in specs, f"duplicate query name {spec.name}"
            specs[spec.name] = spec
    return specs


_CACHE: dict[str, QuerySpec] | None = None


def all_queries() -> dict[str, QuerySpec]:
    global _CACHE
    if _CACHE is None:
        _CACHE = _collect()
    return _CACHE
