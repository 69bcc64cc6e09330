"""PySpark-native analytics engine with the capability surface of
``wangrollin/apache-flink-datastream-api`` (Flink 1.9 DataStream API
examples), re-designed Spark-first.

Layout
------
- ``session``    SparkSession factory tuned for large-scale execution (AQE,
                 Arrow, skew handling) — E1/E2 in SURVEY.md §2.10.
- ``schemas``    explicit StructTypes for every record shape (§1).
- ``sources``    batch + streaming sources: parquet tables, CSV file-monitor
                 (S1), Kafka (S2), rate-source demo generators (S3).
- ``functions``  reusable column-expression libraries: CSV parsing (P1/P2),
                 portable 64-bit hashing, text metrics, vector math.
- ``operators``  the operator inventory of SURVEY.md §2 as composable
                 DataFrame transforms, plus the LLM-data-pipeline extensions
                 (dedup, similarity, text analysis, multimodal).
- ``streaming``  Structured Streaming parity: watermarks + late-data capture
                 (T2/T3), stateful per-key processors (X1/X2), sinks (K1-K3).
- ``plans``      plan-inspection utilities (pushdown/broadcast assertions).
- ``registry``   the query corpus: every operator exposed as a named query
                 with a DuckDB oracle for hash-checked correctness.

Everything here is public-knowledge PySpark; nothing is copied from the
reference — it is a from-scratch Spark-first design (see SURVEY.md).
"""

__version__ = "0.1.0"
