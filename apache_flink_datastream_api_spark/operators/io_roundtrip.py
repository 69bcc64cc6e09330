"""Source/sink format roundtrips (SURVEY.md §2.1 S1-S3 / §2.9 K1-K4
extensions beyond the reference's CSV+Kafka surface).

The reference reads CSV files and Kafka topics and writes rows/Kafka
(``chapter2/BasicStreamingOperations.java:52-60,94-108``); a production
Spark engine additionally needs JSON-lines ingestion and partitioned
columnar output. Both are pinned here as write-then-read-back queries whose
final aggregate must hash-match the oracle computed from the original
parquet — any loss/corruption/duplication in the format path breaks the
match.

Scale notes:
- JSON reads use an EXPLICIT schema: schema inference reads the data
  twice and silently widens types; at 100 TB inference is a full extra
  scan.
- The parquet sink partitions by a low-cardinality column
  (``partitionBy``): one directory per value, so downstream queries that
  filter on it prune whole partitions at file-listing time. High-cardinality
  partition keys (like custkey) would mean millions of tiny files —
  bucketing (sources/bucketing.py) is the right tool there.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..registry import QuerySpec
from ..sources.tables import load_table

JSON_LIMIT = 2000


def json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events slice → JSON-lines files → read back (explicit schema) →
    per-type counts. Timestamps ride as epoch-millis BIGINTs (JSON has no
    timestamp type; strings would re-open timezone parsing)."""
    src = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < JSON_LIMIT)
        .selectExpr("event_id", "user_id", "event_type", "unix_millis(ts) AS ts_ms")
    )
    json_dir = tempfile.mkdtemp(prefix="json_src_")
    src.write.mode("overwrite").json(json_dir)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(json_dir)
    return back.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.min("ts_ms").alias("first_ts_ms"),
        F.max("ts_ms").alias("last_ts_ms"),
    )


JSON_ROUNDTRIP_ORACLE = f"""
SELECT event_type, COUNT(*) AS cnt,
       MIN(epoch_ms(ts)) AS first_ts_ms,
       MAX(epoch_ms(ts)) AS last_ts_ms
FROM events WHERE event_id < {JSON_LIMIT} GROUP BY 1
"""


def partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderpriority → read back with a
    partition filter → aggregate. The filter on the partition column is
    satisfied from directory names alone (partition pruning — the scan
    never opens the skipped partitions' files)."""
    out_dir = os.path.join(tempfile.mkdtemp(prefix="part_sink_"), "orders")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_orderdate_ms", F.unix_millis("o_orderdate"))
        .drop("o_orderdate")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


PARTITIONED_SINK_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
GROUP BY 1
"""


CORRUPT_MOD = 7  # every 7th record is written malformed


def json_corrupt_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input path: JSON-lines where every CORRUPT_MOD-th record
    is deterministically broken, read back PERMISSIVE with a corrupt-record
    column — bad lines survive as a quarantine row (all fields null,
    raw line captured) instead of killing the job or vanishing silently.
    The aggregate pins both populations: per-type counts for parsed rows
    plus one NULL-type row counting the quarantined lines."""
    src = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < JSON_LIMIT)
        .selectExpr("event_id", "user_id", "event_type", "unix_millis(ts) AS ts_ms")
    )
    lines = src.select(
        F.when(
            F.col("event_id") % CORRUPT_MOD == 0,
            F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string")),
        )
        .otherwise(F.to_json(F.struct("event_id", "user_id", "event_type", "ts_ms")))
        .alias("value")
    )
    json_dir = tempfile.mkdtemp(prefix="json_corrupt_")
    lines.write.mode("overwrite").text(json_dir)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(json_dir)
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.count("_bad").alias("n_corrupt"),
    )


JSON_CORRUPT_ORACLE = f"""
SELECT event_type, COUNT(*) AS cnt, 0 AS n_corrupt
FROM events WHERE event_id < {JSON_LIMIT} AND event_id % {CORRUPT_MOD} <> 0
GROUP BY event_type
UNION ALL
SELECT NULL AS event_type, COUNT(*) AS cnt, COUNT(*) AS n_corrupt
FROM events WHERE event_id < {JSON_LIMIT} AND event_id % {CORRUPT_MOD} = 0
"""


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → ORC sink → read back → per-nation aggregate. Exercises
    the second columnar format end-to-end (schema + decimal fidelity);
    ORC is the drop-in alternative wherever the parquet sink is used."""
    out_dir = os.path.join(tempfile.mkdtemp(prefix="orc_sink_"), "customer")
    (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite")
        .orc(out_dir)
    )
    back = spark.read.orc(out_dir)
    return back.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
    )


ORC_ROUNDTRIP_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer GROUP BY 1
"""


def csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV escape fidelity: a payload column deliberately containing the
    delimiter AND the quote char roundtrips through a quoted CSV sink and
    an explicit-schema read. The 60-bit hash checksum (XOR-folded) over
    the read-back payload can only match the oracle's checksum over the
    ORIGINAL expression if quoting/escaping lost nothing."""
    src = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "lang",
        # payload embeds a double-quote, a comma, and the raw text
        "concat('\"', source, ',', text) AS payload",
    )
    csv_dir = tempfile.mkdtemp(prefix="csv_quoted_")
    src.write.mode("overwrite").option("header", "true").option("escape", '"').csv(csv_dir)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("escape", '"')
        .csv(csv_dir)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(payload), 1, 15), 16, 10) as bigint))"
        ).alias("payload_checksum"),
    )


CSV_QUOTED_ORACLE = """
SELECT lang, COUNT(*) AS n_docs,
       bit_xor(CAST(concat('0x', substr(md5(concat('"', source, ',', text)), 1, 15)) AS BIGINT)) AS payload_checksum
FROM documents GROUP BY 1
"""


UPSERT_MOD = 10  # every 10th order gets an update record


def merge_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert without a table format: new versions of every
    UPSERT_MOD-th order (status bumped, price +1) are merged into the
    snapshot by last-writer-wins dedup — union + row_number over
    (key, version) — and the merged snapshot is written and read back.

    At 100 TB this is the standard parquet upsert: partition the snapshot,
    restrict the rewrite to partitions containing updated keys (partition
    pruning on the update set), or flip to a MERGE INTO on a table format
    (Delta/Iceberg) with the identical dedup semantics."""
    base = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice",
            "0 AS version",
        )
    )
    updates = (
        base.where(F.col("o_orderkey") % UPSERT_MOD == 0)
        .selectExpr(
            "o_orderkey", "o_custkey", "'X' AS o_orderstatus",
            "CAST(o_totalprice + 1 AS DECIMAL(18,2)) AS o_totalprice",
            "1 AS version",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    merged = (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    out_dir = os.path.join(tempfile.mkdtemp(prefix="merge_sink_"), "orders")
    merged.write.mode("overwrite").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").cast("double").alias("total_price"),
        F.sum("version").alias("n_updated"),
    )


MERGE_UPSERT_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice, 0 AS version
  FROM orders
), merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {UPSERT_MOD} = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % {UPSERT_MOD} = 0
              THEN CAST(o_totalprice + 1 AS DECIMAL(18,2)) ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % {UPSERT_MOD} = 0 THEN 1 ELSE 0 END AS version
  FROM base
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(o_totalprice) AS DOUBLE) AS total_price,
       CAST(SUM(version) AS BIGINT) AS n_updated
FROM merged GROUP BY 1
"""


def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: an old batch (3 columns) and a new batch
    (4 columns — added ``priority_flag``) land in the same dataset;
    ``mergeSchema`` read reconciles them, old rows surface NULL for the
    added column. The aggregate pins both populations' visibility."""
    out_dir = os.path.join(tempfile.mkdtemp(prefix="evolve_"), "orders")
    orders = load_table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 2 == 0).selectExpr(
        "o_orderkey", "o_orderstatus",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice",
    )
    new = orders.where(F.col("o_orderkey") % 2 == 1).selectExpr(
        "o_orderkey", "o_orderstatus",
        "CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice",
        "CAST(o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' AS INT)"
        " AS priority_flag",
    )
    old.write.mode("overwrite").parquet(os.path.join(out_dir, "batch=0"))
    new.write.mode("overwrite").parquet(os.path.join(out_dir, "batch=1"))
    back = spark.read.option("mergeSchema", "true").parquet(out_dir)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.count("priority_flag").alias("n_new_schema"),
        F.sum("priority_flag").alias("n_priority"),
    )


SCHEMA_EVOLUTION_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_new_schema,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                THEN CAST(o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%' AS INT)
           END) AS BIGINT) AS n_priority
FROM orders GROUP BY 1
"""


SPECS = [
    QuerySpec("json_source_roundtrip", json_source_roundtrip, JSON_ROUNDTRIP_ORACLE,
              "JSON-lines write → explicit-schema read → aggregate",
              ("io", "source")),
    QuerySpec("merge_upsert_roundtrip", merge_upsert_roundtrip,
              MERGE_UPSERT_ORACLE,
              "last-writer-wins MERGE/upsert by rewrite → read-back",
              ("io", "sink")),
    QuerySpec("schema_evolution_roundtrip", schema_evolution_roundtrip,
              SCHEMA_EVOLUTION_ORACLE,
              "mergeSchema reconciliation of evolving parquet batches",
              ("io", "source")),
    QuerySpec("orc_roundtrip", orc_roundtrip, ORC_ROUNDTRIP_ORACLE,
              "ORC sink → read-back → aggregate (second columnar format)",
              ("io", "sink")),
    QuerySpec("csv_quoted_roundtrip", csv_quoted_roundtrip, CSV_QUOTED_ORACLE,
              "CSV quote/escape fidelity via hash checksum roundtrip",
              ("io", "source", "sink")),
    QuerySpec("partitioned_sink_roundtrip", partitioned_sink_roundtrip,
              PARTITIONED_SINK_ORACLE,
              "partitionBy parquet sink → pruned read-back → aggregate",
              ("io", "sink")),
    QuerySpec("json_corrupt_handling", json_corrupt_handling, JSON_CORRUPT_ORACLE,
              "PERMISSIVE corrupt-record quarantine on malformed JSON",
              ("io", "source")),
]


# --- binary-file source (multimodal ingestion path) --------------------------

BINARY_LIMIT = 100


def binary_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents slice → one file per doc (text sink partitioned by
    doc_id, all executor-side — no driver loop) → read back through the
    ``binaryFile`` source → byte-level stats.

    This is the ingestion path for opaque image/audio/video blobs
    (operators/multimodal.py): binaryFile yields (path, length, content)
    with content as raw bytes. The aggregate checks BOTH the file-size
    metadata column and the actual fetched content bytes, so truncated or
    re-encoded reads break the match. Text-sink rows gain one trailing
    newline per doc — the oracle adds it explicitly."""
    src = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < BINARY_LIMIT)
        .select("text", "doc_id")
    )
    out_dir = os.path.join(tempfile.mkdtemp(prefix="bin_src_"), "docs")
    src.write.mode("overwrite").partitionBy("doc_id").text(out_dir)

    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*")
        .option("recursiveFileLookup", "true")
        .load(out_dir)
    )
    return back.agg(
        F.count("*").alias("n_files"),
        F.sum(F.col("length")).alias("meta_bytes"),
        F.sum(F.length("content")).alias("content_bytes"),
        F.min(F.length("content")).alias("min_bytes"),
        F.max(F.length("content")).alias("max_bytes"),
    )


BINARY_ROUNDTRIP_ORACLE = f"""
SELECT COUNT(*) AS n_files,
       CAST(SUM(strlen(text) + 1) AS BIGINT) AS meta_bytes,
       CAST(SUM(strlen(text) + 1) AS BIGINT) AS content_bytes,
       MIN(strlen(text) + 1) AS min_bytes,
       MAX(strlen(text) + 1) AS max_bytes
FROM documents WHERE doc_id < {BINARY_LIMIT}
"""


SPECS += [
    QuerySpec("binary_source_roundtrip", binary_source_roundtrip,
              BINARY_ROUNDTRIP_ORACLE,
              "per-doc binary files through the binaryFile source, byte-exact",
              ("io", "multimodal")),
]


# --- file lineage via the _metadata column ----------------------------------
# "Which physical file did each row come from" — the provenance question
# behind incremental reprocessing, bad-file quarantine, and audit
# trails. Spark exposes it as the hidden ``_metadata`` struct on every
# file source, served from the scan's own file split (zero extra IO).
# Exercised as a roundtrip so the oracle stays path-independent: write a
# copy partitioned by a derived shard, read it back, and recover the
# shard FROM THE FILE PATH (``regexp_extract(_metadata.file_path,
# 'shard=...')``) — never from the data column. The per-shard counts +
# exact key checksums then have to match the shard arithmetic computed
# directly on the source view. At 100 TB this is the mechanics of
# quarantining a bad file: group by provenance, compare checksums.

LINEAGE_SHARDS = 8


def q_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders sharded into LINEAGE_SHARDS partition dirs, read back,
    and aggregate per shard recovered from _metadata.file_path."""
    out_dir = os.path.join(tempfile.mkdtemp(prefix="lineage_"), "orders")
    src = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", f"pmod(o_orderkey, {LINEAGE_SHARDS}) AS shard"
    )
    src.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    return (
        spark.read.parquet(out_dir)
        .select(
            F.regexp_extract(
                F.col("_metadata.file_path"), "shard=([0-9]+)", 1
            ).cast("long").alias("shard_from_path"),
            "o_orderkey",
        )
        .groupBy("shard_from_path")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
    )


FILE_LINEAGE_ORACLE = f"""
SELECT o_orderkey % {LINEAGE_SHARDS} AS shard_from_path,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM orders GROUP BY 1
"""


SPECS += [
    QuerySpec("q_file_lineage", q_file_lineage, FILE_LINEAGE_ORACLE,
              "row provenance recovered from _metadata.file_path, checksummed",
              ("io", "lineage")),
]


# --- XML source/sink roundtrip (Spark 4 built-in XML) ------------------------
# Third ingestion markup after CSV/JSON: the reference's source surface is
# CSV lines + Kafka strings (SURVEY.md §2.1 S1/S2); enterprise feeds are
# often XML exports. Spark 4 ships the (formerly spark-xml) data source
# in-core. Fidelity is pinned the same way as csv_quoted_roundtrip: an
# XOR-folded 60-bit md5 checksum over the read-back payload matches the
# oracle's checksum over the ORIGINAL column only if entity
# escaping/parsing lost nothing. ``ignoreSurroundingSpaces=false`` because
# the default TRIMS element text — silent corruption for text payloads.

XML_LIMIT = 2000


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < XML_LIMIT)
        .selectExpr("doc_id", "lang", "source", "text")
    )
    xml_dir = os.path.join(tempfile.mkdtemp(prefix="xml_src_"), "docs")
    (
        src.write.mode("overwrite").format("xml")
        .option("rootTag", "docs").option("rowTag", "doc")
        .save(xml_dir)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema).format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .load(xml_dir)
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(concat(source, '|', text)), 1, 15), 16, 10) as bigint))"
        ).alias("payload_checksum"),
    )


XML_ROUNDTRIP_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       bit_xor(CAST(concat('0x', substr(md5(concat(source, '|', text)), 1, 15)) AS BIGINT)) AS payload_checksum
FROM documents WHERE doc_id < {XML_LIMIT} GROUP BY 1
"""


# --- raw text-line source roundtrip (S1's DataStream<String> analog) ---------
# The reference ingests RAW TEXT LINES and parses them positionally
# (``chapter2/BasicStreamingOperations.java:52-60`` +
# ``chapter2/AuditTrail.java:15-30``). Batch analog of that whole path:
# records serialized to delimited lines via concat_ws → ``write.text`` →
# ``read.text`` (one ``value`` column, exactly DataStream<String>) →
# positional split/cast parse (P1) → aggregate. The md5 folds the free
# text BEFORE the line is built so the payload is delimiter-safe.

def text_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "documents").selectExpr(
        "concat_ws('|', CAST(doc_id AS STRING), lang, source,"
        " substr(md5(text), 1, 15)) AS value"
    )
    txt_dir = tempfile.mkdtemp(prefix="text_lines_")
    src.write.mode("overwrite").text(txt_dir)

    back = spark.read.text(txt_dir).selectExpr(
        "CAST(element_at(split(value, '\\\\|'), 1) AS BIGINT) AS doc_id",
        "element_at(split(value, '\\\\|'), 2) AS lang",
        "element_at(split(value, '\\\\|'), 3) AS source",
        "element_at(split(value, '\\\\|'), 4) AS text_md5",
    )
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.max("doc_id").alias("max_doc_id"),
        F.expr(
            "bit_xor(cast(conv(text_md5, 16, 10) as bigint))"
        ).alias("text_checksum"),
    )


TEXT_LINES_ORACLE = """
SELECT lang, source, COUNT(*) AS n_docs, MAX(doc_id) AS max_doc_id,
       bit_xor(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)) AS text_checksum
FROM documents GROUP BY 1, 2
"""


SPECS += [
    QuerySpec("xml_roundtrip", xml_roundtrip, XML_ROUNDTRIP_ORACLE,
              "XML sink → explicit-schema read-back, entity-escape fidelity checksummed",
              ("io", "source", "sink")),
    QuerySpec("text_lines_roundtrip", text_lines_roundtrip, TEXT_LINES_ORACLE,
              "raw text-line write → read.text → positional parse (S1/P1 analog)",
              ("io", "source")),
]


# --- small-file compaction (table maintenance) ------------------------------
# The small-files problem: a fragmented write (64 shards of a small
# slice) is rewritten into COMPACT_TARGET files and read back. The
# result pins BOTH properties: file count recovered from
# _metadata.file_path (exactly COMPACT_TARGET — repartition controls
# output sharding) and a content checksum over the surviving rows (the
# rewrite lost/duplicated nothing). At 100 TB this is the scheduled
# compaction job every table format runs; here it's plain parquet +
# repartition, the mechanism underneath them all.

COMPACT_LIMIT = 5000
COMPACT_TARGET = 4


def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < COMPACT_LIMIT)
        .selectExpr("event_id", "user_id", "event_type", "unix_millis(ts) AS ts_ms")
    )
    frag_dir = os.path.join(tempfile.mkdtemp(prefix="compact_"), "frag")
    src.repartition(64).write.mode("overwrite").parquet(frag_dir)

    compact_dir = os.path.join(os.path.dirname(frag_dir), "compact")
    spark.read.parquet(frag_dir).repartition(COMPACT_TARGET).write.mode(
        "overwrite"
    ).parquet(compact_dir)

    back = spark.read.parquet(compact_dir)
    return back.select(
        "*", F.col("_metadata.file_path").alias("fp")
    ).groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("fp").alias("n_files_touched"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(concat_ws('|', event_id, user_id, ts_ms)), 1, 15), 16, 10) as bigint))"
        ).alias("content_checksum"),
    )


COMPACT_ORACLE = f"""
SELECT event_type, COUNT(*) AS n_rows,
       {COMPACT_TARGET} AS n_files_touched,
       bit_xor(CAST(concat('0x', substr(md5(concat_ws('|', event_id, user_id,
                    epoch_ms(ts))), 1, 15)) AS BIGINT)) AS content_checksum
FROM events WHERE event_id < {COMPACT_LIMIT}
GROUP BY event_type
"""


SPECS += [
    QuerySpec("maintenance_compact", maintenance_compact, COMPACT_ORACLE,
              "small-file compaction rewrite, file count + content checksum pinned",
              ("io", "maintenance")),
]


# --- corrupt-file-resilient scan --------------------------------------------
# At 100 TB some file in the lake is ALWAYS broken. A fleet of good
# parquet shards plus one deliberately garbage ".parquet" must still
# scan: ``ignoreCorruptFiles`` (reader option, no session mutation)
# skips the bad file and the aggregate covers exactly the good rows.
# Without the option the same scan throws — pinned in tests.

CORRUPT_SCAN_LIMIT = 3000


def corrupt_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") < CORRUPT_SCAN_LIMIT)
        .selectExpr("event_id", "event_type", "unix_millis(ts) AS ts_ms")
    )
    d = os.path.join(tempfile.mkdtemp(prefix="corrupt_scan_"), "data")
    src.repartition(4).write.mode("overwrite").parquet(d)
    with open(os.path.join(d, "part-junk.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet file payload \x00\x01\x02")

    back = spark.read.option("ignoreCorruptFiles", "true").parquet(d)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.min("ts_ms").alias("first_ts_ms"),
        F.max("ts_ms").alias("last_ts_ms"),
    )


CORRUPT_SCAN_ORACLE = f"""
SELECT event_type, COUNT(*) AS n_rows,
       MIN(epoch_ms(ts)) AS first_ts_ms, MAX(epoch_ms(ts)) AS last_ts_ms
FROM events WHERE event_id < {CORRUPT_SCAN_LIMIT}
GROUP BY event_type
"""


SPECS += [
    QuerySpec("corrupt_file_scan", corrupt_file_scan, CORRUPT_SCAN_ORACLE,
              "ignoreCorruptFiles scan survives a garbage shard, rows pinned",
              ("io", "resilience")),
]


# --- z-order layout readout (multi-dim data skipping) ------------------------
# WHY clustered writes matter at 100 TB: parquet row-group min/max stats
# prune a scan only if each file covers a NARROW value range. This op
# quantifies that for a two-dim workload (user_id, value band): both
# dims are normalized to 10 bits (bounds-adaptive, so the math is
# scale-independent), bit-interleaved into a 20-bit Morton code, and
# bucketed into 64 z-shards; the readout compares the summed per-shard
# min/max span of EACH dim against a hash layout of the same 64 shards.
# Z-order shrinks both dims' spans simultaneously (a hash layout spans
# ~everything in every shard), which is exactly the file-skipping win of
# `repartitionByRange(morton)` + parquet stats on a real write. Pure
# integer arithmetic end-to-end so the oracle replays it bit-for-bit.

_ZBITS = 10
_ZSHARDS = 64
_ZBAND = 500  # value cents per band


def _morton(u: str, b: str, spark_side: bool) -> str:
    if spark_side:
        terms = [f"shiftleft(shiftright({u}, {i}) & 1, {2 * i})"
                 for i in range(_ZBITS)]
        terms += [f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})"
                  for i in range(_ZBITS)]
    else:
        terms = [f"((({u} >> {i}) & 1) << {2 * i})" for i in range(_ZBITS)]
        terms += [f"((({b} >> {i}) & 1) << {2 * i + 1})" for i in range(_ZBITS)]
    return "(" + " + ".join(terms) + ")"


def layout_zorder_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "user_id AS u",
        f"CAST(round(value * 100) AS BIGINT) div {_ZBAND} AS band")
    bounds = ev.agg(
        F.min("u").alias("u0"), F.max("u").alias("u1"),
        F.min("band").alias("b0"), F.max("band").alias("b1"))
    norm = ev.crossJoin(F.broadcast(bounds)).selectExpr(
        "event_id", "u", "band",
        f"(u - u0) * {1 << _ZBITS} div (u1 - u0 + 1) AS un",
        f"(band - b0) * {1 << _ZBITS} div (b1 - b0 + 1) AS bn",
    )
    code = norm.selectExpr(
        "event_id", "u", "band",
        f"{_morton('un', 'bn', True)} div {(1 << (2 * _ZBITS)) // _ZSHARDS}"
        " AS zshard",
        f"pmod(event_id, {_ZSHARDS}) AS hshard",
    )
    both = code.selectExpr("'zorder' AS layout", "zshard AS shard", "u", "band") \
        .unionByName(code.selectExpr("'hash' AS layout", "hshard AS shard",
                                     "u", "band"))
    per_shard = both.groupBy("layout", "shard").agg(
        (F.max("u") - F.min("u") + 1).alias("span_u"),
        (F.max("band") - F.min("band") + 1).alias("span_b"),
    )
    return per_shard.groupBy("layout").agg(
        F.count("*").alias("n_shards"),
        F.sum("span_u").alias("sum_user_span"),
        F.sum("span_b").alias("sum_band_span"),
    )


ZORDER_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id AS u,
         CAST(round(value * 100) AS BIGINT) // {_ZBAND} AS band
  FROM events
), bounds AS (
  SELECT MIN(u) AS u0, MAX(u) AS u1, MIN(band) AS b0, MAX(band) AS b1 FROM ev
), norm AS (
  SELECT event_id, u, band,
         (u - u0) * {1 << _ZBITS} // (u1 - u0 + 1) AS un,
         (band - b0) * {1 << _ZBITS} // (b1 - b0 + 1) AS bn
  FROM ev CROSS JOIN bounds
), code AS (
  SELECT event_id, u, band,
         {_morton('un', 'bn', False)} // {(1 << (2 * _ZBITS)) // _ZSHARDS}
           AS zshard,
         event_id % {_ZSHARDS} AS hshard
  FROM norm
), layouts AS (
  SELECT 'zorder' AS layout, zshard AS shard, u, band FROM code
  UNION ALL
  SELECT 'hash', hshard, u, band FROM code
), per_shard AS (
  SELECT layout, shard, MAX(u) - MIN(u) + 1 AS span_u,
         MAX(band) - MIN(band) + 1 AS span_b
  FROM layouts GROUP BY 1, 2
)
SELECT layout, COUNT(*) AS n_shards,
       CAST(SUM(span_u) AS BIGINT) AS sum_user_span,
       CAST(SUM(span_b) AS BIGINT) AS sum_band_span
FROM per_shard GROUP BY 1
"""


SPECS += [
    QuerySpec("layout_zorder_readout", layout_zorder_readout, ZORDER_ORACLE,
              "Morton z-shard vs hash layout: per-shard min/max span readout",
              ("scale", "layout")),
]


# --- dynamic partition pruning roundtrip --------------------------------------
# The optimizer property that makes partitioned 100 TB fact tables
# servable: when a fact partitioned on the join key joins a dim with a
# SELECTIVE filter, Catalyst injects a runtime
# ``dynamicpruningexpression`` subquery into the scan's
# PartitionFilters, so only the dim-surviving partitions are ever read
# — static pruning can't do this because the surviving keys are data,
# not literals. Both sides are real parquet roundtrips (a
# constant-foldable in-memory dim would defeat the point);
# tests/test_plans.py pins the dynamicpruning subquery's presence.

def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="dpp_")
    fact_dir = os.path.join(base, "orders")
    dim_dir = os.path.join(base, "dim")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(fact_dir)
    (
        orders.select("o_orderpriority").distinct()
        .selectExpr(
            "o_orderpriority AS p",
            "CAST(o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'"
            " AS INT) AS hot")
        .write.mode("overwrite").parquet(dim_dir)
    )
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where("hot = 1")
    return (
        fact.join(dim, fact.o_orderpriority == dim.p)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .alias("revenue_cents"),
        )
    )


DPP_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
GROUP BY o_orderpriority
"""


SPECS += [
    QuerySpec("dpp_partitioned_join", dpp_partitioned_join, DPP_ORACLE,
              "runtime dynamic partition pruning through a parquet roundtrip",
              ("io", "optimizer")),
]


# --- ANALYZE-style column statistics collection -------------------------------------
# The stats pass a lakehouse optimizer feeds on (ANALYZE TABLE ... FOR
# COLUMNS): per column — rows, nulls, exact NDV, min/max — over the
# orders fact table, emitted as one narrow stats relation. Exact NDV is
# deliberate (this is the stats-build job, where the exact pass is run
# and then cached; the query-time estimator uses the HLL family in
# operators/sketches.py). One aggregate pass, map-side combinable;
# min/max of strings emitted as md5-stable VARCHARs.


def maintenance_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def stat(col: str, kind: str) -> DataFrame:
        val = (f"CAST(round({col} * 100) AS BIGINT)" if kind == "money"
               else col)
        return o.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.expr(f"CAST({col} IS NULL AS BIGINT)")).alias("n_nulls"),
            F.countDistinct(col).alias("ndv"),
            F.min(F.expr(val)).cast("string").alias("min_val"),
            F.max(F.expr(val)).cast("string").alias("max_val"),
        ).selectExpr(f"'{col}' AS column_name", "n_rows", "n_nulls", "ndv",
                     "min_val", "max_val")

    out = stat("o_custkey", "id")
    for c, k in (("o_orderstatus", "str"), ("o_totalprice", "money"),
                 ("o_orderpriority", "str")):
        out = out.unionAll(stat(c, k))
    return out


def _colstats_oracle() -> str:
    def stat(col: str, kind: str) -> str:
        val = (f"CAST(round({col} * 100) AS BIGINT)" if kind == "money"
               else col)
        return f"""SELECT '{col}' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       COUNT(DISTINCT {col}) AS ndv,
       CAST(MIN({val}) AS VARCHAR) AS min_val,
       CAST(MAX({val}) AS VARCHAR) AS max_val
FROM orders"""

    return "\nUNION ALL\n".join([
        stat("o_custkey", "id"), stat("o_orderstatus", "str"),
        stat("o_totalprice", "money"), stat("o_orderpriority", "str")])


MAINT_COLSTATS_ORACLE = _colstats_oracle()


SPECS += [
    QuerySpec("maintenance_column_stats", maintenance_column_stats,
              MAINT_COLSTATS_ORACLE,
              "ANALYZE-style exact column stats (rows/nulls/NDV/min/max)",
              ("io", "maintenance")),
]


# --- equi-depth histogram construction -------------------------------------------
# The other half of the ANALYZE pass above: the optimizer's equi-depth
# (equi-height) histogram for selectivity estimation. Exact
# construction: rank every row (sharded row_number — the
# pipeline_reservoir two-phase shape at scale), cut at rank boundaries
# k·n/8, and report each bucket's [lo, hi] in cents plus its exact row
# count and distinct-value count. Deterministic tie-break (cents, key).

HIST_BUCKETS = 8


def maintenance_equi_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
    n_row = o.agg(F.count("*").alias("n"))
    w = Window.orderBy("cents", "k")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(n_row))
        .selectExpr(
            "cents",
            f"least(CAST((rn - 1) * {HIST_BUCKETS} div n AS INT),"
            f" {HIST_BUCKETS - 1}) AS bucket")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"),
             F.countDistinct("cents").alias("ndv"),
             F.min("cents").alias("lo_cents"),
             F.max("cents").alias("hi_cents"))
    )


MAINT_HIST_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), n_row AS (
  SELECT COUNT(*) AS n FROM o
), binned AS (
  SELECT cents,
         least(CAST((row_number() OVER (ORDER BY cents, k) - 1)
                    * {HIST_BUCKETS} // n AS INT), {HIST_BUCKETS - 1}) AS bucket
  FROM o CROSS JOIN n_row
)
SELECT bucket, COUNT(*) AS n_rows, COUNT(DISTINCT cents) AS ndv,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents
FROM binned GROUP BY 1
"""


SPECS += [
    QuerySpec("maintenance_equi_depth_hist", maintenance_equi_depth_hist,
              MAINT_HIST_ORACLE,
              "exact equi-depth histogram for optimizer selectivity stats",
              ("io", "maintenance")),
]
