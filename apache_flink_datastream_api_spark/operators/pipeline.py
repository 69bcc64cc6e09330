"""Training-data pipeline operators over ``documents`` (driver-mandated
extension; no reference file:line): chunking, deterministic sampling,
TF-IDF term scoring. The shapes a 100 TB corpus-preparation job runs
between dedup and tokenization.

All built-in column expressions / relational ops — no Python in the data
path:

- chunking       posexplode over a computed span array: one narrow pass,
                 output partitioning inherits the input (no shuffle).
- sampling       hash-gated filter: sampling by ``portable_hash(doc_id)``
                 is deterministic, reproducible across runs/engines, and
                 pushes down to a scan filter — the ONLY sane way to
                 sample 100 TB (no global sort, no count, no rand()).
- TF-IDF         two aggregations (term-per-doc counts, doc frequency)
                 and a broadcast-able join; top-k terms per doc by
                 row_number. The shuffles are on (term) and (doc_id) —
                 both well-distributed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import text as X
from ..functions.hashing import portable_hash64_sql
from ..operators.dedup import NORM_D, NORM_S
from ..registry import QuerySpec
from ..sources.tables import load_table, spread_small_source

TOKS_S = X.tokens_spark("text")
TOKS_D = X.tokens_duck("text")


# --- document chunking ------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping CHUNK_TOKENS-token windows
    every CHUNK_STRIDE tokens (the standard context-window packing step).
    Emits (doc_id, chunk_id, n_chunk_tokens, chunk_text)."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", F.expr(TOKS_S).alias("toks"))
    starts = (
        f"sequence(1, greatest(1, size(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}), "
        f"{CHUNK_STRIDE})"
    )
    return (
        toked.select("doc_id", "toks", F.posexplode(F.expr(starts)).alias("chunk_id", "start"))
        .selectExpr(
            "doc_id",
            "chunk_id",
            f"slice(toks, start, {CHUNK_TOKENS}) AS chunk_toks",
        )
        .selectExpr(
            "doc_id",
            "chunk_id",
            "size(chunk_toks) AS n_chunk_tokens",
            "concat_ws(' ', chunk_toks) AS chunk_text",
        )
    )


CHUNK_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {TOKS_D} AS toks FROM documents
), starts AS (
  SELECT doc_id, toks,
         generate_subscripts(range(1, greatest(1, len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}) + 1, {CHUNK_STRIDE}), 1) - 1 AS chunk_id,
         unnest(range(1, greatest(1, len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE}) + 1, {CHUNK_STRIDE})) AS start
  FROM toked
)
SELECT doc_id, chunk_id,
       len(toks[start : start + {CHUNK_TOKENS} - 1]) AS n_chunk_tokens,
       array_to_string(toks[start : start + {CHUNK_TOKENS} - 1], ' ') AS chunk_text
FROM starts
"""


# --- deterministic stratified sampling -------------------------------------

SAMPLE_PCT = 25  # keep ~25% per language stratum


def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sample: keep doc when
    portable_hash(doc_id) mod 100 < pct. Engine-independent, re-runnable,
    and a pure scan filter — no rand(), no per-stratum counting pass.
    Emits the kept ids with their stratum for downstream joins."""
    docs = load_table(spark, sf_dir, "documents")
    gate = (
        f"pmod(cast(conv(substr(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) as bigint), 100)"
    )
    return docs.selectExpr("doc_id", "lang", "n_chars", f"{gate} AS bucket").where(
        F.col("bucket") < SAMPLE_PCT
    )


SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars,
       {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 100 AS bucket
FROM documents
WHERE {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 100 < {SAMPLE_PCT}
"""


# --- TF-IDF top terms per document -----------------------------------------

TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per doc by tf-idf (ln(N/df) idf, integer tf). Ties
    broken lexicographically so the ranking is total and engine-stable."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar N: one cheap count, broadcast into the expr
    terms = docs.select(
        "doc_id", F.explode(F.expr(TOKS_S)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        tf.join(df_, "term")
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


TFIDF_ORACLE = f"""
WITH terms AS (
  SELECT doc_id, unnest({TOKS_D}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# --- composed corpus-cleaning pipeline --------------------------------------
# The flagship end-to-end shape: quality-filter → exact near-dup removal →
# deterministic sample → per-language summary, as ONE declarative plan.
# Catalyst fuses the filter/projection stages into the scan pass; the only
# shuffles are the dedup window partition (content_hash) and the final tiny
# groupBy(lang). At 100 TB: scan-speed filters, one well-keyed shuffle,
# then a 5-row aggregate.

QUALITY_FLOOR = 0.40
CLEAN_SAMPLE_PCT = 50


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = f"size({TOKS_S})"
    stop = X.count_in_list_spark(TOKS_S, X.STOPWORDS)
    punct = X.punct_count_spark("text")
    quality = (
        f"0.5 * CAST({stop} AS DOUBLE) / {nt}"
        f" + 0.3 * (1.0 - CAST({punct} AS DOUBLE) / length(text))"
        f" + 0.2 * least(1.0, CAST({nt} AS DOUBLE) / 100.0)"
    )
    gate = "pmod(cast(conv(substr(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) as bigint), 100)"
    scored = docs.selectExpr(
        "doc_id",
        "lang",
        f"{nt} AS n_tokens",
        f"{quality} AS quality_score",
        f"md5({NORM_S}) AS content_hash",
        f"{gate} AS bucket",
    ).where(F.col("quality_score") >= QUALITY_FLOOR)
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    kept = (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("bucket") < CLEAN_SAMPLE_PCT))
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("quality_score").alias("min_quality"),
        F.max("quality_score").alias("max_quality"),
    )


_nt_d = f"len({TOKS_D})"
_stop_d = X.count_in_list_duck(TOKS_D, X.STOPWORDS)
_punct_d = X.punct_count_duck("text")
_quality_d = (
    f"0.5 * CAST({_stop_d} AS DOUBLE) / {_nt_d}"
    f" + 0.3 * (1.0 - CAST({_punct_d} AS DOUBLE) / length(text))"
    f" + 0.2 * least(1.0, CAST({_nt_d} AS DOUBLE) / 100.0)"
)
CLEAN_CORPUS_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_nt_d} AS n_tokens,
         {_quality_d} AS quality_score,
         md5({NORM_D}) AS content_hash,
         {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 100 AS bucket
  FROM documents
  WHERE {_quality_d} >= {QUALITY_FLOOR}
), kept AS (
  SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
  FROM scored
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(quality_score) AS min_quality, MAX(quality_score) AS max_quality
FROM kept WHERE rn = 1 AND bucket < {CLEAN_SAMPLE_PCT}
GROUP BY lang
"""


SPECS = [
    QuerySpec("pipeline_clean_corpus", pipeline_clean_corpus, CLEAN_CORPUS_ORACLE,
              "quality-filter → dedup → sample → summary, one declarative plan",
              ("pipeline", "text", "dedup")),
    QuerySpec("chunk_documents", chunk_documents, CHUNK_ORACLE,
              "overlapping token-window chunking via posexplode", ("pipeline", "text")),
    QuerySpec("sample_documents", sample_documents, SAMPLE_ORACLE,
              "deterministic hash-gated sampling", ("pipeline",)),
    QuerySpec("tfidf_top_terms", tfidf_top_terms, TFIDF_ORACLE,
              "tf-idf top-k terms per document", ("pipeline", "text")),
]


# --- end-to-end pre-training pipeline with stage audit -----------------------
# The whole corpus-prep flow as ONE declarative plan: Gopher-style quality
# rules → PII redaction → exact dedup (canonical-per-hash) → eval-set
# fingerprint decontamination → 80/10/5/5 split — emitting a per-stage
# audit table (stage, n_docs) so every drop is accountable. Everything is
# computed in ONE derived frame + one conditional aggregate, unpivoted
# with stack(): the corpus is scanned once, shuffled twice (dedup window
# on content hash; the tiny eval-fingerprint dim broadcasts). Per-doc
# array lambdas replace explode-aggs here because every signal feeds one
# fused projection — right for bounded doc lengths; the explode forms
# live in operators/textops.py for heavy-tailed corpora.

E2E_TRAIN_LT, E2E_VAL_LT, E2E_TEST_LT = 80, 90, 95  # bucket >= 95: eval holdout
E2E_SH_K = 5


def pipeline_pretrain_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The corpus scan is CPU-bound (regex redaction + per-shingle md5);
    # re-spread a low-split scan so it parallelizes (no-op on any real
    # multi-split table — see spread_small_source).
    docs = spread_small_source(
        load_table(spark, sf_dir, "documents"), spark
    )
    toks = TOKS_S
    sh = X.shingles_spark(toks, E2E_SH_K)
    fp_item = "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)"
    redacted = (
        "regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>'), "
        "'[0-9]{3}-[0-9]{4}', '<PHONE>')"
    )
    gate = "pmod(cast(conv(substr(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) as bigint), 100)"
    base = docs.selectExpr(
        "doc_id",
        f"size({toks}) AS n_tokens",
        f"CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks}) AS distinct_ratio",
        f"CAST({X.count_in_list_spark(toks, X.STOPWORDS)} AS DOUBLE) / size({toks}) AS stopword_frac",
        f"md5({redacted}) AS content_hash",
        f"coalesce(array_min(transform({sh}, s -> {fp_item})), "
        f"cast(conv(substr(md5(lower(text)), 1, 15), 16, 10) as bigint)) AS fingerprint",
        f"{gate} AS bucket",
    ).selectExpr(
        "*",
        "n_tokens BETWEEN 20 AND 1000 AND distinct_ratio >= 0.4"
        " AND stopword_frac >= 0.02 AS pass_quality",
    )
    w = Window.partitionBy("content_hash", "pass_quality").orderBy("doc_id")
    ranked = base.withColumn(
        "canonical", F.expr("pass_quality") & (F.row_number().over(w) == 1)
    )
    # Contamination = "any doc in the eval holdout shares my fingerprint".
    # A window-max over fingerprint computes it in the SAME pass as the
    # dedup window — the alternative (distinct eval fingerprints +
    # broadcast join) re-scans the corpus and re-derives the md5-shingle
    # fingerprint, the most expensive expression in the plan. One extra
    # 5-byte column through one shuffle beats a second full derivation.
    w_fp = Window.partitionBy("fingerprint")
    flagged = ranked.withColumn(
        "contaminated",
        F.max(F.when(F.col("bucket") >= E2E_TEST_LT, 1).otherwise(0)).over(w_fp)
        == 1,
    )
    m = flagged.agg(
        F.count("*").alias("n0"),
        F.count_if("pass_quality").alias("n1"),
        F.count_if("canonical").alias("n2"),
        F.count_if(
            F.expr(f"canonical AND NOT contaminated AND bucket < {E2E_TEST_LT}")
        ).alias("n3"),
        F.count_if(
            F.expr(f"canonical AND NOT contaminated AND bucket < {E2E_TRAIN_LT}")
        ).alias("n4"),
        F.count_if(
            F.expr(
                f"canonical AND NOT contaminated AND bucket >= {E2E_TRAIN_LT}"
                f" AND bucket < {E2E_VAL_LT}"
            )
        ).alias("n5"),
        F.count_if(
            F.expr(
                f"canonical AND NOT contaminated AND bucket >= {E2E_VAL_LT}"
                f" AND bucket < {E2E_TEST_LT}"
            )
        ).alias("n6"),
    )
    return m.selectExpr(
        "stack(7, '0_input', n0, '1_quality', n1, '2_dedup', n2, "
        "'3_decontaminated', n3, '4_train', n4, '5_val', n5, '6_test', n6) "
        "AS (stage, n_docs)"
    )


_e2e_sh_d = X.shingles_duck(TOKS_D, E2E_SH_K)
_e2e_redacted_d = (
    "regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'), "
    "'[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')"
)
PRETRAIN_E2E_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         len({TOKS_D}) AS n_tokens,
         CAST(len(list_distinct({TOKS_D})) AS DOUBLE) / len({TOKS_D}) AS distinct_ratio,
         CAST({X.count_in_list_duck(TOKS_D, X.STOPWORDS)} AS DOUBLE) / len({TOKS_D}) AS stopword_frac,
         md5({_e2e_redacted_d}) AS content_hash,
         coalesce(list_min(list_transform({_e2e_sh_d}, s -> {portable_hash64_sql('s')})),
                  {portable_hash64_sql('lower(text)')}) AS fingerprint,
         {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 100 AS bucket
  FROM documents
), flagged0 AS (
  SELECT *,
         n_tokens BETWEEN 20 AND 1000 AND distinct_ratio >= 0.4
           AND stopword_frac >= 0.02 AS pass_quality
  FROM base
), ranked AS (
  SELECT *,
         pass_quality AND row_number() OVER (
           PARTITION BY content_hash, pass_quality ORDER BY doc_id
         ) = 1 AS canonical
  FROM flagged0
), flagged AS (
  SELECT r.*, (e.efp IS NOT NULL) AS contaminated
  FROM ranked r LEFT JOIN (
    SELECT DISTINCT fingerprint AS efp FROM flagged0 WHERE bucket >= {E2E_TEST_LT}
  ) e ON r.fingerprint = e.efp
), m AS (
  SELECT COUNT(*) AS n0,
         COUNT(*) FILTER (pass_quality) AS n1,
         COUNT(*) FILTER (canonical) AS n2,
         COUNT(*) FILTER (canonical AND NOT contaminated AND bucket < {E2E_TEST_LT}) AS n3,
         COUNT(*) FILTER (canonical AND NOT contaminated AND bucket < {E2E_TRAIN_LT}) AS n4,
         COUNT(*) FILTER (canonical AND NOT contaminated AND bucket >= {E2E_TRAIN_LT} AND bucket < {E2E_VAL_LT}) AS n5,
         COUNT(*) FILTER (canonical AND NOT contaminated AND bucket >= {E2E_VAL_LT} AND bucket < {E2E_TEST_LT}) AS n6
  FROM flagged
)
SELECT stage, n_docs FROM (
  SELECT '0_input' AS stage, n0 AS n_docs FROM m UNION ALL
  SELECT '1_quality', n1 FROM m UNION ALL
  SELECT '2_dedup', n2 FROM m UNION ALL
  SELECT '3_decontaminated', n3 FROM m UNION ALL
  SELECT '4_train', n4 FROM m UNION ALL
  SELECT '5_val', n5 FROM m UNION ALL
  SELECT '6_test', n6 FROM m
)
"""


SPECS += [
    QuerySpec("pipeline_pretrain_e2e", pipeline_pretrain_e2e, PRETRAIN_E2E_ORACLE,
              "full pretrain prep: quality→redact→dedup→decontaminate→split, stage audit",
              ("pipeline", "trainprep", "dedup")),
]


# --- right-to-be-forgotten erasure audit --------------------------------------
# The governance op every data platform runs on a schedule: given a set of
# erasure requests (here: the deterministic c_custkey % 97 = 0 cohort),
# purge the subject's rows from every table that carries the key and emit
# the audit the DPO actually reads — per table, how many rows were erased
# and how many remain. One scan per fact table with the request set
# BROADCAST (the request list is always driver-scale relative to the
# facts); purged/remaining come from one conditional aggregate over the
# left join, not separate semi + anti passes.

ERASE_MOD = 97


def pipeline_user_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    requests = (
        load_table(spark, sf_dir, "customer")
        .where(F.expr(f"c_custkey % {ERASE_MOD} = 0"))
        .select(F.col("c_custkey").alias("erase_key"))
    )

    def audit(df: DataFrame, key: str, name: str) -> DataFrame:
        return (
            df.join(F.broadcast(requests), F.col(key) == F.col("erase_key"), "left")
            .agg(
                F.sum(F.expr("CASE WHEN erase_key IS NOT NULL THEN 1 ELSE 0 END"))
                .cast("long").alias("n_purged"),
                F.sum(F.expr("CASE WHEN erase_key IS NULL THEN 1 ELSE 0 END"))
                .cast("long").alias("n_remaining"),
            )
            .selectExpr(f"'{name}' AS table_name", "n_purged", "n_remaining")
        )

    return (
        audit(load_table(spark, sf_dir, "customer"), "c_custkey", "customer")
        .unionAll(audit(load_table(spark, sf_dir, "orders"), "o_custkey", "orders"))
        .unionAll(audit(load_table(spark, sf_dir, "events"), "user_id", "events"))
    )


USER_ERASURE_ORACLE = f"""
WITH req AS (
  SELECT c_custkey AS erase_key FROM customer WHERE c_custkey % {ERASE_MOD} = 0
)
SELECT 'customer' AS table_name,
       CAST(SUM(CASE WHEN erase_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purged,
       CAST(SUM(CASE WHEN erase_key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_remaining
FROM customer LEFT JOIN req ON c_custkey = erase_key
UNION ALL
SELECT 'orders',
       CAST(SUM(CASE WHEN erase_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN erase_key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders LEFT JOIN req ON o_custkey = erase_key
UNION ALL
SELECT 'events',
       CAST(SUM(CASE WHEN erase_key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN erase_key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events LEFT JOIN req ON user_id = erase_key
"""


SPECS += [
    QuerySpec("pipeline_user_erasure", pipeline_user_erasure, USER_ERASURE_ORACLE,
              "GDPR erasure audit: purged/remaining per table, broadcast requests",
              ("pipeline", "governance")),
]


# --- GDPR right-to-ACCESS export manifest ----------------------------------------
# The read twin of pipeline_user_erasure: for every access request
# (sampled as c_custkey % ACCESS_MOD = 0), enumerate what the export
# package must contain — per table, the row count, the money totals in
# exact cents, and an id checksum — INCLUDING data reachable only
# through the FK chain (lineitem rows belong to a customer via their
# orders; an export that walks only direct keys under-discloses).
# Shapes: the request list broadcasts everywhere; lineitem joins through
# orders on its own keys. The manifest is what the DPO signs off on and
# what the erasure audit is later diffed against.

ACCESS_MOD = 997


def q_gdpr_access_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    requests = (
        load_table(spark, sf_dir, "customer")
        .where(F.expr(f"c_custkey % {ACCESS_MOD} = 0"))
        .select(F.col("c_custkey").alias("req_key"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(requests), F.col("c_custkey") == F.col("req_key"))
        .groupBy("req_key")
        .agg(F.count("*").alias("n_rows"),
             F.expr("CAST(SUM(round(c_acctbal * 100)) AS BIGINT)").alias("cents"),
             F.sum("c_custkey").alias("id_checksum"))
        .selectExpr("req_key", "'customer' AS table_name",
                    "n_rows", "cents", "id_checksum")
    )
    orders = load_table(spark, sf_dir, "orders")
    ords = (
        orders.join(F.broadcast(requests), F.col("o_custkey") == F.col("req_key"))
        .groupBy("req_key")
        .agg(F.count("*").alias("n_rows"),
             F.expr("CAST(SUM(round(o_totalprice * 100)) AS BIGINT)").alias("cents"),
             F.sum("o_orderkey").alias("id_checksum"))
        .selectExpr("req_key", "'orders' AS table_name",
                    "n_rows", "cents", "id_checksum")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(requests), F.col("o_custkey") == F.col("req_key"))
        .groupBy("req_key")
        .agg(F.count("*").alias("n_rows"),
             F.expr("CAST(SUM(round(l_extendedprice * 100)) AS BIGINT)")
             .alias("cents"),
             F.sum("l_orderkey").alias("id_checksum"))
        .selectExpr("req_key", "'lineitem' AS table_name",
                    "n_rows", "cents", "id_checksum")
    )
    return cust.unionAll(ords).unionAll(li)


Q_GDPR_ACCESS_ORACLE = f"""
WITH requests AS (
  SELECT c_custkey AS req_key FROM customer WHERE c_custkey % {ACCESS_MOD} = 0
)
SELECT req_key, 'customer' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM(round(c_acctbal * 100)) AS BIGINT) AS cents,
       CAST(SUM(c_custkey) AS BIGINT) AS id_checksum
FROM customer JOIN requests ON c_custkey = req_key GROUP BY 1
UNION ALL
SELECT req_key, 'orders', COUNT(*),
       CAST(SUM(round(o_totalprice * 100)) AS BIGINT),
       CAST(SUM(o_orderkey) AS BIGINT)
FROM orders JOIN requests ON o_custkey = req_key GROUP BY 1
UNION ALL
SELECT req_key, 'lineitem', COUNT(*),
       CAST(SUM(round(l_extendedprice * 100)) AS BIGINT),
       CAST(SUM(l_orderkey) AS BIGINT)
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN requests ON o_custkey = req_key
GROUP BY 1
"""


SPECS += [
    QuerySpec("q_gdpr_access_export", q_gdpr_access_export,
              Q_GDPR_ACCESS_ORACLE,
              "right-to-access export manifest incl. FK-reachable rows",
              ("pipeline", "governance")),
]
