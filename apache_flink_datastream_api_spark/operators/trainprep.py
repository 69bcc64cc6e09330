"""Training-run preparation operators over ``documents`` (driver-mandated
LLM-pipeline extension; no reference file:line): deterministic splits,
source-weighted mixing, eval-set decontamination, sequence packing.

These are the steps between a cleaned corpus and a tokenized training run,
each in its 100 TB shape:

- split          hash-gated assignment (train/val/test) — a scan-level
                 filter expression; no rand(), no global count, identical
                 assignment on every engine and every re-run.
- source mix     per-source sampling rates from a broadcast config dim:
                 the rate table is tiny (one row per source), the big scan
                 is filtered map-side after a broadcast hash join — no
                 shuffle of the corpus.
- decontaminate  flag training docs sharing word-5-gram fingerprints with
                 the held-out set. The eval fingerprint set is a small
                 fraction of the corpus, so it broadcasts; the train side
                 streams through map-side. At 100 TB the eval set is KB-MB
                 (a benchmark suite) and this is exactly a Bloom-filter /
                 broadcast-semi-join pass over the corpus.
- packing        concat-and-chop context-window assignment via a two-pass
                 distributed prefix sum: per-shard token subtotals (tiny)
                 are cumsummed and broadcast back, so no single partition
                 ever sees the whole corpus — the standard scalable scan
                 shape, vs. the naive single-partition running-sum window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import text as X
from ..functions.localdf import local_literal_df
from ..functions.hashing import portable_hash64_sql
from ..registry import QuerySpec
from ..sources.tables import load_table, spread_small_source

TOKS_S = X.tokens_spark("text")
TOKS_D = X.tokens_duck("text")

# Portable doc_id gate: same 0-99 bucket in both engines.
GATE_S = (
    "pmod(cast(conv(substr(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) as bigint), 100)"
)
GATE_D = f"{portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 100"


# --- deterministic train/val/test split ------------------------------------

TRAIN_PCT = 80   # buckets [0, 80)
VAL_PCT = 90     # buckets [80, 90); test = [90, 100)

SPLIT_CASE = (
    f"CASE WHEN bucket < {TRAIN_PCT} THEN 'train' "
    f"WHEN bucket < {VAL_PCT} THEN 'val' ELSE 'test' END"
)


def pipeline_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, lang) corpus composition under a deterministic 80/10/10
    hash split. The assignment is a pure scan expression — on 100 TB this
    costs one pass and zero shuffles beyond the tiny 15-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id", "lang", f"size({TOKS_S}) AS n_tokens", f"{GATE_S} AS bucket"
        )
        .selectExpr("lang", "n_tokens", f"{SPLIT_CASE} AS split")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


TRAIN_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT lang, len({TOKS_D}) AS n_tokens, {GATE_D} AS bucket FROM documents
)
SELECT {SPLIT_CASE.replace("bucket", "bucket")} AS split, lang,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM assigned
GROUP BY 1, 2
"""


# --- source-weighted data mixing -------------------------------------------
# Per-source keep-rates live in a config dimension (derived here from the
# source name so both engines build the identical table; in production it's
# a literal table from the data-mixing recipe). The dim is one row per
# source → broadcast; the corpus is filtered map-side during its one scan.

MIX_RATE_S = (
    "10 + pmod(cast(conv(substr(md5(source), 1, 15), 16, 10) as bigint), 80)"
)
MIX_RATE_D = f"10 + ({portable_hash64_sql('source')} % 80)"


def pipeline_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply per-source sampling rates (10-89%) from a broadcast rate dim;
    report achieved composition. The corpus never shuffles: broadcast hash
    join + filter inside the scan stage, then a per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    rates = (
        docs.select("source").distinct()
        .selectExpr("source", f"{MIX_RATE_S} AS keep_pct")
    )
    return (
        docs.selectExpr("doc_id", "source", f"{GATE_S} AS bucket")
        .join(F.broadcast(rates), "source")
        .where(F.col("bucket") < F.col("keep_pct"))
        .groupBy("source", "keep_pct")
        .agg(F.count("*").alias("n_kept"))
    )


SOURCE_MIX_ORACLE = f"""
WITH rates AS (
  SELECT source, {MIX_RATE_D} AS keep_pct FROM (SELECT DISTINCT source FROM documents)
), gated AS (
  SELECT doc_id, source, {GATE_D} AS bucket FROM documents
)
SELECT g.source, r.keep_pct, COUNT(*) AS n_kept
FROM gated g JOIN rates r USING (source)
WHERE g.bucket < r.keep_pct
GROUP BY 1, 2
"""


# --- eval-set decontamination ----------------------------------------------

DECON_K = 5          # word 5-grams: random cross-doc collisions ~1, dups ~50+
DECON_EVAL_PCT = 95  # buckets >= 95 are the held-out set
DECON_THRESHOLD = 10  # shared-shingle count that flags contamination


def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share word-5-gram fingerprints with the eval
    split: (doc_id, n_shared, contaminated). The eval fingerprint set (5%
    of docs, distinct hashes only) broadcasts; train shingles stream
    against it map-side, then one aggregate keyed by doc_id. Collision
    noise (~1 shared 5-gram) and true near-dups (~full overlap) are
    separated by DECON_THRESHOLD."""
    docs = spread_small_source(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    sh = X.shingles_spark("toks", DECON_K)
    shingled = (
        docs.selectExpr("doc_id", f"{TOKS_S} AS toks", f"{GATE_S} AS bucket")
        .select("doc_id", "bucket", F.explode(F.array_distinct(F.expr(sh))).alias("shingle"))
        .selectExpr(
            "doc_id", "bucket",
            "cast(conv(substr(md5(shingle), 1, 15), 16, 10) as bigint) AS sh_h",
        )
    )
    eval_fp = (
        shingled.where(F.col("bucket") >= DECON_EVAL_PCT)
        .select("sh_h").distinct()
    )
    train = shingled.where(F.col("bucket") < DECON_EVAL_PCT)
    return (
        train.join(F.broadcast(eval_fp), "sh_h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .selectExpr(
            "doc_id", "n_shared",
            f"CAST(n_shared >= {DECON_THRESHOLD} AS INT) AS contaminated",
        )
    )


DECONTAMINATE_ORACLE = f"""
WITH toked AS (
  SELECT doc_id, {TOKS_D} AS toks, {GATE_D} AS bucket FROM documents
), sh AS (
  SELECT DISTINCT doc_id, bucket,
         unnest({X.shingles_duck('toks', DECON_K)}) AS shingle
  FROM toked
), hashed AS (
  SELECT doc_id, bucket, {portable_hash64_sql('shingle')} AS sh_h FROM sh
), eval_fp AS (
  SELECT DISTINCT sh_h FROM hashed WHERE bucket >= {DECON_EVAL_PCT}
)
SELECT h.doc_id, COUNT(*) AS n_shared,
       CAST(COUNT(*) >= {DECON_THRESHOLD} AS INT) AS contaminated
FROM hashed h JOIN eval_fp USING (sh_h)
WHERE h.bucket < {DECON_EVAL_PCT}
GROUP BY 1
"""


# --- sequence packing (concat-and-chop) ------------------------------------

PACK_CTX = 512     # context-window token budget
PACK_SHARD = 1000  # doc_ids per prefix-sum shard


def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop packing: documents are concatenated in doc_id order
    and chopped into PACK_CTX-token context windows; each doc reports its
    start offset and the window span it lands in.

    The running offset is a distributed two-pass prefix sum, not one
    global window partition: (1) cumsum WITHIN each doc_id-range shard,
    (2) cumsum the per-shard subtotals (one row per shard — driver-scale)
    and broadcast them back as shard base offsets. No partition ever holds
    more than one shard, so the shape survives a 100 TB corpus; a plain
    ``sum() over (order by doc_id)`` would funnel everything through one
    task. Shards are doc_id ranges, so (shard, doc_id) order == doc_id
    order and the result is identical to the naive window (the oracle).
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        f"size({TOKS_S}) AS n_tokens",
        f"CAST(floor(doc_id / {PACK_SHARD}) AS BIGINT) AS shard",
    )
    in_shard = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = base.withColumn(
        "local_offset", F.coalesce(F.sum("n_tokens").over(in_shard), F.lit(0))
    )
    shard_w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_bases = (
        base.groupBy("shard").agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn("shard_base", F.coalesce(F.sum("shard_tokens").over(shard_w), F.lit(0)))
        .select("shard", "shard_base")
    )
    return (
        local.join(F.broadcast(shard_bases), "shard")
        .selectExpr(
            "doc_id", "n_tokens",
            "shard_base + local_offset AS start_offset",
        )
        .selectExpr(
            "doc_id", "n_tokens", "start_offset",
            f"CAST(floor(start_offset / {PACK_CTX}) AS BIGINT) AS first_window",
            f"CAST(floor((start_offset + n_tokens - 1) / {PACK_CTX}) AS BIGINT) AS last_window",
        )
    )


PACK_ORACLE = f"""
WITH base AS (
  SELECT doc_id, len({TOKS_D}) AS n_tokens FROM documents
), offs AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM base
)
SELECT doc_id, n_tokens, start_offset,
       CAST(floor(start_offset / {PACK_CTX}) AS BIGINT) AS first_window,
       CAST(floor((start_offset + n_tokens - 1) / {PACK_CTX}) AS BIGINT) AS last_window
FROM offs
"""


SPECS = [
    QuerySpec("pipeline_train_eval_split", pipeline_train_eval_split,
              TRAIN_SPLIT_ORACLE,
              "deterministic 80/10/10 hash split, per-(split,lang) composition",
              ("pipeline", "trainprep")),
    QuerySpec("pipeline_source_mix", pipeline_source_mix, SOURCE_MIX_ORACLE,
              "per-source sampling rates via broadcast config dim",
              ("pipeline", "trainprep")),
    QuerySpec("pipeline_decontaminate", pipeline_decontaminate,
              DECONTAMINATE_ORACLE,
              "eval-set 5-gram fingerprint decontamination",
              ("pipeline", "trainprep", "dedup")),
    QuerySpec("pipeline_pack_sequences", pipeline_pack_sequences, PACK_ORACLE,
              "concat-and-chop packing via two-pass distributed prefix sum",
              ("pipeline", "trainprep")),
]


# --- per-source quota sampling ----------------------------------------------

QUOTA_BUDGET = 4_000  # chars per source — binds on every source (totals 6.3-8.6k)
QUOTA_SHARD = 200      # doc_id range per prefix-sum shard


def pipeline_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each source at a character budget, keeping docs in doc_id
    (priority) order until the running total would exceed the quota — the
    "N tokens per domain" cap every mixture recipe needs.

    Same two-pass sharded prefix sum as ``pipeline_pack_sequences`` but
    keyed per source: in-shard cumsum, then per-(source, shard) subtotals
    (driver-scale) cumsum'd and broadcast back. No single-task global
    window, so the cap is computable over a 100 TB source without
    funneling it through one partition.
    """
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        "n_chars",
        f"CAST(floor(doc_id / {QUOTA_SHARD}) AS BIGINT) AS shard",
    )
    in_shard = Window.partitionBy("source", "shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = docs.withColumn("local_cum", F.sum("n_chars").over(in_shard))
    shard_w = Window.partitionBy("source").orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        docs.groupBy("source", "shard")
        .agg(F.sum("n_chars").alias("shard_chars"))
        .withColumn("base", F.coalesce(F.sum("shard_chars").over(shard_w), F.lit(0)))
        .select("source", "shard", "base")
    )
    return (
        local.join(F.broadcast(bases), ["source", "shard"])
        .selectExpr("doc_id", "source", "n_chars", "base + local_cum AS cum_chars")
        .where(F.col("cum_chars") <= QUOTA_BUDGET)
    )


QUOTA_ORACLE = f"""
SELECT doc_id, source, n_chars, cum_chars
FROM (
  SELECT doc_id, source, n_chars,
         CAST(SUM(n_chars) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_chars
  FROM documents
)
WHERE cum_chars <= {QUOTA_BUDGET}
"""


SPECS += [
    QuerySpec("pipeline_quota_sample", pipeline_quota_sample, QUOTA_ORACLE,
              "per-source char-budget cap via sharded distributed prefix sum",
              ("pipeline", "trainprep")),
]


# --- temperature-weighted source mixing --------------------------------------
# The T=2 mixture recipe (rate ∝ share^(1/2), renormalized): upweights
# rare sources, downweights dominant ones. Determinism: the only float
# steps are per-source sqrt + one round-to-int (6 dp) — the cross-source
# normalizer is then an INTEGER sum, so no float accumulation order
# exists anywhere. The corpus itself never shuffles: the 20-row rate dim
# broadcasts back onto the scan, same as pipeline_source_mix.

TEMP_GATE_S = (
    "pmod(cast(conv(substr(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) as bigint), 1000)"
)


def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = W.partitionBy()
    rates = (
        counts.withColumn("n_total", F.sum("n_docs").over(tot))
        .selectExpr(
            "source",
            "n_docs",
            "CAST(round(sqrt(CAST(n_docs AS DOUBLE) / n_total) * 1000000) AS BIGINT) AS term",
        )
        .withColumn("denom", F.sum("term").over(tot))
        .selectExpr(
            "source",
            "n_docs",
            "CAST(floor(1000.0 * term / denom) AS BIGINT) AS rate_permille",
        )
    )
    return (
        docs.selectExpr("doc_id", "source", f"{TEMP_GATE_S} AS bucket")
        .join(F.broadcast(rates), "source")
        .where(F.col("bucket") < F.col("rate_permille"))
        .groupBy("source", "n_docs", "rate_permille")
        .agg(F.count("*").alias("n_kept"))
    )


TEMP_GATE_D = f"{portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % 1000"

TEMPERATURE_MIX_ORACLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), terms AS (
  SELECT source, n_docs,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()) * 1000000) AS BIGINT) AS term
  FROM counts
), rates AS (
  SELECT source, n_docs,
         CAST(floor(1000.0 * term / SUM(term) OVER ()) AS BIGINT) AS rate_permille
  FROM terms
), gated AS (
  SELECT doc_id, source, {TEMP_GATE_D} AS bucket FROM documents
)
SELECT g.source, r.n_docs, r.rate_permille, COUNT(*) AS n_kept
FROM gated g JOIN rates r USING (source)
WHERE g.bucket < r.rate_permille
GROUP BY 1, 2, 3
"""


SPECS += [
    QuerySpec("pipeline_temperature_mix", pipeline_temperature_mix,
              TEMPERATURE_MIX_ORACLE,
              "temperature-weighted (share^1/2) source mixing, integer-exact normalizer",
              ("pipeline", "trainprep")),
]


# --- fixed-size deterministic sample (distributed reservoir) ----------------
# "Give me exactly K docs per source" — the reservoir-sampling ask, made
# deterministic by ranking on a portable hash of doc_id instead of rand().
# The scale hazard is that a per-source row_number() puts EVERY row of a
# hot source through one reducer. So it runs in two phases: a local top-K
# per (source, hash-shard) — SHARDS parallel reducers per source, each
# keeping at most K candidates — then the true top-K per source over the
# surviving SHARDS*K rows. Same answer as the single-window oracle
# (the global top-K is always contained in the union of shard top-Ks),
# but no reducer ever sees more than max(shard_size, SHARDS*K) rows.

RES_K = 20
RES_SHARDS = 8
RES_H_S = "cast(conv(substr(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) as bigint)"


def pipeline_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.selectExpr("source", "doc_id", f"{RES_H_S} AS h")
    local = Window.partitionBy("source", F.pmod(F.col("h"), F.lit(RES_SHARDS))) \
        .orderBy("h", "doc_id")
    cand = (
        d.withColumn("lrk", F.row_number().over(local))
        .where(F.col("lrk") <= RES_K)
        .drop("lrk")
    )
    final = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(final))
        .where(F.col("rk") <= RES_K)
        .select("source", "doc_id", "rk")
    )


RESERVOIR_ORACLE = f"""
WITH d AS (
  SELECT source, doc_id,
         {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} AS h
  FROM documents
), r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM d
)
SELECT source, doc_id, rk FROM r WHERE rk <= {RES_K}
"""


SPECS += [
    QuerySpec("pipeline_reservoir_sample", pipeline_reservoir_sample,
              RESERVOIR_ORACLE,
              "fixed-K per-source deterministic sample, sharded two-phase top-K",
              ("pipeline", "trainprep", "sampling")),
]


# --- deterministic hash-based negative sampling -----------------------------
# Contrastive-training pair construction: K pseudo-random negatives per
# anchor embedding, drawn by a deterministic LCG-style formula over the
# contiguous id space — so the sample is reproducible, shard-independent,
# and the DuckDB oracle regenerates it exactly. Shape at 100 TB: the
# candidate ids are a map-side generator (explode of K per row, no RNG
# state), then ONE equi-join on neg_id fetches negative metadata —
# uniform fan-in by construction (the mixer spreads ids), so the join has
# no skew. |corpus| enters as a broadcast one-row aggregate, never a
# driver collect. The per-row product vec_id * 40503 stays inside a long
# up to ~2e14 anchors.

NEG_K = 4
_NEG_A, _NEG_B = 40503, 1000003


def pipeline_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K negatives per anchor: (anchor, rank, negative id/label, and a
    false-negative flag when the drawn negative shares the anchor's
    label — the quantity contrastive pipelines monitor)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_df = emb.agg(F.count("*").alias("n"))
    cand = (
        emb.select("vec_id", F.col("label").alias("anchor_label"))
        .crossJoin(F.broadcast(n_df))
        .selectExpr(
            "vec_id", "anchor_label", "n",
            f"explode(sequence(1, {NEG_K})) AS neg_rank",
        )
        .selectExpr(
            "vec_id", "anchor_label", "neg_rank",
            f"(vec_id * {_NEG_A} + neg_rank * {_NEG_B}) % n AS h", "n",
        )
        .selectExpr(
            "vec_id", "anchor_label", "neg_rank",
            "CASE WHEN h = vec_id THEN (h + 1) % n ELSE h END AS neg_id",
        )
    )
    neg = emb.select(F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label"))
    return cand.join(neg, "neg_id").select(
        "vec_id", "neg_rank", "neg_id", "anchor_label", "neg_label",
        (F.col("neg_label") == F.col("anchor_label")).cast("int").alias("is_false_negative"),
    )


NEGATIVE_PAIRS_ORACLE = f"""
WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
cand AS (
  SELECT e.vec_id, e.label AS anchor_label, i.neg_rank,
         (e.vec_id * {_NEG_A} + i.neg_rank * {_NEG_B}) % nn.n AS h, nn.n
  FROM embeddings e, nn,
       (SELECT unnest(generate_series(1, {NEG_K})) AS neg_rank) i
), fixed AS (
  SELECT vec_id, anchor_label, neg_rank,
         CASE WHEN h = vec_id THEN (h + 1) % n ELSE h END AS neg_id
  FROM cand
)
SELECT f.vec_id, f.neg_rank, f.neg_id, f.anchor_label, g.label AS neg_label,
       CAST(g.label = f.anchor_label AS INT) AS is_false_negative
FROM fixed f JOIN embeddings g ON g.vec_id = f.neg_id
"""


SPECS += [
    QuerySpec("pipeline_negative_pairs", pipeline_negative_pairs,
              NEGATIVE_PAIRS_ORACLE,
              "deterministic K-negative sampling per anchor, skew-free fetch join",
              ("trainprep", "contrastive")),
]


# --- deterministic class rebalancing ----------------------------------------
# Oversample minority classes to (approximate) parity by an integer
# replication factor rep = ceil(max_class_size / class_size) — the
# deterministic batch form of weighted sampling for class-imbalanced
# training. Per-label factors are a driver-scale broadcast dim; the
# replication itself is a map-side ``explode(sequence(1, rep))`` — no
# shuffle of the fact table, no RNG. Output pins the post-balance class
# sizes plus an exact id checksum over the replicated rows, so the
# oracle verifies the replication content, not just its cardinality.


def pipeline_class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per label: size before/after oversampling to parity, the
    replication factor, and an exact checksum of replicated ids."""
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count("*").alias("n"))
    maxn = counts.agg(F.max("n").alias("maxn"))
    factors = counts.crossJoin(F.broadcast(maxn)).selectExpr(
        "label", "n", "CAST(ceil(CAST(maxn AS DOUBLE) / n) AS BIGINT) AS rep"
    )
    rebal = (
        emb.join(F.broadcast(factors), "label")
        .selectExpr("label", "vec_id", "explode(sequence(1, rep)) AS copy_i")
    )
    out = rebal.groupBy("label").agg(
        F.count("*").alias("n_after"),
        F.sum("vec_id").alias("id_checksum"),
    )
    return out.join(
        factors.select("label", F.col("n").alias("n_before"), "rep"), "label"
    )


CLASS_REBALANCE_ORACLE = """
WITH counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
mx AS (SELECT MAX(n) AS maxn FROM counts),
factors AS (
  SELECT label, n, CAST(ceil(CAST(maxn AS DOUBLE) / n) AS BIGINT) AS rep
  FROM counts, mx
), rebal AS (
  SELECT e.label, e.vec_id
  FROM embeddings e JOIN factors f USING (label),
       UNNEST(generate_series(1, f.rep)) AS g(copy_i)
)
SELECT r.label, COUNT(*) AS n_after, CAST(SUM(vec_id) AS BIGINT) AS id_checksum,
       ANY_VALUE(f.n) AS n_before, ANY_VALUE(f.rep) AS rep
FROM rebal r JOIN factors f USING (label)
GROUP BY r.label
"""


SPECS += [
    QuerySpec("pipeline_class_rebalance", pipeline_class_rebalance,
              CLASS_REBALANCE_ORACLE,
              "map-side oversampling to class parity with exact content checksums",
              ("trainprep", "sampling")),
]


# --- preference-pair construction (DPO/RLHF prep) ---------------------------
# Contrastive (chosen, rejected) document pairs per (lang, source)
# bucket: chosen = highest quality score, rejected = lowest. The score is
# an INTEGER letter-density proxy — (alpha_chars * 1000) div n_chars —
# so ranking never compares engine-accumulated floats; ties break on
# doc_id, making the pair selection total. One shuffle on the bucket
# key; both extremes come from the SAME window pass (rank ascending +
# rank descending over one sorted partition — Spark reuses the sort).
# At 100 TB the bucket count is bounded (|lang| × |source|), and the
# per-bucket window is the standard argmax shape — for mega-buckets
# swap in the sharded-rank machinery (q_revenue_gini).

def pipeline_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", "source",
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) * 1000 AS BIGINT)"
        " div greatest(length(text), 1) AS score",
    )
    w_best = Window.partitionBy("lang", "source").orderBy(
        F.desc("score"), "doc_id"
    )
    w_worst = Window.partitionBy("lang", "source").orderBy(
        F.asc("score"), "doc_id"
    )
    ranked = d.select(
        "lang", "source", "doc_id", "score",
        F.row_number().over(w_best).alias("rb"),
        F.row_number().over(w_worst).alias("rw"),
    )
    best = ranked.where(F.col("rb") == 1).selectExpr(
        "lang", "source", "doc_id AS chosen_doc_id", "score AS chosen_score"
    )
    worst = ranked.where(F.col("rw") == 1).selectExpr(
        "lang", "source", "doc_id AS rejected_doc_id", "score AS rejected_score"
    )
    return (
        best.join(worst, ["lang", "source"])
        .where(F.col("chosen_doc_id") != F.col("rejected_doc_id"))
        .selectExpr(
            "lang", "source", "chosen_doc_id", "rejected_doc_id",
            "chosen_score", "rejected_score",
            "chosen_score - rejected_score AS score_margin",
        )
    )


DPO_PAIRS_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, source,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000
              // greatest(length(text), 1) AS BIGINT) AS score
  FROM documents
), ranked AS (
  SELECT lang, source, doc_id, score,
         row_number() OVER (PARTITION BY lang, source ORDER BY score DESC, doc_id) AS rb,
         row_number() OVER (PARTITION BY lang, source ORDER BY score ASC, doc_id) AS rw
  FROM d
)
SELECT b.lang, b.source, b.doc_id AS chosen_doc_id, w.doc_id AS rejected_doc_id,
       b.score AS chosen_score, w.score AS rejected_score,
       b.score - w.score AS score_margin
FROM (SELECT * FROM ranked WHERE rb = 1) b
JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (lang, source)
WHERE b.doc_id <> w.doc_id
"""


SPECS += [
    QuerySpec("pipeline_dpo_pairs", pipeline_dpo_pairs, DPO_PAIRS_ORACLE,
              "per-bucket (chosen, rejected) preference pairs by integer quality score",
              ("trainprep", "pairs")),
]


# --- leave-one-out target encoding ------------------------------------------
# The leakage-safe categorical-feature encoder: each row's category is
# replaced by the target mean over all OTHER rows of the category —
# (Σ_group − own) / (n_group − 1). One tiny per-category aggregate
# broadcast back; everything else is map-side integer arithmetic. The
# emitted mean is FLOOR((num·1000) / den) in integer milli-cents, so
# the comparison never touches engine float accumulation. At 100 TB
# this is the canonical aggregate-broadcast-rejoin: the fact table is
# scanned twice but shuffled never.

def pipeline_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
    )
    g = o.groupBy("o_orderpriority").agg(
        F.sum(F.expr("CAST(cents AS DECIMAL(18,0))")).cast("long").alias("g_sum"),
        F.count("*").alias("g_n"),
    )
    return o.join(F.broadcast(g), "o_orderpriority").selectExpr(
        "o_orderkey", "o_orderpriority",
        "g_sum - cents AS loo_num_cents",
        "g_n - 1 AS loo_den",
        "(g_sum - cents) * 1000 div (g_n - 1) AS loo_mean_millicents",
    )


LOO_ENCODING_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), g AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS g_sum,
         COUNT(*) AS g_n
  FROM o GROUP BY o_orderpriority
)
SELECT o_orderkey, o_orderpriority,
       g_sum - cents AS loo_num_cents,
       g_n - 1 AS loo_den,
       (g_sum - cents) * 1000 // (g_n - 1) AS loo_mean_millicents
FROM o JOIN g USING (o_orderpriority)
"""


SPECS += [
    QuerySpec("pipeline_loo_target_encoding", pipeline_loo_target_encoding,
              LOO_ENCODING_ORACLE,
              "leakage-safe leave-one-out categorical target encoding, integer-exact",
              ("trainprep", "features")),
]


# --- dataset freeze: shard manifest ------------------------------------------
# The reproducibility artifact every frozen training set ships with: a
# deterministic hash-shard assignment plus per-shard counts, byte
# totals, and an order-independent XOR content checksum — enough to
# verify any later re-materialization shard-by-shard without comparing
# rows. One scan, one 16-group aggregate.

MANIFEST_SHARDS = 16


def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "text",
        "cast(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) as bigint)"
        f" % {MANIFEST_SHARDS} AS shard",
    )
    return d.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.expr(
            "bit_xor(cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint))"
        ).alias("content_checksum"),
    )


SHARD_MANIFEST_ORACLE = f"""
SELECT {portable_hash64_sql("CAST(doc_id AS VARCHAR)")} % {MANIFEST_SHARDS} AS shard,
       COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
       bit_xor({portable_hash64_sql("text")}) AS content_checksum
FROM documents GROUP BY 1
"""


# --- length-bucketed batching efficiency -------------------------------------
# Why sequence buckets exist: a training batch pads every member to the
# batch max, so batches drawn in HASH order waste far more tokens than
# batches drawn in LENGTH order. Both arrangements are global ranks —
# computed with the value-sharded two-pass distributed rank (the
# q_revenue_gini machinery; hash ranks shard uniformly by construction)
# — then batch_id = (rank-1) div B and the waste is an integer
# aggregate. Output: one row per policy with exact padded/real token
# counts; the oracle uses plain row_number (single-threaded engine).

BATCH_SIZE = 32
LEN_SHARD = 200          # chars per length shard
HASH_SHARD = 1 << 55     # uniform hash shards


def _global_rank(df: DataFrame, key: str, shard_expr: str):
    """Two-pass sharded global rank by (key, doc_id): in-shard
    row_number + broadcast prefix-sum of shard sizes."""
    sharded = df.selectExpr("doc_id", "n", "k", f"{shard_expr} AS shard")
    in_shard = Window.partitionBy("shard").orderBy(key, "doc_id")
    local = sharded.withColumn("lr", F.row_number().over(in_shard))
    shard_w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        sharded.groupBy("shard").agg(F.count("*").alias("c"))
        .withColumn("base", F.coalesce(F.sum("c").over(shard_w), F.lit(0)))
        .select("shard", "base")
    )
    return local.join(F.broadcast(bases), "shard").selectExpr(
        "doc_id", "n", "base + lr AS rnk"
    )


def pipeline_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "length(text) AS n",
        "cast(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) as bigint) AS h",
    )
    by_len = _global_rank(
        d.selectExpr("doc_id", "n", "n AS k"), "k", f"k div {LEN_SHARD}"
    ).withColumn("policy", F.lit("length_sorted"))
    by_hash = _global_rank(
        d.selectExpr("doc_id", "n", "h AS k"), "k", f"k div {HASH_SHARD}"
    ).withColumn("policy", F.lit("hash_order"))
    both = by_len.unionByName(by_hash).selectExpr(
        "policy", "n", f"(rnk - 1) div {BATCH_SIZE} AS batch_id"
    )
    per_batch = both.groupBy("policy", "batch_id").agg(
        F.count("*").alias("b_n"),
        F.max("n").alias("b_max"),
        F.sum(F.expr("CAST(n AS DECIMAL(18,0))")).cast("long").alias("b_sum"),
    )
    return per_batch.groupBy("policy").agg(
        F.count("*").alias("n_batches"),
        F.sum(F.expr("CAST(b_sum AS DECIMAL(18,0))")).cast("long").alias("real_tokens"),
        F.sum(F.expr("CAST(b_max * b_n AS DECIMAL(18,0))")).cast("long").alias("padded_tokens"),
    ).selectExpr(
        "policy", "n_batches", "real_tokens", "padded_tokens",
        "round((padded_tokens - real_tokens) / CAST(padded_tokens AS DOUBLE) * 100, 6)"
        " AS waste_pct",
    )


LENGTH_BUCKETING_ORACLE = f"""
WITH d AS (
  SELECT doc_id, length(text) AS n,
         {portable_hash64_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
), ranked AS (
  SELECT 'length_sorted' AS policy, n,
         row_number() OVER (ORDER BY n, doc_id) AS rnk
  FROM d
  UNION ALL
  SELECT 'hash_order', n, row_number() OVER (ORDER BY h, doc_id) FROM d
), batched AS (
  SELECT policy, n, (rnk - 1) // {BATCH_SIZE} AS batch_id FROM ranked
), per_batch AS (
  SELECT policy, batch_id, COUNT(*) AS b_n, MAX(n) AS b_max,
         CAST(SUM(CAST(n AS HUGEINT)) AS BIGINT) AS b_sum
  FROM batched GROUP BY 1, 2
), agg AS (
  SELECT policy, COUNT(*) AS n_batches,
         CAST(SUM(CAST(b_sum AS HUGEINT)) AS BIGINT) AS real_tokens,
         CAST(SUM(CAST(b_max * b_n AS HUGEINT)) AS BIGINT) AS padded_tokens
  FROM per_batch GROUP BY 1
)
SELECT policy, n_batches, real_tokens, padded_tokens,
       round((padded_tokens - real_tokens) / CAST(padded_tokens AS DOUBLE) * 100, 6)
         AS waste_pct
FROM agg
"""


# --- T5-style span-corruption masks ------------------------------------------
# Denoising-objective prep: deterministic corruption spans per document,
# one span per 20 whitespace tokens, start positions drawn from the
# portable hash family keyed on (doc_id, span_idx). Pure map-side
# generation (sequence + explode) — at 100 TB this runs at scan speed
# with zero shuffles; the oracle regenerates the same arithmetic.

SPAN_LEN = 3
SPAN_EVERY = 20


def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"size({X.tokens_spark('text')}) AS n_tokens"
    ).where(F.col("n_tokens") > SPAN_LEN + SPAN_EVERY)
    return d.selectExpr(
        "doc_id", "n_tokens",
        f"explode(sequence(0, n_tokens div {SPAN_EVERY} - 1)) AS span_idx",
    ).selectExpr(
        "doc_id", "n_tokens", "span_idx",
        "cast(conv(substr(md5(concat(CAST(doc_id AS STRING), '#', CAST(span_idx AS STRING))), 1, 15), 16, 10) as bigint)"
        f" % (n_tokens - {SPAN_LEN}) AS span_start",
        f"{SPAN_LEN} AS span_len",
    )


SPAN_CORRUPTION_ORACLE = f"""
WITH d AS (
  SELECT doc_id, len({X.tokens_duck('text')}) AS n_tokens FROM documents
), eligible AS (
  SELECT doc_id, n_tokens FROM d WHERE n_tokens > {SPAN_LEN + SPAN_EVERY}
), spans AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(0, n_tokens // {SPAN_EVERY} - 1)) AS span_idx
  FROM eligible
)
SELECT doc_id, n_tokens, span_idx,
       {portable_hash64_sql("concat(CAST(doc_id AS VARCHAR), '#', CAST(span_idx AS VARCHAR))")}
         % (n_tokens - {SPAN_LEN}) AS span_start,
       {SPAN_LEN} AS span_len
FROM spans
"""


SPECS += [
    QuerySpec("pipeline_shard_manifest", pipeline_shard_manifest,
              SHARD_MANIFEST_ORACLE,
              "dataset-freeze shard manifest with XOR content checksums",
              ("trainprep", "manifest")),
    QuerySpec("pipeline_length_bucketing", pipeline_length_bucketing,
              LENGTH_BUCKETING_ORACLE,
              "padding-waste comparison: hash-order vs length-bucketed batches",
              ("trainprep", "batching")),
    QuerySpec("pipeline_span_corruption", pipeline_span_corruption,
              SPAN_CORRUPTION_ORACLE,
              "T5-style deterministic span-corruption mask generation",
              ("trainprep", "masking")),
]


# --- deterministic median imputation -----------------------------------------
# Feature-prep null handling: every IMPUTE_MOD-th reading is knocked out
# deterministically (the corruption device from json_corrupt_handling),
# then refilled with its event-type's median over the SURVIVING values.
# The median is floored to integer cents (decile-binning boundary rule)
# so imputed cells are never engine-float artifacts; output pins both
# populations (observed vs imputed) per type.

IMPUTE_MOD = 7


def pipeline_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "event_type",
        f"CASE WHEN event_id % {IMPUTE_MOD} = 0 THEN NULL"
        " ELSE CAST(round(value * 100) AS BIGINT) END AS cents",
    )
    med = ev.where(F.col("cents").isNotNull()).groupBy("event_type").agg(
        F.expr("CAST(floor(percentile(cents, 0.5)) AS BIGINT)").alias("median_cents")
    )
    filled = ev.join(F.broadcast(med), "event_type").selectExpr(
        "event_type",
        "CAST(cents IS NULL AS INT) AS imputed",
        "coalesce(cents, median_cents) AS filled_cents",
    )
    return filled.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("imputed").alias("n_imputed"),
        F.sum(F.expr("CAST(filled_cents AS DECIMAL(18,0))")).cast("long").alias("sum_cents"),
        F.min("filled_cents").alias("min_cents"),
    )


MEDIAN_IMPUTE_ORACLE = f"""
WITH ev AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % {IMPUTE_MOD} = 0 THEN NULL
              ELSE CAST(round(value * 100) AS BIGINT) END AS cents
  FROM events
), med AS (
  SELECT event_type, CAST(floor(quantile_cont(cents, 0.5)) AS BIGINT) AS median_cents
  FROM ev WHERE cents IS NOT NULL GROUP BY event_type
), filled AS (
  SELECT ev.event_type, CAST(ev.cents IS NULL AS INT) AS imputed,
         COALESCE(ev.cents, med.median_cents) AS filled_cents
  FROM ev JOIN med USING (event_type)
)
SELECT event_type, COUNT(*) AS n, CAST(SUM(imputed) AS BIGINT) AS n_imputed,
       CAST(SUM(CAST(filled_cents AS HUGEINT)) AS BIGINT) AS sum_cents,
       MIN(filled_cents) AS min_cents
FROM filled GROUP BY event_type
"""


SPECS += [
    QuerySpec("pipeline_median_impute", pipeline_median_impute,
              MEDIAN_IMPUTE_ORACLE,
              "deterministic knockout + per-type floored-median imputation",
              ("trainprep", "features")),
]


# --- incremental aggregate maintenance ---------------------------------------
# The 100 TB daily-pipeline contract: when a new day lands, update the
# serving aggregate WITHOUT rescanning history. COUNT/SUM re-aggregate
# trivially; COUNT(DISTINCT ...) does NOT — the stored state must carry
# a mergeable distinct representation (exact sets here, since |users| is
# bounded; at open-domain scale the same shape swaps in HLL sketches —
# operators/sketches.py pins that union-merge path). This query runs the
# incremental plan: "state" (days < cutoff) and "delta" (days >= cutoff)
# aggregated separately, then MERGED (sums added, user sets unioned) —
# and the DuckDB oracle is the full recompute over all days, so the hash
# match IS the proof that the merge law holds for every output column.

def pipeline_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "user_id",
        "CAST(round(value * 100) AS BIGINT) AS cents",
        f"unix_millis(ts) div {86_400_000} AS day",
    )
    bounds = ev.agg(F.expr("min(day) + (max(day) - min(day)) * 9 div 10")
                    .alias("cutoff"))
    stamped = ev.crossJoin(F.broadcast(bounds))

    def _partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("CAST(cents AS DECIMAL(28,0))")).cast("long")
            .alias("revenue_cents"),
            F.collect_set("user_id").alias("users"),
        )

    state = _partial(stamped.where("day < cutoff"))
    delta = _partial(stamped.where("day >= cutoff"))
    merged = (
        state.selectExpr("event_type", "n_events", "revenue_cents", "users")
        .unionByName(delta.selectExpr(
            "event_type", "n_events", "revenue_cents", "users"))
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.expr("CAST(revenue_cents AS DECIMAL(28,0))")).cast("long")
            .alias("revenue_cents"),
            F.size(F.array_distinct(F.flatten(F.collect_list("users"))))
            .alias("n_users"),
        )
    )
    return merged


INCREMENTAL_ROLLUP_ORACLE = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
            AS BIGINT) AS revenue_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


SPECS += [
    QuerySpec("pipeline_incremental_rollup", pipeline_incremental_rollup,
              INCREMENTAL_ROLLUP_ORACLE,
              "state+delta merge equals full recompute (mergeable distincts)",
              ("pipeline", "scale", "incremental")),
]


# --- exact-proportion stratified split ----------------------------------------
# pipeline_train_eval_split's hash-threshold split gives ~90/10 only in
# EXPECTATION — small strata can land 80/20. This is the exact-count
# variant: within every source stratum, rank docs in md5(doc_id) order (a
# deterministic uniform draw) and cut at floor(0.9 * n_stratum), so each
# stratum's train share is exactly right regardless of its size. The rank
# is the value-sharded two-pass machinery (shard = first md5 hex digit,
# per-(stratum, shard) counts prefix-summed driver-side, in-shard
# row_number + broadcast base) — no per-stratum global sort, so a stratum
# 1000x larger than the rest never serializes one partition.

SPLIT_TRAIN_PCT = 90


def pipeline_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "source", "md5(CAST(doc_id AS STRING)) AS h")
        .withColumn("shard", F.expr("CAST(conv(substr(h, 1, 1), 16, 10) AS INT)"))
    )
    counts = sorted(
        (r.source, r.shard, r.c)
        for r in docs.groupBy("source", "shard").agg(F.count("*").alias("c")).collect()
    )  # |sources| x 16 rows — driver-scale metadata, like every sharded-rank user
    totals: dict[str, int] = {}
    bases: list[tuple[str, int, int]] = []
    for src, sh, c in counts:
        bases.append((src, sh, totals.get(src, 0)))
        totals[src] = totals.get(src, 0) + c
    base_df = local_literal_df(
        spark, [(s, sh, b, totals[s]) for s, sh, b in bases],
        "source string, shard int, base long, n_src long",
    )
    w = Window.partitionBy("source", "shard").orderBy("h", "doc_id")
    ranked = (
        docs.join(F.broadcast(base_df), ["source", "shard"])
        .withColumn("rk", F.row_number().over(w) + F.col("base"))
    )
    return (
        ranked.selectExpr(
            "source", "doc_id",
            f"CASE WHEN rk <= n_src * {SPLIT_TRAIN_PCT} div 100"
            " THEN 'train' ELSE 'eval' END AS split",
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )


STRATIFIED_SPLIT_ORACLE = f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM documents
)
SELECT source,
       CASE WHEN rk <= n_src * {SPLIT_TRAIN_PCT} // 100
            THEN 'train' ELSE 'eval' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM r GROUP BY 1, 2
"""


SPECS += [
    QuerySpec("pipeline_stratified_split", pipeline_stratified_split,
              STRATIFIED_SPLIT_ORACLE,
              "exact-count 90/10 split per source stratum via sharded rank",
              ("trainprep", "sampling")),
]


# --- pretraining epoch-mixture plan -------------------------------------------
# The planning artifact a training run starts from: given a total token
# BUDGET, how many epochs of each corpus slice (lang) to take. It is
# square-root scaling (target share proportional to sqrt(slice_tokens) —
# upweights small high-value sources without letting giants drown them),
# capped at MAX_EPOCHS. Float determinism: sqrt IS correctly rounded
# under IEEE-754 (portable, unlike pow/log), and the cross-source sum of
# sqrts folds over a SORTED collected list on both engines, so even the
# double arithmetic is bit-identical. Per-source rollup is one shuffle;
# the normalizer is a one-row broadcast.

MIX_BUDGET_TOKENS = 30_000
MIX_MAX_EPOCHS_MILLI = 1_000  # cap: 1 epoch (sized so the fixture hits BOTH branches)


def pipeline_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.selectExpr("lang", f"CAST(len AS BIGINT) AS n_toks".replace(
            "len", f"size({X.tokens_spark('text')})"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
    )
    z_row = per_src.agg(
        F.expr(
            "aggregate(sort_array(collect_list(struct(lang, "
            "sqrt(CAST(n_tokens AS DOUBLE)) AS sq))), CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + x.sq)"
        ).alias("z")
    )
    return (
        per_src.crossJoin(F.broadcast(z_row))
        .selectExpr(
            "lang", "n_docs", "n_tokens",
            f"CAST(floor(least(CAST({MIX_BUDGET_TOKENS} AS DOUBLE)"
            " * sqrt(CAST(n_tokens AS DOUBLE)) / z / CAST(n_tokens AS DOUBLE),"
            f" {MIX_MAX_EPOCHS_MILLI / 1000.0}) * 1000.0) AS BIGINT)"
            " AS epochs_milli",
        )
        .selectExpr(
            "lang", "n_docs", "n_tokens", "epochs_milli",
            "n_tokens * epochs_milli div 1000 AS planned_tokens",
        )
    )


EPOCH_MIXTURE_ORACLE = f"""
WITH per_src AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len({X.tokens_duck('text')})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), z_row AS (
  SELECT list_sum(list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang)) AS z
  FROM per_src
), planned AS (
  SELECT lang, n_docs, n_tokens,
         CAST(floor(least(CAST({MIX_BUDGET_TOKENS} AS DOUBLE)
              * sqrt(CAST(n_tokens AS DOUBLE)) / z / CAST(n_tokens AS DOUBLE),
              {MIX_MAX_EPOCHS_MILLI / 1000.0}) * 1000.0) AS BIGINT)
           AS epochs_milli
  FROM per_src, z_row
)
SELECT lang, n_docs, n_tokens, epochs_milli,
       CAST(n_tokens * epochs_milli // 1000 AS BIGINT) AS planned_tokens
FROM planned
"""


SPECS += [
    QuerySpec("pipeline_epoch_mixture", pipeline_epoch_mixture,
              EPOCH_MIXTURE_ORACLE,
              "sqrt-scaled epoch allocation per lang slice under a token budget",
              ("trainprep", "mixture")),
]


# --- curriculum ordering: staged difficulty schedule with global positions --
# The curriculum-learning prep step: rank the corpus easy → hard in
# coarse STAGES (here a readability proxy — average token length in
# centichars, fixed config thresholds), but shuffle WITHIN each stage
# (portable 60-bit hash of doc_id) so batches stay i.i.d. inside a
# stage. Every doc gets its exact global training position. The
# position is NOT one global window: order key (stage, h, doc_id) is
# sharded by (stage, hash-bucket) — row_number inside each shard, plus
# a broadcast cumsum of the ~192 per-shard counts (3 stages × 64
# buckets), the same two-pass prefix sum as pipeline_pack_sequences.
# Bucket = top bits of the hash, so shard order == order-key order and
# the sharded result equals the naive global window (the oracle).

CURR_EASY_MAX = 540    # difficulty < 540  → stage 0
CURR_MED_MAX = 556     # difficulty < 556  → stage 1, else stage 2
CURR_BUCKETS = 64
CURR_BUCKET_WIDTH = (1 << 60) // CURR_BUCKETS


def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    base = docs.selectExpr(
        "doc_id",
        f"length(text) * 100 div size({TOKS_S}) AS difficulty",
    ).withColumn(
        "stage",
        F.expr(f"CAST(CASE WHEN difficulty < {CURR_EASY_MAX} THEN 0 "
               f"WHEN difficulty < {CURR_MED_MAX} THEN 1 ELSE 2 END AS INT)"),
    ).withColumn(
        "h", portable_hash64(F.col("doc_id").cast("string"))
    ).withColumn(
        "hbucket", F.expr(f"h div {CURR_BUCKET_WIDTH}")
    )
    in_shard = Window.partitionBy("stage", "hbucket").orderBy("h", "doc_id")
    local = base.withColumn(
        "local_pos", F.row_number().over(in_shard) - 1)
    shard_w = Window.orderBy("stage", "hbucket").rowsBetween(
        Window.unboundedPreceding, -1)
    shard_bases = (
        base.groupBy("stage", "hbucket").agg(F.count("*").alias("n"))
        .withColumn("shard_base",
                    F.coalesce(F.sum("n").over(shard_w), F.lit(0)))
        .select("stage", "hbucket", "shard_base")
    )
    return (
        local.join(F.broadcast(shard_bases), ["stage", "hbucket"])
        .selectExpr("doc_id", "stage", "difficulty",
                    "CAST(shard_base + local_pos AS BIGINT) AS global_pos")
    )


CURRICULUM_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) * 100 // len({TOKS_D}) AS BIGINT) AS difficulty,
         {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} AS h
  FROM documents
), staged AS (
  SELECT doc_id, difficulty,
         CAST(CASE WHEN difficulty < {CURR_EASY_MAX} THEN 0
              WHEN difficulty < {CURR_MED_MAX} THEN 1 ELSE 2 END AS INT)
           AS stage, h
  FROM base
)
SELECT doc_id, stage, difficulty,
       CAST(row_number() OVER (ORDER BY stage, h, doc_id) - 1 AS BIGINT)
         AS global_pos
FROM staged
"""


SPECS += [
    QuerySpec("pipeline_curriculum_order", pipeline_curriculum_order,
              CURRICULUM_ORACLE,
              "staged easy→hard curriculum with sharded-prefix-sum positions",
              ("pipeline", "trainprep")),
]


# --- weighted sampling without replacement (A-ES exponential keys) --------------
# The weighted companion of pipeline_reservoir_sample: Efraimidis-
# Spirakis assigns every doc the key u^(1/w) (u uniform, w = doc weight)
# and keeps the top-K — one distributed pass, no sequential reservoir.
# Ranking by u^(1/w) is ranking by ln(u)/w, and that stays INTEGER here:
# u is the doc hash folded into [1, 1000003] (inside the ln-micros range
# tests/test_round3_laws.py pins bit-equal across engines), so
# key = (lnm(u) - lnm(1000003)) * 1e6 div w is exact BIGINT arithmetic —
# monotone in the real-valued key, deterministic tie-breaks, and both
# engines truncate negative division toward zero (verified). Same
# sharded two-phase top-K as the reservoir: per-shard row_number, then
# the K-bounded global pass.

WS_K = 20
WS_U_MOD = 1_000_003              # u domain (prime); inside the lnm pin range
WS_LNM_MOD = 13_815_513           # floor(ln(1000003) * 1e6)
_WS_LNM = "CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"


def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.selectExpr(
        "source", "doc_id", "n_chars AS weight",
        f"pmod({RES_H_S}, {WS_U_MOD}) + 1 AS u",
    ).where("n_chars > 0").selectExpr(
        "source", "doc_id", "weight",
        f"({_WS_LNM.format(x='u')} - {WS_LNM_MOD}) * 1000000 div weight"
        " AS key_micros",
    )
    local = Window.partitionBy(
        F.pmod(F.col("doc_id"), F.lit(RES_SHARDS))
    ).orderBy(F.desc("key_micros"), "doc_id")
    cand = (
        d.withColumn("lrk", F.row_number().over(local))
        .where(F.col("lrk") <= WS_K)
        .drop("lrk")
    )
    final = Window.orderBy(F.desc("key_micros"), "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(final))
        .where(F.col("rk") <= WS_K)
        .select("rk", "doc_id", "source", "weight", "key_micros")
    )


WEIGHTED_SAMPLE_ORACLE = f"""
WITH d AS (
  SELECT source, doc_id, n_chars AS weight,
         ({portable_hash64_sql('CAST(doc_id AS VARCHAR)')}) % {WS_U_MOD} + 1
           AS u
  FROM documents WHERE n_chars > 0
), keyed AS (
  SELECT source, doc_id, weight,
         ({_WS_LNM.format(x='u')} - {WS_LNM_MOD}) * 1000000 // weight
           AS key_micros
  FROM d
), r AS (
  SELECT source, doc_id, weight, key_micros,
         row_number() OVER (ORDER BY key_micros DESC, doc_id) AS rk
  FROM keyed
)
SELECT rk, doc_id, source, weight, key_micros FROM r WHERE rk <= {WS_K}
"""


SPECS += [
    QuerySpec("pipeline_weighted_sample", pipeline_weighted_sample,
              WEIGHTED_SAMPLE_ORACLE,
              "Efraimidis-Spirakis weighted top-K sample, integer-exact keys",
              ("trainprep", "sampling")),
]


# --- k-fold cross-validation assignment + balance audit ---------------------------
# The missing member of the split family (train/eval, exact stratified):
# hash-deterministic k-fold assignment plus the audit a CV harness runs
# before trusting fold metrics — does each fold's language mix track the
# corpus mix? Deviation per (fold, lang) is the ppm gap between the
# fold's lang share and the corpus's; the report carries each fold's
# WORST deviation. Everything from two grouped rollups; the per-lang
# corpus shares broadcast.

KFOLD_K = 5


def pipeline_kfold_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang",
        f"size({X.tokens_spark('text')}) AS n_toks",
        f"pmod({RES_H_S}, {KFOLD_K}) AS fold",
    )
    per_fl = docs.groupBy("fold", "lang").agg(
        F.count("*").alias("n"), F.sum("n_toks").alias("toks"))
    per_f = per_fl.groupBy("fold").agg(
        F.sum("n").alias("fold_docs"), F.sum("toks").alias("fold_tokens"))
    per_l = per_fl.groupBy("lang").agg(F.sum("n").alias("lang_docs"))
    tot = per_l.agg(F.sum("lang_docs").alias("total_docs"))
    dev = (
        per_fl.join(per_f, "fold")
        .join(F.broadcast(per_l), "lang")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "fold",
            "abs(n * 1000000 div fold_docs"
            " - lang_docs * 1000000 div total_docs) AS dev_ppm")
        .groupBy("fold").agg(F.max("dev_ppm").alias("max_lang_dev_ppm"))
    )
    return (
        per_f.join(dev, "fold")
        .selectExpr("fold", "fold_docs", "fold_tokens", "max_lang_dev_ppm")
    )


PIPELINE_KFOLD_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, lang, len({X.tokens_duck('text')}) AS n_toks,
         ({portable_hash64_sql('CAST(doc_id AS VARCHAR)')}) % {KFOLD_K}
           AS fold
  FROM documents
), per_fl AS (
  SELECT fold, lang, COUNT(*) AS n, CAST(SUM(n_toks) AS BIGINT) AS toks
  FROM docs GROUP BY 1, 2
), per_f AS (
  SELECT fold, CAST(SUM(n) AS BIGINT) AS fold_docs,
         CAST(SUM(toks) AS BIGINT) AS fold_tokens
  FROM per_fl GROUP BY 1
), per_l AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_docs FROM per_fl GROUP BY 1
), tot AS (
  SELECT CAST(SUM(lang_docs) AS BIGINT) AS total_docs FROM per_l
), dev AS (
  SELECT fold,
         CAST(MAX(abs(n * 1000000 // fold_docs
                      - lang_docs * 1000000 // total_docs)) AS BIGINT)
           AS max_lang_dev_ppm
  FROM per_fl JOIN per_f USING (fold) JOIN per_l USING (lang)
  CROSS JOIN tot GROUP BY 1
)
SELECT fold, fold_docs, fold_tokens, max_lang_dev_ppm
FROM per_f JOIN dev USING (fold)
"""


SPECS += [
    QuerySpec("pipeline_kfold_assignments", pipeline_kfold_assignments,
              PIPELINE_KFOLD_ORACLE,
              "hash-deterministic k-fold split with stratification audit",
              ("trainprep", "sampling")),
]
