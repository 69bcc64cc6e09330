"""Multimodal columns (driver-mandated extension).

Images / audio / video ride through the engine as opaque ``binary`` columns
with a typed metadata struct. The decode / resize / feature-extract
pipeline runs a REAL dependency-free codec end-to-end: payloads are valid
binary PPM P6 images (any viewer opens them), parsed by an actual
header+raster parser, resized with a genuine nearest-neighbor resample,
and every emitted stat is hash-checked against a DuckDB oracle that
recomputes it from the pixel rule. Swapping in JPEG/PNG (PIL) or video
(ffmpeg) when those libraries exist is a codec-function substitution —
the Spark plumbing, schemas and Arrow batch shapes stay identical. The
WAV path at the bottom does the same for audio via the stdlib ``wave``
codec.

Scale design: binary payloads inflate row size, so multimodal transforms

- never pass payload bytes through a shuffle (metadata is derived FIRST,
  payloads are dropped or written out before any wide operation),
- use ``mapInPandas`` (Arrow batches) so bytes move JVM→Python in columnar
  batches, never row-at-a-time,
- size batches via ``spark.sql.execution.arrow.maxRecordsPerBatch`` when
  payloads are large (documented knob, default fine for metadata work).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

DECODE_SCHEMA = "doc_id bigint, width int, height int, n_bytes int, format string"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a string column as an opaque binary payload + typed metadata —
    the column-shape every real multimodal table has."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length("payload").alias("n_bytes"),
        ),
    )


def attach_ppm_payload(df: DataFrame) -> DataFrame:
    """doc_id → a REAL binary PPM P6 payload column + typed metadata.

    Each payload is a complete, viewer-openable P6 image synthesized from
    the deterministic pixel rule (``_ppm_synthesize`` below) — the
    stand-in for reading an image column off a lakehouse table. Payload
    bytes are produced in the same Arrow-batched stage that consumes
    them downstream; they never cross a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [_ppm_synthesize(int(d)) for d in pdf["doc_id"]],
            })

    out = df.select("doc_id").mapInPandas(run, "doc_id bigint, payload binary")
    return out.withColumn(
        "media_meta",
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.octet_length("payload").alias("n_bytes"),
        ),
    )


def decode_images(df: DataFrame) -> DataFrame:
    """payload binary → (width, height, n_bytes, format) via a REAL PPM
    parse per payload (``_ppm_parse``: magic check, tokenized header,
    raster validation) in Arrow-batched mapInPandas.

    Swapping in PIL for JPEG/PNG replaces one function call; the
    plumbing (schema, batching, shuffle-free payload path) is unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _ppm_parse(bytes(payload))
                h, w, _ = img.shape
                rows.append((int(doc_id), w, h, len(payload), "ppm"))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_bytes", "format"])

    return df.select("doc_id", "payload").mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes bigint, resized_sum bigint"
)


def resize_images(df: DataFrame, max_side: int = 16) -> DataFrame:
    """payload binary → REAL aspect-preserving nearest-neighbor resample:
    parse the PPM, fit (w, h) into the max_side box (never upscaling),
    index-select src rows/cols (src = (dst * src_dim) // dst_dim — the
    classic NN mapping), and emit the resampled raster's exact pixel sum
    and byte size. One Arrow-batched stage; payloads never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _ppm_parse(bytes(payload))
                h, w, _ = img.shape
                scale = min(1.0, max_side / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                ys = (np.arange(oh) * h) // oh
                xs = (np.arange(ow) * w) // ow
                small = img[ys][:, xs, :]
                rows.append((
                    int(doc_id), w, h, ow, oh,
                    int(small.size), int(small.sum(dtype=np.int64)),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "out_width", "out_height",
                "out_bytes", "resized_sum"])

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FEATURE_DIM = 8
FEATURE_SCHEMA = "doc_id bigint, feature array<float>"


def extract_features(df: DataFrame) -> DataFrame:
    """payload binary → fixed-dim feature vector from REAL decoded
    pixels: per-channel sums, geometry, and pixel extrema — the
    hand-rolled stand-in for a vision-model embedding. The output column
    shape (``array<float>``) is the contract — it feeds directly into
    the ANN operators (`similarity.knn_*`), closing the multimodal →
    embedding path. Every component is an integer < 2^24, so the float32
    array is exact and the flattened query below hash-matches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = _ppm_parse(bytes(payload))
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append([
                    float(sums[0]), float(sums[1]), float(sums[2]),
                    float(w), float(h), float(w * h),
                    float(img.max()), float(img.min()),
                ])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": out})

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def chunk_audio(df: DataFrame, chunk_ms: int = 20) -> DataFrame:
    """Audio-style fixed-duration chunking: split a PCM payload into
    chunk_ms windows of 16-bit mono samples — pure column expressions
    (explode over a computed sequence), no Python in the path.

    STUB boundary: the sample rate would come from a real container
    header; here it is derived deterministically from doc_id (8/16/44.1
    kHz). Chunk geometry (byte offsets, tail-chunk truncation) is real —
    exactly what feeds a feature-extraction or ASR stage downstream.
    """
    sr = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    chunk_bytes = (sr * 2 * chunk_ms / 1000).cast("long")
    n_bytes = F.octet_length("payload")
    n_chunks = F.ceil(n_bytes / chunk_bytes)
    return (
        df.select(
            "doc_id",
            n_bytes.alias("n_bytes"),
            sr.alias("sample_rate"),
            chunk_bytes.alias("chunk_bytes"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "sample_rate",
            "chunk_idx",
            (F.col("chunk_idx") * F.col("chunk_bytes")).alias("byte_start"),
            F.least(
                F.col("chunk_bytes"),
                F.col("n_bytes") - F.col("chunk_idx") * F.col("chunk_bytes"),
            ).alias("byte_len"),
        )
    )


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: emit n_frames offset rows per payload —
    pure column expressions (explode over a sequence), no Python."""
    return df.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).withColumn(
        "byte_offset",
        (F.col("frame_idx") * F.col("n_bytes") / n_frames).cast("long"),
    )


# --- queries ---------------------------------------------------------------

def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata derivation, fully JVM-side (oracle-checked):
    byte length and content hash of the utf-8 payload."""
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
    )


MM_BINARY_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_hash
FROM documents
"""


_PPM_DIMS_D = """dims AS (
  SELECT doc_id,
         1 + (doc_id * 7) % 32 AS w,
         1 + (doc_id * 13) % 24 AS h
  FROM documents
)"""


def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PPM decode over a binary payload column (hash-matched: the
    oracle recomputes geometry and the exact container byte count)."""
    docs = attach_ppm_payload(load_table(spark, sf_dir, "documents"))
    return decode_images(docs)


MM_IMAGE_DECODE_ORACLE = f"""
WITH {_PPM_DIMS_D}
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
            + w * h * 3 AS INT) AS n_bytes,
       'ppm' AS format
FROM dims
"""


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """payload → real parse → real nearest-neighbor resample (fit in a
    16-box), exact resampled pixel sums hash-checked by the oracle."""
    docs = attach_ppm_payload(load_table(spark, sf_dir, "documents"))
    return resize_images(docs, max_side=16)


MM_RESIZE_ORACLE = f"""
WITH {_PPM_DIMS_D}, geom AS (
  SELECT doc_id, w, h,
         GREATEST(1, CAST(trunc(w * LEAST(1.0, 16.0 / GREATEST(w, h)))
                          AS INT)) AS ow,
         GREATEST(1, CAST(trunc(h * LEAST(1.0, 16.0 / GREATEST(w, h)))
                          AS INT)) AS oh
  FROM dims
), px AS (
  SELECT g.doc_id, g.w, g.h, g.ow, g.oh,
         (g.doc_id * 31
          + (((yy.y * g.h) // g.oh) * g.w + (xx.x * g.w) // g.ow) * 3
          + cc.c) % 256 AS v
  FROM geom g,
       LATERAL (SELECT unnest(range(g.oh)) AS y) yy,
       LATERAL (SELECT unnest(range(g.ow)) AS x) xx,
       LATERAL (SELECT unnest(range(3)) AS c) cc
)
SELECT doc_id, CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
       CAST(MAX(ow) AS INT) AS out_width, CAST(MAX(oh) AS INT) AS out_height,
       CAST(MAX(ow) * MAX(oh) * 3 AS BIGINT) AS out_bytes,
       CAST(SUM(v) AS BIGINT) AS resized_sum
FROM px GROUP BY doc_id
"""


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """payload → real decode → 8-dim feature vector, flattened to exact
    integer columns for the oracle (the array<float> form feeds ANN;
    every component is < 2^24 so float32 is lossless)."""
    docs = attach_ppm_payload(load_table(spark, sf_dir, "documents"))
    feats = extract_features(docs)
    return feats.selectExpr(
        "doc_id",
        *[f"CAST(feature[{i}] AS BIGINT) AS f{i}" for i in range(FEATURE_DIM)],
    )


MM_FEATURE_ORACLE = f"""
WITH {_PPM_DIMS_D}, pix AS (
  SELECT doc_id, w, h, (doc_id * 31 + k) % 256 AS v, k % 3 AS c
  FROM dims, LATERAL (SELECT unnest(range(w * h * 3)) AS k)
)
SELECT doc_id,
       CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS f0,
       CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS f2,
       CAST(MAX(w) AS BIGINT) AS f3,
       CAST(MAX(h) AS BIGINT) AS f4,
       CAST(MAX(w) * MAX(h) AS BIGINT) AS f5,
       CAST(MAX(v) AS BIGINT) AS f6,
       CAST(MIN(v) AS BIGINT) AS f7
FROM pix GROUP BY doc_id
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(docs, 4)


def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return chunk_audio(docs, 20)


MM_AUDIO_CHUNKS_ORACLE = """
WITH a AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         [8000, 16000, 44100][CAST(doc_id % 3 + 1 AS INT)] AS sample_rate,
         CAST([8000, 16000, 44100][CAST(doc_id % 3 + 1 AS INT)] * 2 * 20 / 1000 AS BIGINT)
           AS chunk_bytes
  FROM documents
)
SELECT doc_id, sample_rate, c AS chunk_idx,
       c * chunk_bytes AS byte_start,
       least(chunk_bytes, n_bytes - c * chunk_bytes) AS byte_len
FROM a CROSS JOIN LATERAL (
  SELECT unnest(generate_series(0, CAST(ceil(n_bytes / (1.0 * chunk_bytes)) AS BIGINT) - 1)) AS c
) s
"""


MM_FRAME_SAMPLE_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       f AS frame_idx,
       CAST(trunc(f * octet_length(encode(text)) / 4.0) AS BIGINT) AS byte_offset
FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) fr
"""


SPECS = [
    QuerySpec("mm_binary_meta", mm_binary_meta, MM_BINARY_META_ORACLE,
              "binary payload + metadata struct derivation", ("multimodal",)),
    QuerySpec("mm_image_decode", mm_image_decode, MM_IMAGE_DECODE_ORACLE,
              "REAL PPM decode of a binary payload column, hash-matched",
              ("multimodal",)),
    QuerySpec("mm_frame_sample", mm_frame_sample, MM_FRAME_SAMPLE_ORACLE,
              "frame-offset sampling via explode", ("multimodal",)),
    QuerySpec("mm_resize", mm_resize, MM_RESIZE_ORACLE,
              "real parse → nearest-neighbor resample, exact pixel sums",
              ("multimodal",)),
    QuerySpec("mm_feature_extract", mm_feature_extract, MM_FEATURE_ORACLE,
              "real decode → 8-dim pixel features (feeds ANN operators)",
              ("multimodal",)),
    QuerySpec("mm_audio_chunks", mm_audio_chunks, MM_AUDIO_CHUNKS_ORACLE,
              "fixed-duration audio chunk geometry via explode", ("multimodal",)),
]


# --- perceptual-hash near-dup detection over binary payloads ----------------
# The media-dedup family member: a SimHash-style 60-bit fingerprint over
# NON-OVERLAPPING 4-byte chunks of the binary payload (hex domain, so
# both engines shingle the same string), banded 4×15 bits for candidate
# generation, exact Hamming (bit_count of xor) verification. A real
# image pHash swaps the chunk hash for DCT coefficients — the Spark
# plumbing (fingerprint agg, band join, Hamming verify) is identical.
# Near-dup twins are SYNTHESIZED deterministically (every 5th doc gets a
# 3-byte-appended copy, same device as json_corrupt_handling) since the
# corpus has no natural binary near-dups.
#
# Scale: one explode + one 60-column vote aggregate (single doc_id
# shuffle), band join keyed on (band_id, 15-bit value) — the self-join
# only ever meets rows in the same small bucket; no pairwise scan.

PHASH_BITS = 60
PHASH_BANDS = 4
PHASH_BAND_BITS = 15
PHASH_HAMMING_MAX = 8
PHASH_TWIN_MOD = 5
PHASH_TWIN_OFFSET = 1_000_000

_PH_SIG_S = " + ".join(
    f"shiftleft(cast(s{b} > 0 as bigint), {b})" for b in range(PHASH_BITS)
)
_PH_VOTES_D = ", ".join(
    f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(PHASH_BITS)
)
_PH_SIG_D = " + ".join(
    f"(CAST(s{b} > 0 AS BIGINT) << {b})" for b in range(PHASH_BITS)
)


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "hex(encode(text, 'UTF-8')) AS hx"
    )
    twins = docs.where(F.col("doc_id") % PHASH_TWIN_MOD == 0).selectExpr(
        f"doc_id + {PHASH_TWIN_OFFSET} AS doc_id", "concat(hx, '207632') AS hx"
    )
    blobs = docs.unionByName(twins)
    chunks = blobs.selectExpr(
        "doc_id",
        "explode(transform(sequence(0, CAST(ceil(length(hx) / 8.0) AS INT) - 1),"
        " i -> substr(hx, i * 8 + 1, 8))) AS chunk",
    )
    h = chunks.selectExpr(
        "doc_id", "cast(conv(substr(md5(chunk), 1, 15), 16, 10) as bigint) AS hv"
    )
    sigs = h.groupBy("doc_id").agg(
        *[
            F.expr(f"sum(CASE WHEN (shiftright(hv, {b}) & 1) = 1 THEN 1 ELSE -1 END)").alias(f"s{b}")
            for b in range(PHASH_BITS)
        ]
    ).selectExpr("doc_id", f"{_PH_SIG_S} AS sig")
    sigs = sigs.localCheckpoint(eager=True)  # feeds both join sides
    bands = sigs.selectExpr(
        "doc_id", "sig",
        "explode(transform(sequence(0, "
        f"{PHASH_BANDS - 1}), b -> named_struct('band', b, "
        f"'bv', shiftright(sig, b * {PHASH_BAND_BITS}) & {(1 << PHASH_BAND_BITS) - 1}))) AS bb",
    ).selectExpr("doc_id", "sig", "bb.band AS band", "bb.bv AS bv")
    a = bands.selectExpr("doc_id AS doc_a", "sig AS sig_a", "band", "bv")
    b = bands.selectExpr("doc_id AS doc_b", "sig AS sig_b", "band", "bv")
    return (
        a.join(b, ["band", "bv"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .selectExpr("doc_a", "doc_b", "bit_count(sig_a ^ sig_b) AS hamming")
        .distinct()
        .where(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


MM_PHASH_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
), blobs AS (
  SELECT doc_id, hx FROM docs
  UNION ALL
  SELECT doc_id + {PHASH_TWIN_OFFSET}, hx || '207632'
  FROM docs WHERE doc_id % {PHASH_TWIN_MOD} = 0
), chunks AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(0,
             CAST(ceil(length(hx) / 8.0) AS INT) - 1),
             i -> substr(hx, i * 8 + 1, 8))) AS chunk
  FROM blobs
), h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(chunk), 1, 15)) AS BIGINT) AS hv
  FROM chunks
), votes AS (
  SELECT doc_id, {_PH_VOTES_D} FROM h GROUP BY doc_id
), sigs AS (
  SELECT doc_id, {_PH_SIG_D} AS sig FROM votes
), bands AS (
  SELECT doc_id, sig, b AS band,
         (sig >> (b * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1} AS bv
  FROM sigs, unnest(generate_series(0, {PHASH_BANDS - 1})) AS t(b)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
  AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {PHASH_HAMMING_MAX}
"""


SPECS += [
    QuerySpec("mm_phash_dedup", mm_phash_dedup, MM_PHASH_ORACLE,
              "banded SimHash near-dup over binary payload chunks, Hamming-verified",
              ("multimodal", "dedup")),
]


# --- REAL codec path: PPM (P6) synthesize -> parse -> stats -> resize --------
# The stubs above stand in for PIL/ffmpeg; this is the one codec that
# needs NO library, so the decode step is genuinely real: payloads are
# valid binary PPM P6 images (any image viewer opens them), and the
# decoder is an actual parser — magic check, whitespace-tokenized header,
# maxval validation, frombuffer + reshape to (H, W, 3). Pixels follow an
# arithmetic rule, pixel[k] = (doc_id*31 + k) % 256, so the DuckDB oracle
# recomputes the EXACT channel sums and the strided nearest-neighbor
# resize sums from pure SQL arithmetic — the decode path is hash-checked
# end-to-end, not rows-only. Plan shape matches the stub family: one
# mapInPandas, payload bytes never cross a shuffle.

PPM_SCHEMA = (
    "doc_id bigint, width int, height int, r_sum bigint, g_sum bigint, "
    "b_sum bigint, resized_w int, resized_h int, resized_sum bigint"
)


def _ppm_synthesize(doc_id: int) -> bytes:
    w = 1 + (doc_id * 7) % 32
    h = 1 + (doc_id * 13) % 24
    header = f"P6\n{w} {h}\n255\n".encode()
    n = w * h * 3
    pix = (doc_id * 31 + np.arange(n, dtype=np.int64)) % 256
    return header + pix.astype(np.uint8).tobytes()


def _ppm_parse(payload: bytes) -> "np.ndarray":
    """A real PPM P6 parser: magic, w/h/maxval tokens, raster bytes."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        tokens.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def mm_ppm_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                img = _ppm_parse(_ppm_synthesize(int(doc_id)))
                h, w, _ = img.shape
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                small = img[::2, ::2, :]  # real nearest-neighbor 2x downsample
                rows.append((
                    int(doc_id), w, h,
                    int(sums[0]), int(sums[1]), int(sums[2]),
                    small.shape[1], small.shape[0],
                    int(small.sum(dtype=np.int64)),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "r_sum", "g_sum", "b_sum",
                "resized_w", "resized_h", "resized_sum",
            ])

    return docs.mapInPandas(run, PPM_SCHEMA)


MM_PPM_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         1 + (doc_id * 7) % 32 AS w,
         1 + (doc_id * 13) % 24 AS h
  FROM documents
), pix AS (
  SELECT doc_id, w, h, k,
         (doc_id * 31 + k) % 256 AS v,
         (k // 3) // w AS y, (k // 3) % w AS x, k % 3 AS c
  FROM dims, LATERAL (SELECT unnest(range(w * h * 3)) AS k)
)
SELECT doc_id,
       CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
       CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum,
       CAST((MAX(w) + 1) // 2 AS INT) AS resized_w,
       CAST((MAX(h) + 1) // 2 AS INT) AS resized_h,
       CAST(SUM(CASE WHEN y % 2 = 0 AND x % 2 = 0 THEN v END) AS BIGINT)
         AS resized_sum
FROM pix GROUP BY doc_id
"""


SPECS += [
    QuerySpec("mm_ppm_codec_roundtrip", mm_ppm_codec_roundtrip, MM_PPM_ORACLE,
              "REAL PPM P6 codec: synthesize, parse, channel stats, NN resize",
              ("multimodal", "codec")),
]


# --- REAL codec path: WAV (RIFF PCM) synthesize -> parse -> stats ------------
# The audio twin of the PPM path: payloads are valid 16-bit mono PCM WAV
# files written by the stdlib ``wave`` encoder and read back by the
# stdlib ``wave`` decoder — a genuine container-format roundtrip with no
# external dependency. Samples follow an arithmetic rule, so the oracle
# recomputes the exact sample sum / extrema / 20 ms-chunk count in SQL.

WAV_RATE = 16_000
WAV_CHUNK_SAMPLES = 320  # 20 ms at 16 kHz
WAV_SCHEMA = (
    "doc_id bigint, n_samples int, framerate int, sample_sum bigint, "
    "sample_min int, sample_max int, n_chunks int"
)


def _wav_synthesize(doc_id: int) -> bytes:
    import io
    import wave

    n = 160 + (doc_id % 160)
    samples = (((doc_id * 17 + np.arange(n, dtype=np.int64) * 7) % 65536)
               - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(WAV_RATE)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def _wav_parse(payload: bytes) -> tuple[int, "np.ndarray"]:
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wv:
        if wv.getnchannels() != 1 or wv.getsampwidth() != 2:
            raise ValueError("expected 16-bit mono PCM")
        rate = wv.getframerate()
        raw = wv.readframes(wv.getnframes())
    return rate, np.frombuffer(raw, dtype="<i2")


def mm_wav_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                rate, samples = _wav_parse(_wav_synthesize(int(doc_id)))
                n = len(samples)
                rows.append((
                    int(doc_id), n, rate,
                    int(samples.sum(dtype=np.int64)),
                    int(samples.min()), int(samples.max()),
                    -(-n // WAV_CHUNK_SAMPLES),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "framerate", "sample_sum",
                "sample_min", "sample_max", "n_chunks",
            ])

    return docs.mapInPandas(run, WAV_SCHEMA)


MM_WAV_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, 160 + doc_id % 160 AS n FROM documents
), samp AS (
  SELECT doc_id, n, ((doc_id * 17 + i * 7) % 65536) - 32768 AS v
  FROM dims, LATERAL (SELECT unnest(range(n)) AS i)
)
SELECT doc_id, CAST(MAX(n) AS INT) AS n_samples,
       {WAV_RATE} AS framerate,
       CAST(SUM(v) AS BIGINT) AS sample_sum,
       CAST(MIN(v) AS INT) AS sample_min,
       CAST(MAX(v) AS INT) AS sample_max,
       CAST((MAX(n) + {WAV_CHUNK_SAMPLES} - 1) // {WAV_CHUNK_SAMPLES} AS INT)
         AS n_chunks
FROM samp GROUP BY doc_id
"""


SPECS += [
    QuerySpec("mm_wav_codec_roundtrip", mm_wav_codec_roundtrip, MM_WAV_ORACLE,
              "REAL WAV PCM codec via stdlib wave: encode, decode, exact stats",
              ("multimodal", "codec", "audio")),
]


# --- capstone: multimodal -> embedding -> similarity search ------------------
# The full path a multimodal corpus takes through the engine, composed
# from REAL parts and oracle-checked end-to-end: PPM payload -> actual
# decode -> integer feature vector (channel sums + scaled dims; integers
# so the cosine arithmetic is bit-reproducible) -> brute-force cosine
# top-3 per query doc. Every stage is the verified machinery above; the
# oracle rebuilds the same features from the pixel rule and replays the
# same fixed-order cosine expression, so even the float similarity
# ranking hash-matches (dot products stay < 2^53 — exact in doubles).

MM_ANN_QUERIES = 5
MM_ANN_TOP = 3
_MM_COS = (
    "CAST(r_sum * CAST(q_r AS DOUBLE) + g_sum * CAST(q_g AS DOUBLE)"
    " + b_sum * CAST(q_b AS DOUBLE) + ws * CAST(q_ws AS DOUBLE)"
    " + hs * CAST(q_hs AS DOUBLE) AS DOUBLE)"
    " / (sqrt(CAST(r_sum * r_sum + g_sum * g_sum + b_sum * b_sum"
    " + ws * ws + hs * hs AS DOUBLE))"
    " * sqrt(CAST(q_r * q_r + q_g * q_g + q_b * q_b"
    " + q_ws * q_ws + q_hs * q_hs AS DOUBLE)))"
)


def mm_ann_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    feats = (
        mm_ppm_codec_roundtrip(spark, sf_dir)
        .selectExpr(
            "doc_id", "r_sum", "g_sum", "b_sum",
            "CAST(width AS BIGINT) * 1000 AS ws",
            "CAST(height AS BIGINT) * 1000 AS hs",
        )
    )
    q = feats.where(f"doc_id < {MM_ANN_QUERIES}").selectExpr(
        "doc_id AS qid", "r_sum AS q_r", "g_sum AS q_g", "b_sum AS q_b",
        "ws AS q_ws", "hs AS q_hs",
    )
    pairs = feats.join(F.broadcast(q), F.expr("doc_id <> qid")).withColumn(
        "cos_sim", F.expr(_MM_COS)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "doc_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(f"rank <= {MM_ANN_TOP}")
        .select("qid", F.col("doc_id").alias("neighbor_id"), "rank", "cos_sim")
    )


MM_ANN_ORACLE = f"""
WITH dims AS (
  SELECT doc_id,
         1 + (doc_id * 7) % 32 AS w,
         1 + (doc_id * 13) % 24 AS h
  FROM documents
), pix AS (
  SELECT doc_id, w, h, (doc_id * 31 + k) % 256 AS v, k % 3 AS c
  FROM dims, LATERAL (SELECT unnest(range(w * h * 3)) AS k)
), feats AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r_sum,
         CAST(SUM(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g_sum,
         CAST(SUM(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b_sum,
         CAST(MAX(w) * 1000 AS BIGINT) AS ws,
         CAST(MAX(h) * 1000 AS BIGINT) AS hs
  FROM pix GROUP BY doc_id
), q AS (
  SELECT doc_id AS qid, r_sum AS q_r, g_sum AS q_g, b_sum AS q_b,
         ws AS q_ws, hs AS q_hs
  FROM feats WHERE doc_id < {MM_ANN_QUERIES}
), pairs AS (
  SELECT f.doc_id, q.qid, {_MM_COS} AS cos_sim
  FROM feats f JOIN q ON f.doc_id <> q.qid
), ranked AS (
  SELECT qid, doc_id, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, doc_id) AS rank
  FROM pairs
)
SELECT qid, doc_id AS neighbor_id, rank, cos_sim
FROM ranked WHERE rank <= {MM_ANN_TOP}
"""


SPECS += [
    QuerySpec("mm_ann_pipeline", mm_ann_pipeline, MM_ANN_ORACLE,
              "capstone: real decode -> integer features -> exact cosine top-k",
              ("multimodal", "similarity", "capstone")),
]


# --- content-defined chunking (CDC) storage dedup -----------------------------
# The STORAGE-layer dedup primitive (the restic/borg/LBFS device) next
# to the token-level families: payloads split at CONTENT-DEFINED
# boundaries — a position ends a chunk when the hash of its trailing
# CDC_W-char window is ≡ 0 mod CDC_DIV — so an insertion early in a
# payload shifts only the chunk it lands in, not every fixed-size block
# after it. Chunks dedupe across payloads by content hash; the rollup
# is the dedup-ratio readout a content-addressed store reports.
# Spark side is the production shape: one linear scan per payload in
# Arrow batches (mapInPandas), chunk bytes never shuffle — only
# (doc_id, chunk_hash, len) rows do. The window hash is the portable
# md5-prefix family, so the oracle replays boundary detection, chunk
# reassembly and the dedup rollup exactly in SQL.

CDC_W = 8     # rolling window (chars)
CDC_DIV = 64  # boundary divisor -> expected ~64-char chunks


def _cdc_chunks(text: str) -> list[str]:
    """Split text at content-defined boundaries (trailing-window hash
    ≡ 0 mod CDC_DIV). Mirrors the SQL rule character-for-character."""
    import hashlib

    chunks, start = [], 0
    n = len(text)
    for i in range(CDC_W, n + 1):  # i = 1-based position ending a window
        h = int(hashlib.md5(
            text[i - CDC_W:i].encode("utf-8")).hexdigest()[:15], 16)
        if h % CDC_DIV == 0:
            chunks.append(text[start:i])
            start = i
    if start < n:
        chunks.append(text[start:])
    return chunks


def mm_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, source, text in zip(
                    pdf["doc_id"], pdf["source"], pdf["text"]):
                for c in _cdc_chunks(text):
                    rows.append((int(doc_id), source,
                                 hashlib.md5(c.encode("utf-8")).hexdigest(),
                                 len(c)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "source", "chunk_hash", "chunk_len"])

    chunks = docs.mapInPandas(
        run, "doc_id bigint, source string, chunk_hash string, chunk_len bigint")
    per_src = chunks.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("chunk_hash").alias("n_unique_chunks"),
        F.sum("chunk_len").alias("chars_total"),
    )
    uniq = (
        chunks.groupBy("source", "chunk_hash")
        .agg(F.max("chunk_len").alias("l"))
        .groupBy("source").agg(F.sum("l").alias("chars_unique"))
    )
    return (
        per_src.join(uniq, "source")
        .selectExpr(
            "source", "n_chunks", "n_unique_chunks", "chars_total",
            "chars_unique",
            "(chars_total - chars_unique) * 1000000 div chars_total"
            " AS savings_ppm",
        )
    )


MM_CDC_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, source, text, u.i AS i,
         CASE WHEN CAST(concat('0x', substr(md5(
                  substr(text, u.i - {CDC_W} + 1, {CDC_W})), 1, 15)) AS BIGINT)
                  % {CDC_DIV} = 0
              THEN 1 ELSE 0 END AS is_b
  FROM documents,
       LATERAL (SELECT unnest(range({CDC_W}, length(text) + 1)) AS i) u
), bounds AS (
  SELECT doc_id, source, text, i FROM pos WHERE is_b = 1
), marks AS (
  SELECT doc_id, source, text, i,
         COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS prev
  FROM bounds
), tails AS (
  SELECT d.doc_id, d.source, d.text, length(d.text) AS i,
         COALESCE((SELECT MAX(b.i) FROM bounds b WHERE b.doc_id = d.doc_id), 0)
           AS prev
  FROM documents d
  WHERE length(d.text) >
        COALESCE((SELECT MAX(b.i) FROM bounds b WHERE b.doc_id = d.doc_id), 0)
), chunks AS (
  SELECT doc_id, source, md5(substr(text, prev + 1, i - prev)) AS chunk_hash,
         CAST(i - prev AS BIGINT) AS chunk_len
  FROM (SELECT * FROM marks UNION ALL SELECT * FROM tails)
), per_src AS (
  SELECT source, COUNT(*) AS n_chunks,
         CAST(COUNT(DISTINCT chunk_hash) AS BIGINT) AS n_unique_chunks,
         CAST(SUM(chunk_len) AS BIGINT) AS chars_total
  FROM chunks GROUP BY 1
), uniq AS (
  SELECT source, CAST(SUM(l) AS BIGINT) AS chars_unique FROM (
    SELECT source, chunk_hash, MAX(chunk_len) AS l
    FROM chunks GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT source, n_chunks, n_unique_chunks, chars_total, chars_unique,
       (chars_total - chars_unique) * 1000000 // chars_total AS savings_ppm
FROM per_src JOIN uniq USING (source)
"""


SPECS += [
    QuerySpec("mm_cdc_dedup", mm_cdc_dedup, MM_CDC_ORACLE,
              "content-defined chunking + cross-payload chunk dedup rollup",
              ("multimodal", "dedup", "storage")),
]


# --- video: scene-change detection over real decoded frame sequences --------
# The video twin of the decode family (ref has no media ops; this is the
# LLM-pipeline extension mandate): each sampled doc carries a short
# "video" — SCENE_FRAMES genuine PPM P6 payloads, one per frame, whose
# pixel rule shifts by +40 at a per-doc cut frame. The operator decodes
# every frame with the REAL parser and emits the exact sum-of-absolute-
# differences between consecutive frames plus the thresholded cut flag —
# the standard SAD shot-boundary detector. The oracle replays the pixel
# rule (including the mod-256 wraparound, where |Δ| is 216 not 40) so
# the whole decode→diff→threshold path is hash-checked.
#
# Scale: frames for one doc never leave their mapInPandas batch (the
# SAD is computed where the payload lives — no shuffle carries pixels);
# sampling is a pushed-down filter; output is one thin row per frame
# transition. A real detector swaps _ppm_parse for an ffmpeg frame
# iterator — batch shape and schema are unchanged.

SCENE_FRAMES = 6
SCENE_SHIFT = 40
SCENE_DOC_MOD = 7  # deterministic corpus sample: doc_id % 7 == 3
SCENE_SCHEMA = "doc_id bigint, frame_idx int, sad bigint, is_cut int"


def _ppm_frame_synthesize(doc_id: int, f: int, cut: int, w: int, h: int) -> bytes:
    header = f"P6\n{w} {h}\n255\n".encode()
    n = w * h * 3
    shift = SCENE_SHIFT if f >= cut else 0
    pix = (doc_id * 31 + np.arange(n, dtype=np.int64) + shift) % 256
    return header + pix.astype(np.uint8).tobytes()


def detect_scene_changes(df: DataFrame) -> DataFrame:
    """(doc_id) → per-transition SAD + cut flag over real decoded frames.

    Threshold: mean absolute channel difference > 20, i.e.
    sad > 20 * 3 * w * h."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 1 + (d * 7) % 16
                h = 1 + (d * 13) % 12
                cut = 1 + d % (SCENE_FRAMES - 1)
                frames = [
                    _ppm_parse(_ppm_frame_synthesize(d, f, cut, w, h))
                    .astype(np.int64)
                    for f in range(SCENE_FRAMES)
                ]
                thresh = 20 * 3 * w * h
                for f in range(1, SCENE_FRAMES):
                    sad = int(np.abs(frames[f] - frames[f - 1]).sum())
                    rows.append((d, f, sad, int(sad > thresh)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "frame_idx", "sad", "is_cut"])

    return df.select("doc_id").mapInPandas(run, SCENE_SCHEMA)


def mm_scene_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % SCENE_DOC_MOD == 3)
    return detect_scene_changes(docs)


MM_SCENE_ORACLE = f"""
WITH dims AS (
  SELECT doc_id,
         1 + (doc_id * 7) % 16 AS w,
         1 + (doc_id * 13) % 12 AS h,
         1 + doc_id % {SCENE_FRAMES - 1} AS cut
  FROM documents WHERE doc_id % {SCENE_DOC_MOD} = 3
), px AS (
  SELECT doc_id, w, h, f,
         abs(((doc_id * 31 + k
               + CASE WHEN f >= cut THEN {SCENE_SHIFT} ELSE 0 END) % 256)
             - ((doc_id * 31 + k
               + CASE WHEN f - 1 >= cut THEN {SCENE_SHIFT} ELSE 0 END) % 256))
           AS dv
  FROM dims,
       LATERAL (SELECT unnest(range(1, {SCENE_FRAMES})) AS f) ff,
       LATERAL (SELECT unnest(range(w * h * 3)) AS k) kk
)
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       CAST(SUM(dv) AS BIGINT) AS sad,
       CAST(CASE WHEN SUM(dv) > 20 * 3 * MAX(w) * MAX(h)
            THEN 1 ELSE 0 END AS INT) AS is_cut
FROM px GROUP BY doc_id, f
"""


SPECS += [
    QuerySpec("mm_scene_detect", mm_scene_detect, MM_SCENE_ORACLE,
              "SAD shot-boundary detection over real decoded PPM frame sequences",
              ("multimodal", "codec", "video")),
]


# --- audio: per-chunk DSP features over real decoded WAV payloads -----------
# The feature-extraction stage after chunk_audio: decode the REAL WAV
# container (stdlib wave, same payloads as mm_wav_codec_roundtrip),
# window into fixed 64-sample chunks, and emit the classic integer DSP
# trio per chunk — energy (sum of squares), zero-crossing count (sign
# flips across consecutive samples inside the chunk), and peak
# amplitude. Every stat is exact 64-bit integer arithmetic, so the
# oracle recomputes them from the sample rule (recomputing v(i-1)
# arithmetically instead of LAG keeps the oracle windowless).
#
# Scale: one mapInPandas stage, payloads never shuffle, output is thin
# (doc, chunk) rows; a real pipeline swaps the synthesized payload for
# a lakehouse binary column and nothing else changes.

AUDIO_CHUNK = 64
AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, chunk_idx int, n_samples int, energy bigint, "
    "zero_crossings int, peak int"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                _, samples = _wav_parse(_wav_synthesize(d))
                v = samples.astype(np.int64)
                for c in range(-(-len(v) // AUDIO_CHUNK)):
                    ch = v[c * AUDIO_CHUNK:(c + 1) * AUDIO_CHUNK]
                    neg = ch < 0
                    rows.append((
                        d, c, len(ch),
                        int((ch * ch).sum()),
                        int((neg[1:] != neg[:-1]).sum()),
                        int(np.abs(ch).max()),
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "chunk_idx", "n_samples", "energy",
                "zero_crossings", "peak"])

    return df.select("doc_id").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_audio_features(load_table(spark, sf_dir, "documents"))


MM_AUDIO_FEATURES_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, 160 + doc_id % 160 AS n FROM documents
), samp AS (
  SELECT doc_id, i // {AUDIO_CHUNK} AS c,
         ((doc_id * 17 + i * 7) % 65536) - 32768 AS v,
         CASE WHEN i % {AUDIO_CHUNK} > 0 THEN
           ((doc_id * 17 + (i - 1) * 7) % 65536) - 32768 END AS pv
  FROM dims, LATERAL (SELECT unnest(range(n)) AS i)
)
SELECT doc_id, CAST(c AS INT) AS chunk_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN (pv < 0) <> (v < 0) THEN 1 ELSE 0 END) AS INT)
         AS zero_crossings,
       CAST(MAX(abs(v)) AS INT) AS peak
FROM samp GROUP BY doc_id, c
"""


SPECS += [
    QuerySpec("mm_audio_features", mm_audio_features, MM_AUDIO_FEATURES_ORACLE,
              "per-chunk energy / zero-crossing / peak over real decoded WAV",
              ("multimodal", "codec", "audio")),
]


# --- audio fingerprint match (constellation hashing + offset voting) -----------
# The Shazam-style retrieval loop on the REAL WAV codec path: per doc,
# decode the PCM stream, take per-16-sample-chunk peak landmarks, and
# hash LANDMARK PAIRS (anchor peak, target peak, chunk gap 1..3) into
# 24-bit fingerprints — then match a probe snippet (doc 0's fingerprint
# set) against the corpus by voting on the TIME OFFSET c_corpus -
# c_probe. A true source aligns at one consistent offset (doc 0
# self-matches with every fingerprint at offset 0); hash-collision
# impostors scatter across offsets and score noise — which is exactly
# the discrimination the top-5 readout demonstrates. Shapes: fingerprint
# extraction is mapInPandas at ingest (one pass, no shuffle), the probe
# set broadcasts, and matching is one equi-join on the 24-bit hash +
# one (doc, offset) rollup — the inverted-index lookup shape that holds
# at 100 TB of audio.

FP_CHUNK = 16     # landmark granularity (samples per chunk)
FP_MAX_DT = 3     # constellation fan-out: pair with the next 1..3 chunks
FP_PROBE_DOC = 0  # the probe snippet's source
FP_TOP = 5

FP_SCHEMA = "doc_id bigint, c1 int, fp_hash bigint"


def _fp_fingerprints(df: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                _, samples = _wav_parse(_wav_synthesize(d))
                v = np.abs(samples.astype(np.int64))
                peaks = [
                    int(v[c * FP_CHUNK:(c + 1) * FP_CHUNK].max())
                    for c in range(-(-len(v) // FP_CHUNK))
                ]
                for c1, p1 in enumerate(peaks):
                    for dt in range(1, FP_MAX_DT + 1):
                        if c1 + dt < len(peaks):
                            p2 = peaks[c1 + dt]
                            rows.append((
                                d, c1,
                                (p1 % 256) * 65536 + (p2 % 256) * 256 + dt))
            yield pd.DataFrame(rows, columns=["doc_id", "c1", "fp_hash"])

    return df.select("doc_id").mapInPandas(run, FP_SCHEMA)


def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = _fp_fingerprints(load_table(spark, sf_dir, "documents"))
    probe = fps.where(F.col("doc_id") == FP_PROBE_DOC).selectExpr(
        "c1 AS qc1", "fp_hash")
    votes = (
        fps.join(F.broadcast(probe), "fp_hash")
        .groupBy("doc_id", F.expr("c1 - qc1").alias("offset"))
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("votes"), "offset")
    return (
        votes.withColumn("r", F.row_number().over(w))
        .where("r = 1")
        .selectExpr("doc_id", "offset AS best_offset", "votes")
        .orderBy(F.desc("votes"), "doc_id")
        .limit(FP_TOP)
    )


MM_AUDIO_FP_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, 160 + doc_id % 160 AS n FROM documents
), samp AS (
  SELECT doc_id, i // {FP_CHUNK} AS c,
         abs(((doc_id * 17 + i * 7) % 65536) - 32768) AS v
  FROM dims, LATERAL (SELECT unnest(range(n)) AS i)
), peaks AS (
  SELECT doc_id, c, MAX(v) AS p FROM samp GROUP BY 1, 2
), fps AS (
  SELECT a.doc_id, CAST(a.c AS INT) AS c1,
         (a.p % 256) * 65536 + (b.p % 256) * 256 + (b.c - a.c) AS fp_hash
  FROM peaks a JOIN peaks b
    ON b.doc_id = a.doc_id AND b.c - a.c BETWEEN 1 AND {FP_MAX_DT}
), probe AS (
  SELECT c1 AS qc1, fp_hash FROM fps WHERE doc_id = {FP_PROBE_DOC}
), votes AS (
  SELECT f.doc_id, f.c1 - p.qc1 AS "offset", COUNT(*) AS votes
  FROM fps f JOIN probe p USING (fp_hash)
  GROUP BY 1, 2
), best AS (
  SELECT doc_id, "offset", votes,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY votes DESC, "offset") AS r
  FROM votes
)
SELECT doc_id, "offset" AS best_offset, votes
FROM best WHERE r = 1
ORDER BY votes DESC, doc_id LIMIT {FP_TOP}
"""


SPECS += [
    QuerySpec("mm_audio_fingerprint", mm_audio_fingerprint,
              MM_AUDIO_FP_ORACLE,
              "constellation-hash audio retrieval with offset voting",
              ("multimodal", "codec", "audio")),
]


# --- dominant-palette extraction over the real PPM codec ------------------------
# The image-side feature that a dedup/search pipeline stores alongside
# pHash: quantize every decoded pixel to a 4x4x4 RGB cube (2 bits per
# channel) and keep each image's top-4 bins with exact counts and
# coverage ppm. The Spark side decodes the REAL binary P6 payload with
# the in-tree parser and builds the histogram inside one mapInPandas
# pass (per-image work is bounded by the pixel count; no shuffle at
# all); the oracle replays the synthesized raster formula pixel-by-pixel
# in SQL. Tie-break (count DESC, bin ASC) keeps the rank deterministic.

PALETTE_TOP = 4

PALETTE_SCHEMA = ("doc_id bigint, rank int, r_bin int, g_bin int, b_bin int, "
                  "n_pixels bigint, share_ppm bigint")


def mm_palette_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                img = _ppm_parse(_ppm_synthesize(d)).astype(np.int64)
                bins = (
                    (img[:, :, 0] // 64) * 16
                    + (img[:, :, 1] // 64) * 4
                    + (img[:, :, 2] // 64)
                ).ravel()
                n = len(bins)
                cnt = np.bincount(bins, minlength=64)
                order = sorted(range(64), key=lambda b: (-cnt[b], b))
                for r, b in enumerate(order[:PALETTE_TOP], start=1):
                    if cnt[b] == 0:
                        break
                    rows.append((
                        d, r, b // 16, (b // 4) % 4, b % 4,
                        int(cnt[b]), int(cnt[b]) * 1_000_000 // n))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "rank", "r_bin", "g_bin", "b_bin",
                "n_pixels", "share_ppm"])

    return docs.select("doc_id").mapInPandas(run, PALETTE_SCHEMA)


MM_PALETTE_ORACLE = f"""
WITH {_PPM_DIMS_D}, pix AS (
  SELECT doc_id,
         ((doc_id * 31 + i * 3) % 256) // 64 AS r,
         ((doc_id * 31 + i * 3 + 1) % 256) // 64 AS g,
         ((doc_id * 31 + i * 3 + 2) % 256) // 64 AS b
  FROM dims, LATERAL (SELECT unnest(range(w * h)) AS i)
), hist AS (
  SELECT doc_id, r * 16 + g * 4 + b AS bin, r, g, b, COUNT(*) AS n,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS BIGINT) AS total
  FROM pix GROUP BY 1, 2, 3, 4, 5
), ranked AS (
  SELECT doc_id, r, g, b, n, total,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bin) AS rank
  FROM hist
)
SELECT doc_id, CAST(rank AS INT) AS rank,
       CAST(r AS INT) AS r_bin, CAST(g AS INT) AS g_bin, CAST(b AS INT) AS b_bin,
       n AS n_pixels, n * 1000000 // total AS share_ppm
FROM ranked WHERE rank <= {PALETTE_TOP}
"""


SPECS += [
    QuerySpec("mm_palette_extract", mm_palette_extract, MM_PALETTE_ORACLE,
              "top-4 quantized-color palette per real decoded PPM image",
              ("multimodal", "codec")),
]


# --- WebDataset-style TAR shard scan --------------------------------------------
# Large multimodal training corpora ship as TAR shards (WebDataset): the
# loader must slice members out of archives, not read loose files. This
# operator exercises the REAL format end-to-end on the engine: each
# shard's documents (shard = doc_id % 8) are packed into an in-memory
# USTAR archive with stdlib tarfile (zeroed mtime/uid -> deterministic
# bytes), then PARSED BACK with the real reader, emitting each member's
# size, its byte offset inside the archive, and the md5 of the extracted
# payload. The oracle knows nothing of tarfile — it reproduces the
# offsets from the USTAR layout ARITHMETIC (512-byte header + payload
# rounded up to 512-byte blocks, members in doc_id order) and the md5
# from the source text, so a drift in either the packer or the parser
# breaks the hash. Shapes: one applyInPandas per shard group (the
# pack-verify unit a 100 TB pipeline parallelizes over), no other
# shuffle.

WDS_SHARDS = 8

WDS_SCHEMA = ("shard int, member string, size_bytes bigint, "
              "offset_data bigint, payload_md5 string")


def mm_webdataset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import io
    import tarfile

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "text", f"CAST(doc_id % {WDS_SHARDS} AS INT) AS shard")

    def pack_and_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = ("" if text is None else str(text)).encode("utf-8")
                info = tarfile.TarInfo(name=f"{int(doc_id)}.txt")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
        buf.seek(0)
        rows = []
        with tarfile.open(fileobj=buf, mode="r") as tf:
            for m in tf.getmembers():
                data = tf.extractfile(m).read()
                rows.append((
                    shard, m.name, m.size, m.offset_data,
                    hashlib.md5(data).hexdigest()))
        return pd.DataFrame(rows, columns=[
            "shard", "member", "size_bytes", "offset_data", "payload_md5"])

    return docs.groupBy("shard").applyInPandas(pack_and_scan, WDS_SCHEMA)


MM_WDS_ORACLE = f"""
WITH d AS (
  SELECT CAST(doc_id % {WDS_SHARDS} AS INT) AS shard, doc_id,
         COALESCE(text, '') AS text,
         CAST(strlen(COALESCE(text, '')) AS BIGINT) AS size_bytes
  FROM documents
), layout AS (
  SELECT shard, doc_id, size_bytes,
         CAST(COALESCE(SUM(512 + ((size_bytes + 511) // 512) * 512)
           OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 512
           AS BIGINT) AS offset_data,
         md5(text) AS payload_md5
  FROM d
)
SELECT shard, doc_id || '.txt' AS member, size_bytes, offset_data, payload_md5
FROM layout
"""


SPECS += [
    QuerySpec("mm_webdataset_scan", mm_webdataset_scan, MM_WDS_ORACLE,
              "TAR shard pack + real-parser scan vs USTAR layout arithmetic",
              ("multimodal", "io", "codec")),
]
