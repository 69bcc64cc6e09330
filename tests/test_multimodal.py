"""Multimodal plumbing: the codec work is stubbed (no imaging libs in the
container), so these tests pin everything AROUND the stub — schemas, Arrow
batch shapes, determinism, and the geometry/feature contracts a real codec
swap must preserve."""

from __future__ import annotations

from apache_flink_datastream_api_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_binary_payload,
    decode_images,
    extract_features,
    resize_images,
)
from apache_flink_datastream_api_spark.sources.tables import load_table

from .conftest import SF_DIR


def _docs(spark, n=50):
    return attach_binary_payload(
        load_table(spark, SF_DIR, "documents").limit(n)
    )


def test_decode_is_deterministic(spark):
    docs = _docs(spark)
    a = {r.doc_id: (r.width, r.height) for r in decode_images(docs).collect()}
    b = {r.doc_id: (r.width, r.height) for r in decode_images(docs).collect()}
    assert a == b
    assert all(1 <= w <= 64 and 1 <= h <= 64 for w, h in a.values())


def test_resize_geometry(spark):
    out = resize_images(decode_images(_docs(spark)), max_side=32).collect()
    assert out
    for r in out:
        # fits the box, never upscales
        assert 1 <= r.out_width <= 32 and 1 <= r.out_height <= 32
        assert r.out_width <= r.width and r.out_height <= r.height
        # aspect preserved up to integer rounding on the scaled axis
        if max(r.width, r.height) > 32:
            scale = 32 / max(r.width, r.height)
            assert abs(r.out_width - int(r.width * scale)) <= 1
            assert abs(r.out_height - int(r.height * scale)) <= 1
        else:  # already fits: untouched
            assert (r.out_width, r.out_height) == (r.width, r.height)
        assert r.out_bytes == r.out_width * r.out_height * 3


def test_feature_contract(spark):
    feats = {r.doc_id: r.feature for r in extract_features(_docs(spark)).collect()}
    assert feats
    for v in feats.values():
        assert len(v) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in v)
    # deterministic across runs
    again = {r.doc_id: r.feature for r in extract_features(_docs(spark)).collect()}
    assert feats == again
    # payload-sensitive: not all vectors identical
    assert len({tuple(v) for v in feats.values()}) > 1


def test_audio_chunks_tile_payload_exactly(spark):
    """Chunks must tile the payload: contiguous, non-overlapping, positive
    lengths, summing to the payload size, all full-size except the tail."""
    from apache_flink_datastream_api_spark.operators.multimodal import (
        attach_binary_payload, chunk_audio,
    )

    docs = _docs(spark)
    chunks = chunk_audio(docs, 20).collect()
    sizes = {r.doc_id: r.n_bytes for r in docs.selectExpr(
        "doc_id", "octet_length(payload) AS n_bytes").collect()}

    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc.keys() == sizes.keys()
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        offset = 0
        for r in rows:
            assert r.byte_start == offset
            assert r.byte_len > 0
            offset += r.byte_len
        assert offset == sizes[doc_id]
        # every chunk except the tail is full-size
        full = rows[0].byte_len if len(rows) > 1 else None
        for r in rows[:-1]:
            assert r.byte_len == full
        assert r.sample_rate in (8000, 16000, 44100)
