"""Multimodal pipeline: payloads are REAL binary PPM P6 images and the
decode / resize / feature stages run an actual parser + resampler, so
these tests pin the codec contracts themselves — parse-vs-synthesize
consistency, resample geometry, feature exactness — plus the Arrow
plumbing around them."""

from __future__ import annotations

from apache_flink_datastream_api_spark.operators.multimodal import (
    FEATURE_DIM,
    _ppm_parse,
    _ppm_synthesize,
    attach_ppm_payload,
    decode_images,
    extract_features,
    resize_images,
)
from apache_flink_datastream_api_spark.sources.tables import load_table

from .conftest import SF_DIR


def _docs(spark, n=50):
    return attach_ppm_payload(
        load_table(spark, SF_DIR, "documents").limit(n)
    )


def test_payloads_are_valid_ppm(spark):
    """Every attached payload is a parseable P6 image whose geometry and
    raster agree with the synthesis rule."""
    rows = _docs(spark).collect()
    assert rows
    for r in rows:
        img = _ppm_parse(bytes(r.payload))
        h, w, c = img.shape
        assert c == 3
        assert (w, h) == (1 + (r.doc_id * 7) % 32, 1 + (r.doc_id * 13) % 24)
        assert r.media_meta.n_bytes == len(bytes(r.payload))
        assert bytes(r.payload) == _ppm_synthesize(int(r.doc_id))


def test_decode_is_deterministic(spark):
    docs = _docs(spark)
    a = {r.doc_id: (r.width, r.height, r.n_bytes) for r in decode_images(docs).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_bytes) for r in decode_images(docs).collect()}
    assert a == b
    assert all(1 <= w <= 32 and 1 <= h <= 24 for w, h, _ in a.values())


def test_resize_geometry(spark):
    out = resize_images(_docs(spark), max_side=16).collect()
    assert out
    for r in out:
        # fits the box, never upscales
        assert 1 <= r.out_width <= 16 and 1 <= r.out_height <= 16
        assert r.out_width <= r.width and r.out_height <= r.height
        # aspect preserved up to integer rounding on the scaled axis
        if max(r.width, r.height) > 16:
            scale = 16 / max(r.width, r.height)
            assert abs(r.out_width - int(r.width * scale)) <= 1
            assert abs(r.out_height - int(r.height * scale)) <= 1
        else:  # already fits: untouched
            assert (r.out_width, r.out_height) == (r.width, r.height)
        assert r.out_bytes == r.out_width * r.out_height * 3
        # resampled sum is bounded by the raster's value range
        assert 0 <= r.resized_sum <= r.out_bytes * 255


def test_feature_contract(spark):
    feats = {r.doc_id: r.feature for r in extract_features(_docs(spark)).collect()}
    assert feats
    for doc_id, v in feats.items():
        assert len(v) == FEATURE_DIM
        img = _ppm_parse(_ppm_synthesize(int(doc_id)))
        # channel sums + geometry + extrema from the REAL decoded raster
        assert v[0] == float(img[:, :, 0].sum())
        assert (v[3], v[4]) == (float(img.shape[1]), float(img.shape[0]))
        assert (v[6], v[7]) == (float(img.max()), float(img.min()))
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


def test_cdc_insertion_locality():
    """The CDC selling point vs fixed-size blocks: a prefix insertion
    perturbs only the chunks up to the first content-defined boundary —
    the chunk sequence RE-SYNCHRONIZES and the tail is byte-identical.
    (A fixed-size chunker would shift every block after the edit.)"""
    from apache_flink_datastream_api_spark.operators.multimodal import (
        _cdc_chunks)

    base = ("the quick brown fox jumps over the lazy dog " * 30)
    edited = "INSERTED PREFIX >>> " + base
    a, b = _cdc_chunks(base), _cdc_chunks(edited)
    assert len(a) > 3, "fixture must produce several chunks"
    # chunk multisets share a long common suffix
    k = 0
    while k < min(len(a), len(b)) and a[-1 - k] == b[-1 - k]:
        k += 1
    assert k >= len(a) - 2, (
        f"only {k} trailing chunks survived a prefix edit "
        f"(expected all but the first 1-2)")
    # and reassembly is lossless
    assert "".join(a) == base and "".join(b) == edited
