"""Multimodal plumbing tests: schema, Arrow batch shape, stubbed decode."""

from __future__ import annotations

import math

import pytest

from vector_db_at_home_spark.operators.multimodal import (
    _extract_features_bytes,
    decode_stub,
    extract_media_features,
    media_stats_by_modality,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return synthesize_media(docs, "text", "doc_id")


def test_media_schema(media):
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["modality"] == "string"
    assert "struct" in fields["meta"]


def test_feature_extraction_end_to_end(spark, media):
    feats = extract_media_features(media, n_features=8)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-9  # L1-normalized histogram
        assert 0.0 <= r.byte_entropy <= 8.0
        assert r.n_bytes > 0


def test_features_deterministic_python_reference(media):
    r = extract_media_features(media).orderBy("media_id").first()
    # recompute driver-side from the same payload
    payload = bytes(media.orderBy("media_id").first().payload)
    ent, feats = _extract_features_bytes(payload, 8)
    assert r.byte_entropy == pytest.approx(ent, abs=1e-12)
    assert list(r.features) == pytest.approx(feats, abs=1e-12)


def test_real_decoder_path_is_stubbed(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        extract_media_features(media, use_real_decoder=True).collect()
    assert "NotImplementedError" in str(exc.value)


def test_decode_stub_raises_directly():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        decode_stub(b"\x89PNG", "image")


def test_stats_by_modality(media):
    stats = media_stats_by_modality(extract_media_features(media)).collect()
    assert {r.modality for r in stats} == {"image", "audio", "video"}
    assert all(r.total_bytes > 0 for r in stats)


def test_entropy_formula():
    ent, feats = _extract_features_bytes(b"aabb", 2)
    assert ent == pytest.approx(1.0)  # two symbols, uniform
    assert feats == [0.0, 1.0] or sum(feats) == 1.0
    ent0, feats0 = _extract_features_bytes(b"", 4)
    assert ent0 == 0.0 and feats0 == [0.0] * 4
