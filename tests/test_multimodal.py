"""Multimodal plumbing: stub gating + deterministic fake decode."""

from __future__ import annotations

import pytest

from redis_streams_spark.operators.multimodal import attach_blob, decode_features
from redis_streams_spark.session import load_table


def test_real_codecs_stub_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(NotImplementedError):
        decode_features(docs, use_real_codecs=True)


def test_attach_blob_binary_payload(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    row = attach_blob(docs).orderBy("doc_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.byte_len == len(row.payload)
    assert len(row.checksum) == 32
    assert row.modality in ("image", "audio", "video")


def test_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = decode_features(docs).orderBy("doc_id").limit(5).collect()
    b = decode_features(docs).orderBy("doc_id").limit(5).collect()
    assert a == b
    for r in a:
        assert 64 <= r.width < 1024 and 64 <= r.height < 1024
        assert 1 <= r.n_frames <= 120
        assert 0.0 <= r.mean_byte <= 255.0
