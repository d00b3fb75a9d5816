"""Multimodal plumbing: binary column round-trip through mapInPandas."""

from __future__ import annotations

import pytest

from sparkifydb_datawarehouse_spark.llm import multimodal


def test_features_roundtrip(spark, sf_dir):
    df = multimodal.multimodal_features(spark, sf_dir)
    rows = df.limit(20).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["magic_ok"] == 1, "header must survive the binary round-trip"
        assert r["width"] == r["doc_id"] % 64 + 1
        assert r["height"] == r["doc_id"] % 48 + 1
        assert r["kind"] == "image/fake"
        assert r["n_bytes"] > 8


def test_checksum_matches_python(spark, sf_dir):
    from sparkifydb_datawarehouse_spark.tables import load_table

    doc = load_table(spark, sf_dir, "documents").filter("doc_id = 0").collect()[0]
    feat = (
        multimodal.multimodal_features(spark, sf_dir).filter("doc_id = 0").collect()[0]
    )
    assert feat["payload_checksum"] == sum(doc["text"].encode()) % (1 << 31)


def test_decode_image_stub_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_image(b"\x89PNG\r\n")
