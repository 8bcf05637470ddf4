"""Tests for the multimodal binary-column plumbing + stubbed decode."""

from __future__ import annotations

import pytest

from udacity_data_engineer_capstone_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    media_table,
)


def test_media_schema(spark, sf_dir):
    media = media_table(spark, sf_dir)
    schema = dict(media.dtypes)
    assert schema["media"] == "binary"
    assert schema["meta"].startswith("struct<")
    row = media.first()
    assert isinstance(row.media, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.media)
    assert row.meta.format == "text/plain"


def test_extract_features_batch_shape(spark, sf_dir):
    feats = extract_features(media_table(spark, sf_dir))
    rows = feats.limit(5).collect()
    assert rows
    for r in rows:
        assert len(r.feature) == 4
        assert r.feature[0] == float(r.n_bytes)  # feature[0] is byte length
        assert 0.0 <= r.feature[1] <= 255.0  # mean byte


def test_decode_stub_contract():
    assert decode_stub(b"") == [0.0, 0.0, 0.0, 0.0]
    f = decode_stub(b"abc")
    assert f[0] == 3.0 and f[2] == float(ord("a")) and f[3] == float(ord("c"))
    with pytest.raises(NotImplementedError):
        decode_stub(None)  # the seam where a real decoder plugs in
