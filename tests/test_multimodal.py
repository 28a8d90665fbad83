"""Multimodal binary-column plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.multimodal.binary_ops import (
    attach_fake_media,
    decode_media,
    extract_byte_features,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    return attach_fake_media(docs, "doc_id", "text").cache()


def test_media_schema_and_meta(media):
    row = media.first()
    assert row["media_type"] in ("image", "audio", "video")
    assert row["meta"]["n_bytes"] == len(row["payload"])
    assert len(row["meta"]["content_md5"]) == 32


def test_decode_stub_raises_without_codecs(media):
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        decode_media(media, fake=False).collect()


def test_fake_decode_is_deterministic(media):
    a = decode_media(media, fake=True).collect()
    b = decode_media(media, fake=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    r = a[0]
    assert r["width"] >= 1 and r["height"] >= 1 and r["n_channels"] == 3


def test_byte_features_sum_to_one(media):
    feats = extract_byte_features(media).collect()
    for r in feats:
        assert len(r["byte_histogram"]) == 8
        assert abs(sum(r["byte_histogram"]) - 1.0) < 1e-9


def test_frame_sampling_shapes(media):
    frames = sample_frames(media, frame_bytes=64, stride=2)
    rows = frames.collect()
    assert len(rows) > 0
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    assert all(len(r["frame_bytes"]) <= 64 for r in rows)
    # only video media produce frames
    types = {r["media_id"] % 3 for r in rows}
    assert types == {2}
