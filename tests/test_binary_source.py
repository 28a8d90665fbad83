"""binaryFile media ingestion -> multimodal operator contract."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.multimodal.binary_ops import (
    extract_byte_features,
)
from data_integration_openfoodfacts_spark.sources.binary_source import (
    load_media_dir,
)


def _mkfiles(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (d / "b.wav").write_bytes(b"RIFFfakewav")
    (d / "c.unknown").write_bytes(b"\x00\x01\x02")
    return str(d)


def test_load_media_dir_contract(spark, tmp_path):
    out = load_media_dir(spark, _mkfiles(tmp_path))
    rows = {r["meta"]["source_uri"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert set(rows) == {"a.jpg", "b.wav", "c.unknown"}
    assert rows["a.jpg"]["media_type"] == "image"
    assert rows["b.wav"]["media_type"] == "audio"
    assert rows["c.unknown"]["media_type"] == "bin"
    assert bytes(rows["a.jpg"]["payload"]) == b"\xff\xd8fakejpeg"
    assert rows["a.jpg"]["meta"]["n_bytes"] == 10
    assert len({r["media_id"] for r in rows.values()}) == 3  # stable, unique
    # feeds the downstream multimodal operators unchanged
    feats = extract_byte_features(out, n_buckets=4)
    assert feats.count() == 3


def test_glob_prunes_listing(spark, tmp_path):
    out = load_media_dir(spark, _mkfiles(tmp_path), glob="*.jpg")
    assert out.count() == 1
