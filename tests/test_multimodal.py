"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

import pytest
from pyspark.sql import functions as F

from autoextraction_spark import corpus
from autoextraction_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    pages = corpus.web_pages(spark, sf_dir)
    return multimodal.media_table(pages).cache()


def test_media_table_kinds(media):
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "video"}
    row = media.filter(F.col("kind") == "video").first()
    assert row.duration_ms is not None and row.duration_ms > 0
    assert isinstance(row.payload, (bytes, bytearray))


def test_image_features_shape(media):
    feats = multimodal.extract_image_features(media)
    rows = feats.limit(5).collect()
    assert rows
    for r in rows:
        assert r.n_channels == 3
        assert len(r.features) == 8
        assert all(0.0 <= f < 1.0 for f in r.features)
    # deterministic across runs
    a = {r.url: r.features for r in feats.collect()}
    b = {r.url: r.features for r in multimodal.extract_image_features(media).collect()}
    assert a == b


def test_real_decoder_is_stubbed():
    if multimodal.HAVE_PIL:
        pytest.skip("PIL present; stub not applicable")
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_real(b"x")


def test_frame_sampling(media):
    frames = multimodal.sample_frames(media, every_ms=5000)
    one = frames.groupBy("url").count().first()
    assert one["count"] >= 1
    r = frames.first()
    assert r.frame_ts_ms == r.frame_idx * 5000
    assert len(bytes(r.frame)) == 16
