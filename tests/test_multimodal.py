from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_arrow_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    return mm.fake_payloads(docs, "doc_id", "text").cache()


def test_payload_schema_convention(media):
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.filter("media.media_type = 'image'").first()
    assert row.media.width is not None and row.media.duration_ms is None


def test_extract_features_shape_and_determinism(media):
    f1 = mm.extract_features(media, "doc_id", dim=16)
    rows = {r.doc_id: r.feature for r in f1.collect()}
    assert all(len(v) == 16 for v in rows.values())
    assert all(-1.0 <= x < 1.0 for v in rows.values() for x in v)
    # deterministic: second run identical
    rows2 = {r.doc_id: r.feature for r in mm.extract_features(media, "doc_id", dim=16).collect()}
    assert rows == rows2


def test_real_codec_path_is_stubbed(media):
    with pytest.raises(mm.CodecUnavailable):
        mm.extract_features(media, "doc_id", fake=False)
    with pytest.raises(mm.CodecUnavailable):
        mm.decode_image(media, "doc_id", fake=False)


def test_decode_image(media):
    out = mm.decode_image(media, "doc_id")
    r = out.first()
    assert 16 <= r.width < 80 and r.channels == 3 and 0 <= r.mean_pixel <= 1


def test_resize_marks_payload(media):
    out = mm.resize_images(media, "doc_id", target=(64, 64))
    r = out.first()
    assert bytes(r.payload).startswith(b"RESIZED:64x64:")
    assert (r.width, r.height) == (64, 64)


def test_sample_frames_from_metadata(media):
    out = mm.sample_frames(media, "doc_id", every_ms=1000)
    vids = media.filter("media.media_type = 'video'").count()
    assert out.select("doc_id").distinct().count() == vids
    r = out.groupBy("doc_id").agg(F.max("frame_ts_ms").alias("m"), F.count("*").alias("n")).first()
    assert r.m == (r.n - 1) * 1000


def test_features_feed_similarity(spark, media):
    """The multimodal features plug into the similarity operators."""
    from neo4j_arrow_spark.operators.similarity import cosine_topk

    feats = mm.extract_features(media, "doc_id", dim=8)
    out = cosine_topk(feats, feats.limit(2), "doc_id", "feature", k=3)
    assert out.groupBy("query_id").count().filter("count != 3").count() == 0
