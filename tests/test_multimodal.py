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


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_real_codec_path_decodes_everywhere(spark):
    # the real path (fake=False) runs in EVERY build (r6): Pillow when
    # installed, else the vendored pure-Python PNG backend. An 8x6 red
    # RGB PNG round-trips through decode_image / resize_images /
    # extract_features with exact dimensions on either backend.
    from neo4j_arrow_spark.operators import pngcodec

    payload = pngcodec.encode(bytes([255, 0, 0] * 8 * 6), 8, 6, 3)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    dec = mm.decode_image(df, "doc_id", fake=False).first()
    assert (dec.width, dec.height, dec.channels) == (8, 6, 3)
    # red's ITU-R 601 luma is 76 -> mean 76/255
    assert abs(dec.mean_pixel - 76 / 255.0) < 0.01
    rs = mm.resize_images(df, "doc_id", target=(4, 4), fake=False).first()
    assert (rs.width, rs.height) == (4, 4)
    w, h, ch, px = pngcodec.decode(bytes(rs.payload))
    assert (w, h, ch) == (4, 4, 3) and list(px[:3]) == [255, 0, 0]
    feat = mm.extract_features(df, "doc_id", dim=16, fake=False).first()
    assert len(feat.feature) == 16
    assert all(-1.0 <= x < 1.0 for x in feat.feature)


def test_real_codec_path_rejects_non_png_payload(spark):
    # on the pure backend a non-PNG payload is a decode-time format
    # error (Pillow raises its own UnidentifiedImageError) — either
    # way the executor surfaces a real error, not a silent fake
    df = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="(?i)png|image|identif"):
        mm.decode_image(df, "doc_id", fake=False).first()


def test_sample_frames_real_path_requires_av(media):
    try:
        import av  # noqa: F401

        has_av = True
    except ImportError:
        has_av = False
    if has_av:
        pytest.skip("PyAV installed: the real path activates")
    with pytest.raises(mm.CodecUnavailable):
        mm.sample_frames(media, "doc_id", fake=False)


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


def test_real_codec_path_decodes_jpeg(spark):
    # SECOND real format through the same fake=False seam (r7): a
    # baseline grayscale JPEG payload decodes on executors via the
    # magic-byte sniff in the pure backend (Pillow handles it natively
    # when installed). Lossy codec -> mean-pixel asserted within the
    # quantization error bound.
    from neo4j_arrow_spark.operators import jpegcodec

    img = bytes([200]) * (16 * 8)
    payload = jpegcodec.encode(img, 16, 8)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    dec = mm.decode_image(df, "doc_id", fake=False).first()
    assert (dec.width, dec.height, dec.channels) == (16, 8, 1)
    assert abs(dec.mean_pixel - 200 / 255.0) < 0.02
    feat = mm.extract_features(df, "doc_id", dim=8, fake=False).first()
    assert len(feat.feature) == 8
