"""Multimodal plumbing tests: schema, Arrow batch shape, partitioning;
decode kernels are deterministic fakes / clearly-gated stubs."""

import pytest

from gliner_transbronchialbiopsy_spark.operators import multimodal


def test_media_fixture_schema(spark):
    media = multimodal.synthesize_media(spark, n=30)
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.head()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["source"].startswith("src")


def test_image_feature_extraction_deterministic(spark):
    media = multimodal.synthesize_media(spark, n=30)
    feats = multimodal.extract_features(media, kind="image", dim=8)
    rows = feats.collect()
    assert all(r["kind"] == "image" for r in rows)
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["features"])
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in feats.collect()}
    assert {r["media_id"]: r["features"] for r in rows} == again


def test_frame_sample_plan(spark):
    media = multimodal.synthesize_media(spark, n=30)
    frames = multimodal.frame_sample_plan(media, every_n=10, max_frames=4)
    rows = frames.collect()
    assert rows and all(r["byte_offset"] == r["frame_idx"] * 10 for r in rows)
    per_video = {}
    for r in rows:
        per_video.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in per_video.values())


def test_audio_stub_raises_clearly(spark):
    media = multimodal.synthesize_media(spark, n=6)
    stub = multimodal.decode_audio_stub(media)
    with pytest.raises(Exception, match="torchaudio|librosa|NotImplemented"):
        stub.collect()
