from __future__ import annotations

import pytest

from nexus_processor_spark.sources import multimodal


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "png", bytearray(b"payload-one"), 8, 8, None),
        (2, "image", "png", bytearray(b"payload-two"), 8, 8, None),
        (3, "image", "png", None, None, None, None),
        (4, "video", "mp4", bytearray(b"vid"), 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_fake_decode_features_deterministic(spark, media):
    out1 = {r.media_id: r for r in
            multimodal.extract_image_features(media, fake_decode=True).collect()}
    out2 = {r.media_id: r for r in
            multimodal.extract_image_features(media, fake_decode=True).collect()}
    assert out1[1].embedding == out2[1].embedding  # deterministic
    assert out1[1].sha256 != out1[2].sha256
    assert len(out1[1].embedding) == 16
    assert out1[3].sha256 is None  # null payload propagates
    assert 0.0 <= out1[1].mean_luma <= 255.0


def test_real_decode_is_gated(spark, media):
    """With codec libs absent the real path fails with a clear ImportError
    naming the library; with them present it decodes (skip — not this
    container's path)."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present: real decode path active")
    except ImportError:
        pass
    with pytest.raises(Exception, match="Pillow"):
        multimodal.extract_image_features(
            media.filter("media_id = 1"), fake_decode=False
        ).collect()


def test_real_audio_decode_is_gated(spark, media):
    try:
        import soundfile  # noqa: F401
        pytest.skip("soundfile present: real decode path active")
    except ImportError:
        pass
    with pytest.raises(Exception, match="soundfile"):
        multimodal.extract_audio_features(
            media.filter("media_id = 1"), fake_decode=False
        ).collect()


def test_audio_features_fake_decode(spark, media):
    out = {r.media_id: r for r in
           multimodal.extract_audio_features(
               media.filter("media_id <= 2"), fake_decode=True).collect()}
    assert out[1].n_samples == 8000
    assert 0 < out[1].rms < out[1].peak
    assert out[1].zero_crossings > 0
    # deterministic per payload, distinct across payloads
    again = {r.media_id: r.rms for r in
             multimodal.extract_audio_features(
                 media.filter("media_id <= 2"), fake_decode=True).collect()}
    assert again[1] == out[1].rms and again[2] != again[1]


def test_frame_sampling_grid(spark, media):
    rows = multimodal.sample_frames(media, every_ms=1000).collect()
    assert [(r.media_id, r.frame_ts_ms) for r in rows] == [
        (4, 0), (4, 1000), (4, 2000), (4, 3000)
    ]
