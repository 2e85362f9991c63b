"""Multimodal binary-column plumbing: schemas, 1-to-many frame sampling,
error rows, determinism. Decode itself is a documented stub."""

from __future__ import annotations

from document_ai_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    image_features,
    sample_frames,
)


def _media_df(spark):
    rows = [
        ("img1", "image", b"\x89PNGfakebytes" * 8, "image/png",
         {"width": 16, "height": 12, "duration_ms": None}),
        ("img2", "image", b"\xff\xd8jpegfake" * 4, "image/jpeg",
         {"width": 8, "height": 8, "duration_ms": None}),
        ("img_bad", "image", b"", "image/png",
         {"width": 4, "height": 4, "duration_ms": None}),
        ("aud1", "audio", b"RIFFfakewav" * 10, "audio/wav",
         {"width": None, "height": None, "duration_ms": 250}),
        ("vid1", "video", b"\x00\x00ftypmp4fake" * 20, "video/mp4",
         {"width": 64, "height": 48, "duration_ms": 2000}),
        ("vid_empty", "video", b"", "video/mp4",
         {"width": 64, "height": 48, "duration_ms": 2000}),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_image_features_and_error_rows(spark):
    media = _media_df(spark)
    feats = {r.media_id: r for r in image_features(
        media.filter(media.kind == "image")).collect()}
    assert feats["img1"].decode_ok and feats["img1"].width == 16
    assert feats["img2"].decode_ok and feats["img2"].height == 8
    assert not feats["img_bad"].decode_ok
    assert feats["img_bad"].err.startswith("decode_failed:")
    # deterministic phash
    again = {r.media_id: r.phash for r in image_features(
        media.filter(media.kind == "image")).collect()}
    assert again["img1"] == feats["img1"].phash


def test_frame_sampling_one_to_many(spark):
    media = _media_df(spark)
    frames = sample_frames(media, n_frames=4).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    assert len(by_id["vid1"]) == 4
    assert [f.frame_no for f in sorted(by_id["vid1"],
                                       key=lambda x: x.frame_no)] == [0, 1, 2, 3]
    assert all(len(f.frame) > 0 for f in by_id["vid1"])
    assert "vid_empty" not in by_id  # undecodable -> zero frames, no crash


def test_audio_features(spark):
    media = _media_df(spark)
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert rows["aud1"].decode_ok
    assert rows["aud1"].n_samples == 250 * 16
    assert 0.0 <= rows["aud1"].rms <= 1.0


def test_image_features_hand_computed_goldens(spark):
    """The stub decoder is deterministic, so the feature math has exact
    hand-derivable answers:
    - constant payload byte v -> plane all v: mean_luma == v, and since
      every 8x8 cell equals the global mean, no bit exceeds it -> phash 0
    - payload bytes 0..63 tiled to 8x8 -> plane[y][x] = 8y+x:
      mean = 31.5; cells are single pixels; bits set exactly for y >= 4,
      i.e. bit indices 32..63 -> value 2^64 - 2^32 -> signed -2^32."""
    rows = [
        ("const", "image", bytes([7]) * 64, "image/x-fake",
         {"width": 8, "height": 8, "duration_ms": None}),
        ("ramp", "image", bytes(range(64)), "image/x-fake",
         {"width": 8, "height": 8, "duration_ms": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(media).collect()}
    c = got["const"]
    assert (c.mean_luma, c.phash, c.decode_ok) == (7.0, 0, True)
    r = got["ramp"]
    assert (r.mean_luma, r.phash, r.decode_ok) == (31.5, -(1 << 32), True)
