"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
stub decoding, frame-sampling plan."""

from __future__ import annotations

import hashlib

import pytest

from etl_developstoday_test_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", (640, 480, None, "image/png")),
        (2, "audio", b"RIFF fake wave", (None, None, 2500, "audio/wav")),
        (3, "video", b"\x00\x00ftyp fake mp4", (1920, 1080, 3500, "video/mp4")),
        (4, "image", b"", (0, 0, None, "image/png")),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_schema_and_determinism(media):
    out = multimodal.extract_features(media)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in multimodal.FEATURE_SCHEMA.fields
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    img = rows[1]
    assert img["n_bytes"] == len(b"\x89PNG fake bytes")
    assert img["content_sha256"] == hashlib.sha256(b"\x89PNG fake bytes").hexdigest()
    digest = hashlib.sha256(b"\x89PNG fake bytes").digest()
    expected = [digest[i] / 256.0 for i in range(multimodal.FEATURE_DIM)]
    assert [pytest.approx(v, abs=1e-6) for v in img["feature"]] == expected
    assert len(img["feature"]) == multimodal.FEATURE_DIM


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.DECODERS["image/real"](b"bytes")


def test_frame_sample_plan(media):
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = sorted(
        (r["media_id"], r["frame_idx"], r["frame_ts_ms"]) for r in plan.collect()
    )
    # 3500ms video sampled at 1000ms → frames 0..2 (3 frames)
    assert rows == [(3, 0, 0), (3, 1, 1000), (3, 2, 2000)]


def test_resize_plan_geometry(spark):
    """Aspect ratio preserved, never upscaled, floor semantics."""
    from pyspark.sql import functions as F

    from etl_developstoday_test_spark.operators.multimodal import resize_plan

    rows = [
        (1, "image", b"x", (128, 256, None, "img")),   # tall: fit height
        (2, "image", b"y", (32, 16, None, "img")),     # small: no upscale
        (3, "audio", b"z", (999, 999, None, "aud")),   # filtered out
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, content binary, "
        "meta struct<width:int, height:int, duration_ms:int, mime:string>",
    )
    out = {r.media_id: r for r in resize_plan(media).collect()}
    assert set(out) == {1, 2}
    assert (out[1].thumb_w, out[1].thumb_h) == (32, 64)   # 128/256 → x0.25
    assert (out[2].thumb_w, out[2].thumb_h) == (32, 16)   # scale clamped to 1
    assert len(out[1].thumb_sha256) == 64


def test_audio_window_plan_geometry(spark):
    """STFT framing: full clips get 1 + (dur-win)//hop windows with the
    last one clamped to the clip end; clips shorter than one window get
    exactly one truncated window."""
    from pyspark.sql import functions as F, types as T

    from etl_developstoday_test_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_window_plan,
    )

    rows = [
        (1, "audio", b"x", (None, None, 1000, "m")),   # 4 windows
        (2, "audio", b"y", (None, None, 300, "m")),    # shorter than win
        (3, "video", b"z", (None, None, 9999, "m")),   # filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_window_plan(media, win_ms=400, hop_ms=200).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(
            (r["window_idx"], r["start_ms"], r["end_ms"])
        )
    assert sorted(by_id) == [1, 2]
    assert sorted(by_id[1]) == [(0, 0, 400), (1, 200, 600), (2, 400, 800), (3, 600, 1000)]
    assert by_id[2] == [(0, 0, 300)]  # truncated to clip end
