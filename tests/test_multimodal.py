"""Multimodal plumbing tests: decode UDF shape, determinism,
frame sampling, resize planning, real-codec stub behavior."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from clara_ocr_spark.sources.multimodal import (
    _decode_one,
    decode,
    encode_fake,
    frame_sample,
    make_media,
    resize_plan,
)


def test_decode_shapes_and_determinism(spark):
    media = make_media(spark, n=48)
    d1 = decode(media)
    rows = {r.media_id: r for r in d1.collect()}
    assert len(rows) == 48
    for r in rows.values():
        assert r.width >= 32 and r.height >= 32
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram
    rows2 = {r.media_id: r for r in decode(media).collect()}
    assert all(rows[k].features == rows2[k].features for k in rows)


def test_kind_distribution_and_frames(spark):
    media = make_media(spark, n=30)
    d = decode(media)
    kinds = {r.kind for r in d.collect()}
    assert kinds == {"image", "audio", "video"}
    assert d.filter((F.col("kind") == "image") & (F.col("frames") != 1)).count() == 0


def test_frame_sampling(spark):
    media = make_media(spark, n=30)
    d = decode(media)
    frames = frame_sample(d, every=4)
    per_vid = {
        r.media_id: r.n for r in frames.groupBy("media_id").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    vid_frames = {r.media_id: r.frames for r in d.filter(F.col("kind") == "video").collect()}
    assert set(per_vid) == set(vid_frames)
    for mid, n in per_vid.items():
        assert n == len(range(0, vid_frames[mid], 4))


def test_resize_plan_aspect(spark):
    media = make_media(spark, n=20)
    plans = resize_plan(decode(media), max_dim=64).collect()
    for r in plans:
        assert 1 <= r.target_w <= 64 and 1 <= r.target_h <= 64


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError, match="Pillow"):
        _decode_one(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_fake_codec_roundtrip():
    blob = encode_fake(7, 2, 100, 50, 24)
    w, h, frames, body = _decode_one(blob)
    assert (w, h, frames) == (100, 50, 24)
    assert len(body) == min(100 * 50, 4096)
