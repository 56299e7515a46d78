"""Multimodal binary-column operators: decode seam, features, resize,
frame sampling — deterministic FAKE-container codecs, real Arrow
plumbing (multi-batch via the tiny arrow_batch in conftest)."""

from __future__ import annotations

import math
import struct

import pytest

from ocr_engine_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synth_media(spark, 90, seed=7, partitions=4)
    df = df.cache()
    df.count()
    return df


def test_synth_media_shape(media):
    kinds = {r.kind: r.n for r in media.groupBy("kind").count().withColumnRenamed("count", "n").collect()}
    assert set(kinds) == {"image", "audio", "video"}
    assert sum(kinds.values()) == 90


def test_image_features_match_local_decode(media):
    feats = {r.media_id: r for r in mm.image_features(media).collect()}
    rows = media.filter("kind = 'image'").collect()
    assert len(feats) == len(rows) > 0
    for r in rows:
        w, h, px = mm.decode_image(bytes(r.payload))
        f = feats[r.media_id]
        assert (f.width, f.height) == (w, h)
        assert f.decode_failed == 0
        assert math.isclose(f.mean_intensity, sum(px) / len(px))
        assert sum(f.hist8) == w * h


def test_corrupt_image_counted_not_fatal(spark):
    rows = [("bad-1", "image", "image/x-fake", b"NOTAFORMAT"),
            ("ok-1", "image", "image/x-fake", mm.encode_fake_image(4, 4, 1))]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r.media_id: r.decode_failed for r in mm.image_features(df).collect()}
    assert out == {"bad-1": 1, "ok-1": 0}


def test_resize_roundtrip(media):
    out = mm.resize_images(media, 8, 6).collect()
    assert len(out) == media.filter("kind = 'image'").count()
    for r in out:
        w, h, px = mm.decode_image(bytes(r.payload))
        assert (w, h) == (8, 6)
        assert len(px) == 48


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, every_n=2).collect()
    vids = media.filter("kind = 'video'").collect()
    expected = 0
    for v in vids:
        fps, n_frames, w, h = mm.decode_video_header(bytes(v.payload))
        expected += len(range(0, n_frames, 2))
    assert len(frames) == expected > 0
    # every sampled frame decodes as a standalone image of video dims
    by_vid = {v.media_id: mm.decode_video_header(bytes(v.payload)) for v in vids}
    for f in frames:
        fps, n_frames, w, h = by_vid[f.media_id]
        fw, fh, px = mm.decode_image(bytes(f.frame))
        assert (fw, fh) == (w, h) and len(px) == w * h


def test_frame_content_matches_source(media):
    vids = media.filter("kind = 'video'").collect()
    frames = {(r.media_id, r.frame_idx): bytes(r.frame)
              for r in mm.sample_frames(media, every_n=1).collect()}
    for v in vids:
        blob = bytes(v.payload)
        fps, n_frames, w, h = mm.decode_video_header(blob)
        fsz = w * h
        for fi in range(n_frames):
            expect = b"FIMG" + struct.pack(">HH", w, h) + blob[12 + fi * fsz: 12 + (fi + 1) * fsz]
            assert frames[(v.media_id, fi)] == expect


def test_audio_features(media):
    feats = {r.media_id: r for r in mm.audio_features(media).collect()}
    auds = media.filter("kind = 'audio'").collect()
    assert len(feats) == len(auds) > 0
    for a in auds:
        rate, pcm = mm.decode_audio(bytes(a.payload))
        f = feats[a.media_id]
        assert f.sample_rate == rate and f.n_samples == len(pcm)
        rms = math.sqrt(sum((b - 128) ** 2 for b in pcm) / len(pcm))
        assert math.isclose(f.rms, rms)


def test_non_fake_payload_raises_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF....WAVE")
    with pytest.raises(NotImplementedError):
        mm.decode_video_header(b"\x00\x00\x00 ftypmp42")
