"""Tests for the multimodal binary-column plumbing (stubbed decode)."""

from __future__ import annotations

import pytest

from storm_data_etl_spark.operators import multimodal as M


def _media_df(spark):
    rows = [
        (1, b"fakeimagebytes-aaaaaaaaaaaaaaa" * 100, ("image/fake", 0, 0, 0)),
        (2, b"other-binary-payload-bbbbbbbbb" * 50, ("image/fake", 0, 0, 0)),
        (3, b"", ("application/octet-stream", 0, 0, 0)),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_image_features_shape(spark):
    out = M.extract_image_features(_media_df(spark)).collect()
    assert len(out) == 3
    by_id = {r.media_id: r for r in out}
    assert by_id[1].n_bytes == 3000
    assert len(by_id[1].feature) == 8
    assert all(0.0 <= f <= 1.0 for f in by_id[1].feature)
    # deterministic: same payload → same feature
    again = {r.media_id: r for r in M.extract_image_features(_media_df(spark)).collect()}
    assert again[1].feature == by_id[1].feature


def test_real_image_raises_not_implemented(spark):
    df = spark.createDataFrame(
        [(9, b"\x89PNG\r\n\x1a\n-rest-of-png", ("image/png", 0, 0, 0))], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="PIL|NotImplemented"):
        M.extract_image_features(df).collect()


def test_sample_frames(spark):
    out = M.sample_frames(_media_df(spark), every_n_bytes=1000, max_frames=3).collect()
    frames_1 = [r for r in out if r.media_id == 1]
    assert len(frames_1) == 3
    assert [r.frame_index for r in sorted(frames_1, key=lambda r: r.frame_index)] == [0, 1, 2]
    # empty payload still yields one (empty) frame row
    assert len([r for r in out if r.media_id == 3]) == 1


def test_media_stats(spark):
    out = {r.mime: r.n for r in M.media_stats(_media_df(spark)).collect()}
    assert out == {"image/fake": 2, "application/octet-stream": 1}
