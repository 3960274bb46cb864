"""Multimodal plumbing tests: binary columns, metadata pushdown shape,
Arrow-batched decode stub, frame sampling fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataflowjavasdk_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251] * (50 + i))) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    return M.attach_media_meta(df)


def test_metadata_struct_shape(media):
    assert dict(media.dtypes)["meta"].startswith("struct<media_type:string")
    types = {r[0] for r in media.select("meta.media_type").distinct().collect()}
    assert types <= {"image/png", "audio/wav", "video/mp4"}


def test_metadata_filter_without_payload(media):
    # The plan that matters at scale: filtering on metadata only must not
    # require the payload column in the projection.
    small = media.filter(F.col("meta.width") < 500).select("media_id", "meta.width")
    assert "payload" not in small.columns
    assert small.count() > 0


def test_image_feature_extraction_batch_shape(media):
    feats = M.extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["width"] == 8 and r["height"] == 8
        assert 0.0 <= r["mean_luma"] <= 255.0
    # deterministic stub: same payload → same phash
    again = {r["media_id"]: r["phash"] for r in M.extract_image_features(media).collect()}
    first = {r["media_id"]: r["phash"] for r in rows}
    assert again == first


def test_decode_stub_raises_on_empty(spark):
    with pytest.raises(ValueError):
        M._decode_image_stub(b"")


def test_frame_sampling_fanout(media):
    frames = M.sample_frames(media, every_nth=7)
    got = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r["n"] for r in media.select("media_id", F.col("meta.n_frames").alias("n")).collect()}
    for r in got:
        expected = (meta[r["media_id"]] - 1) // 7 + 1
        assert r["count"] == expected
