"""Multimodal binary-column plumbing tests (driver round spec: decode /
feature-extract / resize / frame-sample over opaque binary payloads)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import multimodal as mm


N = 90  # 30 of each kind


def test_synth_deterministic_and_parallelism_invariant(spark):
    a = mm.media_df(spark, N, partitions=1).orderBy("media_id").collect()
    b = mm.media_df(spark, N, partitions=7).orderBy("media_id").collect()
    assert len(a) == N
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_decode_meta_schema_and_values(spark):
    media = mm.media_df(spark, N, partitions=4)
    meta = mm.decode_meta(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == N
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        s = src[mid]
        assert r["kind"] == s["kind"]
        assert r["n_bytes"] == len(bytes(s["payload"]))
        if r["kind"] == "image":
            assert r["width"] * r["height"] * r["channels"] == r["n_bytes"] - 17
            assert r["sample_rate"] is None
        elif r["kind"] == "audio":
            assert r["sample_rate"] == 8000
            assert r["n_samples"] * r["channels"] * 2 == r["n_bytes"] - 17
        else:
            assert r["n_frames"] >= 4
            assert r["width"] * r["height"] * r["n_frames"] == r["n_bytes"] - 17


def test_features_fixed_dim_unit_norm(spark):
    feats = mm.extract_features(mm.media_df(spark, N, partitions=4), dim=16)
    rows = feats.collect()
    assert len(rows) == N
    for r in rows:
        v = np.array(r["feature"], dtype=np.float64)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_frame_sample_counts(spark):
    media = mm.media_df(spark, N, partitions=4)
    frames = mm.sample_frames(media, every_n=2)
    meta = mm.decode_meta(media).filter(F.col("kind") == "video")
    exp = sum(-(-r["n_frames"] // 2) for r in meta.collect())  # ceil
    got = frames.count()
    assert got == exp > 0
    r = frames.first()
    assert len(bytes(r["frame"])) == r["width"] * r["height"]
    # sampled indices are the even ones
    assert frames.filter(F.col("frame_idx") % 2 == 1).count() == 0


def test_resize_block_mean(spark):
    media = mm.media_df(spark, N, partitions=4)
    thumbs = mm.resize_images(media, out_w=4, out_h=4)
    n_img = media.filter(F.col("kind") == "image").count()
    rows = thumbs.collect()
    assert len(rows) == n_img > 0
    for r in rows[:5]:
        assert len(bytes(r["thumb"])) == 4 * 4 * 3


def test_unknown_container_raises(spark):
    with pytest.raises(Exception) as ei:
        mm._parse_header(b"JUNKDATA" + b"\x00" * 32)
    assert "NotImplementedError" in str(type(ei.value)) or isinstance(
        ei.value, NotImplementedError)


def test_features_feed_ann(spark):
    """Media features are drop-in vectors for the similarity operators."""
    from mergeaddressesandbuildings_spark.operators import similarity

    feats = mm.extract_features(mm.media_df(spark, 40, partitions=2), dim=16) \
              .select(F.col("media_id").alias("vec_id"),
                      F.col("feature").alias("embedding"))
    qs = feats.limit(2).select(F.col("vec_id").alias("qid"),
                               F.col("embedding").alias("q_embedding"))
    top = similarity.cosine_topk_bruteforce(feats, qs, k=3)
    got = top.groupBy("qid").count().collect()
    assert all(r["count"] == 3 for r in got)
