"""Multimodal plumbing tests: Arrow batch shape, determinism, and
payload-free metadata paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import multimodal as mm
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_from_documents(load_table(spark, SF, "documents"))


def test_feature_extract_shape_and_determinism(spark, media):
    a = mm.extract_features(media).orderBy("media_id").limit(5).collect()
    b = mm.extract_features(media).orderBy("media_id").limit(5).collect()
    assert len(a) == 5
    for ra, rb in zip(a, b):
        assert ra.media_id == rb.media_id
        assert len(ra.feature) == mm.FEATURE_DIM
        assert ra.feature == rb.feature  # deterministic stub
        assert all(0.0 <= x < 1.0 for x in ra.feature)
        assert ra.feature_norm > 0


def test_feature_extract_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, fake=False)


def test_resize_plan_bounds(spark, media):
    rows = mm.resize_plan(media).collect()
    for r in rows:
        assert max(r.target_width, r.target_height) <= 256
        if r.needs_resize:
            assert max(r.width, r.height) > 256


def test_frame_sample_only_videos(spark, media):
    rows = mm.frame_sample_plan(media).collect()
    vids = {r.media_id for r in rows}
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert all(kinds[v] == "video" for v in vids)
    assert all(r.frame_idx % 10 == 0 for r in rows)


def test_features_feed_similarity_pipeline(spark, media):
    """The stub embeddings flow into the similarity operators — the
    multimodal path composes with ANN end-to-end."""
    from geoscale_healthflow_etl_django_analytics_spark.functions.vectors import cosine

    feats = mm.extract_features(media).select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
        F.lit(0).alias("label"),
    )
    from geoscale_healthflow_etl_django_analytics_spark.operators.similarity import cosine_topk

    top = cosine_topk(feats, query_vec_id=int(feats.first().vec_id), k=3).collect()
    assert len(top) == 3
    assert all(-1.0 <= r.cosine_sim <= 1.0 for r in top)
