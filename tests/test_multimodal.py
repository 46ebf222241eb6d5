"""Multimodal plumbing tests: binary columns through mapInPandas, stub
decode determinism, digest dedup, and feature → similarity handoff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_forecast_mlops_at_scale_spark.operators.llm.embedsim import brute_force_topk
from sales_forecast_mlops_at_scale_spark.operators.llm.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    media_dedup_keys,
    synthetic_assets,
)


def test_extract_features_shape_and_determinism(spark):
    assets = synthetic_assets(spark, n=48)
    feats = extract_media_features(assets).orderBy("asset_id")
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.features)
    rows2 = extract_media_features(assets).orderBy("asset_id").collect()
    assert [r.content_digest for r in rows] == [r.content_digest for r in rows2]


def test_real_decode_is_explicitly_stubbed(spark):
    assets = synthetic_assets(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_media_features(assets, decode_fn="real").collect()


def test_digest_dedup_and_similarity_handoff(spark):
    assets = synthetic_assets(spark, n=24)
    # duplicate content under new ids → digest dedup must collapse them
    dup = assets.withColumn("asset_id", F.col("asset_id") + 1000)
    feats = extract_media_features(assets.unionByName(dup))
    keys = media_dedup_keys(feats)
    assert keys.count() == 24
    assert keys.filter(F.col("n_dups") != 2).count() == 0
    # features flow into the generic embedding similarity operator
    emb = feats.select(F.col("asset_id").alias("vec_id"), F.col("features").alias("embedding"))
    nn = brute_force_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    # each duplicated asset's twin is its top neighbor at score 1.0
    top = {r.q_id: (r.nn_id, r.score) for r in nn.filter(F.col("rank") == 1).collect()}
    assert top[0] == (1000, 1.0)
    assert top[1] == (1001, 1.0)
