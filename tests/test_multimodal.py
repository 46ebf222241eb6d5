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


def test_bmp_wav_really_decoded(spark):
    """BMP/WAV header fields decoded in-executor match the generator's
    parameters exactly; video rows keep -1 sentinels."""
    assets = synthetic_assets(spark, n=12)
    feats = {r.asset_id: r for r in extract_media_features(assets).collect()}
    for i, r in feats.items():
        if r.modality == "image":
            assert r.decoded
            assert (r.width, r.height) == (8 + (i % 8) * 4, 6 + (i % 5) * 4)
            assert r.channels == 3 and r.sample_rate == -1
            assert r.payload_sum > 0
        elif r.modality == "audio":
            assert r.decoded
            assert r.sample_rate == (8000, 11025, 16000, 22050, 24000)[i % 5]
            assert r.n_samples == 400 + (i % 7) * 100
            assert r.channels == 1 and r.width == -1
        else:
            assert not r.decoded
            assert r.width == r.payload_sum == -1


def test_ppm_decoder_roundtrip():
    from sales_forecast_mlops_at_scale_spark.operators.llm.multimodal import (
        _decode_asset,
        make_ppm,
    )

    d = _decode_asset(make_ppm(9, 5, "x"), strict=True)
    assert (d["width"], d["height"], d["channels"]) == (9, 5, 3)
    # comment lines in the header are skipped
    d2 = _decode_asset(b"P6\n# a comment\n3 2\n255\n" + bytes(18), strict=True)
    assert (d2["width"], d2["height"], d2["payload_sum"]) == (3, 2, 0)


def test_auto_decode_degrades_on_malformed_containers(spark):
    """A corrupt or accidentally magic-prefixed asset must degrade to
    decoded=false in auto mode (never fail the job) and raise only under
    strict mode."""
    from sales_forecast_mlops_at_scale_spark.operators.llm.multimodal import (
        _decode_asset,
    )

    malformed = [
        b"BM" + b"\x01" * 10,  # truncated BMP header
        b"P6\n9 9\n70000\n" + bytes(10),  # 16-bit PPM
        b"RIFF" + bytes(4) + b"WAVE" + bytes(4),  # missing fmt/data
    ]
    for b in malformed:
        d = _decode_asset(b, strict=False)
        assert d["decoded"] is False and d["width"] == -1
        import pytest as _pytest

        with _pytest.raises((ValueError, NotImplementedError)):
            _decode_asset(b, strict=True)


def test_strict_real_decode_raises_only_for_codec_less_formats(spark):
    assets = synthetic_assets(spark, n=6)
    decodable = assets.filter(F.col("modality") != "video")
    rows = extract_media_features(decodable, decode_fn="real").collect()
    assert all(r.decoded for r in rows)
    with pytest.raises(Exception, match="NotImplementedError|no in-container codec"):
        extract_media_features(
            assets.filter(F.col("modality") == "video"), decode_fn="real"
        ).collect()


def test_frame_sampling_grid_and_determinism(spark):
    from sales_forecast_mlops_at_scale_spark.operators.llm.multimodal import (
        sample_frames,
    )

    assets = synthetic_assets(spark, n=12)
    frames = sample_frames(assets, every_ms=1000)
    rows = frames.collect()
    vids = {r.asset_id: r for r in assets.filter("modality = 'video'").collect()}
    assert {r.asset_id for r in rows} == set(vids)
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, rs in by_asset.items():
        assert len(rs) == vids[aid].duration_ms // 1000 + 1  # grid size
        assert sorted(r.ts_ms for r in rs) == [i * 1000 for i in range(len(rs))]
        assert all(len(r.frame_features) == 4 for r in rs)
        assert all(0.0 <= x <= 1.0 for r in rs for x in r.frame_features)
    again = sample_frames(assets, every_ms=1000).collect()
    assert {r.frame_digest for r in again} == {r.frame_digest for r in rows}


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


def test_perceptual_dhash_catches_what_digest_dedup_misses(spark):
    """Byte-padded + pixel-perturbed copies: sha256 digests all differ
    (exact dedup finds nothing), but the perceptual tier pairs each
    original with both variants within the Hamming budget."""
    from sales_forecast_mlops_at_scale_spark.operators.llm.multimodal import (
        make_bmp,
        make_wav,
        media_neardup_pairs,
        perceptual_hashes,
    )

    img = make_bmp(18, 16, "orig")
    img_padded = img + b"\x00\x07"          # container tail junk
    perturbed = bytearray(img)
    perturbed[60] = (perturbed[60] + 1) % 256  # one pixel byte nudged
    wav = make_wav(16000, 700, "orig")
    wav_padded = wav + b"\x00"
    other_img = make_bmp(18, 16, "different")

    rows = [
        (0, "image", bytearray(img)),
        (1, "image", bytearray(img_padded)),
        (2, "image", bytes(perturbed)),
        (3, "image", bytearray(other_img)),
        (10, "audio", bytearray(wav)),
        (11, "audio", bytearray(wav_padded)),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, modality string, content binary"
    )
    hashes = perceptual_hashes(assets)
    got = {r.asset_id: r.phash_hex for r in hashes.collect()}
    assert set(got) == {0, 1, 2, 3, 10, 11}
    assert got[0] == got[1]              # padding: identical pixels
    assert got[10] == got[11]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in media_neardup_pairs(hashes, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(10, 11)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 3  # perturbed copy found
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated image
