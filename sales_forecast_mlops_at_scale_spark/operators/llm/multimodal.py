"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Design (the 100 TB shape):

- Media bytes live in a ``binary`` column (or object-store URIs with
  bytes fetched in-executor); metadata (modality, dims, duration) are
  first-class typed columns, so filters like "images wider than 512px"
  prune **before** any decode.
- Decode / feature-extract run as ``mapInPandas`` — one Arrow batch of
  rows in, one out, so Python cost is amortized per-batch and memory is
  bounded by batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``
  is the backstop against huge videos: lower it for wide binaries).
- Repartition by size before decode when assets are skewed — one 4 GB
  video next to thumbnails makes a straggler task.

The actual codecs (PIL/ffmpeg/librosa) are not in this container, so
``decode_fn='stub'`` computes deterministic pseudo-features from the raw
bytes (real plumbing, fake math — clearly marked); ``decode_fn='real'``
raises ``NotImplementedError`` at the decode site.  Swapping in a real
decoder changes ONE function, not the dataflow.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ...schemas import MEDIA_ASSETS

FEATURE_DIM = 8

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake asset table matching MEDIA_ASSETS — bytes are a
    seeded digest expansion so tests have stable content without shipping
    media files."""
    modalities = ("image", "audio", "video")

    def make_row(i: int):
        m = modalities[i % 3]
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 5)
        return (
            i,
            m,
            f"mem://assets/{m}/{i}",
            bytearray(content),
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[m],
            64 + (i % 8) * 32 if m == "image" else None,
            64 + (i % 5) * 32 if m == "image" else None,
            None if m == "image" else 1000 * (1 + i % 30),
            {"seed": str(i)},
        )

    return spark.createDataFrame([make_row(i) for i in range(n)], MEDIA_ASSETS)


#: Committed parquet snapshot of ``synthetic_assets(n=64)`` — gives the
#: driver's DuckDB oracle a shared on-disk input (sha256 over the same
#: BLOBs) instead of an un-oracle-able in-memory frame.
MEDIA_FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures_data",
    "media_assets.parquet",
)


def media_assets_fixture(spark: SparkSession) -> DataFrame:
    """Load the committed media-asset fixture (64 deterministic assets,
    identical content to ``synthetic_assets(spark, n=64)``)."""
    return spark.read.parquet(MEDIA_FIXTURE_PATH)


def _stub_features(content: bytes) -> list[float]:
    """Deterministic pseudo-embedding from raw bytes (stands in for a real
    decode→model pass; same shape, stable values)."""
    d = hashlib.sha256(content).digest()
    return [d[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_media_features(
    assets: DataFrame,
    *,
    decode_fn: str = "stub",
    batch_hint: int | None = None,
) -> DataFrame:
    """Per-asset feature extraction via ``mapInPandas``.

    Output: MEDIA_FEATURES (id, modality, byte count, content digest,
    FEATURE_DIM-float feature vector).  The feature column feeds directly
    into ``embedsim.brute_force_topk`` / ``ivf_topk`` — multimodal dedup
    is "extract features, then embedding-dedup".
    """
    if decode_fn not in ("stub", "real"):
        raise ValueError(f"unknown decode_fn: {decode_fn}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn == "real":
                # Real decoders (PIL / ffmpeg / librosa) are not available
                # in this environment — see module docstring.
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg/librosa in executors"
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(len).astype("int64"),
                    # digest of the lowercase-hex encoding (not the raw
                    # bytes): injective, so dedup identity is unchanged,
                    # and every SQL engine can recompute it over a BLOB
                    # column via sha256(lower(hex(content))) — DuckDB's
                    # sha256 only accepts VARCHAR
                    "content_digest": content.map(
                        lambda b: hashlib.sha256(bytes(b).hex().encode()).hexdigest()
                    ),
                    "features": content.map(lambda b: _stub_features(bytes(b))),
                }
            )

    out = assets.select("asset_id", "modality", "content")
    if batch_hint:
        out = out.repartition(batch_hint)
    return out.mapInPandas(process, MEDIA_FEATURES)


def media_dedup_keys(features: DataFrame) -> DataFrame:
    """Exact multimodal dedup: group by content digest (the binary twin of
    text exact-dedup), keep lowest asset_id."""
    return features.groupBy("content_digest").agg(
        F.min("asset_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )
