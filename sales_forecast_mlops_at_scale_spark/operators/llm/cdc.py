"""Content-defined chunking (CDC) dedup for binary columns — the
storage-dedup technique (LBFS/Venti lineage, FastCDC's simple ancestor)
that also powers blob-level dedup in multimodal training-data lakes:
chunk boundaries are set by the CONTENT (a rolling hash hitting a mask),
not by fixed offsets, so inserting bytes shifts boundaries only locally
and shared regions between assets still produce identical chunks.

Scheme (deliberately stateless so a SQL twin can restate it row-for-row;
production FastCDC adds min/max chunk clamps, which only change the
boundary predicate):

1. bytes ``b[0..n-1]``; for every window start ``p`` the Karp-Rabin hash
   ``rh(p) = fold_j (h·257 + b[p+j]) mod (2^31 − 1)`` over ``W=8`` bytes
   (the :mod:`winnow` polynomial, byte-valued instead of code-point)
2. a chunk boundary falls AFTER byte ``p+W−1`` wherever
   ``rh(p) % DIV == 0`` (``DIV=16`` → ≈16-byte average chunks at
   fixture blob sizes; production uses KiB-scale divisors)
3. chunks are the segments between boundaries; each chunk's digest is
   ``md5`` of its lowercase-hex encoding — a string both engines hash
   identically (the house blob convention, see the multimodal oracle)

Execution is the :mod:`winnow`-style Arrow kernel: one
``np.frombuffer`` per blob, ``W`` numpy passes for the rolling hash,
boundary mask → chunk slices; zero shuffle until the dedup rollup.

Scale shape: chunking is a pure per-row map; the rollup is one
map-side-combinable groupBy over ``(digest)`` — bounded by the distinct
chunk count, the same shape as exact text dedup.  For petabyte blob
stores the chunk table IS the dedup index (store once per digest,
reference-count the rest).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .winnow import POLY_BASE, POLY_MOD

CDC_WINDOW = 8
CDC_DIV = 16


def cdc_chunks(
    assets: DataFrame,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    w: int = CDC_WINDOW,
    div: int = CDC_DIV,
) -> DataFrame:
    """Per-chunk rows ``(asset_id, chunk_idx, chunk_len, chunk_digest)``.

    Blobs shorter than ``w`` bytes form a single chunk (no window fits,
    so no boundary can fire); NULL blobs produce no rows.
    """
    src = assets.select(F.col(id_col), F.col(content_col).alias("__c"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "chunk_idx": pd.Series(dtype="int32"),
                "chunk_len": pd.Series(dtype="int32"),
                "chunk_digest": pd.Series(dtype="object"),
            }
        )
        for pdf in batches:
            ids, idxs, lens, digs = [], [], [], []
            for aid, content in zip(pdf[id_col], pdf["__c"]):
                if content is None:
                    continue
                b = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.int64)
                n = len(b)
                if n == 0:
                    continue
                hexs = bytes(content).hex()
                npos = n - w + 1
                if npos > 0:
                    h = np.zeros(npos, dtype=np.int64)
                    for j in range(w):
                        h = (h * POLY_BASE + b[j : j + npos]) % POLY_MOD
                    # boundary AFTER byte p+w-1; a boundary at the blob's
                    # final byte is a no-op (the chunk ends there anyway)
                    ends = np.nonzero(h % div == 0)[0] + w - 1
                    starts = [0] + [int(e) + 1 for e in ends if int(e) + 1 < n]
                    # boundary collisions inside the first w-1 bytes of a
                    # chunk can't happen (windows overlap freely in this
                    # stateless scheme; duplicates removed via sort/uniq)
                    starts = sorted(set(starts))
                else:
                    starts = [0]
                bounds = starts + [n]
                for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                    ids.append(int(aid))
                    idxs.append(i)
                    lens.append(e - s)
                    digs.append(
                        hashlib.md5(hexs[2 * s : 2 * e].encode()).hexdigest()
                    )
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.asarray(ids, dtype=np.int64),
                        "chunk_idx": np.asarray(idxs, dtype=np.int32),
                        "chunk_len": np.asarray(lens, dtype=np.int32),
                        "chunk_digest": digs,
                    }
                )
            else:
                yield empty

    return src.mapInPandas(
        kernel,
        f"{id_col} long, chunk_idx int, chunk_len int, chunk_digest string",
    )


def cdc_dedup_stats(
    assets: DataFrame,
    *,
    id_col: str = "asset_id",
    content_col: str = "content",
    group_col: str = "modality",
    w: int = CDC_WINDOW,
    div: int = CDC_DIV,
) -> DataFrame:
    """Per-group chunk-level dedup rollup — the numbers a blob store
    reads to decide whether CDC pays: total vs distinct chunks/bytes.

    Output: ``group, n_assets, n_chunks, n_distinct_chunks, total_bytes,
    distinct_bytes, dedup_ratio`` (ratio = distinct/total bytes, 6
    digits; 1.0 = nothing shared).
    """
    chunks = cdc_chunks(
        assets, id_col=id_col, content_col=content_col, w=w, div=div
    ).join(assets.select(id_col, F.col(group_col).alias("grp")), id_col)
    per_digest = chunks.groupBy("grp", "chunk_digest").agg(
        F.count(F.lit(1)).alias("refs"),
        # same digest ⇒ same bytes ⇒ same length: first() is unique
        F.first("chunk_len").alias("clen"),
    )
    assets_per_grp = (
        assets.groupBy(F.col(group_col).alias("grp"))
        .agg(F.countDistinct(id_col).alias("n_assets"))
    )
    agg = per_digest.groupBy("grp").agg(
        F.sum("refs").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("refs") * F.col("clen")).cast("long").alias("total_bytes"),
        F.sum("clen").cast("long").alias("distinct_bytes"),
    )
    return (
        agg.join(assets_per_grp, "grp")
        .select(
            F.col("grp").alias(group_col),
            "n_assets",
            "n_chunks",
            "n_distinct_chunks",
            "total_bytes",
            "distinct_bytes",
            F.round(
                F.col("distinct_bytes") / F.col("total_bytes"), 6
            ).alias("dedup_ratio"),
        )
    )
