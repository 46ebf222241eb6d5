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

Decode is REAL for container formats a pure-stdlib parser can handle —
BMP (uncompressed 24-bpp), binary PPM (P6), and PCM WAV — and honestly
stubbed for formats that need an external codec (mp4 etc.):

- ``decode_fn='auto'`` (default): dispatch on magic bytes; decodable
  assets get real header fields (width/height/channels/sample-rate/
  sample-count) plus an exact payload byte-sum computed from the decoded
  payload region; non-decodable assets fall back to the stub features
  with ``decoded = false`` and ``-1`` sentinels (not NULL — so the
  differential hash compare is engine-exact).
- ``decode_fn='stub'``: no decode at all — deterministic pseudo-features
  from the raw bytes (real plumbing, fake math — clearly marked).
- ``decode_fn='real'``: strict — raises ``NotImplementedError`` for any
  asset whose format has no in-container codec (mp4/mkv/jpeg/...).

Swapping in a full decoder (PIL/ffmpeg) changes ONE function
(:func:`_decode_asset`), not the dataflow.
"""

from __future__ import annotations

import hashlib
import os
import struct
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
        T.StructField("decoded", T.BooleanType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("payload_sum", T.LongType()),
    ]
)

#: Decode fields with their -1 "not decoded" sentinels.
_NO_DECODE = {
    "decoded": False,
    "width": -1,
    "height": -1,
    "channels": -1,
    "sample_rate": -1,
    "n_samples": -1,
    "payload_sum": -1,
}


# --- pure-stdlib decoders ------------------------------------------------
#
# Each returns the _NO_DECODE field dict with real values filled in, or
# raises ValueError on a malformed container.  payload_sum is the exact
# integer sum of the decoded payload bytes (pixel array / PCM data) — an
# integer a SQL oracle can recompute byte-for-byte, unlike a float mean
# whose rounding could tie-break differently across engines.


def make_bmp(width: int, height: int, tag: str) -> bytes:
    """Minimal uncompressed 24-bpp bottom-up BMP with deterministic
    pseudo-random pixels (sha256 stream seeded by ``tag``)."""
    row = (3 * width + 3) // 4 * 4  # rows pad to 4-byte boundaries
    pix = _stream_bytes(f"bmp-{tag}", row * height)
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return file_header + info_header + pix


def make_ppm(width: int, height: int, tag: str) -> bytes:
    """Binary PPM (P6, maxval 255) with deterministic pixels."""
    return (
        f"P6\n{width} {height}\n255\n".encode()
        + _stream_bytes(f"ppm-{tag}", 3 * width * height)
    )


def make_wav(sample_rate: int, n_samples: int, tag: str) -> bytes:
    """Canonical 44-byte-header PCM WAV, 8-bit unsigned mono."""
    data = _stream_bytes(f"wav-{tag}", n_samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _stream_bytes(tag: str, n: int) -> bytes:
    out = bytearray()
    k = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}-{k}".encode()).digest()
        k += 1
    return bytes(out[:n])


def _decode_bmp(b: bytes) -> dict:
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    payload = b[pix_off:]
    return {
        "decoded": True,
        "width": width,
        "height": abs(height),  # negative height = top-down row order
        "channels": bpp // 8,
        "sample_rate": -1,
        "n_samples": -1,
        "payload_sum": sum(payload),
    }


def _decode_ppm(b: bytes) -> dict:
    # header: P6, then width/height/maxval as whitespace-separated ASCII
    # tokens ('#' comment lines allowed), then ONE whitespace byte, then
    # binary RGB triples
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    payload = b[pos + 1 : pos + 1 + 3 * width * height]
    return {
        "decoded": True,
        "width": width,
        "height": height,
        "channels": 3,
        "sample_rate": -1,
        "n_samples": -1,
        "payload_sum": sum(payload),
    }


def _decode_wav(b: bytes) -> dict:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):  # chunk walk: [id u32][size u32][payload]
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"non-PCM WAV format {audio_format}")
    return {
        "decoded": True,
        "width": -1,
        "height": -1,
        "channels": n_channels,
        "sample_rate": sample_rate,
        "n_samples": len(data) // max(1, n_channels * (bits // 8)),
        "payload_sum": sum(data),
    }


def _decode_asset(b: bytes, strict: bool) -> dict:
    """Magic-byte dispatch to the stdlib decoders.  ``strict`` raises for
    formats with no in-container codec AND for malformed containers;
    otherwise both fall back to the -1 sentinels with
    ``decoded = false`` — a corrupt (or accidentally magic-prefixed)
    asset must degrade to "not decoded", never fail the whole job (at
    corpus scale a random 2-byte 'BM' prefix occurs at ~2^-16 per
    opaque asset)."""
    try:
        if b[:2] == b"BM":
            return _decode_bmp(b)
        if b[:2] == b"P6":
            return _decode_ppm(b)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _decode_wav(b)
    except (ValueError, IndexError, struct.error):
        if strict:
            raise
        return dict(_NO_DECODE)
    if strict:
        # mp4/mkv/jpeg/... genuinely need PIL/ffmpeg, absent here — see
        # module docstring
        raise NotImplementedError(
            f"no in-container codec for media magic {b[:8]!r} "
            "(real decode of compressed formats requires PIL/ffmpeg)"
        )
    return dict(_NO_DECODE)


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic asset table matching MEDIA_ASSETS.  Image and audio
    rows carry REAL decodable containers (24-bpp BMP, 8-bit PCM WAV —
    generated in pure stdlib, so no media files ship with the repo);
    video rows are an opaque digest expansion standing in for a format
    (mp4) that has no in-container codec."""
    modalities = ("image", "audio", "video")

    def make_row(i: int):
        m = modalities[i % 3]
        if m == "image":
            w, h = 8 + (i % 8) * 4, 6 + (i % 5) * 4
            content, mime = make_bmp(w, h, str(i)), "image/bmp"
            duration = None
        elif m == "audio":
            sr = (8000, 11025, 16000, 22050, 24000)[i % 5]
            ns = 400 + (i % 7) * 100
            content, mime = make_wav(sr, ns, str(i)), "audio/wav"
            w = h = None
            duration = ns * 1000 // sr
        else:
            content = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 5)
            mime, w, h = "video/mp4", None, None
            duration = 1000 * (1 + i % 30)
        return (
            i,
            m,
            f"mem://assets/{m}/{i}",
            bytearray(content),
            mime,
            w,
            h,
            duration,
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
    decode_fn: str = "auto",
    batch_hint: int | None = None,
) -> DataFrame:
    """Per-asset decode + feature extraction via ``mapInPandas``.

    Output: MEDIA_FEATURES — identity/digest columns, the FEATURE_DIM
    pseudo-embedding (a deterministic stand-in for a model forward pass),
    and the REAL decoded header fields for BMP/PPM/WAV assets
    (``decoded, width, height, channels, sample_rate, n_samples,
    payload_sum``; -1 sentinels when not decodable).  The feature column
    feeds directly into ``embedsim.brute_force_topk`` / ``ivf_topk`` —
    multimodal dedup is "extract features, then embedding-dedup".
    """
    if decode_fn not in ("stub", "auto", "real"):
        raise ValueError(f"unknown decode_fn: {decode_fn}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            if decode_fn == "stub":
                decoded = [dict(_NO_DECODE) for _ in range(len(pdf))]
            else:
                decoded = [
                    _decode_asset(bytes(b), strict=decode_fn == "real")
                    for b in content
                ]
            dec = pd.DataFrame(decoded, index=pdf.index)
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
                    **{c: dec[c] for c in _NO_DECODE},
                }
            )

    out = assets.select("asset_id", "modality", "content")
    if batch_hint:
        out = out.repartition(batch_hint)
    return out.mapInPandas(process, MEDIA_FEATURES)


def sample_frames(
    assets: DataFrame,
    *,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame sampling for video assets — one row per sampled timestamp.

    The frame GRID is pure metadata (``duration_ms`` // ``every_ms`` + 1
    frames on an ``every_ms`` grid), so the expansion is a JVM
    ``explode(sequence(...))`` — no bytes are touched until a downstream
    consumer decodes a specific frame, which is exactly the order you
    want at 100 TB (sample → filter on frame metadata → decode the few
    survivors).  The per-frame payload here is a STUB: a deterministic
    digest chain ``md5(content_digest || '-' || frame_idx)`` standing in
    for the ffmpeg frame grab (absent in this container), plus a small
    pseudo-feature vector derived from it — both reproducible by any
    SQL engine, so the whole sampling dataflow is oracle-checked even
    though the codec is faked.  Swapping in real extraction replaces the
    digest column with a ``mapInPandas`` over (content, ts_ms) — the
    grid, partitioning, and output contract stay identical.

    Output: ``asset_id, frame_idx, ts_ms, frame_digest, frame_features``.
    """
    vids = assets.filter(
        (F.col("modality") == "video")
        & F.col("duration_ms").isNotNull()
        # negative-sentinel durations (unknown length) sample no frames
        & (F.col("duration_ms") >= 0)
    ).select(
        "asset_id",
        "duration_ms",
        F.sha2(F.lower(F.hex(F.col("content"))), 256).alias("content_digest"),
    )
    n_frames = (F.col("duration_ms") / every_ms).cast("long") + 1
    frames = vids.select(
        "asset_id",
        "content_digest",
        F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias("frame_idx"),
    )
    fd = F.md5(F.concat_ws("-", "content_digest", "frame_idx"))
    return (
        frames.withColumn("ts_ms", F.col("frame_idx") * every_ms)
        .withColumn("frame_digest", fd)
        .withColumn(
            "frame_features",
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                # nibble-pair of the digest as a [0, 1) float — the same
                # stub-feature recipe as _stub_features, engine-portable
                lambda i: F.round(
                    F.conv(F.substring(F.col("frame_digest"), i * 2 + 1, 2), 16, 10)
                    .cast("double")
                    / 255.0,
                    6,
                ),
            ),
        )
        .select("asset_id", "frame_idx", "ts_ms", "frame_digest", "frame_features")
    )


def media_dedup_keys(features: DataFrame) -> DataFrame:
    """Exact multimodal dedup: group by content digest (the binary twin of
    text exact-dedup), keep lowest asset_id."""
    return features.groupBy("content_digest").agg(
        F.min("asset_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


# --- perceptual hashing (dHash) over the REAL decode ---------------------
#
# The exact-digest dedup above misses re-encoded / lightly-edited media.
# dHash (difference hash) is the standard cheap perceptual tier: compare
# adjacent downsampled cells, 1 bit per comparison, 64 bits per asset;
# near-duplicates land within a small Hamming radius.  Everything here is
# INTEGER-EXACT so a SQL oracle reproduces the bits: grayscale is the
# plain channel sum r+g+b (no luma weights, no division), cells are
# floor-boundary blocks, and "mean(cell b) > mean(cell a)" is evaluated
# as the cross-multiplication sum_b·n_a > sum_a·n_b — no float touches
# any bit.  Images use the classic 8-row × 9-col grid (8 comparisons per
# row); audio uses the 1-D analogue over 65 sample blocks.  Cells can be
# EMPTY when an image is smaller than the grid (fixture has 6-px-high
# images): an empty cell has sum = n = 0, so both cross-products are 0
# and the bit is deterministically 0 — same on both engines.

PHASH_COLS = 9
PHASH_ROWS = 8
PHASH_AUDIO_BLOCKS = 65


def _gray_bmp(b: bytes):
    """(H, W) int64 grayscale (r+g+b) matrix of an uncompressed 24-bpp
    BMP, top-down row order."""
    import numpy as np

    pix_off = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    h = abs(height)
    stride = (3 * width + 3) // 4 * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : 3 * width].astype(np.int64)
    gray = rows.reshape(h, width, 3).sum(axis=2)
    if height > 0:  # bottom-up storage -> flip to top-down
        gray = gray[::-1]
    return gray


def _gray_ppm(b: bytes):
    """(H, W) grayscale matrix of a binary P6 PPM (maxval ≤ 255)."""
    import numpy as np

    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    width, height, _ = fields
    pix = np.frombuffer(
        b, dtype=np.uint8, count=3 * width * height, offset=pos + 1
    ).astype(np.int64)
    return pix.reshape(height, width, 3).sum(axis=2)


def _samples_wav(b: bytes):
    """int64 sample vector of an 8-bit PCM WAV (chunk-walked)."""
    import numpy as np

    pos, data = 12, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        if cid == b"data":
            data = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("missing data chunk")
    return np.frombuffer(data, dtype=np.uint8).astype(np.int64)


def _dhash_bits_2d(gray) -> list[bool]:
    """64 gradient bits from the 8×9 floor-boundary cell grid: bit
    (i, j) = mean(cell[i][j+1]) > mean(cell[i][j]), cross-multiplied."""
    h, w = gray.shape
    ys = [i * h // PHASH_ROWS for i in range(PHASH_ROWS + 1)]
    xs = [j * w // PHASH_COLS for j in range(PHASH_COLS + 1)]
    sums = [
        [int(gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].sum()) for j in range(PHASH_COLS)]
        for i in range(PHASH_ROWS)
    ]
    cnts = [
        [
            (ys[i + 1] - ys[i]) * (xs[j + 1] - xs[j])
            for j in range(PHASH_COLS)
        ]
        for i in range(PHASH_ROWS)
    ]
    return [
        sums[i][j + 1] * cnts[i][j] > sums[i][j] * cnts[i][j + 1]
        for i in range(PHASH_ROWS)
        for j in range(PHASH_COLS - 1)
    ]


def _dhash_bits_1d(samples) -> list[bool]:
    """64 gradient bits from 65 floor-boundary sample blocks."""
    n = len(samples)
    es = [j * n // PHASH_AUDIO_BLOCKS for j in range(PHASH_AUDIO_BLOCKS + 1)]
    sums = [int(samples[es[j] : es[j + 1]].sum()) for j in range(PHASH_AUDIO_BLOCKS)]
    cnts = [es[j + 1] - es[j] for j in range(PHASH_AUDIO_BLOCKS)]
    return [
        sums[j + 1] * cnts[j] > sums[j] * cnts[j + 1]
        for j in range(PHASH_AUDIO_BLOCKS - 1)
    ]


def _pack_bits(bits: list[bool]) -> tuple[int, int, str]:
    """(ph_hi, ph_lo, hex): bit k of the 64-bit value is bits[k]; hi/lo
    are unsigned 32-bit halves carried in longs (the simhash convention
    — no int64 sign games), hex is the 16-char big-endian rendering."""
    v = 0
    for k, bit in enumerate(bits):
        if bit:
            v |= 1 << k
    hi, lo = v >> 32, v & 0xFFFFFFFF
    return hi, lo, f"{hi:08x}{lo:08x}"


def perceptual_hashes(assets: DataFrame) -> DataFrame:
    """Per-decodable-asset 64-bit dHash: ``asset_id, modality, ph_hi,
    ph_lo, phash_hex``.  Images (BMP/PPM) use the 2-D 8×9 gradient grid;
    audio (PCM WAV) the 1-D 65-block analogue; assets with no
    in-container codec (video here) emit nothing — filter upstream on
    the typed metadata before decode, as always.

    Scale shape: one ``mapInPandas`` pass over (asset_id, modality,
    content); per-task memory is one Arrow batch of assets; output is 2
    longs + a 16-char string per asset — the downstream Hamming pair
    search never touches bytes again."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "modality": [], "ph_hi": [], "ph_lo": [],
                   "phash_hex": []}
            # explicit dtypes: a partition where EVERY asset is skipped
            # (all-video) must still yield typed (empty) Arrow columns,
            # not object-dtype ones
            dtypes = {"asset_id": "int64", "modality": "object",
                      "ph_hi": "int64", "ph_lo": "int64",
                      "phash_hex": "object"}
            for aid, mod, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                b = bytes(content)
                try:
                    if b[:2] == b"BM":
                        bits = _dhash_bits_2d(_gray_bmp(b))
                    elif b[:2] == b"P6":
                        bits = _dhash_bits_2d(_gray_ppm(b))
                    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        bits = _dhash_bits_1d(_samples_wav(b))
                    else:
                        continue
                except (ValueError, IndexError, struct.error):
                    continue  # corrupt container -> no perceptual tier
                hi, lo, hx = _pack_bits(bits)
                out["asset_id"].append(aid)
                out["modality"].append(mod)
                out["ph_hi"].append(hi)
                out["ph_lo"].append(lo)
                out["phash_hex"].append(hx)
            yield pd.DataFrame(
                {c: pd.Series(v, dtype=dtypes[c]) for c, v in out.items()}
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(
        process,
        "asset_id long, modality string, ph_hi long, ph_lo long, "
        "phash_hex string",
    )


def media_neardup_pairs(
    hashes: DataFrame, *, max_hamming: int = 3
) -> DataFrame:
    """Perceptual near-duplicate pairs within a modality: ``modality,
    id_a, id_b, hamming`` for Hamming distance ≤ ``max_hamming``.

    Same pigeonhole shape as :func:`simhash.simhash_pairs` — 4×16-bit
    chunk buckets (exact for ``max_hamming ≤ 3``), equi-join on
    (modality, chunk index, chunk value), ``bit_count`` verify — so the
    candidate generation is #assets × 4 bucket rows, never all-pairs."""
    from ...cache import persist_slot
    from .simhash import CHUNKS, _chunk

    # the hash frame feeds BOTH sides of the pigeonhole self-join; under
    # a broadcast join (the local-mode plan) exchange reuse cannot kick
    # in, so an unpersisted frame re-runs the decode+dHash mapInPandas
    # pass once per side.  Same fix/lifetime contract as
    # ``simhash_pairs``'s signature persist.
    hashes = persist_slot("media.phash", hashes)
    chunked = hashes.select(
        "asset_id",
        "modality",
        "ph_hi",
        "ph_lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _chunk(F.col("ph_hi"), F.col("ph_lo"), j).alias("cv"),
                    )
                    for j in range(CHUNKS)
                ]
            )
        ).alias("c"),
    ).select(
        "asset_id", "modality", "ph_hi", "ph_lo",
        F.col("c.j").alias("j"), F.col("c.cv").alias("cv"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    hamming = F.bit_count(
        F.col("a.ph_hi").bitwiseXOR(F.col("b.ph_hi"))
    ) + F.bit_count(F.col("a.ph_lo").bitwiseXOR(F.col("b.ph_lo")))
    return (
        a.join(
            b,
            (F.col("a.modality") == F.col("b.modality"))
            & (F.col("a.j") == F.col("b.j"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.modality").alias("modality"),
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
