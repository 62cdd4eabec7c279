"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference is tabular-only; a training-data pipeline carries media.
Contract here:

- media lives in a ``binary`` column (``content``) with a struct
  metadata column (``media_meta``: mime, width/height or
  sample_rate/duration, codec) — the schema every operator agrees on;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so bytes never cross the Python boundary
  row-at-a-time;
- the actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
  the decode kernel is pluggable: the default is a deterministic fake
  (stable per content hash) clearly marked below; a real kernel drops
  in without touching the Spark plumbing.

Scale notes: binary columns make wide rows — keep media tables
separate from text/metadata tables and join on id (column pruning then
keeps media bytes out of every query that doesn't need them);
``spark.sql.files.maxPartitionBytes`` bounds scan partition size, and
``mapInPandas`` streams batches (no whole-partition materialization).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(content: bytes, meta) -> "object":
    """Decode bytes → pixel array. REAL CODECS UNAVAILABLE IN THIS
    ENVIRONMENT — a production deployment plugs PIL/torchvision here.
    """
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not installed; "
        "use fake_image_features for deterministic pipeline testing"
    )


def fake_image_features(content: bytes, dim: int = 8) -> list[float]:
    """DETERMINISTIC FAKE feature extractor (stands in for a decoded
    CNN/CLIP embedding): sha256 of the bytes, folded into ``dim``
    floats in [0,1). Stable across runs/executors — lets every
    downstream stage (dedup, ANN, joins) be tested for real."""
    digest = hashlib.sha256(content or b"").digest()
    out = []
    for i in range(dim):
        chunk = digest[(4 * i) % 32 : (4 * i) % 32 + 4]
        out.append(int.from_bytes(chunk, "big") / 2**32)
    return out


def extract_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media rows.

    Arrow-batched: each pandas batch holds ~10k rows of (id, bytes);
    the kernel is a plain Python function over bytes, swapped for a GPU
    / PIL implementation in production. Output schema is fixed
    (IMAGE_FEATURES_SCHEMA) so downstream plans are stable either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [
                        hashlib.sha256(b or b"").hexdigest() for b in content
                    ],
                    "n_bytes": [len(b or b"") for b in content],
                    "feature": [fake_image_features(b, dim) for b in content],
                }
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def decode_audio(content: bytes, meta) -> "object":
    """Decode bytes → waveform. REAL CODECS UNAVAILABLE IN THIS
    ENVIRONMENT — a production deployment plugs librosa/ffmpeg here."""
    raise NotImplementedError(
        "audio decode requires librosa/ffmpeg — not installed; "
        "use extract_audio_features' deterministic fake kernel"
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_audio_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas audio featurization — same Arrow-batched plumbing as
    images, with sample_rate carried through from metadata (the fake
    kernel stands in for an MFCC/wav2vec embedding)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [
                        hashlib.sha256(b or b"").hexdigest() for b in content
                    ],
                    "n_bytes": [len(b or b"") for b in content],
                    "sample_rate": pdf["sample_rate"],
                    "feature": [fake_image_features(b, dim) for b in content],
                }
            )

    flat = media.select(
        "media_id", "content", F.col("media_meta.sample_rate").alias("sample_rate")
    )
    return flat.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def resize_image_plan(media: DataFrame, max_w: int = 512, max_h: int = 512) -> DataFrame:
    """Image-resize *plan*: target dimensions computed JVM-side from
    metadata (aspect-preserving fit into max_w×max_h, integer floor);
    the pixel resample itself is the pluggable decode kernel. Keeps the
    expensive part (per-image target geometry + filtering of no-op
    resizes) in codegen."""
    w = F.col("media_meta.width").cast("double")
    h = F.col("media_meta.height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0))
    return media.filter(w.isNotNull() & h.isNotNull()).select(
        "media_id",
        F.col("media_meta.width").alias("src_w"),
        F.col("media_meta.height").alias("src_h"),
        F.floor(w * scale).cast("int").alias("dst_w"),
        F.floor(h * scale).cast("int").alias("dst_h"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, computed from metadata only (no decode): duration /
    every_ms frames via sequence+explode. The decode of each frame is
    the pluggable kernel (NotImplemented here); the row fan-out, which
    is the Spark-side hard part, is real and tested."""
    return (
        media.select(
            "media_id",
            F.col("media_meta.duration_ms").alias("duration_ms"),
        )
        .filter(F.col("duration_ms") >= 1)  # NULL and zero-length media drop out
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only profiling (no Python): bytes, mime distribution.
    Stays entirely JVM-side — binary column length via F.length."""
    return media.groupBy(F.col("media_meta.mime").alias("mime")).agg(
        F.count("*").alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.avg(F.length("content")).alias("avg_bytes"),
    )


def image_near_dups(
    media: DataFrame,
    threshold: float = 0.95,
    dim: int = 8,
    num_planes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Image near-duplicate pairs: feature-extract (mapInPandas kernel,
    fake here / CLIP-style in production) → sign-bit LSH banding →
    exact cosine on band candidates only — the multimodal face of the
    text near-dup plan, composed from ``extract_image_features`` and
    ``similarity.lsh_cosine_pairs`` (no new join machinery).

    Output: (id_a, id_b, cosine_sim). Exact byte-dups additionally
    share ``sha256`` (catch those first with the cheaper
    ``dedup_exact_hashed`` on the digest — identical bytes always
    reach cosine 1.0 here, but hashing is a scan, not a join).

    At 100 TB the feature extraction is the cost center (GPU batch per
    partition); everything after moves (id, dim floats) only.
    """
    from .similarity import lsh_cosine_pairs

    feats = extract_image_features(media, dim).select(
        "media_id", F.col("feature").alias("embedding")
    )
    return lsh_cosine_pairs(
        feats,
        id_col="media_id",
        vec_col="embedding",
        threshold=threshold,
        num_planes=num_planes,
        bands=bands,
    )
