"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media payloads are opaque ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schema, partition discipline,
Arrow-batched mapInPandas operators, batch shapes — is real and tested;
the codec step itself is gated: PIL/librosa/ffmpeg are not in this
container, so ``decode`` falls back to a clearly-marked deterministic
fake (or raises NotImplementedError when strict=True). Swapping in a
real codec changes one function body, not the pipeline.

Scale notes: payload bytes never pass through the driver; mapInPandas
streams Arrow record batches of ``batch_rows`` so executor memory is
bounded by batch_rows × max payload size; repartitioning is done on
media_id before any decode so one straggler file can't skew a partition
of heavyweight payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image codec, absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

#: media table schema: binary payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from sha256(media_id, seed)."""
    kinds = ["image", "audio", "video"]

    def rows():
        for i in range(n):
            kind = kinds[i % 3]
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
            meta = {
                "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                "width": 64 + (i % 8) * 16 if kind != "audio" else None,
                "height": 64 + (i % 5) * 16 if kind != "audio" else None,
                "duration_ms": (1000 + i * 37) if kind != "image" else None,
                "sample_rate": 16000 if kind == "audio" else None,
            }
            yield (i, kind, bytearray(payload), meta)

    return spark.createDataFrame(rows(), schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, out_dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a codec+encoder: sha256-seeded floats.
    STUB — replace with PIL/torchvision/librosa decode in production."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((out_dim * 4) // len(h) + 1))[: out_dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(
    media: DataFrame, batch_rows: int = 64, strict: bool = False
) -> DataFrame:
    """payload → float feature vector via Arrow-batched mapInPandas.

    strict=True raises NotImplementedError when no real codec is present
    (production posture); default uses the deterministic fake so the
    pipeline shape is testable end-to-end.
    """
    if strict and not HAVE_PIL:
        raise NotImplementedError(
            "no media codec in this environment — install PIL/librosa or run strict=False"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-chunk so a batch never exceeds batch_rows heavyweight rows
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": [len(p) for p in chunk["payload"]],
                        "features": [
                            _fake_decode(bytes(p)).tolist() for p in chunk["payload"]
                        ],
                    }
                )

    return media.select("media_id", "kind", "payload").mapInPandas(op, out_schema)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize plumbing: filters kind=image, rewrites meta dims,
    transforms payload via mapInPandas. STUB codec — payload passes
    through unchanged (PIL absent); meta reflects the target size."""
    images = media.filter(F.col("kind") == "image")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # real impl: Image.open(BytesIO(p)).resize((width, height))
            yield pdf.assign(width=width, height=height)

    schema = "media_id long, payload binary, width int, height int"
    return images.select("media_id", "payload").mapInPandas(op, schema)


def sample_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (codec-free — timestamps derive from meta.duration_ms; the
    frame payload extraction is the stubbed step)."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_embedding_topk(media: DataFrame, k: int = 3) -> DataFrame:
    """End-to-end: decode → feature vector → cosine top-k over the
    features (reuses the similarity operator — multimodal similarity
    search is the same plan shape as text embeddings)."""
    from degdb_spark.operators.similarity import brute_force_topk

    feats = extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    queries = feats.limit(k)
    return brute_force_topk(feats, queries, k=k)
