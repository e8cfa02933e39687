"""Multimodal contract queries over the CODEC-FREE parts of the media
pipeline (operators/multimodal.py): frame-timestamp sampling and
Arrow-batched payload statistics.

The synthetic media table is fully deterministic arithmetic —
kind = i%3, duration_ms = 1000+37i, payload length = 32·(4+i%7) — so
both queries replay exactly in DuckDB without any codec: the oracle
recomputes the expected values from the generators while the Spark side
runs the REAL pipeline (synthetic payload bytes through mapInPandas
batching). The decode step itself stays gated behind strict=True
(multimodal.extract_features) and is exactly what these queries do NOT
claim to verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.operators.multimodal import (
    extract_features,
    sample_video_frames,
    synthetic_media,
)
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import sql_dround

_N_MEDIA = 100


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling summary: per video, how many 500 ms frame
    timestamps and the last one — the codec-free half of video decode
    (timestamps derive from meta.duration_ms, never the payload)."""
    media = synthetic_media(spark, _N_MEDIA)
    frames = sample_video_frames(media, every_ms=500)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_ts_ms").cast("long").alias("max_ts_ms"),
        )
        .orderBy("media_id")
    )


FRAME_SQL = f"""
WITH media AS (
  SELECT i AS media_id, 1000 + i * 37 AS duration_ms
  FROM generate_series(0, {_N_MEDIA - 1}) t(i)
  WHERE i % 3 = 2
),
frames AS (
  SELECT media_id, unnest(generate_series(0, duration_ms, 500)) AS frame_ts_ms
  FROM media
)
SELECT media_id, COUNT(*) AS n_frames, CAST(MAX(frame_ts_ms) AS BIGINT) AS max_ts_ms
FROM frames GROUP BY media_id ORDER BY media_id
"""


def media_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind payload statistics THROUGH the Arrow mapInPandas feature
    operator — n_bytes is computed executor-side from the actual binary
    payloads, so this drives the real batching plumbing."""
    media = synthetic_media(spark, _N_MEDIA)
    feats = extract_features(media, batch_rows=16)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            (
                F.floor(
                    F.sum("n_bytes").cast("double") / F.count(F.lit(1)) * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("avg_bytes"),
        )
        .orderBy("kind")
    )


PAYLOAD_SQL = f"""
WITH media AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         32 * (4 + i % 7) AS n_bytes
  FROM generate_series(0, {_N_MEDIA - 1}) t(i)
)
SELECT kind, COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       {sql_dround('SUM(n_bytes)::DOUBLE / COUNT(*)', 4)} AS avg_bytes
FROM media GROUP BY kind ORDER BY kind
"""


QUERIES: dict[str, Query] = {
    "media_frame_sample": Query(media_frame_sample, FRAME_SQL),
    "media_payload_stats": Query(media_payload_stats, PAYLOAD_SQL),
}
