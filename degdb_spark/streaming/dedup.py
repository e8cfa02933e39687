"""Streaming deduplication for document ingest.

At 100 TB the dedup pass of a training-data pipeline IS a stream: new
crawl shards arrive continuously and each document must be admitted or
dropped against what already streamed past. Two tiers, mirroring the
batch operators in operators/dedup.py:

- exact:    fingerprint (md5 of normalized text) +
            dropDuplicatesWithinWatermark — exactly one survivor per
            fingerprint inside the watermark horizon; state is one
            (fingerprint) entry per distinct doc in the horizon.
- near-dup: full MinHash band signature (all bands joined) as the drop
            key. Equality of the FULL signature ≈ very high Jaccard —
            the conservative streaming policy (precision over recall:
            a stream can't do the batch path's candidate-join +
            verify). Batch `minhash_lsh_candidates` remains the recall
            instrument; this stage cheaply absorbs the flood of
            true/near-exact duplicates at ingest so the periodic batch
            near-dedup compacts far less data.

Both stages are single stateful operators keyed by a fixed-width hash —
state size is bounded by (watermark horizon × distinct-doc rate),
independent of corpus size, and the shuffle key never carries document
text. Scale knob: the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.dedup import minhash_band_hashes
from degdb_spark.operators.text import fingerprint


def exact_dedup_stream(
    docs: DataFrame, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: first document per normalized-text
    fingerprint within the watermark horizon survives (the streaming
    twin of operators/dedup.exact_dedup)."""
    return (
        docs.withColumn("fp", fingerprint("text"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def neardup_dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Streaming near-dup dedup on the full MinHash signature: documents
    whose every band hash matches an earlier in-horizon document are
    dropped. The signature is the same md5 double-hash expression the
    batch LSH uses (operators/dedup.minhash_band_hashes), so a doc
    admitted here lands in exactly the batch pipeline's buckets later."""
    sig = F.concat_ws("|", minhash_band_hashes("text", shingle_k, num_hashes, bands))
    return (
        docs.withColumn("minhash_sig", sig)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["minhash_sig"])
    )
