"""Streaming maintenance of the persisted IVF-PQ ANN index.

The third index-lifecycle twin next to the band index and the BM25
postings index (streaming/dedup.py): vectors stream in, each
micro-batch encodes ONLY its increment against the pinned
codebook/centroids and lands in its own ``_batch`` partitions of the
code table (operators/pq.build_pq_index / refresh_pq_index). ANN
queries against the table are correct after every batch, equal to a
full re-encode over everything that has streamed (tested).

Replay safety: the micro-batch id IS the partition key, so a
crashed-and-retried batch overwrites its own partitions with identical
rows — codes are never duplicated (same contract as
postings_index_stream). At 100 TB the per-batch cost is the
increment's encode (one broadcast-codebook join + min-struct
aggregation, linear in the increment) — historical vectors are never
re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ann_index_stream(
    vecs: DataFrame,
    table: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    codebook: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maintain a build_pq_index table from a vector stream (the first
    batch builds it). Returns the started availableNow StreamingQuery."""
    from degdb_spark.operators.pq import build_pq_index, refresh_pq_index

    spark = vecs.sparkSession

    def step(batch: DataFrame, batch_id: int) -> None:
        batch = batch.localCheckpoint(eager=True)
        # refresh only when the WHOLE artifact exists: if batch 0
        # crashed after the code table landed but before the
        # codebook/centroids sidecars, the retry must re-run the build
        # (which drops and rewrites all three) or the sidecars would
        # never be written and the self-contained-artifact contract
        # would break permanently
        if all(
            spark.catalog.tableExists(t)
            for t in (table, f"{table}_codebook", f"{table}_centroids")
        ):
            refresh_pq_index(
                batch, table, centroids, codebook, id_col, vec_col,
                batch_id=int(batch_id),
            )
        else:
            build_pq_index(
                batch, table, centroids, codebook, id_col, vec_col,
                batch_id=int(batch_id),
            )

    return (
        vecs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
