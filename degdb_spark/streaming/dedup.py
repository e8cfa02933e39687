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
from degdb_spark.persistence import pin


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


def neardup_index_stream(
    docs: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
):
    """The third dedup tier: banded-LSH candidate generation as a
    STREAM, via foreachBatch against a persisted band index — the
    streaming twin of operators/dedup.incremental_lsh_candidates.

    Each micro-batch (1) probes the index for new-vs-corpus candidate
    pairs plus new-vs-new within the batch, (2) appends the pairs to
    ``pairs_path``, and (3) appends its OWN band table to the index —
    so the index is always exactly "everything that streamed before
    this batch", historical text is never re-read, and old-vs-old is
    never re-paired. The union of all batches' emissions equals the
    full-corpus banded candidate set (asserted in tests) — recall the
    in-flight signature-equality tier above cannot provide.

    State lives in the PERSISTED index, not stream state: per-batch
    cost is the increment's sketch build + one band_hash-keyed probe
    join (bucket the index by band_hash at scale).

    Replay safety: every output is keyed by micro-batch id — pairs land
    in ``{pairs_path}/batch=N``, band rows in ``{index_path}/batch=N``,
    both written with overwrite — so a crashed-and-retried batch
    rewrites its own partition with identical rows instead of
    double-appending. The probe reads only partitions ``batch <
    batch_id``, which makes the candidate set deterministic even when a
    retry finds its own half-written band partition already present.
    Index existence is checked explicitly (Hadoop FS); a transient read
    failure on a later batch FAILS the batch so the checkpoint retries
    it, rather than being silently treated as an empty index (which
    would permanently lose that batch's new-vs-corpus pairs). Returns
    the started StreamingQuery (availableNow-triggered)."""
    def step(batch: DataFrame, batch_id: int) -> None:
        _neardup_index_step(
            batch, int(batch_id), index_path, pairs_path,
            id_col, text_col, shingle_k, num_hashes, bands,
        )

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _neardup_index_step(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
) -> None:
    """One micro-batch of neardup_index_stream, module-level so the
    replay contract is directly testable: running the same (batch,
    batch_id) twice converges to the single-run state."""
    from degdb_spark.operators.dedup import band_table, incremental_lsh_candidates

    spark = batch.sparkSession
    batch = batch.transform(pin, eager=True)  # feeds probe + index write
    from degdb_spark.streaming.util import has_committed_parquet

    if has_committed_parquet(spark, index_path):
        existing = (
            spark.read.option("basePath", index_path)
            .parquet(index_path)
            .filter(F.col("batch") < F.lit(batch_id))
            .select(id_col, "band", "band_hash")
        )
    else:  # genuinely the first batch: empty index, right schema
        existing = band_table(
            batch, text_col, id_col, shingle_k, num_hashes, bands
        ).limit(0)
    cands = incremental_lsh_candidates(
        batch, existing, text_col, id_col, shingle_k, num_hashes, bands
    )
    cands.write.mode("overwrite").parquet(f"{pairs_path}/batch={batch_id}")
    band_table(batch, text_col, id_col, shingle_k, num_hashes, bands).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/batch={batch_id}")


def postings_index_stream(
    docs: DataFrame,
    table: str,
    checkpoint_dir: str,
    text_col: str = "text",
    buckets: int = 16,
):
    """Streaming maintenance of the BM25 postings index: each
    micro-batch writes its postings and stats row into its OWN
    ``_batch`` partition of the bucketed table via
    operators/search.refresh_postings_index — the same
    state-in-the-persisted-index contract as neardup_index_stream (the
    first batch builds the table). BM25 queries against the table are
    correct after every batch, equal to a full rebuild over everything
    that has streamed (tested).

    Replay safety: the micro-batch id IS the partition key, so a
    crashed-and-retried batch overwrites its own partition with
    identical rows — postings are never double-appended and
    _n_docs/_total_dl never double-counted (the stats are per-batch
    rows summed at read time; there is no swap step to crash between).
    Returns the started availableNow StreamingQuery."""
    from degdb_spark.operators.search import (
        build_postings_index,
        refresh_postings_index,
    )

    spark = docs.sparkSession

    def step(batch: DataFrame, batch_id: int) -> None:
        batch = batch.transform(pin, eager=True)
        if spark.catalog.tableExists(table):
            refresh_postings_index(batch, table, text_col, batch_id=int(batch_id))
        else:
            build_postings_index(batch, table, text_col, buckets, batch_id=int(batch_id))

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def positional_index_stream(
    docs: DataFrame,
    table: str,
    checkpoint_dir: str,
    text_col: str = "text",
    buckets: int = 16,
):
    """Streaming maintenance of the positional phrase/proximity index:
    the fourth index-lifecycle twin (band, postings, PQ codes,
    positions), with the identical contract — each micro-batch
    tokenizes ONLY its increment into its own ``_batch`` partition of
    the token-bucketed table (first batch builds it), phrase queries
    against the table are correct after every batch, and a
    crashed-and-retried batch overwrites its own partition with
    identical rows (tested). Returns the started availableNow
    StreamingQuery."""
    from degdb_spark.operators.search import (
        build_positional_index,
        refresh_positional_index,
    )

    spark = docs.sparkSession

    def step(batch: DataFrame, batch_id: int) -> None:
        batch = batch.transform(pin, eager=True)
        if spark.catalog.tableExists(table):
            refresh_positional_index(batch, table, text_col, batch_id=int(batch_id))
        else:
            build_positional_index(
                batch, table, text_col, buckets, batch_id=int(batch_id)
            )

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def span_index_stream(
    docs: DataFrame,
    index_path: str,
    clean_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 10,
):
    """Streamed C4-style span dedup: each micro-batch probes the
    persisted span index (distinct 128-bit span hashes of all earlier
    batches — 16 bytes per span, never corpus text), drops
    already-seen spans from its documents, writes the cleaned docs and
    its genuinely-new spans — both to ``batch=N`` partitions with
    overwrite, so a crashed-and-retried batch converges (the probe
    reads only ``batch < batch_id``, same replay discipline as
    neardup_index_stream). Doc-ordered batches reproduce the batch
    operator bit-for-bit (pytest-pinned)."""
    def step(batch: DataFrame, batch_id: int) -> None:
        _span_index_step(
            batch, int(batch_id), index_path, clean_path,
            id_col, text_col, span_tokens,
        )

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _span_index_step(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    clean_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 10,
) -> None:
    """One micro-batch of span_index_stream, module-level so the replay
    contract is directly testable."""
    from degdb_spark.operators.dedup import incremental_span_dedup

    spark = batch.sparkSession
    batch = batch.transform(pin, eager=True)  # feeds probe + both writes
    from degdb_spark.streaming.util import has_committed_parquet

    if has_committed_parquet(spark, index_path):
        idx = spark.read.option("basePath", index_path).parquet(index_path)
        if not {"span_h1", "span_h2"} <= set(idx.columns):
            # a pre-128-bit index (single span/span_hash column) must
            # FAIL the stream loudly: silently treating its batches as
            # unreadable would re-admit every historical span as fresh
            raise RuntimeError(
                f"span index at {index_path} has columns {idx.columns}; "
                "this code writes (span_h1, span_h2). Rebuild the index "
                "(fresh index_path + checkpoint) — hash-key formats are "
                "not migratable in place."
            )
        existing = idx.filter(F.col("batch") < F.lit(batch_id)).select(
            "span_h1", "span_h2"
        )
    else:  # genuinely the first batch: empty index, right schema
        existing = spark.createDataFrame([], "span_h1 long, span_h2 long")
    report, fresh = incremental_span_dedup(
        batch, existing, text_col, id_col, span_tokens
    )
    report.write.mode("overwrite").parquet(f"{clean_path}/batch={batch_id}")
    fresh.write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")


def dsir_counts_stream(
    docs: DataFrame,
    counts_path: str,
    checkpoint_dir: str,
    target: str,
):
    """Streamed maintenance of the DSIR bucket-count state
    (operators/text.dsir_word_counts): each micro-batch tokenizes ONLY
    its increment and lands its own (b, cb, ct) table in
    ``{counts_path}/batch=N`` — counts are ADDITIVE, so the live state
    is a bounded (≤DSIR_BUCKETS-row) sum over batch partitions
    (dsir_counts_load) and scoring from it equals scoring from a full
    recompute (parity-tested). Same replay contract as the other index
    streams: the batch id keys an overwrite-mode partition, so a
    crashed-and-retried batch converges instead of double-counting."""

    def step(batch: DataFrame, batch_id: int) -> None:
        from degdb_spark.operators.text import dsir_occurrences, dsir_word_counts

        dsir_word_counts(
            dsir_occurrences(batch.transform(pin, eager=True)), target
        ).write.mode("overwrite").parquet(f"{counts_path}/batch={batch_id}")

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dsir_counts_load(spark, counts_path: str) -> DataFrame:
    """The live DSIR state from the batch-keyed table: per-bucket sums
    across batch partitions (bounded at DSIR_BUCKETS rows)."""
    return (
        spark.read.option("basePath", counts_path)
        .parquet(counts_path)
        .groupBy("b")
        .agg(F.sum("cb").alias("cb"), F.sum("ct").alias("ct"))
    )


def substring_index_stream(
    docs: DataFrame,
    index_path: str,
    clean_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
):
    """Streamed ExactSubstr dedup (operators/dedup.substring_dedup):
    each micro-batch probes the persisted window index (distinct
    128-bit sliding-window hashes of all earlier batches — 16 bytes
    per distinct window, never corpus text), removes already-seen
    >= min_tokens substrings from its documents, applies
    first-occurrence within the batch, and writes cleaned docs + its
    genuinely-new window hashes, both to ``batch=N`` partitions with
    overwrite (crashed-and-retried batches converge; the probe reads
    only ``batch < batch_id`` — the span_index_stream discipline).
    Doc-ordered batches reproduce the batch operator bit-for-bit
    (pytest-pinned)."""

    def step(batch: DataFrame, batch_id: int) -> None:
        _substring_index_step(
            batch, int(batch_id), index_path, clean_path,
            id_col, text_col, min_tokens,
        )

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _substring_index_step(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    clean_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
) -> None:
    """One micro-batch of substring_index_stream, module-level so the
    replay contract is directly testable."""
    from degdb_spark.operators.dedup import incremental_substring_dedup

    spark = batch.sparkSession
    batch = batch.transform(pin, eager=True)  # feeds probe + both writes
    from degdb_spark.streaming.util import has_committed_parquet

    if has_committed_parquet(spark, index_path):
        idx = spark.read.option("basePath", index_path).parquet(index_path)
        existing = idx.filter(F.col("batch") < F.lit(batch_id)).select(
            "win_h1", "win_h2"
        )
    else:  # genuinely the first batch: empty index, right schema
        existing = spark.createDataFrame([], "win_h1 long, win_h2 long")
    report, fresh = incremental_substring_dedup(
        batch, existing, text_col, id_col, min_tokens
    )
    report.write.mode("overwrite").parquet(f"{clean_path}/batch={batch_id}")
    fresh.write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")


def paragraph_index_stream(
    docs: DataFrame,
    index_path: str,
    clean_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streamed CCNet paragraph dedup — lifecycle #17, the paragraph-
    granularity twin of span_index_stream with the identical index
    layout and replay discipline: each micro-batch probes the
    persisted (span_h1, span_h2) normalized-paragraph fingerprints of
    all earlier batches, drops already-seen paragraphs from its
    documents, and writes cleaned docs + its genuinely-new
    fingerprints to ``batch=N`` overwrite partitions (probe reads only
    ``batch < batch_id``; crashed-and-retried batches converge).
    Doc-ordered batches reproduce the batch operator bit-for-bit."""

    def step(batch: DataFrame, batch_id: int) -> None:
        _paragraph_index_step(
            batch, int(batch_id), index_path, clean_path, id_col, text_col
        )

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _paragraph_index_step(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    clean_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of paragraph_index_stream, module-level so the
    replay contract is directly testable."""
    from degdb_spark.operators.dedup import incremental_paragraph_dedup
    from degdb_spark.streaming.util import has_committed_parquet

    spark = batch.sparkSession
    batch = batch.transform(pin, eager=True)  # feeds probe + both writes
    if has_committed_parquet(spark, index_path):
        idx = spark.read.option("basePath", index_path).parquet(index_path)
        existing = idx.filter(F.col("batch") < F.lit(batch_id)).select(
            "span_h1", "span_h2"
        )
    else:  # genuinely the first batch: empty index, right schema
        existing = spark.createDataFrame([], "span_h1 long, span_h2 long")
    report, fresh = incremental_paragraph_dedup(batch, existing, text_col, id_col)
    report.write.mode("overwrite").parquet(f"{clean_path}/batch={batch_id}")
    fresh.write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")
