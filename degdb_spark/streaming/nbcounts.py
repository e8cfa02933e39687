"""Streaming maintenance of the Naive Bayes training-statistics index.

The tenth member of the persisted-index lifecycle family (band index,
BM25 postings, positional index, PQ codes, SemDeDup assignment, span
index, media fingerprints, word histogram, hourly counts): documents
stream in, each micro-batch counts ONLY its own train-split rows —
(label, token) occurrence counts and (label) document counts — into
its own ``batch=N`` partitions. Both tables are the ADDITIVE
sufficient statistics of the multinomial NB model, so the merged index
(one groupBy-sum each) feeds operators/nb.predict_from_stats directly:
the classifier retrains and scores from the index alone, never
re-reading a historical training document. That is the falsifiable
scale claim the corpus-deletion probe pins
(tests/test_index_scale_probe.py): delete every training file, score a
held-out set, and the confusion matrix still equals the full-corpus
training run.

The split discipline matches operators/nb.train_predict_nb: the md5
bucket of doc_id decides train membership, re-derived per batch (pure
codegen, no doc-level join), so a document lands in the training
statistics exactly when batch training would have used it.

Replay safety: the micro-batch id IS the partition key, so a
crashed-and-retried batch overwrites its own partitions with identical
rows (the family contract); the first-write crash case is covered by
has_committed_parquet like the other twins.

At 100 TB: per-batch state is the batch's own (label, token) pairs —
Heaps-bounded like the word histogram — and retraining cost is
O(|vocab|·|labels|), completely decoupled from corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOK_SCHEMA = "cand string, token string, cnt long"
_DOC_SCHEMA = "cand string, nd long"


def nb_stats_index_stream(
    docs: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    label_col: str = "lang",
    test_pct: int = 20,
):
    """Maintain the per-batch NB statistics index from a document
    stream. Returns the started availableNow StreamingQuery."""

    def step(batch: DataFrame, batch_id: int) -> None:
        _nb_index_step(batch, int(batch_id), index_path, label_col, test_pct)

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _nb_index_step(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    label_col: str = "lang",
    test_pct: int = 20,
) -> None:
    """One micro-batch, module-level so the replay contract is
    directly testable (the family convention)."""
    from degdb_spark.operators.sampling import md5_bucket
    from degdb_spark.operators.text import tokens

    train = batch.filter(md5_bucket("doc_id", 100) >= test_pct)
    tok_counts = (
        train.select(
            F.col(label_col).alias("cand"),
            F.explode(tokens("text")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("cand", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    doc_counts = train.groupBy(F.col(label_col).alias("cand")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    tok_counts.write.mode("overwrite").parquet(f"{index_path}/tok/batch={batch_id}")
    doc_counts.write.mode("overwrite").parquet(f"{index_path}/docs/batch={batch_id}")


def merged_nb_stats(spark, index_path: str) -> tuple[DataFrame, DataFrame]:
    """The additive merge of every committed batch partition —
    predict_from_stats' (counts, nd) inputs. Explicit schemas so a
    crashed first write reads as empty instead of wedging replays on
    schema inference."""
    from degdb_spark.streaming.util import has_committed_parquet

    tok_path, doc_path = f"{index_path}/tok", f"{index_path}/docs"
    if has_committed_parquet(spark, tok_path):
        counts = (
            spark.read.schema(_TOK_SCHEMA + ", batch int")
            .option("basePath", tok_path)
            .parquet(tok_path)
            .groupBy("cand", "token")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        counts = spark.createDataFrame([], _TOK_SCHEMA)
    if has_committed_parquet(spark, doc_path):
        nd = (
            spark.read.schema(_DOC_SCHEMA + ", batch int")
            .option("basePath", doc_path)
            .parquet(doc_path)
            .groupBy("cand")
            .agg(F.sum("nd").alias("nd"))
        )
    else:
        nd = spark.createDataFrame([], _DOC_SCHEMA)
    return counts, nd
