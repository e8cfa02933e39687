"""Sequence packing for LLM training-data assembly.

The standard GPT-style packing: concatenate documents in a deterministic
order and chunk the token stream into fixed-size context windows. Each
document's placement is fully determined by the running token offset, so
the whole operator is a global cumulative sum — which naively is a
single-task window (the 100 TB killer). This implementation uses the
classic two-phase scan instead:

1. range-partition by the order key (contiguous key ranges per
   partition), cumulative-sum *within* each partition via a window
   partitioned by ``spark_partition_id()``;
2. compute per-partition totals (a tiny aggregate), prefix-sum them on
   the driver-free broadcast side, and add each partition's prefix
   offset back with a broadcast join.

Wall-clock is two narrow shuffles + one broadcast join; no stage ever
sees more than one partition's rows in one task. The result is
independent of the partition boundaries (the range partitioner only
needs contiguity, which it guarantees), so output is deterministic and
oracle-checkable against a plain SQL window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from degdb_spark.operators.text import token_count
from degdb_spark.persistence import lineage_cut


def pack_documents(
    df: DataFrame,
    budget: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> DataFrame:
    """Assign each document its token-stream placement under
    concat-and-chunk packing with ``budget``-token windows.

    Returns (id_col, n_tokens, start_offset, pack_id, crosses_boundary):
    pack_id = window index of the document's first token;
    crosses_boundary = the document straddles a window edge (training
    pipelines route these to truncation/continuation handling).
    """
    sized = df.select(
        F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
    )
    # materialized ONCE by a TRUE lineage cut (not pin): the frame
    # feeds both the local scan and the totals aggregate, the range
    # partitioner's sampled boundaries are not stable across
    # re-evaluations, and _pid reads the physical partition — a
    # persist-mode pin could silently recompute divergent boundaries
    # after replica loss and desync _pid between the branches
    parted = (
        sized.repartitionByRange(num_partitions, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .transform(lineage_cut, eager=True)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parted.withColumn(
        "_local_off", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    totals = parted.groupBy("_pid").agg(F.sum("n_tokens").alias("_total"))
    w_prefix = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    # the totals frame has num_partitions rows — the single-task window
    # over it is O(num_partitions), not O(rows)
    prefixes = totals.withColumn(
        "_prefix", F.coalesce(F.sum("_total").over(w_prefix), F.lit(0))
    ).select("_pid", "_prefix")
    placed = local.join(F.broadcast(prefixes), on="_pid").withColumn(
        "start_offset", (F.col("_local_off") + F.col("_prefix")).cast("long")
    )
    first_win = F.floor(F.col("start_offset") / budget)
    last_win = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
        / budget
    )
    return placed.select(
        id_col,
        "n_tokens",
        "start_offset",
        first_win.cast("long").alias("pack_id"),
        ((F.col("n_tokens") > 0) & (first_win != last_win)).alias(
            "crosses_boundary"
        ),
    )
