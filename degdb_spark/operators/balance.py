"""Input rebalancing for compute-bound projections.

Expensive per-row operators (shingling + 32-way minhash, SimHash bit
votes, SRP sketches) are pure projections: their parallelism is exactly
the input's partition count. At cluster scale parquet inputs arrive
pre-split (maxPartitionBytes), so a well-partitioned input passes
through untouched. But a narrow input — one small file, the output of a
coalesce, a driver-created frame — would serialize the whole projection
onto a handful of tasks. One round-robin shuffle of the raw rows costs
far less than that serialization.

Only safe for operators whose result is partitioning-independent
(per-row projections, equi-join/groupBy pipelines). Do NOT use upstream
of order-sensitive double aggregations — reordering float sums drifts
low bits (see queries/rounding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_compute(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    current partition count is below ``min_fraction`` of it. No-op (and
    no shuffle) for inputs that are already split."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_fraction)):
        return df.repartition(target)
    return df


def compact_pinned(
    df: DataFrame, rows: int | None = None, rows_per_partition: int = 65536
) -> DataFrame:
    """The inverse of rebalance_for_compute, for MATERIALIZED (pinned)
    frames that iterative algorithms re-scan every superstep: fold a
    small frame's partitions with a narrow coalesce so each superstep
    stops scheduling a near-empty task per original partition (a
    7k-edge graph pinned off a 16-bucket table read costs a 16-32-task
    swarm per BFS round otherwise — pure scheduler overhead).

    Size-adaptive, so it self-disables at scale: the target partition
    count is ceil(rows / rows_per_partition) capped at the current
    count — a corpus-sized frame keeps every partition. ``rows`` (pass
    it when the caller just counted) avoids a second count job; on an
    eagerly pinned frame the count is a cached-RDD sweep either way.
    coalesce() is pure partitioning — results are bit-identical."""
    n = df.count() if rows is None else rows
    parts = df.rdd.getNumPartitions()
    want = max(1, min(parts, -(-n // rows_per_partition)))
    return df.coalesce(want) if want < parts else df
