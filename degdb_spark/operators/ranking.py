"""Distributed global row_number without a single-task window.

``row_number().over(Window.orderBy(...))`` with no partition spec moves
every row to ONE task (Spark logs `WindowExec: No Partition Defined`) —
the classic scale-killer for any rank over a data-sized frame. This is
the two-phase scan from operators/packing.py generalized to ranking:

1. range-partition by the order key (contiguous key ranges per
   partition, so partition id order == global sort order), rank
   *within* each partition via a window partitioned by
   ``spark_partition_id()``;
2. per-partition row counts (a ``num_partitions``-row aggregate) are
   prefix-summed — the only unpartitioned window runs over that tiny
   totals frame, O(num_partitions) not O(rows) — and each partition's
   offset is added back through a broadcast join.

The result is identical to the naive global row_number for any TOTAL
order (ties must be broken by a unique column, as every caller here
does), independent of where the range partitioner draws boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from degdb_spark.persistence import lineage_cut


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_name: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """Append ``rank_name`` = 1-based global row_number under the total
    order given by ``order_cols`` (Column sort expressions, e.g.
    ``[F.col("n").desc(), F.col("token")]``).

    The frame is materialized once by a TRUE lineage cut
    (lineage_cut, not pin): it feeds both the local-rank branch and
    the totals aggregate, the range partitioner's sampled boundaries
    are not guaranteed stable across re-evaluations, and ``_pid`` is a
    physical-partition read — so a persist-mode pin would be UNSAFE:
    persist keeps the plan, and a recompute after replica loss could
    re-sample divergent boundaries and silently desync ``_pid``
    between the branches. A lineage cut removes the recompute path
    entirely (reliable checkpoint on clusters).
    """
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(lineage_cut, eager=True)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    local = parted.withColumn("_local_rank", F.row_number().over(w_local))
    totals = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_prefix), F.lit(0))
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(prefixes), on="_pid")
        .withColumn(
            rank_name, (F.col("_local_rank") + F.col("_offset")).cast("long")
        )
        .drop("_pid", "_local_rank", "_offset")
    )


def cut_range_partitioned(
    df: DataFrame, order_cols: list[Column], num_partitions: int = 32
) -> DataFrame:
    """Range-partition ``df`` by the total order, stamp ``_pid``, and
    lineage-cut (eager) — the shared first phase of the two-phase
    scans. The cut is load-bearing (see global_row_number's safety
    note: sampled range boundaries are not re-evaluation-stable and
    ``_pid`` is a physical read); exposing it lets a caller run
    SEVERAL cumsum phases — including ones over columns DERIVED from
    an earlier phase's result — against ONE sample + shuffle +
    checkpoint instead of paying that stack per phase
    (events_kaplan_meier: the survival sum consumes the at-risk sum)."""
    return (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(lineage_cut, eager=True)
    )


def running_sums_over(
    parted: DataFrame,
    order_cols: list[Column],
    value_cols: list[str],
    sum_names: list[str],
) -> DataFrame:
    """INCLUSIVE running sums over an already cut_range_partitioned
    frame carrying ``_pid`` (kept in the output so a later phase can
    ride the same partitioning): local windowed cumsums per partition,
    per-partition totals prefix-summed over the tiny ``_pid`` frame,
    offsets added back through a broadcast join. Identical to the
    naive global cumsum for any total order, wherever the range
    boundaries fell."""
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted
    for i, vc in enumerate(value_cols):
        local = local.withColumn(f"_local_sum_{i}", F.sum(vc).over(w_local))
    totals = parted.groupBy("_pid").agg(
        *[F.sum(vc).alias(f"_t_{i}") for i, vc in enumerate(value_cols)]
    )
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals
    for i in range(len(value_cols)):
        prefixes = prefixes.withColumn(
            f"_offset_{i}",
            F.coalesce(F.sum(f"_t_{i}").over(w_prefix), F.lit(0)),
        )
    prefixes = prefixes.select(
        "_pid", *[f"_offset_{i}" for i in range(len(value_cols))]
    )
    out = local.join(F.broadcast(prefixes), on="_pid")
    for i, name in enumerate(sum_names):
        out = out.withColumn(
            name,
            (F.col(f"_local_sum_{i}") + F.col(f"_offset_{i}")).cast("long"),
        )
    return out.drop(
        *[f"_local_sum_{i}" for i in range(len(value_cols))],
        *[f"_offset_{i}" for i in range(len(value_cols))],
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str | list[str],
    sum_name: str | list[str] = "running_sum",
    num_partitions: int = 32,
) -> DataFrame:
    """Append INCLUSIVE running SUM(s) under the global total order
    given by ``order_cols`` — the cumulative-sum twin of
    global_row_number, same two-phase scan (range partition → local
    cumsum → broadcast prefix offsets). Value columns must be integral
    (long) so partial sums are exact and order-free. Pass lists to
    carry several cumulative columns through ONE range partitioning
    (e.g. KS needs both groups' CDFs on the same value order)."""
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    sum_names = [sum_name] if isinstance(sum_name, str) else list(sum_name)
    assert len(value_cols) == len(sum_names)
    parted = cut_range_partitioned(df, order_cols, num_partitions)
    return running_sums_over(parted, order_cols, value_cols, sum_names).drop(
        "_pid"
    )
