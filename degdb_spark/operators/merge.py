"""MERGE-style upsert/delete over parquet table directories, and
incremental aggregate (materialized-view) maintenance built on it.

The reference's only write semantics is idempotent insert (unique
(subj,pred,obj) index, triplestore/triplestore.go:134-148 — mirrored
by TripleStore.insert's anti-join). This module adds the other half of
a real table sink: keyed UPDATE/DELETE (Delta/Iceberg ``MERGE WHEN
MATCHED``) and the rollup-maintenance pattern that rides on it.

Scale notes (100 TB): the merge itself is one left-anti join (target
rows not superseded) plus a union — shuffle keyed on the merge keys,
exactly what Delta does under the hood minus the transaction log. The
directory swap here is write-temp → move, which is NOT atomic across
readers; production deployments put Delta/Iceberg's log in front —
that seam is deliberate and documented, the join topology is the part
that carries to a cluster. Incremental rollup maintenance merges
MERGEABLE partials (sum/count — never avg) so each refresh touches
only the new batch + the (dimension-sized, not data-sized) state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _swap_write(df: DataFrame, path: str) -> None:
    """Materialize ``df`` fully, then replace ``path`` with it. The
    read-before-overwrite hazard is resolved by writing to a sibling
    temp dir first (df may lazily re-scan ``path`` during the write)."""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def merge_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    when_matched: str = "update",
) -> dict:
    """MERGE ``updates`` into the parquet table at ``path`` on ``keys``.

    when_matched='update': matched target rows are replaced by the
    update row, unmatched updates are inserted (classic upsert).
    when_matched='delete': matched target rows are removed; unmatched
    updates are ignored (keyed delete).

    Returns {'before': n, 'after': n} row counts. Updates must be
    unique per key (enforced — duplicate update keys make the result
    order-dependent, the same constraint Delta MERGE raises).
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    target = spark.read.parquet(path)
    n_before = target.count()
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1).count()
    if dup:
        raise ValueError(f"{dup} duplicate key groups in updates")
    survivors = target.join(updates.select(*keys), on=keys, how="left_anti")
    if when_matched == "update":
        merged = survivors.unionByName(updates.select(*target.columns))
    else:
        merged = survivors
    _swap_write(merged, path)
    return {"before": n_before, "after": spark.read.parquet(path).count()}


def maintain_rollup(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    dims: list[str],
    value_col: str,
    scale: int = 2,
) -> DataFrame:
    """Incrementally maintain SUM/COUNT partials per ``dims`` group.

    State rows are (dims..., cnt, total DECIMAL(30,scale)); each refresh
    aggregates only the new batch, merges with existing state by key
    (union + re-aggregate — decimal sums are order-independent so the
    merged state is bit-identical to a full recompute), and swap-writes.
    AVG and friends derive from the partials at read time — never store
    non-mergeable aggregates. This is the continuous-aggregate pattern
    (cf. timeseries.hypertable_rollup) generalised to any dimension set.
    """
    partial = batch.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast(f"decimal(30,{scale})")).alias("total"),
    )
    if os.path.exists(state_path):
        state = spark.read.parquet(state_path)
        merged = (
            state.unionByName(partial)
            .groupBy(*dims)
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("total").cast(f"decimal(30,{scale})").alias("total"),
            )
        )
    else:
        merged = partial
    _swap_write(merged, state_path)
    return spark.read.parquet(state_path)
