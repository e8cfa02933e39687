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


class VersionedTable:
    """Snapshot-versioned parquet table with time travel — the minimal
    lakehouse-table contract (Delta/Iceberg shape) in plain files.

    Layout: ``root/v=N/`` immutable snapshot dirs plus a ``_VERSION``
    pointer file. Every write creates a NEW snapshot and then swings
    the pointer via write-temp + os.replace — atomic on POSIX, so a
    reader always resolves a complete snapshot (this closes the
    non-atomic-swap seam merge_parquet documents; on object stores the
    pointer becomes a conditional-put, which is exactly what Delta's
    log commit is). Old snapshots stay readable (time travel) until
    ``vacuum``. Writers are single-process here — multi-writer
    coordination is the transaction-log feature this deliberately
    leaves to the real formats.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- pointer ------------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.root, "_VERSION")

    def current_version(self) -> int:
        with open(self._pointer()) as f:
            return int(f.read().strip())

    def versions(self) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("v=")
        )

    def _next_version(self) -> int:
        # max over existing snapshot DIRS, not the pointer: staged but
        # never-published snapshots must not collide with the next write
        vs = self.versions()
        return (vs[-1] + 1) if vs else 1

    def stage(self, df: DataFrame) -> int:
        """Write a snapshot WITHOUT publishing it: the dir exists (and
        is readable via read(version=v) for auditing) but the pointer
        — what every plain reader resolves — does not move."""
        os.makedirs(self.root, exist_ok=True)
        v = self._next_version()
        df.write.mode("errorifexists").parquet(os.path.join(self.root, f"v={v}"))
        return v

    def publish(self, v: int) -> None:
        """Swing the pointer to an already-staged snapshot (atomic)."""
        if not os.path.isdir(os.path.join(self.root, f"v={v}")):
            raise FileNotFoundError(f"no staged snapshot v={v} under {self.root}")
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer())  # atomic pointer swing

    def _commit(self, df: DataFrame) -> int:
        v = self.stage(df)
        self.publish(v)
        return v

    # -- public surface ----------------------------------------------
    def create(self, df: DataFrame) -> int:
        return self._commit(df)

    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        path = os.path.join(self.root, f"v={v}")
        if not os.path.isdir(path):
            raise FileNotFoundError(f"no snapshot v={v} under {self.root}")
        return self.spark.read.parquet(path)

    def merge(
        self, updates: DataFrame, keys: list[str], when_matched: str = "update"
    ) -> int:
        """Same MERGE semantics as merge_parquet, committed as a new
        snapshot (the old version remains readable)."""
        if when_matched not in ("update", "delete"):
            raise ValueError(
                f"when_matched must be update|delete, got {when_matched!r}"
            )
        dup = updates.groupBy(*keys).count().filter(F.col("count") > 1).count()
        if dup:
            raise ValueError(f"{dup} duplicate key groups in updates")
        target = self.read()
        survivors = target.join(updates.select(*keys), on=keys, how="left_anti")
        if when_matched == "update":
            merged = survivors.unionByName(updates.select(*target.columns))
        else:
            merged = survivors
        return self._commit(merged)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Remove all but the newest ``keep_last`` snapshots (never the
        current one). Returns the versions removed."""
        keep_last = max(1, keep_last)
        vs = self.versions()
        cur = self.current_version()
        drop = [v for v in vs[:-keep_last] if v != cur]
        for v in drop:
            shutil.rmtree(os.path.join(self.root, f"v={v}"))
        return drop


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


def write_audit_publish(
    table: VersionedTable,
    df: DataFrame,
    rules,
    fk_checks=None,
):
    """Write-Audit-Publish: stage ``df`` as an unpublished snapshot,
    run the data contract (operators/quality.check_contract) against
    the STAGED FILES — what readers would actually see, not the input
    plan — and swing the pointer only if every rule passes. On
    violation the pointer never moves (readers keep the last good
    version) and the staged snapshot stays on disk for debugging.

    Returns (published: bool, version: int, report: DataFrame).
    This is the pipeline-gating pattern that keeps a 100 TB table
    always-consistent: the audit cost is one scan of the new snapshot,
    and publish is a pointer swap, so a failed audit costs nothing to
    roll back.
    """
    from degdb_spark.operators.quality import check_contract

    v = table.stage(df)
    staged = table.read(version=v)
    report = check_contract(staged, rules, fk_checks)
    n_bad = report.filter(F.col("n_violations") > 0).count()
    if n_bad == 0:
        table.publish(v)
        return True, v, report
    return False, v, report
