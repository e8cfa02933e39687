"""Multi-dimensional clustered writes (Z-order) for scan pruning.

The reference's only layout lever is subject-hash sharding
(network/network.go:283-289 — the keyspace ring; mirrored by
operators/sharded.py). Hash layout prunes exact-key lookups but
nothing else; an analytics engine also wants RANGE pruning on more
than one column at once — parquet min/max (and Delta/Iceberg file
stats) skip a file only if the queried range misses the file's range,
and a single-column sort gives tight ranges on one column while
leaving every other column's per-file range at the global width.

Z-ordering interleaves the bits of several columns' normalized ranks
into one sort key, so files tile the multi-dimensional space: per-file
ranges shrink on EVERY participating column (×1/√F per dimension for
two columns and F files, vs ×1/F on one column and ×1 on the rest for
a linear sort). This is the same idea Delta Lake's OPTIMIZE ZORDER BY
applies; implemented here engine-side with plain DataFrame ops.

Scale notes (100 TB): normalization uses min/max bounds carried as a
crossJoin(broadcast) of a 1-row aggregate — one extra scan, never a
driver collect, and deliberately NOT a rank/percent_rank window (a
global window is a single-task bottleneck; if value skew makes min/max
buckets degenerate, pass precomputed quantile ``bounds`` instead).
The write itself is repartitionByRange(z) + sortWithinPartitions(z):
one range-exchange whose sampling is Spark's own distributed sketch.
"""

from __future__ import annotations

import functools
import glob
import operator
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (16 ⇒ two columns fill a 32-bit z-value)
_BITS = 16


def _interleave(cols: list[Column], bits: int = _BITS) -> Column:
    """Morton code: bit j of dimension d lands at position j·D + d.
    Pure bitwise codegen — no UDF."""
    d = len(cols)
    parts = [
        ((c.bitwiseAND(F.lit(1 << j)) != 0).cast("long") * F.lit(1 << (j * d + i)))
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return functools.reduce(operator.add, parts)


def zorder_key(
    df: DataFrame, cols: list[str], bounds: dict[str, tuple[float, float]] | None = None
) -> DataFrame:
    """Adds a ``_z`` column: the Morton interleave of each column's
    min-max-normalized ``_BITS``-bit bucket. ``bounds`` overrides the
    computed min/max per column (use quantiles for skewed data)."""
    if bounds is None:
        agg = df.agg(
            *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
        )
        df = df.crossJoin(F.broadcast(agg))
        lo = {c: F.col(f"__lo_{c}") for c in cols}
        hi = {c: F.col(f"__hi_{c}") for c in cols}
    else:
        lo = {c: F.lit(float(bounds[c][0])) for c in cols}
        hi = {c: F.lit(float(bounds[c][1])) for c in cols}
    top = float((1 << _BITS) - 1)
    ranks = [
        F.least(
            F.greatest(
                F.floor(
                    (F.col(c).cast("double") - lo[c])
                    / ((hi[c] - lo[c]) / F.lit(float(1 << _BITS)))
                ),
                F.lit(0),
            ),
            F.lit(int(top)),
        ).cast("long")
        for c in cols
    ]
    out = df.withColumn("_z", _interleave(ranks))
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def minmax_manifest(path: str, cols: list[str]) -> list[dict]:
    """File-level min/max manifest from parquet footers — the engine-
    side analogue of Delta/Iceberg file statistics. Footer reads are
    metadata-sized (KBs per file); at 100 TB this runs over the file
    LISTING, not the data, and would itself be a small DataFrame job
    per directory shard (driver loop is fine up to ~10⁵ files)."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        entry: dict = {"file": f, "n_rows": md.num_rows}
        for col in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            entry[col] = (lo, hi)
        out.append(entry)
    return out


def pruned_read(
    spark, path: str, predicates: dict[str, tuple[float, float]], cols: list[str] | None = None
) -> "DataFrame":
    """Manifest-pruned scan: keep only files whose [min,max] intersects
    every queried range, then read just those (and re-apply the exact
    predicate row-level — file stats only prove absence). On a
    z-ordered table a 2-D range predicate prunes ~(w_x·w_y) of the
    files instead of the w_x a linear sort manages — see
    tests/test_layout.py for the measured file counts."""
    manifest = minmax_manifest(path, list(predicates))
    keep = []
    for entry in manifest:
        ok = True
        for col, (qlo, qhi) in predicates.items():
            lo, hi = entry[col]
            if lo is None or hi < qlo or lo > qhi:
                ok = False
                break
        if ok:
            keep.append(entry["file"])
    if not keep:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*keep)
    cond = functools.reduce(
        operator.and_,
        [
            (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
            for c, (lo, hi) in predicates.items()
        ],
    )
    out = df.filter(cond)
    return out.select(*cols) if cols else out


def compact(
    spark, path: str, target_files: int, sort_col: str | None = None
) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files (optionally range-clustered on ``sort_col``
    to preserve/restore skipping stats). The most common 100 TB table
    maintenance job — streaming sinks and fine-grained merges fragment
    tables, and every query then pays per-file open/footer cost.
    Rewrites via a temp dir + os.replace-style swap (same seam as
    merge_parquet; use VersionedTable.commit semantics when readers
    are live)."""
    import shutil as _shutil
    import uuid as _uuid

    df = spark.read.parquet(path)
    n_before = len(glob.glob(os.path.join(path, "*.parquet")))
    if sort_col is not None:
        out = df.repartitionByRange(target_files, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(target_files)
    tmp = f"{path}__compact_{_uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    _shutil.rmtree(path)
    os.replace(tmp, path)
    n_after = len(glob.glob(os.path.join(path, "*.parquet")))
    return {"files_before": n_before, "files_after": n_after}


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Writes ``df`` as ``n_files`` parquet files clustered on the
    z-curve of ``cols`` — each file covers a tile of the value space,
    so min/max file stats prune scans filtered on ANY of the columns."""
    keyed = zorder_key(df, cols, bounds)
    (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
