"""Z-order layout tests: per-file min/max ranges must shrink on BOTH
clustered columns (the whole point vs a linear sort)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from degdb_spark.operators.layout import zorder_key, zorder_write


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            out.append((min(los), max(his)))
    return out


def test_zorder_write_tiles_both_dimensions(spark, tmp_path):
    # two independent pseudo-uniform dims derived from the id
    df = (
        spark.range(0, 40_000)
        .withColumn("x", (F.col("id") * 2654435761) % 100_000)
        .withColumn("y", (F.col("id") * 40503) % 100_000)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(df, zpath, ["x", "y"], n_files=16)

    # linear sort baseline: tight on x, global-width on y
    lpath = str(tmp_path / "linear")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    for col in ("x", "y"):
        zr = _file_ranges(zpath, col)
        assert len(zr) >= 8
        avg_width = sum(hi - lo for lo, hi in zr) / len(zr)
        # 16 files on a 2-D z-curve ⇒ 4×4 tiles ⇒ per-file width ≈ 1/4
        # of the global range on each dim; assert well under half
        assert avg_width < 0.5 * 100_000, (col, avg_width)

    lr_y = _file_ranges(lpath, "y")
    avg_linear_y = sum(hi - lo for lo, hi in lr_y) / len(lr_y)
    zr_y = _file_ranges(zpath, "y")
    avg_z_y = sum(hi - lo for lo, hi in zr_y) / len(zr_y)
    # z-order must beat the linear layout on the non-sorted dimension
    assert avg_z_y < 0.6 * avg_linear_y


def test_zorder_key_is_deterministic_and_bounded(spark):
    df = spark.range(0, 1000).withColumn("x", F.col("id") % 97).withColumn(
        "y", (F.col("id") * 7) % 89
    )
    z1 = [r._z for r in zorder_key(df, ["x", "y"]).orderBy("id").collect()]
    z2 = [r._z for r in zorder_key(df, ["x", "y"]).orderBy("id").collect()]
    assert z1 == z2
    assert all(0 <= z < (1 << 32) for z in z1)


def test_pruned_read_skips_files_on_zorder(spark, tmp_path):
    from degdb_spark.operators.layout import minmax_manifest, pruned_read

    df = (
        spark.range(0, 40_000)
        .withColumn("x", (F.col("id") * 2654435761) % 100_000)
        .withColumn("y", (F.col("id") * 40503) % 100_000)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(df, zpath, ["x", "y"], n_files=16)

    # a 25%×25% box: on a 4×4 z-curve tiling this touches a corner of
    # the space — far fewer than all 16 files
    preds = {"x": (0.0, 25_000.0), "y": (0.0, 25_000.0)}
    manifest = minmax_manifest(zpath, ["x", "y"])
    kept = [
        e for e in manifest
        if e["x"][0] <= 25_000 and e["y"][0] <= 25_000
    ]
    out = pruned_read(spark, zpath, preds)
    got = {(r.x, r.y) for r in out.collect()}
    exp = {
        (r.x, r.y)
        for r in df.filter(
            (F.col("x") <= 25_000) & (F.col("y") <= 25_000)
        ).collect()
    }
    assert got == exp  # pruning never loses rows
    # and it genuinely skips: intersecting files < half the layout
    n_hit = sum(
        1 for e in manifest
        if not (e["x"][1] < 0 or e["x"][0] > 25_000 or e["y"][1] < 0 or e["y"][0] > 25_000)
    )
    assert n_hit <= len(manifest) // 2, (n_hit, len(manifest))


def test_pruned_read_empty_range(spark, tmp_path):
    from degdb_spark.operators.layout import pruned_read

    df = spark.range(0, 1000).withColumn("x", F.col("id") % 100).withColumn(
        "y", F.col("id") % 7
    )
    p = str(tmp_path / "t")
    zorder_write(df, p, ["x", "y"], n_files=4)
    out = pruned_read(spark, p, {"x": (1e9, 2e9)})
    assert out.count() == 0


def test_compact_reduces_files(spark, tmp_path):
    from degdb_spark.operators.layout import compact

    p = str(tmp_path / "frag")
    spark.range(0, 10_000).withColumn("x", F.col("id") % 100).repartition(
        32
    ).write.parquet(p)
    before = spark.read.parquet(p)
    n_rows = before.count()
    stats = compact(spark, p, target_files=4, sort_col="x")
    assert stats["files_before"] >= 16 and stats["files_after"] <= 4
    after = spark.read.parquet(p)
    assert after.count() == n_rows
    # range clustering restored: per-file x ranges are narrow
    ranges = _file_ranges(p, "x")
    assert all(hi - lo <= 60 for lo, hi in ranges), ranges


def test_zorder_interleave_roundtrip(spark):
    """Property: the Morton code decodes back to the exact rank pair —
    bit interleaving loses nothing."""
    from degdb_spark.operators.layout import _interleave

    df = spark.range(0, 512).select(
        (F.col("id") % 23 * 2897 % 65536).alias("rx"),
        (F.col("id") * 7919 % 65536).alias("ry"),
    )
    z = df.select(
        "rx", "ry", _interleave([F.col("rx"), F.col("ry")]).alias("z")
    )
    rows = z.collect()
    for r in rows:
        dx = sum(((r.z >> (2 * j)) & 1) << j for j in range(16))
        dy = sum(((r.z >> (2 * j + 1)) & 1) << j for j in range(16))
        assert (dx, dy) == (r.rx, r.ry)


def test_compact_pinned_folds_small_and_keeps_large(spark):
    """compact_pinned (r13): a tiny materialized frame folds to
    ceil(rows/target) partitions via narrow coalesce; a frame already
    at/below that target keeps every partition (the no-op branch that
    makes the helper scale-safe). Row content is untouched."""
    from degdb_spark.operators.balance import compact_pinned
    from degdb_spark.persistence import pin

    small = pin(spark.range(1000).repartition(16), eager=True)
    folded = compact_pinned(small, rows_per_partition=65536)
    assert folded.rdd.getNumPartitions() == 1
    assert folded.count() == 1000

    # 3 partitions of ~troughly target-sized rows: want >= parts -> unchanged
    big = pin(spark.range(10_000).repartition(3), eager=True)
    kept = compact_pinned(big, rows_per_partition=4000)
    assert kept.rdd.getNumPartitions() == 3
