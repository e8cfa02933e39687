"""MERGE upsert/delete and incremental rollup maintenance tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from degdb_spark.operators.merge import maintain_rollup, merge_parquet


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    ).write.parquet(p)
    return p


def test_merge_upsert(spark, table):
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["k", "name", "v"]
    )
    stats = merge_parquet(spark, table, updates, keys=["k"])
    assert stats == {"before": 3, "after": 4}
    rows = {r.k: (r.name, r.v) for r in spark.read.parquet(table).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_delete(spark, table):
    updates = spark.createDataFrame([(1,), (3,), (9,)], ["k"])
    stats = merge_parquet(spark, table, updates, keys=["k"], when_matched="delete")
    assert stats == {"before": 3, "after": 1}
    assert [r.k for r in spark.read.parquet(table).collect()] == [2]


def test_merge_rejects_duplicate_update_keys(spark, table):
    updates = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], ["k", "name", "v"]
    )
    with pytest.raises(ValueError, match="duplicate key"):
        merge_parquet(spark, table, updates, keys=["k"])


def test_maintain_rollup_equals_full_recompute(spark, tmp_path):
    sp = str(tmp_path / "state")
    full = []
    for batch_vals in ([("a", 1.5), ("b", 2.5)], [("a", 3.0)], [("c", 4.25), ("a", 0.25)]):
        full.extend(batch_vals)
        batch = spark.createDataFrame(batch_vals, ["dim", "v"])
        state = maintain_rollup(spark, sp, batch, dims=["dim"], value_col="v")
    got = {r.dim: (r.cnt, float(r.total)) for r in state.collect()}
    fdf = spark.createDataFrame(full, ["dim", "v"])
    exp = {
        r.dim: (r.cnt, float(r.total))
        for r in fdf.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(30,2)")).alias("total"),
        )
        .collect()
    }
    assert got == exp
