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


def test_versioned_table_time_travel(spark, tmp_path):
    from degdb_spark.operators.merge import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt"))
    v1 = t.create(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "name"]))
    assert v1 == 1 and t.current_version() == 1
    v2 = t.merge(
        spark.createDataFrame([(2, "b2"), (3, "c")], ["k", "name"]), keys=["k"]
    )
    assert v2 == 2 and t.current_version() == 2
    # latest sees the merge…
    assert {r.k: r.name for r in t.read().collect()} == {1: "a", 2: "b2", 3: "c"}
    # …while v1 is unchanged (time travel)
    assert {r.k: r.name for r in t.read(version=1).collect()} == {1: "a", 2: "b"}
    # delete commits a third snapshot
    v3 = t.merge(spark.createDataFrame([(1,)], ["k"]), keys=["k"], when_matched="delete")
    assert v3 == 3
    assert sorted(r.k for r in t.read().collect()) == [2, 3]
    # vacuum drops old snapshots, keeps the current
    dropped = t.vacuum(keep_last=1)
    assert dropped == [1, 2]
    assert t.versions() == [3]
    assert sorted(r.k for r in t.read().collect()) == [2, 3]


def test_versioned_table_read_missing_version(spark, tmp_path):
    import pytest as _pytest

    from degdb_spark.operators.merge import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "vt"))
    t.create(spark.createDataFrame([(1,)], ["k"]))
    with _pytest.raises(FileNotFoundError):
        t.read(version=99)


def test_cdc_stream_to_versioned(spark, tmp_path):
    """Two JSONL drops → two availableNow drains → two snapshot
    versions; upserts apply with latest-wins and old versions remain
    readable."""
    import json
    import os

    from degdb_spark.operators.merge import VersionedTable
    from degdb_spark.streaming.ingest import cdc_stream_to_versioned

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "table")

    def drop(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain(ckpt):
        stream = (
            spark.readStream.schema("version long, k long, name string")
            .json(str(src))
        )
        q = cdc_stream_to_versioned(
            stream, root, keys=["k"], checkpoint_dir=str(tmp_path / ckpt)
        )
        q.awaitTermination(120)

    drop("b1.jsonl", [
        {"version": 1, "k": 1, "name": "a"},
        {"version": 1, "k": 2, "name": "b"},
        {"version": 2, "k": 2, "name": "b2"},  # same-batch: latest wins
    ])
    drain("ck1")
    t = VersionedTable(spark, root)
    assert t.current_version() == 1
    assert {r.k: r.name for r in t.read().collect()} == {1: "a", 2: "b2"}

    drop("b2.jsonl", [
        {"version": 3, "k": 1, "name": "a3"},
        {"version": 3, "k": 9, "name": "new"},
    ])
    drain("ck2")  # fresh checkpoint reprocesses all files; merge is idempotent by key
    assert t.current_version() >= 2
    latest = {r.k: r.name for r in t.read().collect()}
    assert latest == {1: "a3", 2: "b2", 9: "new"}
    # the first snapshot is still readable (time travel)
    assert {r.k: r.name for r in t.read(version=1).collect()} == {1: "a", 2: "b2"}


def test_write_audit_publish_gates_bad_data(spark, tmp_path):
    """WAP: clean batch publishes; dirty batch leaves the pointer on
    the last good version with the staged snapshot kept for debugging."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from degdb_spark.operators.merge import VersionedTable, write_audit_publish

    vt = VersionedTable(spark, str(tmp_path / "wap"))
    rules = [("qty_positive", F.col("qty") > 0)]

    ok, v1, rep = write_audit_publish(
        vt, spark.createDataFrame([Row(k=1, qty=5), Row(k=2, qty=3)]), rules
    )
    assert ok and vt.current_version() == v1
    assert rep.filter(F.col("n_violations") > 0).count() == 0

    ok2, v2, rep2 = write_audit_publish(
        vt, spark.createDataFrame([Row(k=3, qty=-1)]), rules
    )
    assert not ok2
    assert vt.current_version() == v1  # pointer never moved
    assert v2 in vt.versions()  # staged snapshot kept for debugging
    assert {r.k for r in vt.read().collect()} == {1, 2}  # readers see last good
