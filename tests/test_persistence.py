"""persistence.pin: the session knob that picks how multi-consumer
intermediates are materialized (executor-local checkpoint / replicated
persist / reliable checkpoint). All flavors must be bit-identical —
the pin only cuts lineage — and the knob must restore cleanly."""

from __future__ import annotations



import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def _clean_knob(spark):
    yield
    spark.conf.unset("spark.degdb.pin")


def _dsir_rows(spark):
    from degdb_spark.queries.text_queries import dsir_selection

    return [tuple(r) for r in dsir_selection(spark, SF).collect()]


def test_pin_modes_bit_identical(spark, tmp_path, _clean_knob):
    want = _dsir_rows(spark)  # default: localCheckpoint
    spark.conf.set("spark.degdb.pin", "persist")
    assert _dsir_rows(spark) == want
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.degdb.pin", "checkpoint")
    assert _dsir_rows(spark) == want


def test_pin_persist_mode_uses_storage(spark, _clean_knob):
    from degdb_spark.persistence import pin

    spark.conf.set("spark.degdb.pin", "persist")
    df = pin(spark.range(10).withColumn("x", F.col("id") * 2), eager=True)
    try:
        assert df.storageLevel.useDisk or df.storageLevel.useMemory
        assert df.storageLevel.replication == 2
        assert df.count() == 10
    finally:
        df.unpersist()
