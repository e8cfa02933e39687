"""Structured Streaming tests: drain the events stream with availableNow
and check the results against the equivalent batch plans."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from degdb_spark.streaming import events as SE

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF, "events.parquet"), d / "events.parquet")
    return str(d)


@pytest.fixture()
def ckpt(tmp_path):
    return str(tmp_path / "ckpt")


def _batch_events(spark):
    from degdb_spark.catalog import load_table

    return load_table(spark, SF, "events")


def test_hourly_rollup_stream_matches_batch(spark, stream_dir, ckpt):
    s = SE.hourly_rollup_stream(SE.stream_events(spark, stream_dir))
    SE.run_available_now(s, "hourly_mem", ckpt, output_mode="append")
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from hourly_mem").collect()
    }
    batch = _batch_events(spark)
    exp = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    # watermark may hold back the trailing window(s) in append mode;
    # everything emitted must match batch exactly and cover most groups
    assert got
    assert all(exp[k] == v for k, v in got.items())
    assert len(got) >= len(exp) - 10


def test_dedup_stream(spark, stream_dir, ckpt):
    s = SE.dedup_stream(SE.stream_events(spark, stream_dir))
    SE.run_available_now(s, "dedup_mem", ckpt, output_mode="append")
    n = spark.sql("select count(*) n, count(distinct event_id) d from dedup_mem").collect()[0]
    total = _batch_events(spark).count()
    assert n.n == n.d  # no duplicate ids emitted
    assert n.n == total  # source ids are unique → all pass through


def test_session_stream(spark, stream_dir, ckpt):
    s = SE.session_stream(SE.stream_events(spark, stream_dir))
    SE.run_available_now(s, "sess_mem", ckpt, output_mode="append")
    rows = spark.sql("select * from sess_mem").collect()
    assert rows
    # session invariants
    assert all(r.session_end >= r.session_start for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_stateful_user_profile(spark, stream_dir, ckpt):
    from degdb_spark.streaming.stateful import user_profile_stream

    s = user_profile_stream(SE.stream_events(spark, stream_dir))
    SE.run_available_now(s, "prof_mem", ckpt, output_mode="update")
    rows = spark.sql(
        "select user_id, max(n_events) n from prof_mem group by user_id"
    ).collect()
    got = {r.user_id: r.n for r in rows}
    exp = {
        r.user_id: r.n
        for r in _batch_events(spark).groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp
