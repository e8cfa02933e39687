"""Two-phase distributed rank/cumsum (operators/ranking.py) and the
round-4 operators built on them — parity against the naive
single-partition forms on data crossing many partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _scrambled(spark, n=5000):
    """n rows with a non-monotonic sort key spread over 16 partitions."""
    return (
        spark.range(n)
        .repartition(16)
        .withColumn("key", F.pmod(F.col("id") * 7919 + 13, F.lit(n)))
        .withColumn("val", F.pmod(F.col("id") * 271, F.lit(97)) + 1)
    )


def test_global_row_number_matches_naive(spark):
    from degdb_spark.operators.ranking import global_row_number

    df = _scrambled(spark)
    two_phase = global_row_number(
        df, [F.col("key").desc(), F.col("id")], rank_name="rank"
    )
    naive = df.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("key").desc(), F.col("id")))
        .cast("long"),
    )
    assert (
        two_phase.select("id", "rank")
        .exceptAll(naive.select("id", "rank"))
        .count()
        == 0
    )
    assert two_phase.count() == naive.count()


def test_global_running_sum_matches_naive(spark):
    from degdb_spark.operators.ranking import global_running_sum

    df = _scrambled(spark)
    two_phase = global_running_sum(
        df, [F.col("key"), F.col("id")], "val", sum_name="cum"
    )
    naive = df.withColumn(
        "cum",
        F.sum("val")
        .over(
            Window.orderBy(F.col("key"), F.col("id")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    assert (
        two_phase.select("id", "cum").exceptAll(naive.select("id", "cum")).count()
        == 0
    )


def test_global_row_number_no_unpartitioned_data_window(spark):
    """The only unpartitioned window must be over the totals frame —
    verified structurally: every Window node missing a partition spec
    sits above an Aggregate (the num_partitions-row totals), never
    above the data."""
    from degdb_spark.operators.ranking import global_row_number

    df = _scrambled(spark)
    out = global_row_number(df, [F.col("key"), F.col("id")])
    node = out._jdf.queryExecution().optimizedPlan()
    stack, bad = [node], []
    while stack:
        n = stack.pop()
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            # child chain must hit an Aggregate before any scan
            child = n.children().apply(0)
            seen = []
            while True:
                seen.append(child.nodeName())
                if child.nodeName() == "Aggregate":
                    break
                if child.children().length() == 0:
                    bad.append(seen)
                    break
                child = child.children().apply(0)
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
    assert not bad, bad


def test_stratified_weighted_sample_exact_k_and_deterministic(spark):
    from degdb_spark.operators.sampling import stratified_weighted_sample

    df = (
        spark.range(600)
        .withColumn("doc_id", F.col("id"))
        .withColumn("stratum", (F.col("id") % 3).cast("string"))
        .withColumn("w", (F.pmod(F.col("id") * 37, F.lit(50)) + 1).cast("double"))
    )
    out = stratified_weighted_sample(df, "w", k=7, stratum_col="stratum")
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    again = stratified_weighted_sample(df, "w", k=7, stratum_col="stratum")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # ranks are 1..k within each stratum
    ranks = out.groupBy("stratum").agg(
        F.min("sample_rank").alias("lo"), F.max("sample_rank").alias("hi")
    )
    for r in ranks.collect():
        assert (r["lo"], r["hi"]) == (1, 7)


def test_multi_source_bfs_path_graph(spark):
    """Path 0-1-2-3-4-5, sources {0, 5}: known hop distances."""
    from degdb_spark.graph.algorithms import multi_source_bfs

    e = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], ["src", "dst"]
    )
    sources = spark.createDataFrame([(0,), (5,)], ["source"])
    dist = {
        (r["source"], r["id"]): r["dist"]
        for r in multi_source_bfs(edges, sources, max_hops=3).collect()
    }
    for v in range(6):
        if v <= 3:
            assert dist[(0, v)] == v
        else:
            assert (0, v) not in dist  # beyond max_hops
        if 5 - v <= 3:
            assert dist[(5, v)] == 5 - v


def test_histogram_quantiles_by_matches_global_on_single_group(spark):
    from degdb_spark.operators.sketch import (
        histogram_quantiles,
        histogram_quantiles_by,
    )

    df = (
        spark.range(2000)
        .withColumn("x", (F.pmod(F.col("id") * 131, F.lit(1000))).cast("double"))
        .withColumn("g", F.lit("only"))
    )
    qs = [0.5, 0.9]
    glob = {r["q"]: r["est"] for r in histogram_quantiles(df, "x", qs, 100).collect()}
    by = {
        r["q"]: r["est"]
        for r in histogram_quantiles_by(df, "x", "g", qs, 100).collect()
    }
    assert glob == pytest.approx(by)
