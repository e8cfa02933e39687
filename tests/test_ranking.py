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


def test_welch_t_test_matches_numpy(spark):
    """Welch t and df against the straightforward numpy computation."""
    import numpy as np

    from degdb_spark.operators.profile import welch_t_test

    a = [round(x, 2) for x in (1.10, 2.35, 3.50, 2.20, 4.05, 1.95, 2.80)]
    b = [round(x, 2) for x in (5.45, 6.10, 4.90, 7.25, 5.85)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    xa, xb = np.array(a), np.array(b)
    qa = xa.var(ddof=1) / len(xa)
    qb = xb.var(ddof=1) / len(xb)
    t = (xa.mean() - xb.mean()) / np.sqrt(qa + qb)
    dfw = (qa + qb) ** 2 / (qa**2 / (len(xa) - 1) + qb**2 / (len(xb) - 1))
    assert got["n_a"] == 7 and got["n_b"] == 5
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["df_welch"] == pytest.approx(dfw, abs=1e-5)
    assert got["mean_a"] == pytest.approx(xa.mean(), abs=1e-5)


def test_ohlc_struct_minmax_first_last(spark):
    """OHLC open/close pick the earliest/latest event per bar even when
    the extreme values sit mid-bar."""
    from pyspark.sql import functions as F

    rows = [
        # (event_id, ts_second, value) — one hour bar
        (1, 10, 5.0),   # first -> open
        (2, 20, 99.0),  # high
        (3, 30, 1.0),   # low
        (4, 40, 7.0),   # last -> close
    ]
    df = spark.createDataFrame(rows, ["event_id", "s", "value"]).withColumn(
        "ts", F.expr("timestamp_seconds(1700000000 + s)")
    )
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    got = df.groupBy().agg(
        first["value"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        last["value"].alias("close"),
    ).collect()[0]
    assert (got["open"], got["high"], got["low"], got["close"]) == (5.0, 99.0, 1.0, 7.0)


def test_token_budget_selection_is_quality_prefix(spark):
    """The selected set must be exactly the maximal quality-first
    prefix whose cumulative tokens fit the budget."""
    from degdb_spark.operators.ranking import global_running_sum
    from pyspark.sql import functions as F

    df = (
        spark.range(200)
        .withColumn("q", (F.pmod(F.col("id") * 131, F.lit(100)) / 100.0))
        .withColumn("toks", F.pmod(F.col("id") * 17, F.lit(40)) + 1)
    )
    cum = global_running_sum(
        df, [F.col("q").desc(), F.col("id")], "toks", sum_name="cum"
    )
    total = df.agg(F.sum("toks").alias("t")).collect()[0]["t"]
    budget = total // 4
    sel = {r["id"] for r in cum.filter(F.col("cum") <= budget).collect()}
    # replay on the driver
    rows = sorted(df.collect(), key=lambda r: (-r["q"], r["id"]))
    acc, expect = 0, set()
    for r in rows:
        acc += r["toks"]
        if acc > budget:
            break
        expect.add(r["id"])
    assert sel == expect and len(sel) > 0
    # selected tokens within budget; adding the next doc would overflow
    assert sum(r["toks"] for r in rows if r["id"] in sel) <= budget


def test_cusum_finds_planted_changepoint(spark):
    """A volume regime shift mid-series puts the |CUSUM| peak at the
    shift hour."""
    from pyspark.sql import functions as F
    from degdb_spark.queries.behavior_queries import events_cusum_changepoints
    import os

    # synthesize: 10 hours at rate 2, then 10 hours at rate 10
    rows = []
    eid = 0
    for h in range(20):
        rate = 2 if h < 10 else 10
        for i in range(rate):
            eid += 1
            rows.append((eid, h, "x", 1.0, 7))
    df = spark.createDataFrame(
        rows, ["event_id", "h", "event_type", "value", "user_id"]
    ).withColumn("ts", F.expr("timestamp_seconds(1704067200 + h * 3600)"))  # 2024-01-01 00:00 UTC
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.select("event_id", "ts", "user_id", "event_type", "value").withColumn(
            "props", F.lit("{}")
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = events_cusum_changepoints(spark, d).collect()
    assert len(out) == 1
    # CUSUM of (count - mean) is most negative just before the shift:
    # the peak |cusum| lands at hour 9 (mean 6, deficit 4/hour for 10h)
    assert out[0]["change_hour"].hour == 9
    assert out[0]["n_hours"] == 20 and out[0]["total_events"] == 120


def test_global_rank_and_cumsum_property(spark):
    """Property check across adversarial shapes: duplicate sort keys
    (tie-broken by id), skewed key distributions, single-partition and
    many-partition inputs — two-phase results always equal the naive
    global window."""
    from degdb_spark.operators.ranking import global_row_number, global_running_sum

    shapes = [
        (1, 1),      # single row
        (7, 1),      # all rows one key (pure tie-break)
        (257, 3),    # heavy duplication
        (1000, 997), # near-unique keys
    ]
    for n, n_keys in shapes:
        df = (
            spark.range(n)
            .repartition(8)
            .withColumn("key", F.pmod(F.col("id") * 131, F.lit(n_keys)))
            .withColumn("val", F.pmod(F.col("id") * 17, F.lit(29)) + 1)
        )
        order = [F.col("key"), F.col("id")]
        got_r = global_row_number(df, order, rank_name="rk")
        want_r = df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
        assert (
            got_r.select("id", "rk").exceptAll(want_r.select("id", "rk")).count() == 0
        ), (n, n_keys, "rank")
        got_s = global_running_sum(df, order, "val", sum_name="cs")
        want_s = df.withColumn(
            "cs",
            F.sum("val")
            .over(Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        assert (
            got_s.select("id", "cs").exceptAll(want_s.select("id", "cs")).count() == 0
        ), (n, n_keys, "cumsum")


def test_welch_t_test_small_group_nulls(spark):
    """A group with < 2 rows has no sample variance: t_stat/df_welch
    must come back NULL (not NaN), with n_a/n_b identifying the
    too-small side (ADVICE r4)."""
    from degdb_spark.operators.profile import welch_t_test

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)], "g string, v double"
    )
    got = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    assert (got["n_a"], got["n_b"]) == (3, 1)
    assert got["t_stat"] is None and got["df_welch"] is None
    assert got["mean_b"] == 5.0  # 1-row mean is still defined
    # absent group: everything about side b is null, counts still talk
    got2 = welch_t_test(df, "g", "v", "a", "zzz").collect()[0]
    assert (got2["n_a"], got2["n_b"]) == (3, 0)
    assert got2["t_stat"] is None and got2["mean_b"] is None


def test_shared_cut_second_phase_over_derived_column_matches_naive(spark):
    """The batch-8 Kaplan-Meier shape: two cumsum phases riding ONE
    cut_range_partitioned cut, where phase 2's value column is DERIVED
    from phase 1's running sum. Both phases must match the naive
    single-partition cumsums — for any boundary placement — and the
    exposed helpers must compose exactly like two independent
    global_running_sum calls did before the refactor."""
    from degdb_spark.operators.ranking import (
        cut_range_partitioned,
        running_sums_over,
    )

    df = _scrambled(spark, n=3000)
    order = [F.col("key"), F.col("id")]
    parted = cut_range_partitioned(df, order)
    p1 = running_sums_over(parted, order, ["val"], ["cum1"])
    # derived per-row column, then the second phase over the SAME cut
    # (p1 keeps _pid precisely so this works)
    p1 = p1.withColumn("v2", F.pmod(F.col("cum1"), F.lit(11)) + 1)
    p2 = running_sums_over(p1, order, ["v2"], ["cum2"]).drop("_pid")

    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    naive = df.withColumn("cum1", F.sum("val").over(w).cast("long"))
    naive = naive.withColumn("v2", F.pmod(F.col("cum1"), F.lit(11)) + 1)
    naive = naive.withColumn("cum2", F.sum("v2").over(w).cast("long"))

    assert (
        p2.select("id", "cum1", "cum2")
        .exceptAll(naive.select("id", "cum1", "cum2"))
        .count()
        == 0
    )
    assert p2.count() == naive.count()
