"""As-of join / range join / hypertable rollup / count-min sketch tests
with hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from degdb_spark.operators.sketch import cms_build, cms_estimate
from degdb_spark.operators.timeseries import asof_join, hypertable_rollup, range_join_count


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(30)), (2, _ts(5))],
        ["sym", "ts"],
    )
    trades = spark.createDataFrame(
        [(1, 100, _ts(12)), (1, 101, _ts(31)), (2, 102, _ts(4)), (2, 103, _ts(50))],
        ["sym", "trade_id", "ts"],
    )
    return quotes, trades


def test_asof_backward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {r.trade_id: r.asof_ts for r in asof_join(
        quotes, trades, on="sym", left_ts="ts", right_ts="ts"
    ).collect()}
    assert out[100] == _ts(10)  # latest quote <= 10:12
    assert out[101] == _ts(30)
    assert out[102] is None  # no quote before 10:04 for sym 2
    assert out[103] == _ts(5)


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = {r.trade_id: r.asof_ts for r in asof_join(
        quotes, trades, on="sym", left_ts="ts", right_ts="ts",
        tolerance_seconds=600,
    ).collect()}
    assert out[100] == _ts(10)  # 2 min gap, inside tolerance
    assert out[103] is None  # 45 min gap > 10 min tolerance


def test_range_join_count(spark):
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (1, 2, _ts(3)), (1, 3, _ts(4)), (1, 4, _ts(20)), (2, 5, _ts(4))],
        ["user", "eid", "ts"],
    )
    probes = ev.filter(F.col("eid").isin(3, 4, 5))
    out = {r.eid: r.n_in_range for r in range_join_count(
        probes, ev, on="user", probe_ts="ts", build_ts="ts", lookback_seconds=300
    ).collect()}
    # eid 3 @10:04: events 1(10:00) outside [09:59,10:04)? 10:00 >= 09:59 -> in; 2(10:03) in
    assert out[3] == 2
    assert out[4] == 0  # nothing in [10:15,10:20)
    assert out[5] == 0  # other user only


def test_hypertable_rollup_consistency(spark):
    from degdb_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    grains = hypertable_rollup(ev, dims=["event_type"])
    # day-from-hour equals day-from-raw
    direct = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("sum_value"),
    )
    d1 = {(r.bucket, r.event_type): (r.n, r.sum_value) for r in grains["day"].collect()}
    d2 = {(r.bucket, r.event_type): (r.n, r.sum_value) for r in direct.collect()}
    assert d1 == d2
    # month totals equal day totals
    m = grains["month"].agg(F.sum("n")).collect()[0][0]
    assert m == ev.count()


def test_cms_overestimates_only(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sketch = cms_build(ev, "user_id", depth=4, width=64)
    assert sketch.count() <= 4 * 64
    probes = ev.select("user_id").distinct()
    est = {r.probe_key: r.est_count for r in cms_estimate(sketch, probes, "user_id").collect()}
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est[u] >= exact[u] for u in exact)  # CMS never undercounts
    # with 20 users in 64 buckets the error should be modest
    rel_err = sum(est[u] - exact[u] for u in exact) / sum(exact.values())
    assert rel_err < 0.5


def test_hll_merge_equals_union_sketch(spark):
    """Register max-merge of two halves == sketch of the whole (exact law)."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.sketch import hll_estimate, hll_registers

    df = spark.range(0, 5000).select(
        (F.col("id") % 2).cast("string").alias("half"), F.col("id").alias("k")
    )
    per_half = hll_registers(df, "k", ["half"], p=8)
    merged = (
        per_half.groupBy("reg_idx")
        .agg(F.max("reg").alias("reg"))
        .withColumn("half", F.lit("ALL"))
    )
    direct = hll_registers(
        df.withColumn("half", F.lit("ALL")), "k", ["half"], p=8
    )
    got = {(r.reg_idx, r.reg) for r in merged.select("reg_idx", "reg").collect()}
    want = {(r.reg_idx, r.reg) for r in direct.select("reg_idx", "reg").collect()}
    assert got == want
    # and register table size is bounded by 2^p regardless of n
    assert merged.count() <= 256
    est = hll_estimate(merged, ["half"], p=8).collect()[0].est_distinct
    assert abs(est - 5000) / 5000 < 0.15  # ~6.5% RSE at p=8; 15% is >2 sigma


def test_hll_small_range_exactish(spark):
    """Linear-counting branch: tiny cardinalities stay near-exact."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.sketch import hll_estimate, hll_registers

    df = spark.range(0, 30).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    est = hll_estimate(hll_registers(df, "k", ["g"], p=8), ["g"], p=8).collect()[0]
    assert abs(est.est_distinct - 30) <= 3


def test_cms_join_size_overestimates_only(spark):
    """Inner-product estimate >= exact join size (CMS never
    undercounts), and is exact when sketches have no collisions."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.sketch import cms_join_size_estimate

    a = spark.range(0, 300).select((F.col("id") % 50).alias("k"))
    b = spark.range(0, 200).select((F.col("id") % 40).alias("k"))
    est = cms_join_size_estimate(a, b, "k", "k").collect()[0].est_join_size
    exact = (
        a.groupBy("k").count().withColumnRenamed("count", "na")
        .join(b.groupBy("k").count().withColumnRenamed("count", "nb"), on="k")
        .agg(F.sum(F.col("na") * F.col("nb"))).collect()[0][0]
    )
    assert est >= exact
    # with width >> keys, collisions are unlikely per row and the MIN
    # over 4 rows should be close; sanity-bound the overestimate
    assert est <= exact * 2


def test_kmv_set_ops_accuracy(spark):
    """Union/intersection estimates within KMV error bounds on known
    overlap (A=0..999, B=500..1499: union 1500, intersection 500)."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.sketch import kmv_set_ops

    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    r = kmv_set_ops(a, b, "k", "k", k=256).collect()[0]
    assert abs(r.est_union - 1500) / 1500 < 0.2
    assert abs(r.est_intersection - 500) / 500 < 0.35


def test_histogram_quantiles_degenerate_group(spark):
    """A group whose values are all equal (lo == hi) must yield the
    constant for every quantile — not NaN from the 0-width bin
    division (ADVICE r4) — in both the global and grouped variants."""
    import math

    from degdb_spark.operators.sketch import (
        histogram_quantiles,
        histogram_quantiles_by,
    )

    rows = [("a", 5.0)] * 7 + [("b", float(x)) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, x double")
    flat = histogram_quantiles(df.filter("g = 'a'"), "x", [0.5, 0.9]).collect()
    assert [r.est for r in flat] == [5.0, 5.0]
    grouped = histogram_quantiles_by(df, "x", "g", [0.5, 0.9]).collect()
    a = {r.q: r.est for r in grouped if r.g == "a"}
    assert a == {0.5: 5.0, 0.9: 5.0}
    b = {r.q: r.est for r in grouped if r.g == "b"}
    assert all(not math.isnan(v) for v in b.values()) and b[0.5] >= 1.0


# ---- property tier: CMS vs a pure-Python replica on random streams ----------

import hashlib as _hl

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_cell(key: str, row: int, width: int) -> int:
    return int(_hl.md5(f"{row}:{key}".encode()).hexdigest()[:8], 16) % width


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=60))
def test_cms_matches_python_replica_and_never_underestimates(spark, keys):
    """CMS build+estimate on a random stream must equal the pure-Python
    md5 replica CELL FOR CELL, and every estimate must satisfy the CMS
    law: exact count ≤ estimate (min over rows can only overestimate —
    collisions add, never subtract)."""
    from degdb_spark.operators.sketch import cms_build, cms_estimate

    depth, width = 4, 16  # narrow width so collisions actually happen
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    sketch = cms_build(df, "key", depth=depth, width=width)

    # cell-exact replica
    cells = {}
    for k in keys:
        for r in range(depth):
            cells[(r, _py_cell(k, r, width))] = cells.get((r, _py_cell(k, r, width)), 0) + 1
    got_cells = {(r.row, r.bucket): r.cnt for r in sketch.collect()}
    assert got_cells == cells

    probes = spark.createDataFrame([(k,) for k in sorted(set(keys))], "key string")
    est = {
        r.probe_key: r.est_count
        for r in cms_estimate(sketch, probes, "key", depth=depth, width=width).collect()
    }
    from collections import Counter

    exact = Counter(keys)
    for k, n in exact.items():
        want = min(cells[(r, _py_cell(k, r, width))] for r in range(depth))
        assert est[k] == want
        assert est[k] >= n  # the overestimate-only law


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.sampled_from([f"u{i}" for i in range(40)]), min_size=1, max_size=80))
def test_hll_registers_match_python_replica(spark, keys):
    """HLL registers on a random stream must equal the pure-Python
    replica REGISTER FOR REGISTER (60-bit md5 hash, p index bits,
    trailing-zero rho, max per register), and the register MERGE law
    must hold: registers(A ∪ B) == elementwise max of registers(A),
    registers(B) for a random split."""
    from degdb_spark.operators.sketch import hll_registers

    p = 4  # 16 registers so collisions happen at test size
    rmax = 60 - p + 1

    def py_regs(ks):
        regs = {}
        for k in ks:
            h = int(_hl.md5(k.encode()).hexdigest()[:15], 16)
            idx = h & ((1 << p) - 1)
            w = h >> p
            rho = rmax if w == 0 else ((w ^ (w - 1)).bit_count())
            regs[idx] = max(regs.get(idx, 0), rho)
        return regs

    df = spark.createDataFrame([(k,) for k in keys], "key string").withColumn(
        "g", F.lit(1)
    )
    got = {
        r.reg_idx: r.reg for r in hll_registers(df, "key", ["g"], p=p).collect()
    }
    assert got == py_regs(keys)

    # merge law on a deterministic split
    a, b = keys[::2], keys[1::2]
    merged = {}
    for part in (py_regs(a), py_regs(b)):
        for i, r in part.items():
            merged[i] = max(merged.get(i, 0), r)
    assert merged == py_regs(keys)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.sampled_from([f"v{i}" for i in range(30)]), min_size=1, max_size=60),
    st.integers(min_value=2, max_value=8),
)
def test_kmv_estimate_matches_python_replica(spark, keys, k):
    """KMV on a random stream must equal the pure-Python replica: same
    48-bit md5 unit hashes, same k-th order statistic, same exact-count
    branch when distincts < k."""
    from degdb_spark.operators.sketch import kmv_distinct_estimate

    df = spark.createDataFrame([(x,) for x in keys], "key string")
    row = kmv_distinct_estimate(df, "key", k=k).collect()[0]

    hs = sorted(
        int(_hl.md5(x.encode()).hexdigest()[:12], 16) / float(1 << 48)
        for x in set(keys)
    )
    if len(hs) < k:
        want_est, want_k = float(len(hs)), len(hs)
    else:
        want_est, want_k = (k - 1) / hs[k - 1], k
    assert row.k_used == want_k
    assert row.est_distinct == want_est


def test_hourly_acf_matches_numpy_reference(spark):
    """hourly_acf must equal the numpy replica of the same dense-grid
    formula — including densification of MISSING hours to zero and the
    6-dp floor-round — on a planted periodic series with gaps."""
    import datetime as dt
    import math

    import numpy as np

    from degdb_spark.queries.events_queries import hourly_acf

    base = dt.datetime(2024, 1, 1)
    # period-3 pattern over 30 hours, with hours 7 and 13 MISSING (x=0)
    planted = {}
    for i in range(30):
        if i in (7, 13):
            continue
        planted[i] = 5 + (i % 3) * 4
    rows = [(base + dt.timedelta(hours=i), x) for i, x in planted.items()]
    counts = spark.createDataFrame(rows, "h timestamp, x long")

    xs = np.array([planted.get(i, 0) for i in range(30)], dtype=np.int64)
    n = xs.size
    s, q = int(xs.sum()), int((xs * xs).sum())
    xbar = s / n
    expect = {}
    for k in range(1, 7):
        a, b = xs[:-k], xs[k:]
        p = int((a * b).sum())
        num = p - xbar * (int(a.sum()) + int(b.sum())) + (n - k) * xbar * xbar
        den = q - n * xbar * xbar
        expect[k] = (n - k, math.floor(num / den * 1_000_000 + 0.5) / 1_000_000)

    got = {r.lag: (r.n_pairs, r.acf) for r in hourly_acf(spark, counts).collect()}
    assert got == expect
    # period-3 signal: lag-3 autocorrelation dominates lags 1 and 2
    assert got[3][1] > got[1][1] and got[3][1] > got[2][1]


def test_hourly_acf_constant_series_is_null(spark):
    """Zero-variance (constant) series: the ACF is undefined — every
    lag emits NULL instead of dividing by zero (ANSI mode would error;
    the oracle SQL carries the identical CASE guard)."""
    import datetime as dt

    from degdb_spark.queries.events_queries import hourly_acf

    base = dt.datetime(2024, 5, 1)
    counts = spark.createDataFrame(
        [(base + dt.timedelta(hours=i), 7) for i in range(20)],
        "h timestamp, x long",
    )
    rows = hourly_acf(spark, counts).collect()
    assert len(rows) == 6
    assert all(r.acf is None for r in rows)
    assert [r.n_pairs for r in rows] == [19, 18, 17, 16, 15, 14]


def test_hourly_acf_outlier_span_raises(spark):
    """ADVICE r9: one epoch-zero outlier timestamp would inflate the
    dense grid to ~half a million rows per decade of span — past
    MAX_GRID_HOURS the guard raises instead of densifying garbage."""
    import datetime as dt

    from degdb_spark.queries.events_queries import MAX_GRID_HOURS, hourly_acf

    counts = spark.createDataFrame(
        [(dt.datetime(1970, 1, 1), 3), (dt.datetime(2150, 1, 1), 5)],
        "h timestamp, x long",
    )
    assert (dt.datetime(2150, 1, 1) - dt.datetime(1970, 1, 1)).days * 24 > MAX_GRID_HOURS
    with pytest.raises(ValueError, match="MAX_GRID_HOURS"):
        hourly_acf(spark, counts)
