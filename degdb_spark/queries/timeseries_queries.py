"""Contract queries for the custom time-series + sketch operators —
all oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_sql,
    cms_join_size_estimate,
    cms_join_size_sql,
    hll_estimate,
    hll_registers,
    hll_sql,
    kmv_distinct_estimate,
    kmv_set_ops,
    kmv_set_ops_sql,
    kmv_sql,
)
from degdb_spark.operators.timeseries import asof_join, hypertable_rollup, range_join_count
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum


def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's most recent click at or
    before it (1-hour tolerance). Summarised per user for a bounded
    output."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        tolerance_seconds=3600,
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("asof_ts").alias("n_with_click"),
        )
        .orderBy("user_id")
    )


ASOF_SQL = """
WITH purchases AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
), with_click AS (
  SELECT p.user_id, p.event_id,
         (SELECT MAX(c.ts) FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id
            AND c.ts <= p.ts) AS last_click
  FROM purchases p
)
SELECT user_id, COUNT(*) AS n_purchases,
       COUNT(CASE WHEN last_click IS NOT NULL
                   AND FLOOR(EPOCH(ts_part)) - FLOOR(EPOCH(last_click)) <= 3600
             THEN 1 END) AS n_with_click
FROM (SELECT w.user_id, w.event_id, w.last_click, p2.ts AS ts_part
      FROM with_click w JOIN purchases p2 ON w.event_id = p2.event_id)
GROUP BY user_id ORDER BY user_id
"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, how many same-user events occurred
    in the preceding 5 minutes. Histogram over that count."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    counted = range_join_count(
        errors, ev, on="user_id", probe_ts="ts", build_ts="ts", lookback_seconds=300
    )
    return (
        counted.groupBy("n_in_range")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy("n_in_range")
    )


RANGE_SQL = """
WITH errors AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'
), counted AS (
  SELECT e.event_id,
         (SELECT COUNT(*) FROM events b
          WHERE b.user_id = e.user_id
            AND FLOOR(EPOCH(b.ts)) >= FLOOR(EPOCH(e.ts)) - 300
            AND FLOOR(EPOCH(b.ts)) < FLOOR(EPOCH(e.ts))) AS n_in_range
  FROM errors e
)
SELECT n_in_range, COUNT(*) AS n_errors
FROM counted GROUP BY n_in_range ORDER BY n_in_range
"""


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day grain built FROM the hourly continuous aggregate (per event
    type) — must equal a direct daily aggregation."""
    ev = load_table(spark, sf_dir, "events")
    day = hypertable_rollup(ev, dims=["event_type"])["day"]
    return day.select(
        "bucket",
        "event_type",
        "n",
        "sum_value",
        F.floor(F.col("avg_value") * 10000 + F.lit(0.5)) / 10000,
    ).withColumnRenamed(
        "(FLOOR(((avg_value * 10000) + 0.5)) / 10000)", "avg_value"
    ).orderBy("bucket", "event_type")


ROLLUP_HT_SQL = """
SELECT DATE_TRUNC('day', ts)::TIMESTAMP_NS AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value,
       FLOOR((CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_value
FROM events
GROUP BY DATE_TRUNC('day', ts), event_type
ORDER BY bucket, event_type
"""


def events_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates for user_id frequencies (depth 4 × width 64
    over 10k events) next to exact counts for the first 30 users."""
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    probes = ev.select("user_id").distinct().filter(F.col("user_id") < 30)
    est = cms_estimate(sketch, probes, "user_id")
    exact = ev.filter(F.col("user_id") < 30).groupBy(
        F.col("user_id").alias("probe_key")
    ).agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        est.join(exact, on="probe_key")
        .select("probe_key", "est_count", "exact_count")
        .orderBy("probe_key")
    )


CMS_SQL = (
    "WITH cms AS ("
    + cms_sql(
        "SELECT user_id AS key FROM events",
        "SELECT DISTINCT user_id AS key FROM events WHERE user_id < 30",
    )
    + """),
exact AS (
  SELECT user_id AS probe_key, COUNT(*) AS exact_count
  FROM events WHERE user_id < 30 GROUP BY user_id
)
SELECT cms.probe_key, cms.est_count, exact.exact_count
FROM cms JOIN exact USING (probe_key)
ORDER BY probe_key
"""
)


def events_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate with k=64 (vs ~1000 true uniques at
    sf0.01) next to the exact count — deterministic, so the estimate
    itself is oracle-checked, not just bounded."""
    ev = load_table(spark, sf_dir, "events")
    est = kmv_distinct_estimate(ev, "user_id", k=64)
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.crossJoin(exact).select(
        (F.floor(F.col("est_distinct") * 100 + F.lit(0.5)) / 100).alias("est_distinct"),
        "k_used",
        "exact_distinct",
    )


KMV_SQL = (
    "WITH kmv AS ("
    + kmv_sql("SELECT user_id AS key FROM events", k=64)
    + """),
exact AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events)
SELECT FLOOR(kmv.est_distinct * 100 + 0.5) / 100 AS est_distinct,
       kmv.k_used, exact.exact_distinct
FROM kmv CROSS JOIN exact
"""
)


def events_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event type + an 'ALL' scope built by
    MERGING the per-type register tables (elementwise MAX) — while the
    oracle sketches the full stream directly. The two agree only
    because HLL register-merge is exact sketch union, so the hash
    check verifies mergeability itself, not just the estimate. At
    100 TB this is the pattern for cross-partition / cross-day
    distincts: persist 2^p-row register tables, merge with a MAX."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    regs = hll_registers(ev, "user_id", ["event_type"], p=8)
    merged = (
        regs.groupBy("reg_idx")
        .agg(F.max("reg").alias("reg"))
        .withColumn("event_type", F.lit("ALL"))
    )
    est = hll_estimate(regs.unionByName(merged), ["event_type"], p=8)
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .unionByName(
            ev.agg(F.countDistinct("user_id").alias("exact_distinct")).withColumn(
                "event_type", F.lit("ALL")
            )
        )
    )
    return (
        est.join(exact, on="event_type")
        .select(F.col("event_type").alias("scope"), "est_distinct", "exact_distinct")
        .orderBy("scope")
    )


HLL_SQL = (
    "WITH typed AS ("
    + hll_sql("SELECT event_type, user_id AS key FROM events", "event_type", p=8)
    + "), allscope AS ("
    + hll_sql("SELECT event_type, user_id AS key FROM events", "'ALL'", p=8)
    + """),
est AS (SELECT * FROM typed UNION ALL SELECT * FROM allscope),
exact AS (
  SELECT event_type AS grp, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
  UNION ALL
  SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
)
SELECT est.grp AS scope, est.est_distinct, exact.exact_distinct
FROM est JOIN exact ON est.grp = exact.grp
ORDER BY scope
"""
)


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS heavy hitters: users whose estimated frequency exceeds 1.1×
    the mean (the SpaceSaving-style candidate set from a linear sketch),
    with exact counts attached for the survivors. At 100 TB the
    candidate filter runs against the tiny sketch; only candidates touch
    the exact-count aggregation."""
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    # scale-invariant threshold (10% above the mean per-user frequency)
    # computed IN-PLAN as a broadcast 1-row aggregate — no driver-side
    # count()/distinct().count() actions ahead of the query itself
    thresh = ev.agg(
        (
            F.count(F.lit(1)).cast("double")
            / F.count_distinct("user_id")
            * F.lit(1.1)
        ).alias("_t")
    )
    probes = ev.select("user_id").distinct()
    cands = (
        cms_estimate(sketch, probes, "user_id")
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("est_count") > F.col("_t"))
        .drop("_t")
    )
    exact = ev.groupBy(F.col("user_id").alias("probe_key")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        cands.join(exact, on="probe_key")
        .select("probe_key", "est_count", "exact_count")
        .orderBy("probe_key")
    )


HH_SQL = (
    "WITH cms AS ("
    + cms_sql(
        "SELECT user_id AS key FROM events",
        "SELECT DISTINCT user_id AS key FROM events",
    )
    + """),
thresh AS (
  SELECT COUNT(*)::DOUBLE / COUNT(DISTINCT user_id) * 1.1 AS t FROM events
),
exact AS (
  SELECT user_id AS probe_key, COUNT(*) AS exact_count
  FROM events GROUP BY user_id
)
SELECT cms.probe_key, cms.est_count, exact.exact_count
FROM cms JOIN exact USING (probe_key)
WHERE cms.est_count > (SELECT t FROM thresh)
ORDER BY probe_key
"""
)


_QS = [0.5, 0.9, 0.99]
_QBINS = 1000


def lineitem_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles of l_extendedprice (p50/p90/p99) —
    the mergeable, two-scan, no-global-sort quantile path
    (operators/sketch.py::histogram_quantiles). Error ≤ one bin width;
    the sketch (1000 integer bin counts) replays exactly in SQL."""
    from degdb_spark.operators.sketch import histogram_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantiles(li, "l_extendedprice", _QS, n_bins=_QBINS)


def _quantile_sketch_sql(qs: list[float], n_bins: int) -> str:
    one = []
    for q in qs:
        one.append(f"""
SELECT {float(q)} AS q,
       FLOOR((lo + (CAST(bin AS DOUBLE) + ((n * {float(q)}) - prev_cum) / c)
              * ((hi - lo) / {float(n_bins)})) * 10000 + 0.5) / 10000 AS est
FROM (
  SELECT * FROM cum CROSS JOIN total
  WHERE cum >= n * {float(q)} AND prev_cum < n * {float(q)}
  ORDER BY bin LIMIT 1
)""".strip())
    return f"""
WITH bounds AS (
  SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
         CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
  FROM lineitem
), binned AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((CAST(l_extendedprice AS DOUBLE) - lo)
                                   / (CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / {float(n_bins)} END)), 0),
                    {n_bins - 1}) AS BIGINT) AS bin,
         COUNT(*) AS c, MAX(lo) AS lo, MAX(hi) AS hi
  FROM lineitem CROSS JOIN bounds
  GROUP BY 1
), cum0 AS (
  SELECT bin, c, lo, hi, SUM(c) OVER (ORDER BY bin) AS cum FROM binned
), cum AS (
  SELECT bin, c, lo, hi, cum,
         COALESCE(LAG(cum) OVER (ORDER BY bin), 0) AS prev_cum
  FROM cum0
), total AS (SELECT SUM(c) AS n FROM binned)
{chr(10) + 'UNION ALL' + chr(10)}{(chr(10) + 'UNION ALL' + chr(10)).join(one)}
ORDER BY q
""".replace(f"{chr(10)}UNION ALL{chr(10)}", "", 1)




def lineitem_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise histogram-sketch quantiles (p50/p90/p99 of
    l_extendedprice per returnflag) — the mergeable sketch from
    lineitem_quantile_sketch, partitioned: groups × n_bins bin rows,
    PARTITIONED cum/lag windows, broadcast per-group bounds."""
    from degdb_spark.operators.sketch import histogram_quantiles_by

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantiles_by(
        li, "l_extendedprice", "l_returnflag", _QS, n_bins=_QBINS
    )


def _quantiles_by_sql(qs: list[float], n_bins: int) -> str:
    one = []
    for q in qs:
        one.append(f"""
SELECT g AS l_returnflag, {float(q)} AS q,
       FLOOR((lo + (CAST(bin AS DOUBLE) + ((n * {float(q)}) - prev_cum) / c)
              * ((hi - lo) / {float(n_bins)})) * 10000 + 0.5) / 10000 AS est
FROM (
  SELECT cum.*, total.n,
         ROW_NUMBER() OVER (PARTITION BY cum.g ORDER BY bin) AS rk
  FROM cum JOIN total USING (g)
  WHERE cum >= n * {float(q)} AND prev_cum < n * {float(q)}
) WHERE rk = 1""".strip())
    return f"""
WITH bounds AS (
  SELECT l_returnflag AS g,
         CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
         CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
  FROM lineitem GROUP BY l_returnflag
), binned AS (
  SELECT b.g,
         CAST(LEAST(GREATEST(FLOOR((CAST(l_extendedprice AS DOUBLE) - lo)
                                   / (CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / {float(n_bins)} END)), 0),
                    {n_bins - 1}) AS BIGINT) AS bin,
         COUNT(*) AS c, MAX(lo) AS lo, MAX(hi) AS hi
  FROM lineitem l JOIN bounds b ON l.l_returnflag = b.g
  GROUP BY 1, 2
), cum0 AS (
  SELECT g, bin, c, lo, hi,
         SUM(c) OVER (PARTITION BY g ORDER BY bin) AS cum
  FROM binned
), cum AS (
  SELECT g, bin, c, lo, hi, cum,
         COALESCE(LAG(cum) OVER (PARTITION BY g ORDER BY bin), 0) AS prev_cum
  FROM cum0
), total AS (SELECT g, SUM(c) AS n FROM binned GROUP BY g)
{(chr(10) + 'UNION ALL' + chr(10)).join(one)}
ORDER BY l_returnflag, q
"""


def events_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of per-user inter-arrival seconds — the behavioral
    cadence metric (bot detection, session-gap tuning). Lag windows
    are PARTITIONED by user (scale-safe), then the mergeable
    histogram-sketch quantile path runs over the derived gap column —
    no global sort at any stage."""
    from degdb_spark.operators.sketch import histogram_quantiles
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
            .cast("double")
            .alias("gap_s")
        )
    )
    return histogram_quantiles(gaps, "gap_s", _QS, n_bins=_QBINS)


def _interarrival_sql(qs: list[float], n_bins: int) -> str:
    one = []
    for q in qs:
        one.append(f"""
SELECT {float(q)} AS q,
       FLOOR((lo + (CAST(bin AS DOUBLE) + ((n * {float(q)}) - prev_cum) / c)
              * ((hi - lo) / {float(n_bins)})) * 10000 + 0.5) / 10000 AS est
FROM (
  SELECT * FROM cum CROSS JOIN total
  WHERE cum >= n * {float(q)} AND prev_cum < n * {float(q)}
  ORDER BY bin LIMIT 1
)""".strip())
    return f"""
WITH gaps AS (
  SELECT CAST(FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS DOUBLE) AS gap_s
  FROM events
  QUALIFY LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
), bounds AS (
  SELECT CAST(MIN(gap_s) AS DOUBLE) AS lo, CAST(MAX(gap_s) AS DOUBLE) AS hi
  FROM gaps
), binned AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((gap_s - lo) / (CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / {float(n_bins)} END)), 0),
                    {n_bins - 1}) AS BIGINT) AS bin,
         COUNT(*) AS c, MAX(lo) AS lo, MAX(hi) AS hi
  FROM gaps CROSS JOIN bounds
  GROUP BY 1
), cum0 AS (
  SELECT bin, c, lo, hi, SUM(c) OVER (ORDER BY bin) AS cum FROM binned
), cum AS (
  SELECT bin, c, lo, hi, cum,
         COALESCE(LAG(cum) OVER (ORDER BY bin), 0) AS prev_cum
  FROM cum0
), total AS (SELECT SUM(c) AS n FROM binned)
{(chr(10) + 'UNION ALL' + chr(10)).join(one)}
ORDER BY q
"""


def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-7-day WAU / stickiness per day — the engagement
    headline. Rolling DISTINCT is normally the killer (you can't sum
    distincts); here it's free because the per-day HLL REGISTER tables
    merge by elementwise MAX: a RANGE(-6,0) window partitioned by
    register index (days × 2^p rows — aggregate-sized) IS the 7-day
    sketch union, and absent registers densify to 0 then drop before
    estimation (a 0-register is exactly an empty one). DAU comes from
    the same day sketches, so the ratio is sketch-consistent."""
    from degdb_spark.operators import sketch as SK
    from pyspark.sql import Window

    p = 8
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    regs = SK.hll_registers(ev, "user_id", ["day"], p=p)
    days = regs.select("day").distinct()
    grid = days.crossJoin(
        F.broadcast(
            spark.range(1 << p).select(F.col("id").alias("reg_idx"))
        )
    )
    d0 = days.agg(F.min("day").alias("_d0"))
    dense = (
        grid.join(regs, on=["day", "reg_idx"], how="left")
        .withColumn("reg", F.coalesce("reg", F.lit(0)))
        .crossJoin(F.broadcast(d0))
        .withColumn("di", F.datediff("day", "_d0"))
    )
    w = Window.partitionBy("reg_idx").orderBy("di").rangeBetween(-6, 0)
    rolled = (
        dense.withColumn("rreg", F.max("reg").over(w))
        .filter(F.col("rreg") > 0)
        .select("day", "reg_idx", F.col("rreg").alias("reg"))
    )
    wau = SK.hll_estimate(rolled, ["day"], p=p).withColumnRenamed(
        "est_distinct", "wau_est"
    )
    dau = SK.hll_estimate(regs, ["day"], p=p).withColumnRenamed(
        "est_distinct", "dau_est"
    )
    return (
        dau.join(wau, on="day")
        .withColumn("stickiness", dround(F.col("dau_est") / F.col("wau_est"), 4))
        .orderBy("day")
    )


def _rolling_wau_sql(p: int = 8) -> str:
    m = 1 << p
    rmax = 60 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = (
        f"FLOOR((CASE WHEN ({alpha * m * m!r} / z) <= {2.5 * m!r} AND v > 0 "
        f"THEN {float(m)!r} * (FLOOR(ln({float(m)!r} / v) * 1000000 + 0.5) / 1000000) "
        f"ELSE {alpha * m * m!r} / z END) * 100 + 0.5) / 100"
    )
    return f"""
WITH src AS (
  SELECT DATE_TRUNC('day', ts) AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR(64))), 1, 15)) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
), regs AS (
  SELECT day, h & {m - 1} AS reg_idx,
         MAX(CASE WHEN (h >> {p}) = 0 THEN {rmax}
                  ELSE bit_count(xor(h >> {p}, (h >> {p}) - 1)) END) AS reg
  FROM src GROUP BY day, reg_idx
), days AS (SELECT DISTINCT day FROM regs),
d0 AS (SELECT MIN(day) AS d0 FROM days),
grid AS (
  SELECT day, r.range AS reg_idx FROM days CROSS JOIN range({m}) r
), dense AS (
  SELECT g.day, g.reg_idx, COALESCE(regs.reg, 0) AS reg,
         DATEDIFF('day', d0.d0, g.day) AS di
  FROM grid g LEFT JOIN regs ON g.day = regs.day AND g.reg_idx = regs.reg_idx
  CROSS JOIN d0
), rolled AS (
  SELECT day, reg_idx,
         MAX(reg) OVER (PARTITION BY reg_idx ORDER BY di
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS reg
  FROM dense
), wagg AS (
  SELECT day,
         SUM((CAST(1 AS BIGINT) << ({rmax} - reg))) AS s, COUNT(*) AS nreg
  FROM rolled WHERE reg > 0 GROUP BY day
), west AS (
  SELECT day,
    (s + ({m} - nreg) * (CAST(1 AS BIGINT) << {rmax}))::DOUBLE / {float(1 << rmax)!r} AS z,
    {m} - nreg AS v
  FROM wagg
), wau AS (SELECT day, {est} AS wau_est FROM west),
dagg AS (
  SELECT day,
         SUM((CAST(1 AS BIGINT) << ({rmax} - reg))) AS s, COUNT(*) AS nreg
  FROM regs GROUP BY day
), dest AS (
  SELECT day,
    (s + ({m} - nreg) * (CAST(1 AS BIGINT) << {rmax}))::DOUBLE / {float(1 << rmax)!r} AS z,
    {m} - nreg AS v
  FROM dagg
), dau AS (SELECT day, {est} AS dau_est FROM dest)
SELECT dau.day::TIMESTAMP_NS AS day, dau.dau_est, wau.wau_est,
       FLOOR((dau.dau_est / wau.wau_est) * 10000 + 0.5) / 10000 AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY day
"""


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars of event value — the
    candle aggregation every metrics store needs. First/last per bar
    via struct MIN/MAX over (ts, event_id, value) — ONE aggregation,
    no window at all: (ts, event_id) is a total order, so the struct
    minimum IS the first event and `value` rides along (same
    order-by-the-key-itself trick as setsim's rarest-first sort)."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "ts", "event_id", "value"
    )
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        keyed.groupBy("hour")
        .agg(
            dround(first["value"], 2).alias("open"),
            dround(F.max("value"), 2).alias("high"),
            dround(F.min("value"), 2).alias("low"),
            dround(last["value"], 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("volume"),
        )
        .orderBy("hour")
    )


OHLC_SQL = """
SELECT DATE_TRUNC('hour', ts)::TIMESTAMP_NS AS hour,
  FLOOR((MIN({'ts': ts, 'event_id': event_id, 'value': value})).value * 100 + 0.5) / 100 AS open,
  FLOOR(MAX(value) * 100 + 0.5) / 100 AS high,
  FLOOR(MIN(value) * 100 + 0.5) / 100 AS low,
  FLOOR((MAX({'ts': ts, 'event_id': event_id, 'value': value})).value * 100 + 0.5) / 100 AS close,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS volume
FROM events
GROUP BY DATE_TRUNC('hour', ts)
ORDER BY hour
"""


def events_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from CMS inner products
    (operators/sketch.cms_join_size_estimate): predicted size of
    click-events x purchase-events on user_id from two sketches that
    never see each other's rows, next to the exact answer — the
    optimizer-statistics primitive for joins you haven't run yet."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    est = cms_join_size_estimate(clicks, purchases, "user_id", "user_id")
    exact = (
        clicks.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("na"))
        .join(
            purchases.groupBy("user_id").agg(F.count(F.lit(1)).alias("nb")),
            on="user_id",
        )
        .agg(F.sum(F.col("na") * F.col("nb")).alias("exact_join_size"))
    )
    return est.crossJoin(exact)


JOIN_SIZE_SQL = (
    "WITH est AS ("
    + cms_join_size_sql(
        "SELECT user_id AS key FROM events WHERE event_type = 'click'",
        "SELECT user_id AS key FROM events WHERE event_type = 'purchase'",
    )
    + """),
exact AS (
  SELECT CAST(SUM(a.na * b.nb) AS BIGINT) AS exact_join_size
  FROM (SELECT user_id, COUNT(*) AS na FROM events WHERE event_type = 'click' GROUP BY user_id) a
  JOIN (SELECT user_id, COUNT(*) AS nb FROM events WHERE event_type = 'purchase' GROUP BY user_id) b
  USING (user_id)
)
SELECT est.est_join_size, exact.exact_join_size FROM est CROSS JOIN exact
"""
)




def events_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra from sketches (operators/sketch.kmv_set_ops):
    estimated union/intersection of clicking vs purchasing users,
    next to the exact answers."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    est = kmv_set_ops(clicks, purchases, "user_id", "user_id", k=128)
    ca = clicks.select("user_id").distinct()
    cb = purchases.select("user_id").distinct()
    exact = (
        ca.unionByName(cb)
        .distinct()
        .agg(F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(
            ca.join(cb, on="user_id", how="left_semi").agg(
                F.count(F.lit(1)).alias("exact_intersection")
            )
        )
    )
    return est.crossJoin(exact)


KMV_SETOPS_SQL = (
    "WITH est AS ("
    + kmv_set_ops_sql(
        "SELECT user_id AS key FROM events WHERE event_type = 'click'",
        "SELECT user_id AS key FROM events WHERE event_type = 'purchase'",
        k=128,
    )
    + """),
exact AS (
  SELECT
    (SELECT COUNT(*) FROM (
       SELECT DISTINCT user_id FROM events WHERE event_type IN ('click','purchase')
     )) AS exact_union,
    (SELECT COUNT(*) FROM (
       SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
       INTERSECT
       SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
     )) AS exact_intersection
)
SELECT est.est_union, est.est_intersection, exact.exact_union, exact.exact_intersection
FROM est CROSS JOIN exact
"""
)


QUERIES: dict[str, Query] = {
    "lineitem_quantile_sketch": Query(
        lineitem_quantile_sketch, _quantile_sketch_sql(_QS, _QBINS)
    ),
    "lineitem_quantiles_by_flag": Query(
        lineitem_quantiles_by_flag, _quantiles_by_sql(_QS, _QBINS)
    ),
    "events_ohlc_bars": Query(events_ohlc_bars, OHLC_SQL),
    "events_interarrival_quantiles": Query(
        events_interarrival_quantiles, _interarrival_sql(_QS, _QBINS)
    ),
    "events_rolling_wau": Query(events_rolling_wau, _rolling_wau_sql()),
    "events_heavy_hitters": Query(events_heavy_hitters, HH_SQL),
    "events_kmv_distinct": Query(events_kmv, KMV_SQL),
    "events_hll_distinct": Query(events_hll, HLL_SQL),
    "events_join_size_estimate": Query(events_join_size, JOIN_SIZE_SQL),
    "events_kmv_setops": Query(events_kmv_setops, KMV_SETOPS_SQL),
    "events_asof_join": Query(events_asof, ASOF_SQL),
    "events_range_join": Query(events_range_join, RANGE_SQL),
    "events_hypertable_rollup": Query(events_hypertable_rollup, ROLLUP_HT_SQL),
    "events_cms_estimate": Query(events_cms, CMS_SQL),
}
