"""User-behavior analytics over the events table — funnel conversion,
cohort retention, recency-decayed engagement scoring, and volume anomaly
detection. These are the event-log curation primitives a training-data
pipeline runs before sampling interaction data (e.g. recency-weighted
user sampling, bot/anomaly exclusion).

The reference has no analytics surface (SURVEY §2.4 — its only
aggregate is COUNT, triplestore/triplestore.go:167); these extend the
"not present in reference, required by the driver harness" family.

Scale notes (100 TB): every query here shuffles once on user_id (the
natural key); the stacked windows/aggregations after that first
exchange reuse the same hash partitioning, so Catalyst plans no second
exchange. Cohort/anomaly outputs are per-(day|hour) — thousands of
groups, never data-sized. The decay score caps the per-user window at
the 16 most recent events, so state is O(1) per user and the decimal
accumulation stays exact (0.5^n is a terminating binary AND decimal
fraction — both engines sum it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum, sql_dround, sql_dsum
from degdb_spark.persistence import pin

#: funnel stage order: browse → engage → convert.
_FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (view → click → purchase): a user counts
    for stage k only if stage k's first qualifying event is strictly
    after their stage k-1 time. Stacked windows on one user_id
    partitioning — a single exchange end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v, c, p = _FUNNEL_STAGES
    staged = (
        ev.withColumn(
            "t1", F.min(F.when(F.col("event_type") == v, F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == c) & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == p) & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("n_stage1"),
        F.count("t2").alias("n_stage2"),
        F.count("t3").alias("n_stage3"),
        F.count(F.lit(1)).alias("n_users"),
    )


FUNNEL_SQL = f"""
WITH staged AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{_FUNNEL_STAGES[0]}' THEN ts END)
           OVER (PARTITION BY user_id) AS t1,
         event_type, ts
  FROM events
), s2 AS (
  SELECT user_id, t1,
         MIN(CASE WHEN event_type = '{_FUNNEL_STAGES[1]}' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2,
         event_type, ts
  FROM staged
), s3 AS (
  SELECT user_id, t1, t2,
         MIN(CASE WHEN event_type = '{_FUNNEL_STAGES[2]}' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2
), per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
)
SELECT COUNT(t1) AS n_stage1, COUNT(t2) AS n_stage2, COUNT(t3) AS n_stage3,
       COUNT(*) AS n_users
FROM per_user
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: cohort = a user's first active day;
    for day offsets 0..7, how many of the cohort were active again.
    Two aggregations, both keyed by user_id then cohort — the classic
    two-shuffle retention shape (first-touch, then cohort rollup)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .withColumn(
            "offset_days",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long"),
        )
        .filter(F.col("offset_days") <= 7)
        .groupBy("cohort_day", "offset_days")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "offset_days")
    )


RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day FROM events
), first_day AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT first_day.cohort_day::TIMESTAMP_NS AS cohort_day,
       DATEDIFF('day', first_day.cohort_day, ev.day) AS offset_days,
       COUNT(DISTINCT ev.user_id) AS n_active
FROM ev JOIN first_day ON ev.user_id = first_day.user_id
WHERE DATEDIFF('day', first_day.cohort_day, ev.day) <= 7
GROUP BY first_day.cohort_day, offset_days
ORDER BY cohort_day, offset_days
"""

#: recency decay per step; 0.5 is a terminating fraction in binary AND
#: decimal, so value·0.5^n is exact in DECIMAL(38,20) on both engines —
#: summation is order-independent (see rounding.py discipline).
_DECAY_DEPTH = 16


def events_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score: Σ value·0.5^(age_rank) over a
    user's 16 most recent events (rank 0 = most recent). The
    recency-weighted user sampling weight for interaction-data curation.
    One shuffle on user_id; the row_number window and the groupBy reuse
    the same partitioning; per-user state is capped at 16 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _DECAY_DEPTH
    )
    weighted = ranked.withColumn(
        "wv",
        (F.col("value") * F.pow(F.lit(0.5), F.col("rn") - 1)).cast(
            "decimal(38,20)"
        ),
    )
    return (
        weighted.groupBy("user_id")
        .agg(F.sum("wv").cast("double").alias("decay_score"))
        .withColumn("decay_score", dround(F.col("decay_score"), 6))
        .orderBy(F.col("decay_score").desc(), F.col("user_id"))
        .limit(50)
    )


DECAY_SQL = f"""
WITH ranked AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), weighted AS (
  SELECT user_id,
         CAST(value * POW(0.5, rn - 1) AS DECIMAL(38,20)) AS wv
  FROM ranked WHERE rn <= {_DECAY_DEPTH}
)
SELECT user_id,
       {sql_dround("CAST(SUM(wv) AS DOUBLE)", 6)} AS decay_score
FROM weighted GROUP BY user_id
ORDER BY decay_score DESC, user_id
LIMIT 50
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-volume anomaly detection: for each event_type, z-score of
    each hour's event count against that type's own hourly distribution
    (population moments); |z| > 2 flags the hour. Moments are computed
    from exact integer sums (counts are ints → DECIMAL sums are exact),
    so both engines derive identical doubles. Per-type moments are a
    tiny broadcast aggregate, not a driver round-trip."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    moments = hourly.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).alias("h"),
    )
    joined = hourly.join(F.broadcast(moments), "event_type")
    mean = F.col("s1").cast("double") / F.col("h")
    var = F.col("s2").cast("double") / F.col("h") - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        # var == 0 (a type with perfectly uniform hours) would divide by
        # zero — engines disagree on double x/0 (NULL vs inf), so gate it.
        joined.filter(F.col("s2") * F.col("h") > F.col("s1") * F.col("s1"))
        .withColumn("z", dround(z, 4))
        .filter(F.abs(F.col("z")) > 2.0)
        .select("event_type", "hour", "n", "z")
        .orderBy("event_type", "hour")
    )


ANOMALY_SQL = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
), moments AS (
  SELECT event_type, SUM(n) AS s1, SUM(n * n) AS s2, COUNT(*) AS h
  FROM hourly GROUP BY event_type
), scored AS (
  SELECT hourly.event_type, hourly.hour, hourly.n,
         FLOOR(((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / h) /
                SQRT(CAST(s2 AS DOUBLE) / h -
                     (CAST(s1 AS DOUBLE) / h) * (CAST(s1 AS DOUBLE) / h)))
               * 10000 + 0.5) / 10000 AS z
  FROM hourly JOIN moments ON hourly.event_type = moments.event_type
  WHERE s2 * h > s1 * s1
)
SELECT event_type, hour::TIMESTAMP_NS AS hour, n, z
FROM scored WHERE ABS(z) > 2.0
ORDER BY event_type, hour
"""


def events_scd2_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: collapse each user's event stream into
    validity intervals of consecutive same-type runs (valid_from =
    first ts of the run, valid_to = next run's start, NULL while
    current). The change-data-capture shape for slowly-changing
    attributes: one lag window to detect changes, one running-sum
    window to number segments, one groupBy — all on the same user_id
    partitioning, one exchange end-to-end. Output bounded to users
    < 30 to keep the contract row count stable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "chg",
            (
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type"))
            ).cast("int"),
        )
        .withColumn(
            "seg",
            F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    runs = seg.groupBy("user_id", "seg", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("seg")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w2))
        .select("user_id", "seg", "event_type", "valid_from", "valid_to", "n_events")
        .orderBy("user_id", "seg")
    )


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_id, ts, event_type FROM events WHERE user_id < 30
), seg AS (
  SELECT user_id, ts, event_type,
         SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM (
    SELECT user_id, event_id, ts, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM ev
  )
), runs AS (
  SELECT user_id, CAST(seg AS BIGINT) AS seg, event_type,
         MIN(ts)::TIMESTAMP_NS AS valid_from, COUNT(*) AS n_events
  FROM seg GROUP BY user_id, seg, event_type
)
SELECT user_id, seg, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
         ::TIMESTAMP_NS AS valid_to,
       n_events
FROM runs ORDER BY user_id, seg
"""


def events_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-learning feature build: per event, the previous three
    values (lag1..lag3) and the 5-row rolling decimal mean of value —
    the standard time-series feature matrix before model training. All
    four features share ONE user_id window partitioning (single
    exchange); the rolling mean uses the decimal-sum discipline so the
    oracle hash-matches. Output bounded to users < 10."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wroll = w.rowsBetween(-4, 0)
    roll = (
        F.sum(F.col("value").cast("decimal(30,2)")).over(wroll).cast("double")
        / F.count(F.lit(1)).over(wroll)
    )
    return (
        ev.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn("lag3", F.lag("value", 3).over(w))
        .withColumn("roll5_mean", dround(roll, 4))
        .select(
            "user_id", "event_id", "ts", "value",
            "lag1", "lag2", "lag3", "roll5_mean",
        )
        .orderBy("user_id", "ts", "event_id")
    )


LAG_FEATURES_SQL = """
SELECT user_id, event_id, ts::TIMESTAMP_NS AS ts, value,
       LAG(value, 1) OVER w AS lag1,
       LAG(value, 2) OVER w AS lag2,
       LAG(value, 3) OVER w AS lag3,
       FLOOR((CAST(SUM(CAST(value AS DECIMAL(30,2)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
             * 10000 + 0.5) / 10000 AS roll5_mean
FROM events
WHERE user_id < 10
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    (prev_type → type) pair, its count and row-normalized probability —
    the behavioral-model fit that powers next-action prediction and
    bot detection. One lag window on the user_id exchange, then a
    25-key aggregate; the normalizing row totals ride as a broadcast
    per-prev aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        # materialize the (k²-row) matrix once: without this, the
        # totals branch re-runs the whole window+aggregate pipeline —
        # a second full scan of events at scale
        .transform(pin, eager=True)
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .withColumn(
            "p", dround(F.col("n").cast("double") / F.col("row_total"), 6)
        )
        .select("prev_type", "next_type", "n", "p")
        .orderBy("prev_type", "next_type")
    )


MARKOV_SQL = """
WITH pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM (
    SELECT user_id, event_type,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
  )
  WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
), totals AS (
  SELECT prev_type, SUM(n) AS row_total FROM pairs GROUP BY prev_type
)
SELECT pairs.prev_type, next_type, n,
       FLOOR((CAST(n AS DOUBLE) / row_total) * 1000000 + 0.5) / 1000000 AS p
FROM pairs JOIN totals ON pairs.prev_type = totals.prev_type
ORDER BY pairs.prev_type, next_type
"""


def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: hourly volumes,
    cumulative deviation from the type's mean rate, and the hour where
    |CUSUM| peaks — where the volume regime shifted (Page's cumulative
    sum test, the batch twin of a monitoring alert).

    Determinism without float accumulation: CUSUM_i = cum_n_i − i·μ
    where cum_n and i are exact integers from PARTITIONED windows (the
    window input is the hourly rollup — hours × types, never
    data-sized — and each type's series sorts in its own task), and μ
    enters once per row as a single double expression, bit-identical
    across engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("nh")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_i = Window.partitionBy("event_type").orderBy("hour")
    scored = (
        hourly.join(F.broadcast(stats), on="event_type")
        .withColumn("cum_n", F.sum("n").over(w_cum))
        .withColumn("i", F.row_number().over(w_i))
        .withColumn(
            "cusum",
            dround(
                F.col("cum_n")
                - (F.col("i") * F.col("total")).cast("double") / F.col("nh"),
                4,
            ),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("hour")
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hour").alias("change_hour"),
            "cusum",
            F.col("nh").cast("long").alias("n_hours"),
            F.col("total").cast("long").alias("total_events"),
        )
        .orderBy("event_type")
    )


CUSUM_SQL = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
  FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)
), stats AS (
  SELECT event_type, SUM(n) AS total, COUNT(*) AS nh
  FROM hourly GROUP BY event_type
), cum AS (
  SELECT h.event_type, h.hour,
         SUM(h.n) OVER (PARTITION BY h.event_type ORDER BY h.hour
                        ROWS UNBOUNDED PRECEDING) AS cum_n,
         ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY h.hour) AS i,
         s.total, s.nh
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
), scored AS (
  SELECT event_type, hour,
         FLOOR((cum_n - CAST(i * total AS DOUBLE) / nh) * 10000 + 0.5) / 10000 AS cusum,
         nh, total
  FROM cum
), picked AS (
  SELECT event_type, hour, cusum, nh, total,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(cusum) DESC, hour) AS rk
  FROM scored
)
SELECT event_type, hour::TIMESTAMP_NS AS change_hour, cusum,
       CAST(nh AS BIGINT) AS n_hours, CAST(total AS BIGINT) AS total_events
FROM picked WHERE rk = 1 ORDER BY event_type
"""


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test of event value, click vs purchase
    (operators/profile.welch_t_test): one conditional-moments
    aggregation pass, exact integer sums, t + Welch-Satterthwaite df
    as a fixed double expression on the 1-row aggregate — the A/B
    significance primitive next to chi-square and OLS."""
    from degdb_spark.operators.profile import welch_t_test

    ev = load_table(spark, sf_dir, "events")
    return welch_t_test(ev, "event_type", "value", "click", "purchase")


AB_TEST_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE event_type IN ('click', 'purchase')
), m AS (
  SELECT
    COUNT(CASE WHEN g = 'click' THEN 1 END) AS n_a,
    SUM(CASE WHEN g = 'click' THEN x END) AS sx_a,
    SUM(CASE WHEN g = 'click' THEN x * x END) AS sxx_a,
    COUNT(CASE WHEN g = 'purchase' THEN 1 END) AS n_b,
    SUM(CASE WHEN g = 'purchase' THEN x END) AS sx_b,
    SUM(CASE WHEN g = 'purchase' THEN x * x END) AS sxx_b
  FROM base
), d AS (
  SELECT n_a, n_b,
    CAST(sx_a AS DOUBLE) / n_a / 100 AS mean_a,
    CAST(sx_b AS DOUBLE) / n_b / 100 AS mean_b,
    CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE)
      / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
      / CAST(n_a AS DOUBLE) / 10000.0 AS qa,
    CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE)
      / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
      / CAST(n_b AS DOUBLE) / 10000.0 AS qb
  FROM m
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  FLOOR(mean_a * 1000000 + 0.5) / 1000000 AS mean_a,
  FLOOR(mean_b * 1000000 + 0.5) / 1000000 AS mean_b,
  FLOOR(((mean_a - mean_b) / SQRT(qa + qb)) * 1000000 + 0.5) / 1000000 AS t_stat,
  FLOOR((((qa + qb) * (qa + qb))
         / (qa * qa / (CAST(n_a AS DOUBLE) - 1.0)
            + qb * qb / (CAST(n_b AS DOUBLE) - 1.0))) * 1000000 + 0.5) / 1000000
    AS df_welch
FROM d
"""


def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (click vs purchase value) — the
    nonparametric twin of events_ab_test. Rank-based tests normally
    imply a global sort; here midranks come from the DISTINCT-VALUE
    table instead: per-value counts, a two-phase running sum
    (operators/ranking.py) for the rank offsets, and
    midrank·2 = 2·cum_before + n + 1 stays integral, so every moment
    (rank sum, tie correction Σ(t³−t)) is an exact integer/decimal —
    z-score computed once on the 1-row aggregate."""
    from degdb_spark.operators.ranking import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin(["click", "purchase"])).select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    vc = base.groupBy("x").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("g") == "click", F.lit(1))).alias("n_a"),
    )
    cum = global_running_sum(vc, [F.col("x")], "n_all", sum_name="cum_incl")
    scored = cum.withColumn(
        "midrank2",
        F.lit(2) * (F.col("cum_incl") - F.col("n_all")) + F.col("n_all") + 1,
    )
    agg = scored.agg(
        F.sum((F.col("n_a") * F.col("midrank2")).cast("decimal(38,0)")).alias(
            "_ra2"
        ),
        F.sum("n_a").alias("_na"),
        F.sum("n_all").alias("_nt"),
        F.sum(
            F.col("n_all").cast("decimal(38,0)") * F.col("n_all") * F.col("n_all")
            - F.col("n_all")
        ).alias("_tie3"),
    )
    na = F.col("_na").cast("double")
    nt = F.col("_nt").cast("double")
    nb = nt - na
    r_a = F.col("_ra2").cast("double") / 2
    u = r_a - na * (na + 1) / 2
    mu = na * nb / 2
    tie_term = F.col("_tie3").cast("double") / (nt * (nt - 1))
    sig2 = na * nb / 12 * ((nt + 1) - tie_term)
    z = (u - mu) / F.sqrt(sig2)
    return agg.select(
        F.col("_na").cast("long").alias("n_a"),
        (F.col("_nt") - F.col("_na")).cast("long").alias("n_b"),
        dround(u, 2).alias("u_stat"),
        dround(z, 6).alias("z_score"),
    )


MANN_WHITNEY_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE event_type IN ('click', 'purchase')
), vc AS (
  SELECT x, COUNT(*) AS n_all,
         COUNT(CASE WHEN g = 'click' THEN 1 END) AS n_a
  FROM base GROUP BY x
), cum AS (
  SELECT x, n_all, n_a,
         SUM(n_all) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_incl
  FROM vc
), scored AS (
  SELECT n_a, n_all, 2 * (cum_incl - n_all) + n_all + 1 AS midrank2 FROM cum
), m AS (
  SELECT SUM(n_a * midrank2) AS ra2, SUM(n_a) AS na, SUM(n_all) AS nt,
         SUM(CAST(n_all AS DECIMAL(38,0)) * n_all * n_all - n_all) AS tie3
  FROM scored
), d AS (
  SELECT CAST(na AS BIGINT) AS n_a, CAST(nt - na AS BIGINT) AS n_b,
         CAST(ra2 AS DOUBLE) / 2 - CAST(na AS DOUBLE) * (na + 1) / 2 AS u,
         CAST(na AS DOUBLE) * (CAST(nt AS DOUBLE) - na) / 2 AS mu,
         CAST(na AS DOUBLE) * (CAST(nt AS DOUBLE) - na) / 12
           * ((CAST(nt AS DOUBLE) + 1)
              - CAST(tie3 AS DOUBLE) / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1))) AS sig2
  FROM m
)
SELECT n_a, n_b,
       FLOOR(u * 100 + 0.5) / 100 AS u_stat,
       FLOOR(((u - mu) / SQRT(sig2)) * 1000000 + 0.5) / 1000000 AS z_score
FROM d
"""


def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test (click vs purchase value):
    D = max |F_a − F_b| over the distinct-value table. Both empirical
    CDFs ride ONE two-phase running-sum pass (the multi-column form of
    operators/ranking.global_running_sum), each per-value difference
    is a single double expression on exact integer counts, and the max
    is an order-free aggregate — no global sort anywhere."""
    from degdb_spark.operators.ranking import global_running_sum

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin(["click", "purchase"])).select(
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
    )
    vc = base.groupBy("x").agg(
        F.count(F.when(F.col("g") == "click", F.lit(1))).alias("n_a"),
        F.count(F.when(F.col("g") == "purchase", F.lit(1))).alias("n_b"),
    )
    cum = global_running_sum(
        vc, [F.col("x")], ["n_a", "n_b"], sum_name=["cum_a", "cum_b"]
    )
    tot = vc.agg(F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb"))
    diff = cum.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("cum_a").cast("double") / F.col("_ta")
            - F.col("cum_b").cast("double") / F.col("_tb")
        ).alias("d"),
        "_ta",
        "_tb",
    )
    agg = diff.agg(
        F.max("d").alias("_d"), F.max("_ta").alias("_ta"), F.max("_tb").alias("_tb")
    )
    na, nb = F.col("_ta").cast("double"), F.col("_tb").cast("double")
    return agg.select(
        F.col("_ta").cast("long").alias("n_a"),
        F.col("_tb").cast("long").alias("n_b"),
        dround(F.col("_d"), 6).alias("ks_stat"),
        dround(F.sqrt(na * nb / (na + nb)) * F.col("_d"), 6).alias("ks_scaled"),
    )


KS_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
  FROM events WHERE event_type IN ('click', 'purchase')
), vc AS (
  SELECT x,
         COUNT(CASE WHEN g = 'click' THEN 1 END) AS n_a,
         COUNT(CASE WHEN g = 'purchase' THEN 1 END) AS n_b
  FROM base GROUP BY x
), cum AS (
  SELECT x,
         SUM(n_a) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(n_b) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM vc
), tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM vc),
m AS (
  SELECT MAX(ABS(CAST(cum_a AS DOUBLE) / ta - CAST(cum_b AS DOUBLE) / tb)) AS d,
         MAX(ta) AS ta, MAX(tb) AS tb
  FROM cum CROSS JOIN tot
)
SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
       FLOOR(d * 1000000 + 0.5) / 1000000 AS ks_stat,
       FLOOR((SQRT(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE) / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))) * d) * 1000000 + 0.5) / 1000000 AS ks_scaled
FROM m
"""


def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of time-to-purchase (hours from a
    user's first view to their first subsequent purchase; users who
    never purchase are right-censored at the corpus horizon).
    S(t) = Π_{s≤t} (1 − d_s/n_s) without any float product: each
    factor's ln is FLOOR-rounded to an exact 9-dp integer, the product
    becomes a two-phase RUNNING SUM over the distinct-duration table,
    and exp() runs once per output row — deterministic cross-engine.
    At-risk counts come from the same running-sum machinery, so the
    whole estimator is two tiny scans past the per-user reduction."""
    from degdb_spark.operators.ranking import (
        cut_range_partitioned,
        running_sums_over,
    )

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = ev.withColumn(
        "t0", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    ).withColumn(
        "t1",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t0")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t0").alias("t0"), F.max("t1").alias("t1")
    )
    horizon = ev.agg(F.max("ts").alias("_maxts"))
    pu = (
        per_user.filter(F.col("t0").isNotNull())
        .crossJoin(F.broadcast(horizon))
        .select(
            (
                F.unix_timestamp(F.coalesce("t1", "_maxts"))
                - F.unix_timestamp("t0")
            ).alias("_secs"),
            F.col("t1").isNotNull().cast("long").alias("event"),
        )
        .selectExpr("_secs DIV 3600 AS duration_h", "event")
    )
    dt = pu.groupBy("duration_h").agg(
        F.sum("event").alias("d"), F.count(F.lit(1)).alias("c_all")
    )
    # BOTH cumulative phases (at-risk counts, then the survival sum
    # over t9 — a column DERIVED from the first phase) ride ONE range
    # partitioning + lineage cut: duration_h is the total order of
    # both, so the second global_running_sum's sample + shuffle +
    # checkpoint stack was pure overhead. Identical results for any
    # boundary placement (the two-phase scan's invariant).
    parted = cut_range_partitioned(dt, [F.col("duration_h")])
    cum = running_sums_over(parted, [F.col("duration_h")], ["c_all"], ["cum_all"])
    # off the cut, not dt: the same rows (an integer sum is
    # layout-independent), without re-running the per-user reduction
    total = parted.agg(F.sum("c_all").alias("_n"))
    risk = cum.crossJoin(F.broadcast(total)).withColumn(
        "n_at_risk", F.col("_n") - (F.col("cum_all") - F.col("c_all"))
    )
    # ln(1 - d/n) as an exact 9-dp integer (clamped: d == n only at the
    # last time, where S legitimately hits ~0)
    ln_term = F.log(
        F.greatest(
            F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk"),
            F.lit(1e-12),
        )
    )
    risk = risk.withColumn(
        "t9", F.floor(ln_term * F.lit(1000000000.0) + F.lit(0.5)).cast("long")
    )
    surv = running_sums_over(risk, [F.col("duration_h")], ["t9"], ["cum_t9"])
    return surv.select(
        "duration_h",
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("d").cast("long").alias("d_events"),
        (F.col("c_all") - F.col("d")).cast("long").alias("n_censored"),
        dround(F.exp(F.col("cum_t9") / F.lit(1000000000.0)), 6).alias("survival"),
    ).orderBy("duration_h")


KM_SQL = """
WITH staged AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0
  FROM events GROUP BY user_id
), firstp AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN staged s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id
), horizon AS (SELECT MAX(ts) AS maxts FROM events),
pu AS (
  SELECT (CAST(FLOOR(EPOCH(COALESCE(f.t1, h.maxts))) AS BIGINT) - CAST(FLOOR(EPOCH(s.t0)) AS BIGINT)) // 3600 AS duration_h,
         CASE WHEN f.t1 IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM staged s LEFT JOIN firstp f ON s.user_id = f.user_id
  CROSS JOIN horizon h
  WHERE s.t0 IS NOT NULL
), dt AS (
  SELECT duration_h, SUM(event) AS d, COUNT(*) AS c_all
  FROM pu GROUP BY duration_h
), tot AS (SELECT SUM(c_all) AS n FROM dt),
risk AS (
  SELECT duration_h, d, c_all,
         tot.n - (SUM(c_all) OVER (ORDER BY duration_h ROWS UNBOUNDED PRECEDING) - c_all) AS n_at_risk
  FROM dt CROSS JOIN tot
), terms AS (
  SELECT duration_h, d, c_all, n_at_risk,
         CAST(FLOOR(ln(GREATEST(1.0 - CAST(d AS DOUBLE) / n_at_risk, 1e-12)) * 1000000000 + 0.5) AS BIGINT) AS t9
  FROM risk
)
SELECT duration_h, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS d_events,
       CAST(c_all - d AS BIGINT) AS n_censored,
       FLOOR(exp(SUM(t9) OVER (ORDER BY duration_h ROWS UNBOUNDED PRECEDING) / 1000000000.0) * 1000000 + 0.5) / 1000000 AS survival
FROM terms ORDER BY duration_h
"""


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step behavior paths (consecutive event-type
    trigrams per user in time order) — the order-2 extension of the
    Markov transition matrix, the journey-mining staple. Two lead()
    windows on ONE user_id partitioning, then a path rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
    )
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


TOP_PATHS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events
)
SELECT event_type || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
FROM ordered WHERE t3 IS NOT NULL
GROUP BY path ORDER BY n DESC, path LIMIT 20
"""


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase attributes to
    the user's latest click within the preceding 24 h (the as-of join
    operator — one user-keyed shuffle, carry-forward window), reported
    as daily attributed vs unattributed purchase counts and
    decimal-exact revenue. The marketing-analytics twin of the as-of
    join's market-data use."""
    from degdb_spark.operators.timeseries import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    att = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        tolerance_seconds=24 * 3600,
    )
    return (
        att.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("asof_ts").isNotNull().cast("long")).alias("n_attributed"),
            dsum(F.when(F.col("asof_ts").isNotNull(), F.col("value")).otherwise(0.0), 2).alias(
                "attributed_revenue"
            ),
        )
        .orderBy("day")
    )


ATTRIBUTION_SQL = """
WITH clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), att AS (
  SELECT p.user_id, p.ts, p.value,
         (SELECT MAX(c.ts) FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
            AND c.ts >= p.ts - INTERVAL 24 HOURS) AS asof_ts
  FROM purchases p
)
SELECT DATE_TRUNC('day', ts)::TIMESTAMP_NS AS day,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN asof_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(SUM(CAST(CASE WHEN asof_ts IS NOT NULL THEN value ELSE 0.0 END AS DECIMAL(30,2))) AS DOUBLE) AS attributed_revenue
FROM att GROUP BY DATE_TRUNC('day', ts) ORDER BY day
"""


def events_mix_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift as per-type TREND SLOPES: each type's daily
    share of total volume regressed on the day index (ols_fit_by —
    grouped exact-moment OLS, no per-group loop). A significantly
    positive/negative slope is the early-warning version of the PSI
    alarm: the mix is drifting, not just fluctuating."""
    from degdb_spark.operators.profile import ols_fit_by

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    daily = ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = daily.groupBy("day").agg(F.sum("n").alias("day_total"))
    d0 = daily.agg(F.min("day").alias("_d0"))
    pts = (
        daily.join(tot, on="day")
        .crossJoin(F.broadcast(d0))
        .select(
            "event_type",
            F.datediff("day", "_d0").cast("double").alias("x_idx"),
            dround(F.col("n") / F.col("day_total"), 6).alias("share"),
        )
    )
    return ols_fit_by(pts, ["event_type"], "x_idx", "share", scale=6).orderBy(
        "event_type"
    )


MIX_TREND_SQL = """
WITH daily AS (
  SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY DATE_TRUNC('day', ts), event_type
), tot AS (
  SELECT day, SUM(n) AS day_total FROM daily GROUP BY day
), d0 AS (SELECT MIN(day) AS d0 FROM daily),
pts AS (
  SELECT daily.event_type,
         CAST(FLOOR(CAST(DATEDIFF('day', d0.d0, daily.day) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR((FLOOR((daily.n::DOUBLE / tot.day_total) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS y
  FROM daily JOIN tot ON daily.day = tot.day CROSS JOIN d0
), m AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pts GROUP BY event_type
), d AS (
  SELECT event_type, n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
         CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
         CAST(n * syy - sy * sy AS DOUBLE) AS vary,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT event_type, n,
       FLOOR((cov / varx) * 1000000 + 0.5) / 1000000 AS slope,
       FLOOR(((syd - (cov / varx) * sxd) / n / 1000000) * 1000000 + 0.5) / 1000000 AS intercept,
       FLOOR(((cov * cov) / (varx * vary)) * 1000000 + 0.5) / 1000000 AS r2
FROM d ORDER BY event_type
"""


def events_error_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-rate seasonality profile: per hour-of-day (0-23), the
    error share of traffic and its ratio to the overall error rate —
    the diurnal fingerprint an on-call dashboard plots before blaming
    a deploy. One aggregation + broadcast overall rate."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.hour("ts").cast("long").alias("hour_of_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
    )
    overall = ev.agg(
        (
            F.sum((F.col("event_type") == "error").cast("long"))
            / F.count(F.lit(1))
        ).alias("_rate")
    )
    return (
        hourly.crossJoin(F.broadcast(overall))
        .select(
            "hour_of_day",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_errors").cast("long").alias("n_errors"),
            dround(F.col("n_errors") / F.col("n_events"), 6).alias("error_rate"),
            dround(
                (F.col("n_errors") / F.col("n_events")) / F.col("_rate"), 4
            ).alias("lift_vs_overall"),
        )
        .orderBy("hour_of_day")
    )


ERROR_SEASONALITY_SQL = """
WITH hourly AS (
  SELECT EXTRACT(hour FROM ts) AS hour_of_day,
         COUNT(*) AS n_events,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
  FROM events GROUP BY EXTRACT(hour FROM ts)
), overall AS (
  SELECT SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE / COUNT(*) AS rate
  FROM events
)
SELECT CAST(hour_of_day AS BIGINT) AS hour_of_day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_errors AS BIGINT) AS n_errors,
       FLOOR((n_errors::DOUBLE / n_events) * 1000000 + 0.5) / 1000000 AS error_rate,
       FLOOR(((n_errors::DOUBLE / n_events) / rate) * 10000 + 0.5) / 10000 AS lift_vs_overall
FROM hourly CROSS JOIN overall
ORDER BY hour_of_day
"""


QUERIES: dict[str, Query] = {
    "events_error_seasonality": Query(
        events_error_seasonality, ERROR_SEASONALITY_SQL
    ),
    "events_mix_trend": Query(events_mix_trend, MIX_TREND_SQL),
    "events_attribution": Query(events_attribution, ATTRIBUTION_SQL),
    "events_ab_test": Query(events_ab_test, AB_TEST_SQL),
    "events_mann_whitney": Query(events_mann_whitney, MANN_WHITNEY_SQL),
    "events_ks_test": Query(events_ks_test, KS_SQL),
    "events_kaplan_meier": Query(events_kaplan_meier, KM_SQL),
    "events_top_paths": Query(events_top_paths, TOP_PATHS_SQL),
    "events_cusum_changepoints": Query(events_cusum_changepoints, CUSUM_SQL),
    "events_markov_transitions": Query(
        events_markov_transitions, MARKOV_SQL
    ),
    "events_lag_features": Query(events_lag_features, LAG_FEATURES_SQL),
    "events_scd2_segments": Query(events_scd2_segments, SCD2_SQL),
    "events_funnel": Query(events_funnel, FUNNEL_SQL),
    "events_retention": Query(events_retention, RETENTION_SQL),
    "events_decay_score": Query(events_decay_score, DECAY_SQL),
    "events_anomaly_zscore": Query(events_anomaly_zscore, ANOMALY_SQL),
}
