"""Event-stream analytics in batch form, oracle-checked.

The streaming module (degdb_spark/streaming) runs the same logical plans
as Structured Streaming jobs; these batch twins are what the DuckDB
oracle can replay. Windowed aggregation == groupBy(date_trunc) here so
both engines agree on bucket boundaries (UTC session timezone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import davg, dsum, sql_davg, sql_dsum


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (streaming twin: readStream +
    window(ts, '1 hour') + watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


HOURLY_SQL = """
SELECT DATE_TRUNC('hour', ts)::TIMESTAMP_NS AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
ORDER BY hour, event_type
"""


def event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-dedup twin: first occurrence per event_id (streaming:
    dropDuplicates within watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_id")
        .agg(F.min("ts").alias("first_ts"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("event_id") < 100)
        .orderBy("event_id")
    )


DEDUP_SQL = """
SELECT event_id, MIN(ts)::TIMESTAMP::TIMESTAMP_NS AS first_ts, COUNT(*) AS n_dups
FROM events GROUP BY event_id
HAVING event_id < 100
ORDER BY event_id
"""


def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via lag-gap analysis (>30 min gap starts a new
    session) — the batch twin of session_window()/applyInPandasWithState.
    Two window shuffles, both partitioned by user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > 1800)
        ).cast("int"),
    )
    sessions = gapped.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            dsum(F.col("session_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


SESSION_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM gapped
), per_session AS (
  SELECT user_id, session_seq, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS session_value
  FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
       CAST(SUM(CAST(session_value AS DECIMAL(30,2))) AS DOUBLE) AS total_value
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-function surface: extract props.k, bucket it."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), davg(F.col("value"), 2, 4).alias("avg_value"))
        .orderBy("k_bucket")
    )


JSON_SQL = """
SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_value
FROM events
GROUP BY k_bucket
ORDER BY k_bucket
"""


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: daily counts per event type as columns."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("day")
    )


PIVOT_SQL = """
SELECT DATE_TRUNC('day', ts)::TIMESTAMP_NS AS day,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY DATE_TRUNC('day', ts) ORDER BY day
"""


QUERIES: dict[str, Query] = {
    "events_hourly_rollup": Query(hourly_event_rollup, HOURLY_SQL),
    "events_dedup_first": Query(event_dedup_first, DEDUP_SQL),
    "events_sessionization": Query(user_sessionization, SESSION_SQL),
    "events_json_props": Query(json_props_extraction, JSON_SQL),
    "events_type_pivot": Query(event_type_pivot, PIVOT_SQL),
}
