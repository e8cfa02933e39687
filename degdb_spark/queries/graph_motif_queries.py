"""Motif + aggregate-gallery contract queries (oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table, register_all
from degdb_spark.graph.motif import find
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum
from degdb_spark.sources.triples import TRIPLES_SQL, triples_df

_CTE = f"WITH triples AS ({TRIPLES_SQL})"


def motif_customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c)-[in_nation]->(n); (n)-[in_region]->(=region/2): all customers
    in ASIA with their nation binding kept — the motif advantage over
    plain chaining (all hops in the output row)."""
    register_all(spark, sf_dir)
    t = triples_df(spark)
    out = find(t, "(c)-[in_nation]->(n); (n)-[in_region]->(=region/2)")
    return out.filter(F.col("c").startswith("customer/")).orderBy("c", "n")


MOTIF_SQL = f"""{_CTE}
SELECT DISTINCT t1.subj AS c, t1.obj AS n
FROM triples t1 JOIN triples t2 ON t1.obj = t2.subj
WHERE t1.pred = 'in_nation' AND t2.pred = 'in_region'
  AND t2.obj = 'region/2' AND t1.subj LIKE 'customer/%'
ORDER BY c, n
"""


def motif_shared_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converging motif: (customer)-[in_nation]->(n)<-[in_nation]-(supplier)
    pairs — count per nation (bounded output)."""
    register_all(spark, sf_dir)
    t = triples_df(spark)
    out = find(t, "(c)-[in_nation]->(n); (s)-[in_nation]->(n)")
    return (
        out.filter(
            F.col("c").startswith("customer/") & F.col("s").startswith("supplier/")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("n")
    )


MOTIF_SHARED_SQL = f"""{_CTE}
SELECT c.obj AS n, COUNT(*) AS n_pairs
FROM triples c JOIN triples s ON c.obj = s.obj
WHERE c.pred = 'in_nation' AND s.pred = 'in_nation'
  AND c.subj LIKE 'customer/%' AND s.subj LIKE 'supplier/%'
GROUP BY c.obj
ORDER BY n
"""


def aggregate_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by/bool_and/bool_or/stddev/corr surface per nation."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.expr("min_by(c_custkey, c_acctbal)").alias("poorest_cust"),
            F.expr("max_by(c_custkey, c_acctbal)").alias("richest_cust"),
            F.expr("bool_and(c_acctbal > -1000)").alias("all_above_floor"),
            F.expr("bool_or(c_acctbal > 9900)").alias("any_very_rich"),
            dround(F.stddev("c_acctbal"), 2).alias("bal_stddev"),
            dround(F.corr("c_custkey", "c_acctbal"), 4).alias("key_bal_corr"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


AGG_GALLERY_SQL = """
SELECT c_nationkey,
       min_by(c_custkey, c_acctbal) AS poorest_cust,
       max_by(c_custkey, c_acctbal) AS richest_cust,
       bool_and(c_acctbal > -1000) AS all_above_floor,
       bool_or(c_acctbal > 9900) AS any_very_rich,
       FLOOR((stddev_samp(c_acctbal)) * 100 + 0.5) / 100 AS bal_stddev,
       FLOOR((corr(c_custkey, c_acctbal)) * 10000 + 0.5) / 10000 AS key_bal_corr,
       COUNT(*) AS n
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup via row_number (QUALIFY-style) — the CDC /
    upsert-compaction primitive."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts::TIMESTAMP::TIMESTAMP_NS AS ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


def gremlin_region_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin-DSL traversal as a contract query: everyone (customers +
    suppliers) two hops out of region/1 via reversed edges —
    g.V('region/1').in_('in_region').in_('in_nation')."""
    from degdb_spark.graph.gremlin import G

    register_all(spark, sf_dir)
    t = triples_df(spark)
    out = G(t).V("region/1").in_("in_region").in_("in_nation").df()
    return out.select(F.col("node")).orderBy("node")


GREMLIN_SQL = f"""{_CTE}
SELECT DISTINCT t2.subj AS node
FROM triples t1 JOIN triples t2 ON t2.obj = t1.subj
WHERE t1.pred = 'in_region' AND t1.obj = 'region/1' AND t2.pred = 'in_nation'
ORDER BY node
"""


QUERIES: dict[str, Query] = {
    "gremlin_region_members": Query(gremlin_region_members, GREMLIN_SQL),
    "motif_customer_region": Query(motif_customer_region, MOTIF_SQL),
    "motif_shared_nation": Query(motif_shared_nation, MOTIF_SHARED_SQL),
    "aggregate_gallery": Query(aggregate_gallery, AGG_GALLERY_SQL),
    "latest_event_per_user": Query(latest_event_per_user, LATEST_EVENT_SQL),
}
