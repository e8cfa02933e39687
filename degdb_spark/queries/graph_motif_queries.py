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
    """min_by/max_by/bool_and/bool_or/stddev/corr surface per nation.

    stddev/corr use exact split-long moments (the ols_fit pattern:
    acctbal as integer cents, products hi/lo-split so the long sums
    never overflow, recombined in DECIMAL) instead of F.stddev/F.corr —
    raw double moment sums are partial-aggregation-order-dependent, the
    same knife-edge class that flaked docs_temperature_mixture. Range
    bound: exact while custkey² and cents² fit a long (keys < 3e9,
    |balance| < 9e7), the same envelope ols_fit documents."""
    cust = load_table(spark, sf_dir, "customer")
    two31 = 2147483648
    x = F.col("c_custkey").cast("long")
    y = (F.col("c_acctbal").cast("decimal(30,2)") * 100).cast("long")
    base = cust.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        x.alias("_x"),
        y.alias("_y"),
        (x * x).alias("_px"),
        (y * y).alias("_py"),
        (x * y).alias("_pxy"),
    )
    # integer `div` (not `/`, which is double division and loses exactness
    # past 2^53) keeps the hi/lo split exact for any long product
    agg = base.groupBy("c_nationkey").agg(
        F.expr("min_by(c_custkey, c_acctbal)").alias("poorest_cust"),
        F.expr("max_by(c_custkey, c_acctbal)").alias("richest_cust"),
        F.expr("bool_and(c_acctbal > -1000)").alias("all_above_floor"),
        F.expr("bool_or(c_acctbal > 9900)").alias("any_very_rich"),
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.expr(f"_px div {two31}")).alias("_sxx_hi"),
        F.sum(F.col("_px") % two31).alias("_sxx_lo"),
        F.sum(F.expr(f"_py div {two31}")).alias("_syy_hi"),
        F.sum(F.col("_py") % two31).alias("_syy_lo"),
        F.sum(F.expr(f"_pxy div {two31}")).alias("_sxy_hi"),
        F.sum(F.col("_pxy") % two31).alias("_sxy_lo"),
    )
    dec = "decimal(38,0)"

    def re(hi: str, lo: str):
        return F.col(hi).cast(dec) * F.lit(two31).cast(dec) + F.col(lo).cast(dec)

    nd = F.col("n").cast("double")
    n_dec = F.col("n").cast(dec)
    sx, sy = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    cov = (n_dec * re("_sxy_hi", "_sxy_lo") - sx * sy).cast("double")
    varx = (n_dec * re("_sxx_hi", "_sxx_lo") - sx * sx).cast("double")
    vary = (n_dec * re("_syy_hi", "_syy_lo") - sy * sy).cast("double")
    guard = F.col("n") < 2
    return (
        agg.select(
            "c_nationkey",
            "poorest_cust",
            "richest_cust",
            "all_above_floor",
            "any_very_rich",
            F.when(guard, F.lit(None).cast("double"))
            .otherwise(dround(F.sqrt(vary / (nd * (nd - 1))) / 100, 2))
            .alias("bal_stddev"),
            F.when(guard, F.lit(None).cast("double"))
            .otherwise(dround(cov / F.sqrt(varx * vary), 4))
            .alias("key_bal_corr"),
            "n",
        )
        .orderBy("c_nationkey")
    )


AGG_GALLERY_SQL = """
WITH base AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         CAST(c_custkey AS BIGINT) AS x,
         CAST(CAST(c_acctbal AS DECIMAL(30,2)) * 100 AS BIGINT) AS y
  FROM customer
), s AS (
  SELECT c_nationkey,
         min_by(c_custkey, c_acctbal) AS poorest_cust,
         max_by(c_custkey, c_acctbal) AS richest_cust,
         bool_and(c_acctbal > -1000) AS all_above_floor,
         bool_or(c_acctbal > 9900) AS any_very_rich,
         COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy
  FROM base GROUP BY c_nationkey
), d AS (
  SELECT *,
         CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cov,
         CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS varx,
         CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS vary,
         CAST(n AS DOUBLE) AS nd
  FROM s
)
SELECT c_nationkey, poorest_cust, richest_cust, all_above_floor, any_very_rich,
       CASE WHEN n < 2 THEN NULL ELSE
         FLOOR((SQRT(vary / (nd * (nd - 1))) / 100) * 100 + 0.5) / 100
       END AS bal_stddev,
       CASE WHEN n < 2 THEN NULL ELSE
         FLOOR((cov / SQRT(varx * vary)) * 10000 + 0.5) / 10000
       END AS key_bal_corr,
       n
FROM d ORDER BY c_nationkey
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
