"""Deterministic sampling / split contract queries (oracle-checked via
the portable md5 bucket — the split assignment is auditable in DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.operators.sampling import md5_bucket
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dsum

_BUCKET_SQL = "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR(64))), 1, 8)) AS BIGINT) % 100"


def docs_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified split QA: per (lang, split) counts with a 10% hash
    test split on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(md5_bucket("doc_id", 100) < 10, "test").otherwise("train")
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "split")
    )


SPLIT_SQL = f"""
SELECT lang,
       CASE WHEN {_BUCKET_SQL.format(key='doc_id')} < 10 THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n
FROM documents
GROUP BY lang, split
ORDER BY lang, split
"""


def lineitem_sample_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample of lineitem (by orderkey-linenumber key),
    revenue per returnflag — the stable-sample aggregation pattern for
    quick estimates over a 100 TB fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.filter(md5_bucket(key, 100) < 5)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2).alias(
                "sample_revenue"
            ),
        )
        .orderBy("l_returnflag")
    )


SAMPLE_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,4))), 2) AS DOUBLE) AS sample_revenue
FROM lineitem
WHERE {_BUCKET_SQL.format(key="CONCAT(l_orderkey, '-', l_linenumber)")} < 5
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES: dict[str, Query] = {
    "docs_train_test_split": Query(docs_train_test_split, SPLIT_SQL),
    "lineitem_sample_revenue": Query(lineitem_sample_revenue, SAMPLE_SQL),
}
