"""Bucketed table layout — shuffle-free fact-to-fact co-located joins.

The co-location lever for repeated big joins at 100 TB: both fact
tables are written `bucketBy(n, key)` (+ in-bucket sort), so every
join/groupBy on that key reads pre-partitioned, pre-sorted buckets and
the sort-merge join runs with ZERO exchanges — the shuffle is paid once
at write time and amortized over every subsequent query. This is the
Spark analogue of the reference's keyspace routing (a triple's subject
hash decides its owning peer, so rooted queries touch one peer —
/root/reference/protocol/protocol.go keyspace routing); here the bucket
hash decides the owning file set, so keyed queries touch matching
buckets.

Works with the in-memory session catalog (no Hive metastore needed):
`saveAsTable` with an explicit `path` writes an external bucketed
parquet table; bucket metadata lives in the session catalog, so reads
within the deployment see the bucketing. On a cluster the catalog would
be a metastore; the write/read API is identical.

Sizing: pick n_buckets so one bucket of the BIGGER table fits an
executor's task comfortably (~128-512 MB post-compression). Buckets
must match on both sides (equal n) for the exchange-free join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed parquet table at ``path``.

    The one-time shuffle that every later keyed join skips. In-bucket
    sort makes the downstream sort-merge join's sort phase a no-op too.
    """
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", path).mode("overwrite").saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables written by ``write_bucketed`` with equal bucket
    counts on their keys — planned with no Exchange on either side
    (gated in tests/test_plans.py::test_bucketed_join_no_exchange)."""
    a = spark.table(left_table)
    b = spark.table(right_table)
    return a.join(b, a[left_key] == b[right_key], how)
