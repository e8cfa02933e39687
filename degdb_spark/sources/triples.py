"""Derive the universal triple table from the driver's relational testdata.

The driver testdata has no triples parquet, so the graph surface is
exercised over a deterministic edge-list derivation of the TPC-H-ish star
schema. The SAME definition exists twice on purpose:

- ``TRIPLES_SQL`` — ANSI SQL over the pre-registered views, runnable by
  both Spark SQL and DuckDB (this is what makes pattern/traversal queries
  oracle-checkable);
- ``triples_df`` — the DataFrame builder used by the engine internally.

Entity URIs are `<table>/<key>`; predicates name the FK relationship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: ANSI SQL, valid in Spark SQL and DuckDB alike (no engine-specific fns).
TRIPLES_SQL = """
SELECT 'customer/' || CAST(c_custkey AS VARCHAR(32)) AS subj,
       'in_nation' AS pred,
       'nation/' || CAST(c_nationkey AS VARCHAR(32)) AS obj
FROM customer
UNION ALL
SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR(32)),
       'in_nation',
       'nation/' || CAST(s_nationkey AS VARCHAR(32))
FROM supplier
UNION ALL
SELECT 'nation/' || CAST(n_nationkey AS VARCHAR(32)),
       'in_region',
       'region/' || CAST(r_regionkey AS VARCHAR(32))
FROM nation JOIN region ON n_regionkey = r_regionkey
UNION ALL
SELECT 'nation/' || CAST(n_nationkey AS VARCHAR(32)), 'name', n_name FROM nation
UNION ALL
SELECT 'region/' || CAST(r_regionkey AS VARCHAR(32)), 'name', r_name FROM region
UNION ALL
SELECT 'order/' || CAST(o_orderkey AS VARCHAR(32)),
       'by_customer',
       'customer/' || CAST(o_custkey AS VARCHAR(32))
FROM orders
""".strip()


def triples_df(spark: SparkSession) -> DataFrame:
    """Build the derived triple table; requires testdata views registered
    (catalog.register_all)."""
    return spark.sql(TRIPLES_SQL)
