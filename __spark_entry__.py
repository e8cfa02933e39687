"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (+ the
                LLM-pipeline extensions), as (spark, sf_dir) callables.
oracle_sql()  — DuckDB-equivalent SQL for each oracle-checkable query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    from degdb_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from degdb_spark.queries import registry

    return {name: q.spark for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    from degdb_spark.queries import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
