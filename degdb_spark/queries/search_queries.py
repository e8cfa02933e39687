"""Ranked-retrieval queries: BM25 top-k search over `documents`.

Complements the reference's point-lookup query surface
(`core/http.go:29-35` answers exact triple patterns) with scored
retrieval — the op a data pipeline needs for decontamination audits and
eval-set mining. Oracle-checked bit-for-bit (see operators/search.py
for the determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from degdb_spark.catalog import load_table
from degdb_spark.operators import search as S
from degdb_spark.queries import Query

#: Fixed benchmark query: one rare term ('dup' ~ 2.6% df) + two common
#: ones, so idf actually differentiates and the candidate filter prunes.
BM25_TERMS = ["dup", "spark", "window"]


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return S.bm25_topk(docs, BM25_TERMS, k=25)


QUERIES: dict[str, Query] = {
    "docs_bm25_search": Query(bm25_search, S.bm25_sql(BM25_TERMS, k=25)),
}
