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


def parts_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names: canonicalize identical
    strings first (the test table repeats each name ~31x), then q-gram
    blocking + levenshtein <= 3 on the canonical rows only
    (operators/fuzzy.py)."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.fuzzy import fuzzy_match

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    out = fuzzy_match(
        names.select("id", F.col("p_name").alias("name")), "id", "name", max_dist=3
    )
    return (
        out.select(
            "id_a",
            "id_b",
            F.col("text_a").alias("name_a"),
            F.col("text_b").alias("name_b"),
            "dist",
        )
        .orderBy("id_a", "id_b")
    )


FUZZY_MATCH_SQL = """
WITH names AS (
  SELECT p_name AS name, MIN(p_partkey) AS id FROM part GROUP BY p_name
), grams AS (
  SELECT id, name,
         unnest(list_distinct([substr(name, i, 3) for i in range(1, GREATEST(length(name)-1, 1))])) AS g
  FROM names
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
  FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
)
SELECT id_a, id_b, name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= 3
ORDER BY id_a, id_b
"""




#: Fixed phrase for the positional-search benchmark query.
PHRASE = ["hash", "join"]


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact consecutive-token phrase counting as a shuffle-free scan
    (operators/search.phrase_count): top-25 docs by occurrences."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE in a lower projection (see phrase_count docstring)
    toks = docs.select("doc_id", tokens("text").alias("toks"))
    out = toks.select(
        "doc_id", S.phrase_count_tokens(F.col("toks"), PHRASE).alias("n_hits")
    )
    return (
        out.filter(F.col("n_hits") > 0)
        .orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(25)
    )


QUERIES: dict[str, Query] = {
    "docs_bm25_search": Query(bm25_search, S.bm25_sql(BM25_TERMS, k=25)),
    "parts_fuzzy_match": Query(parts_fuzzy_match, FUZZY_MATCH_SQL),
    "docs_phrase_search": Query(phrase_search, S.phrase_sql(PHRASE, k=25)),
}
