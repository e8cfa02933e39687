"""Graph-analytics queries over the derived triple graph (SURVEY.md §7
Phase 4; BASELINE.json "GraphX/Pregel for analytics").

Degrees are closed-form → oracle-checked. PageRank/CC/BFS are iterative
(not SQL-expressible in one shot) → rows-only checks, with their
semantics pinned by tests/test_graph.py against hand-computed fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.catalog import register_all
from degdb_spark.graph import algorithms as G
from degdb_spark.queries import Query
from degdb_spark.sources.triples import TRIPLES_SQL, triples_df

_CTE = f"WITH triples AS ({TRIPLES_SQL})"


def _triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return triples_df(spark)


def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _triples(spark, sf_dir)
    return (
        G.degrees(t)
        .filter(F.col("degree") >= 10)
        .orderBy(F.col("degree").desc(), F.col("id"))
    )


DEGREES_SQL = f"""{_CTE},
out_deg AS (SELECT subj AS id, COUNT(*) AS out_degree FROM triples GROUP BY subj),
in_deg  AS (SELECT obj  AS id, COUNT(*) AS in_degree  FROM triples GROUP BY obj)
SELECT COALESCE(o.id, i.id) AS id,
       COALESCE(out_degree, 0) AS out_degree,
       COALESCE(in_degree, 0) AS in_degree,
       COALESCE(out_degree, 0) + COALESCE(in_degree, 0) AS degree
FROM out_deg o FULL OUTER JOIN in_deg i ON o.id = i.id
WHERE COALESCE(out_degree, 0) + COALESCE(in_degree, 0) >= 10
ORDER BY degree DESC, id
"""


def graph_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes (regions/nations dominate — they are the
    sinks of the FK edge direction). Rows-only."""
    t = _triples(spark, sf_dir)
    return (
        G.pagerank(t, max_iter=10)
        .orderBy(F.col("pagerank").desc(), F.col("id"))
        .limit(20)
    )


def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component summary (undirected). Rows-only."""
    t = _triples(spark, sf_dir)
    return G.component_summary(t)


def graph_bfs_from_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram from region/0 over undirected edges —
    deterministic ints. Rows-only (iterative)."""
    t = _triples(spark, sf_dir)
    dists = G.bfs_distances(t, "region/0", max_depth=5, undirected=True)
    return (
        dists.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes")).orderBy("dist")
    )


def _bfs_sql(source: str, max_depth: int) -> str:
    """Fixed-depth BFS as non-recursive CTE expansion (one level per
    CTE, NOT-IN against all previous levels) — makes the iterative
    Spark BFS oracle-checkable without recursive-CTE aggregation."""
    ctes = [
        "edges AS (SELECT subj AS src, obj AS dst FROM triples "
        "UNION SELECT obj, subj FROM triples)",
        f"d0 AS (SELECT '{source}' AS n)",
    ]
    for i in range(1, max_depth + 1):
        seen = " UNION ALL ".join(f"SELECT n FROM d{j}" for j in range(i))
        ctes.append(
            f"d{i} AS (SELECT DISTINCT dst AS n FROM edges "
            f"JOIN d{i-1} ON src = d{i-1}.n "
            f"WHERE dst NOT IN ({seen}))"
        )
    levels = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS dist, n FROM d{i}" for i in range(max_depth + 1)
    )
    return (
        f"{_CTE},\n" + ",\n".join(ctes) + f"\nSELECT dist, COUNT(*) AS n_nodes "
        f"FROM ({levels}) WHERE dist = 0 OR n IS NOT NULL "
        f"GROUP BY dist HAVING COUNT(*) > 0 ORDER BY dist"
    )


BFS_SQL = _bfs_sql("region/0", 5)


QUERIES: dict[str, Query] = {
    "graph_degrees": Query(graph_degrees, DEGREES_SQL),
    "graph_pagerank_top": Query(graph_pagerank_top, None),
    "graph_components": Query(graph_components, None),
    "graph_bfs_from_region": Query(graph_bfs_from_region, BFS_SQL),
}
