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
from degdb_spark.persistence import pin

_CTE = f"WITH triples AS ({TRIPLES_SQL})"


def _triples(spark: SparkSession, sf_dir: str, materialize: bool = False) -> DataFrame:
    """materialize=True checkpoints the derived triple view — the
    iterative algorithms reference it from several branches (vertices,
    edges, out-degrees), and each lazy reference re-runs the 5-table
    union derivation; one materialization amortizes them all."""
    register_all(spark, sf_dir)
    t = triples_df(spark)
    return t.transform(pin, eager=False) if materialize else t


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


def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law fit: OLS of ln(n_vertices) on
    ln(degree) over the degree histogram (slope ≈ −γ) — the scale-free
    test that decides whether skew mitigation (salting, hub handling)
    is worth wiring into graph jobs. The histogram is degree-value-
    cardinality-sized; the fit reuses the exact-moment OLS."""
    from degdb_spark.operators.profile import ols_fit
    from degdb_spark.queries.rounding import dround

    t = _triples(spark, sf_dir)
    hist = (
        G.degrees(t)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    pts = hist.select(
        dround(F.log(F.col("degree").cast("double")), 6).alias("lx"),
        dround(F.log(F.col("n_vertices").cast("double")), 6).alias("ly"),
    )
    return ols_fit(pts, "lx", "ly", scale=6)


DEGREE_POWERLAW_SQL = f"""{_CTE},
endpoints AS (
  SELECT subj AS id, 1 AS out_c, 0 AS in_c FROM triples
  UNION ALL
  SELECT obj, 0, 1 FROM triples
), deg AS (
  SELECT id, SUM(out_c) + SUM(in_c) AS degree FROM endpoints GROUP BY id
), hist AS (
  SELECT degree, COUNT(*) AS n_vertices FROM deg GROUP BY degree
), pts AS (
  SELECT CAST(FLOOR((FLOOR(ln(degree::DOUBLE) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR((FLOOR(ln(n_vertices::DOUBLE) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) AS BIGINT) AS y
  FROM hist
), m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pts
), d AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
         CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
         CAST(n * syy - sy * sy AS DOUBLE) AS vary,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT n,
       FLOOR((cov / varx) * 1000000 + 0.5) / 1000000 AS slope,
       FLOOR(((syd - (cov / varx) * sxd) / n / 1000000) * 1000000 + 0.5) / 1000000 AS intercept,
       FLOOR(((cov * cov) / (varx * vary)) * 1000000 + 0.5) / 1000000 AS r2
FROM d
"""


def graph_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes (regions/nations dominate — they are the
    sinks of the FK edge direction). Oracle-checked by unrolling the 10
    Pregel supersteps into chained SQL CTEs with the identical update
    formula; double drift from aggregation order is absorbed by the 6dp
    rounding, and the top-20 ordering ties break on node id."""
    t = _triples(spark, sf_dir, materialize=True)
    return (
        G.pagerank(t, max_iter=10)
        .orderBy(F.col("pagerank").desc(), F.col("id"))
        .limit(20)
    )


def _pagerank_sql(damping: float = 0.85, iters: int = 10, top: int = 20) -> str:
    # AS MATERIALIZED everywhere: DuckDB otherwise re-expands each CTE
    # reference, re-opening the underlying parquet per expansion — the
    # 10-iteration unroll then exhausts the open-file limit.
    base = repr(1.0 - damping)  # same float python computes for Spark's lit
    d = repr(damping)
    ctes = [
        "edges AS MATERIALIZED (SELECT subj AS src, obj AS dst FROM triples)",
        "nodes AS MATERIALIZED (SELECT subj AS id FROM triples UNION SELECT obj FROM triples)",
        "outdeg AS MATERIALIZED (SELECT n.id, COALESCE(o.c, 0) AS out_degree FROM nodes n "
        "LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM edges GROUP BY src) o "
        "ON n.id = o.id)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)",
        "r0 AS MATERIALIZED (SELECT id, 1.0 AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        prev = f"r{i-1}"
        ctes.append(
            f"dang{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0.0) AS s FROM {prev} "
            f"JOIN outdeg USING (id) WHERE out_degree = 0)"
        )
        ctes.append(
            f"msg{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank / o.out_degree) AS m "
            f"FROM edges e JOIN {prev} r ON e.src = r.id "
            f"JOIN outdeg o ON o.id = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT n.id, {base} + {d} * (COALESCE(m.m, 0.0) + "
            f"(SELECT s FROM dang{i}) / (SELECT n FROM nn)) AS rank "
            f"FROM nodes n LEFT JOIN msg{i} m ON n.id = m.id)"
        )
    prefix = f"WITH triples AS MATERIALIZED ({TRIPLES_SQL}),\n"
    return (
        prefix
        + ",\n".join(ctes)
        + f"\nSELECT id, FLOOR(rank * 1000000 + 0.5) / 1000000 AS pagerank "
        f"FROM r{iters} ORDER BY pagerank DESC, id LIMIT {top}"
    )


def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component summary (undirected). Oracle-checkable
    because the derived FK graph is one connected component (every
    nation is in a region, every customer/supplier in a nation, every
    order by a customer): the oracle asserts the algorithm found
    exactly one component with the right size and min-label."""
    t = _triples(spark, sf_dir, materialize=True)
    return G.component_summary(t)


def graph_bfs_from_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram from region/0 over undirected edges —
    deterministic ints. Rows-only (iterative)."""
    t = _triples(spark, sf_dir, materialize=True)
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


# The derived FK graph has one component per region (regions are the
# roots and are not connected to each other). The oracle computes each
# node's region by walking the FK chain with joins, then aggregates to
# (min-label, size) per region — exactly what HashMin converges to.
COMPONENTS_SQL = f"""{_CTE},
nr AS (SELECT subj AS nation, obj AS region FROM triples WHERE pred = 'in_region'),
cr AS (SELECT t.subj AS node, nr.region
       FROM triples t JOIN nr ON t.obj = nr.nation WHERE t.pred = 'in_nation'),
members AS (
  SELECT region AS node, region FROM nr
  UNION
  SELECT nation, region FROM nr
  UNION
  SELECT node, region FROM cr
  UNION
  SELECT o.subj, cr.region FROM triples o JOIN cr ON o.obj = cr.node
  WHERE o.pred = 'by_customer'
  UNION
  SELECT n.obj, nr.region FROM triples n JOIN nr ON n.subj = nr.nation
  WHERE n.pred = 'name'
  UNION
  SELECT n.obj, n.subj FROM triples n
  WHERE n.pred = 'name' AND n.subj LIKE 'region/%'
)
SELECT MIN(node) AS component, COUNT(DISTINCT node) AS n_nodes
FROM members GROUP BY region
ORDER BY n_nodes DESC, component
"""


QUERIES: dict[str, Query] = {
    "graph_degrees": Query(graph_degrees, DEGREES_SQL),
    "graph_pagerank_top": Query(graph_pagerank_top, _pagerank_sql()),
    "graph_degree_powerlaw": Query(graph_degree_powerlaw, DEGREE_POWERLAW_SQL),
    "graph_components": Query(graph_components, COMPONENTS_SQL),
    "graph_bfs_from_region": Query(graph_bfs_from_region, BFS_SQL),
}
