"""Round-2 coverage queries — graph triangle analytics, document
chunking/bigram pipeline ops, sliding windows, forward as-of, per-key
capping, stratified sampling. All oracle-checked.

Scale notes are per-query; the common theme is bounded per-key fanout
(basket pairs, chunk explode) so nothing here goes quadratic in the
table size at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from degdb_spark.catalog import load_table
from degdb_spark.operators.sampling import md5_bucket
from degdb_spark.operators.timeseries import asof_join
from degdb_spark.queries import Query
from degdb_spark.queries.rounding import dround, dsum, sql_dround, sql_dsum
from degdb_spark.persistence import pin

_BUCKET_SQL = "CAST(('0x' || substr(md5(CAST({key} AS VARCHAR(64))), 1, 8)) AS BIGINT) % 100"


# --------------------------------------------------------------------------
# Co-purchase graph: parts are vertices; an undirected edge connects two
# parts that appear in the same order. Per-order part fanout is bounded
# (~4-7 items), so edge generation is linear in lineitem — the classic
# market-basket shape that survives 100 TB (vs clique-expansion designs
# that go quadratic per key).


def _basket_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNTHRESHOLDED canonical (u < v) co-purchase pair set, served
    FROM the persisted basket-edge contract index (round 11 — the raw
    per-batch counts make ONE artifact serve both the w >= 2 analytics
    graph and this distinct-pair set: sum partials, keep sum >= 1).
    Built on first touch when the fingerprinted artifact is absent;
    steady-state cost is an index-sized bucket-local aggregate instead
    of the lineitem scan + per-order combination explode (~2 s of
    basket_triangle_count's 2.8 s at sf0.1). Index == inline equality
    is pytest-enforced (tests/test_graph.py)."""
    from degdb_spark.operators import basket as B
    from degdb_spark.queries.graph_adv_queries import (
        _basket_edges_table,
        basket_edges_build,
    )

    table = _basket_edges_table(sf_dir)
    if not spark.catalog.tableExists(table):
        basket_edges_build(spark, sf_dir).collect()
    return B.pairs_from_index(spark, table, min_w=1).select("u", "v")


_EDGES_CTE = """
items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
""".strip()


def _degrees(e: DataFrame) -> DataFrame:
    """Undirected degree per vertex from the u<v canonical edge list."""
    return (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _degree_oriented_edges(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each undirected edge from its lower-rank endpoint to the
    higher, rank = (degree, id) — the Ortmann/Brandes degree ordering.

    This is the 100 TB skew bound for triangle enumeration: in the
    resulting DAG every vertex's out-degree is O(sqrt(m)), so the
    two-path join that keys on the mid vertex can never concentrate on
    a bestseller hub the way id-orientation can (a hub of degree d
    contributes d^2 two-paths when oriented by id, but at most O(m)
    total across all vertices when oriented by degree). Rank is a
    deterministic SQL aggregate, so the DuckDB oracle replays the same
    orientation and the value hash survives.
    """
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    # edges are canonical u<v, so on a degree tie u is already the
    # lower (deg, id) rank
    fwd = F.col("du") <= F.col("dv")
    return e.join(du, "u").join(dv, "v").select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


_ORIENTED_CTE = f"""
{_EDGES_CTE},
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT u AS id FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY id
),
oedges AS (
  SELECT CASE WHEN du.deg <= dv.deg THEN e.u ELSE e.v END AS a,
         CASE WHEN du.deg <= dv.deg THEN e.v ELSE e.u END AS b
  FROM edges e
  JOIN deg du ON du.id = e.u
  JOIN deg dv ON dv.id = e.v
)
""".strip()


def _adjacency(oe: DataFrame) -> DataFrame:
    """Per-vertex sorted out-neighbor array of the degree-oriented DAG.
    Array length is bounded by the orientation's O(sqrt(m)) out-degree
    cap, so no single row can blow up."""
    return oe.groupBy(F.col("a").alias("id")).agg(
        F.sort_array(F.collect_list("b")).alias("nbrs")
    )


def _edge_intersections(oe: DataFrame) -> DataFrame:
    """Each degree-oriented edge (a,b) paired with N+(a) and N+(b).

    This is the adjacency-intersection (edge-iterator) triangle
    formulation: |N+(a) ∩ N+(b)| closes each triangle exactly once.
    Same Σ outdeg² total work as the two-path join, but the wedge
    stream never exists as shuffle rows — the neighbor lists ride as
    array payloads, and the intersection runs inside the task
    (measured at sf0.1: 49M wedge rows → 1.2M edge rows, triangle
    stage 7.4 s → ~2 s).

    The (a, b, na) edge stream is re-derived by EXPLODING the
    adjacency arrays instead of joining ``oe`` back against them: the
    explode regenerates exactly one row per oriented edge with N+(a)
    already attached (collect_list keeps every b of a unique edge
    set), so the a-side join disappears — one shuffle fewer per call,
    and the per-row array payload is the same bytes the a-side join
    carried."""
    adj = _adjacency(oe)
    pairs = adj.select(
        F.col("id").alias("a"),
        F.col("nbrs").alias("na"),
        F.explode("nbrs").alias("b"),
    )
    return (
        pairs.join(adj.select(F.col("id").alias("b"), F.col("nbrs").alias("nb")), "b")
        .select("a", "b", F.array_intersect("na", "nb").alias("common"))
    )


def basket_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count of the co-purchase graph.

    Edges are degree-oriented (lower (deg, id) rank → higher), bounding
    every out-degree by O(sqrt(m)) — no hub-skew at scale (see
    _degree_oriented_edges) — then counted by per-edge adjacency
    intersection (see _edge_intersections) so the wedge stream is never
    shuffled row-at-a-time.
    """
    e = _basket_edges(spark, sf_dir).transform(pin, eager=True)
    oe = _degree_oriented_edges(e, _degrees(e)).transform(pin, eager=True)
    tri = _edge_intersections(oe).agg(
        F.sum(F.size("common")).alias("n_triangles")
    )
    return oe.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


TRIANGLE_SQL = f"""
WITH {_ORIENTED_CTE}
SELECT (SELECT COUNT(*) FROM oedges) AS n_edges,
       (SELECT COUNT(*)
        FROM oedges e1 JOIN oedges e2 ON e1.b = e2.a
        JOIN oedges e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
"""


def basket_clustering_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part: triangles_at(v) /
    C(deg(v), 2), top 20 by coefficient (part id tie-break). One edge
    scan for degrees; closures come from the degree-oriented adjacency
    intersection (each triangle contributes once to each of its three
    vertices regardless of orientation)."""
    e = _basket_edges(spark, sf_dir).transform(pin, eager=True)
    deg = _degrees(e).transform(pin, eager=True)
    oe = _degree_oriented_edges(e, deg).transform(pin, eager=True)
    # per-edge adjacency intersection, exploded only to the actual
    # triangles (1.9M rows at sf0.1, vs the 49M-row wedge stream)
    tri = _edge_intersections(oe).select(
        "a", "b", F.explode("common").alias("c")
    )
    tri_at = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri_at, on="id", how="left")
        .na.fill(0, ["n_tri"])
        .withColumn(
            "clustering",
            dround(F.col("n_tri") * 2.0 / (F.col("deg") * (F.col("deg") - 1)), 6),
        )
        .select("id", "deg", "n_tri", "clustering")
        .orderBy(F.col("clustering").desc(), F.col("id"))
        .limit(20)
    )


CLUSTERING_SQL = f"""
WITH {_EDGES_CTE},
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT u AS id FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY id
),
tri AS (
  SELECT e1.u, e1.v, e2.v AS w
  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
tri_at AS (
  SELECT id, COUNT(*) AS n_tri FROM (
    SELECT u AS id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
  ) GROUP BY id
)
SELECT d.id, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
       {sql_dround("COALESCE(t.n_tri, 0) * 2.0 / (d.deg * (d.deg - 1))", 6)} AS clustering
FROM deg d LEFT JOIN tri_at t ON d.id = t.id
WHERE d.deg >= 2
ORDER BY clustering DESC, d.id
LIMIT 20
"""


# --------------------------------------------------------------------------
# Document chunking: fixed-width character chunks with overlap — the
# context-window packing primitive of a training-data pipeline. The
# explode is bounded by ceil(len/stride) per doc, linear overall.

_CHUNK, _STRIDE = 200, 160


def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = (
        # empty docs produce no chunks; the filter also keeps Spark's
        # sequence() away from the (0, -1) bounds it raises on, matching
        # DuckDB's naturally-empty generate_series(0, -1, stride)
        docs.filter(F.length("text") > 0)
        .withColumn(
            "start",
            F.explode(
                F.sequence(F.lit(0), F.length("text") - 1, F.lit(_STRIDE))
            ),
        )
        .withColumn("chunk", F.col("text").substr(F.col("start") + 1, F.lit(_CHUNK)))
        .select(
            "doc_id",
            F.col("start").cast("long").alias("start"),
            F.length("chunk").cast("long").alias("chunk_len"),
            F.md5("chunk").alias("chunk_md5"),
        )
        .orderBy("doc_id", "start")
    )
    return out


CHUNK_SQL = f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(0, length(text) - 1, {_STRIDE})) AS start
  FROM documents
)
SELECT doc_id, start,
       length(substr(text, start + 1, {_CHUNK})) AS chunk_len,
       md5(substr(text, start + 1, {_CHUNK})) AS chunk_md5
FROM starts
ORDER BY doc_id, start
"""


def docs_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 word bigrams across the corpus (count desc, bigram asc).
    The transform/sequence stays in whole-stage codegen; per-doc output
    is len(words)-1 — linear."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.withColumn("w", F.split("text", " ")).filter(F.size("w") >= 2)
    bigrams = w.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(30)
    )


BIGRAM_SQL = """
WITH words AS (
  SELECT string_split(text, ' ') AS w FROM documents
  WHERE length(string_split(text, ' ')) >= 2
),
bigrams AS (
  SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM words
)
SELECT bigram, COUNT(*) AS n
FROM bigrams GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 30
"""


# --------------------------------------------------------------------------
# Events: sliding windows, forward as-of, per-key capping.


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute windows sliding every 5 — each event lands in 3 windows
    (epoch-aligned, identical to Structured Streaming's window()); counts
    and distinct users per window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "n_users")
        .orderBy("win_start")
    )


SLIDING_SQL = """
WITH shifted AS (
  SELECT (time_bucket(INTERVAL '5 minutes', ts)
          - k.k * INTERVAL '5 minutes')::TIMESTAMP_NS AS win_start,
         user_id
  FROM events, (SELECT unnest([0, 1, 2]) AS k) k
)
SELECT win_start, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM shifted GROUP BY win_start ORDER BY win_start
"""


def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each click, the user's NEXT purchase at or
    after it, within 2 hours. Per-user summary."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        tolerance_seconds=7200, direction="forward",
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("asof_ts").alias("n_with_purchase"),
        )
        .orderBy("user_id")
    )


ASOF_FWD_SQL = """
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
), with_next AS (
  SELECT c.user_id, c.ts,
         (SELECT MIN(p.ts) FROM events p
          WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
            AND p.ts >= c.ts) AS next_purchase
  FROM clicks c
)
SELECT user_id, COUNT(*) AS n_clicks,
       COUNT(CASE WHEN next_purchase IS NOT NULL
                   AND FLOOR(EPOCH(next_purchase)) - FLOOR(EPOCH(ts)) <= 7200
             THEN 1 END) AS n_with_purchase
FROM with_next GROUP BY user_id ORDER BY user_id
"""


def events_per_user_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key capping (keep ≤3 events per user, stable hash order) —
    the source-capping primitive of data curation: one window shuffle on
    the key, no driver involvement."""
    ev = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.md5(F.col("event_id").cast("string")), F.col("event_id")
        )
    )
    return (
        ev.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("event_id").alias("min_kept"),
            F.max("event_id").alias("max_kept"),
        )
        .orderBy("user_id")
    )


CAP_SQL = """
WITH ranked AS (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY md5(CAST(event_id AS VARCHAR(64))), event_id
         ) AS rn
  FROM events
)
SELECT user_id, COUNT(*) AS n_kept,
       MIN(event_id) AS min_kept, MAX(event_id) AS max_kept
FROM ranked WHERE rn <= 3
GROUP BY user_id ORDER BY user_id
"""


def lineitem_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: different rates per stratum
    (A 10%, N 3%, R 7%) off one portable hash — rebalancing a skewed
    corpus without a shuffle beyond the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    rate = (
        F.when(F.col("l_returnflag") == "A", 10)
        .when(F.col("l_returnflag") == "N", 3)
        .otherwise(7)
    )
    return (
        li.filter(md5_bucket(key, 100) < rate)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, out_dp=2
            ).alias("sample_revenue"),
        )
        .orderBy("l_returnflag")
    )


STRATIFIED_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       {sql_dsum("l_extendedprice * (1 - l_discount)", 4, out_dp=2)} AS sample_revenue
FROM lineitem
WHERE {_BUCKET_SQL.format(key="CONCAT(l_orderkey, '-', l_linenumber)")}
      < CASE l_returnflag WHEN 'A' THEN 10 WHEN 'N' THEN 3 ELSE 7 END
GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES: dict[str, Query] = {
    "basket_triangle_count": Query(basket_triangle_count, TRIANGLE_SQL),
    "basket_clustering_top": Query(basket_clustering_top, CLUSTERING_SQL),
    "docs_chunking": Query(docs_chunking, CHUNK_SQL),
    "docs_bigrams": Query(docs_bigrams, BIGRAM_SQL),
    "events_sliding_window": Query(events_sliding_window, SLIDING_SQL),
    "events_asof_forward": Query(events_asof_forward, ASOF_FWD_SQL),
    "events_per_user_cap": Query(events_per_user_cap, CAP_SQL),
    "lineitem_stratified_sample": Query(lineitem_stratified_sample, STRATIFIED_SQL),
}
