"""Graph analytics over the triple table (SURVEY.md §7 Phase 4).

The graph view of a triple store: vertices = distinct(subj ∪ obj),
edges = (src=subj, dst=obj, rel=pred) — the degdb "economic graph"
reinterpreted for analytics. Algorithms are Pregel-pattern loops
(graph/pregel.py) or closed-form DataFrame aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from degdb_spark.graph.pregel import pregel
from degdb_spark.queries.rounding import dround
from degdb_spark.operators.balance import compact_pinned
from degdb_spark.persistence import lineage_cut, pin


def graph_view(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) from a triple DataFrame. Literal-valued objects
    (e.g. names) become vertices too — matching RDF semantics where any
    obj is a node."""
    edges = triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"), F.col("pred").alias("rel")
    )
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return vertices, edges


def degrees(triples: DataFrame) -> DataFrame:
    """In/out/total degree per vertex — closed-form, oracle-checkable.

    One explode + one groupBy = a single shuffle AND a single pass:
    each edge emits both endpoint rows from one generator, so the edge
    scan runs once (the union form it replaces planned the whole
    7-table triple scan twice), and the partial aggregation combines
    map-side."""
    _, edges = graph_view(triples)
    endpoints = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("id"),
                    F.lit(1).alias("out_c"),
                    F.lit(0).alias("in_c"),
                ),
                F.struct(
                    F.col("dst").alias("id"),
                    F.lit(0).alias("out_c"),
                    F.lit(1).alias("in_c"),
                ),
            )
        ).alias("e")
    ).select("e.id", "e.out_c", "e.in_c")
    return (
        endpoints.groupBy("id")
        .agg(F.sum("out_c").alias("out_degree"), F.sum("in_c").alias("in_degree"))
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    triples: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """PageRank via the Pregel loop.

    Dangling mass is redistributed uniformly each superstep so ranks sum
    to N (the GraphX convention of per-node rank around 1.0).
    """
    vertices, edges = graph_view(triples)
    n = vertices.count()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )

    def initial(v: DataFrame) -> DataFrame:
        return (
            v.join(out_deg, on="id", how="left")
            .na.fill(0, ["out_degree"])
            .withColumn("rank", F.lit(1.0))
        )

    def send(joined: DataFrame) -> DataFrame:
        return joined.select(
            F.col("dst"), (F.col("rank") / F.col("out_degree")).alias("msg")
        )

    def aggregate(messages: DataFrame) -> DataFrame:
        return messages.groupBy(F.col("dst").alias("id")).agg(
            F.sum("msg").alias("msg_sum")
        )

    def update(state: DataFrame, aggd: DataFrame) -> DataFrame:
        # dangling mass: total rank not propagated through edges — kept
        # inside the plan as a broadcast 1-row aggregate instead of a
        # per-superstep driver collect() (which would serialize every
        # iteration on a driver round-trip).
        dangling = state.filter(F.col("out_degree") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        return (
            state.drop("rank")
            .join(aggd, on="id", how="left")
            .na.fill(0.0, ["msg_sum"])
            .crossJoin(F.broadcast(dangling))
            .withColumn(
                "rank",
                F.lit(1.0 - damping)
                + F.lit(damping) * (F.col("msg_sum") + F.col("_dangling") / n),
            )
            .drop("msg_sum", "_dangling")
        )

    final = pregel(vertices, edges, initial, send, aggregate, update, max_iter=max_iter)
    # dround, not F.round: the oracle uses FLOOR(x*10^n + 0.5)/10^n, and
    # Spark's ROUND(double) HALF_UPs the shortest decimal string instead
    # of the binary value — they disagree near half-boundaries.
    return final.select("id", dround(F.col("rank"), round_dp).alias("pagerank"))


def hash_min_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Undirected connected components by iterative min-label propagation
    (HashMin — the standard Pregel CC) over arbitrary (id) / (src, dst)
    frames. Shared by the triple-graph view below and the near-dup
    clustering in operators/dedup.py.

    Converges in O(diameter) supersteps; the loop early-exits when no
    label changes. Each superstep is one shuffle on vertex id. The
    resulting ``component`` label is the MIN vertex id of the component —
    callers rely on that for deterministic representative selection.
    """
    # materialize once: every superstep joins edges, and lazily they'd
    # re-derive the upstream scan per iteration (measured 4× on the gate)
    edges = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .transform(pin, eager=False)
        # fold tiny pinned edge frames so supersteps stop paying a
        # near-empty task per original partition (no-op at scale)
        .transform(compact_pinned)
    )
    # initial component = own id
    state = vertices.withColumn("component", F.col("id"))
    for i in range(max_iter):
        msgs = (
            edges.join(state.select(F.col("id").alias("src"), "component"), on="src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("min_neighbor"))
        )
        # Carry old+new component in one frame so convergence is a plain
        # filter-count over the checkpointed partitions — ONE action per
        # superstep (the count materialises the lazy checkpoint), vs the
        # eager-checkpoint + old⋈new probe (two jobs, one with a shuffle).
        step = (
            state.join(msgs, on="id", how="left")
            .withColumn(
                "new_component",
                F.least(F.col("component"), F.coalesce("min_neighbor", "component")),
            )
            .select("id", "component", "new_component")
            .transform(lineage_cut, eager=False)
        )
        changed = step.filter(F.col("new_component") != F.col("component")).count()
        state = step.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return state


def connected_components(triples: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components of the triple graph (see hash_min_components)."""
    vertices, directed = graph_view(triples)
    return hash_min_components(vertices, directed.select("src", "dst"), max_iter)


def component_summary(triples: DataFrame) -> DataFrame:
    """Deterministic CC summary: one row per component with size."""
    cc = connected_components(triples)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.col("n_nodes").desc(), F.col("component"))
    )


def sssp_weighted(
    edges: DataFrame, source: str | int, max_hops: int = 6
) -> DataFrame:
    """Single-source shortest paths over positively-weighted edges,
    bounded to ``max_hops`` relaxations (Bellman-Ford).

    d_i(v) = min weight of any path from source to v using ≤ i edges —
    deterministic at every i whether or not the graph has converged,
    which is what makes the fixed-iteration oracle replay exact. The
    relaxation is a join on the frontier key + groupBy-min: one shuffle
    per hop, monotone (distances only decrease), early-exit when a hop
    improves nothing. ``edges`` is (src, dst, w) and must already
    contain both directions if the graph is undirected.
    """
    spark = edges.sparkSession
    edges = edges.select("src", "dst", "w").transform(pin, eager=False).transform(
        compact_pinned
    )
    dist = spark.createDataFrame([(source, 0)], ["id", "dist"]).withColumn(
        "dist", F.col("dist").cast("long")
    )
    for _ in range(max_hops):
        cand = (
            edges.join(dist.withColumnRenamed("id", "src"), on="src")
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        step = (
            dist.withColumn("_old", F.lit(True))
            .unionByName(cand.withColumn("_old", F.lit(False)))
            .groupBy("id")
            .agg(
                F.min("dist").alias("new_dist"),
                F.min(F.when(F.col("_old"), F.col("dist"))).alias("old_dist"),
            )
            .transform(lineage_cut, eager=False)
        )
        improved = step.filter(
            F.col("old_dist").isNull() | (F.col("new_dist") < F.col("old_dist"))
        ).count()
        dist = step.select("id", F.col("new_dist").alias("dist"))
        if improved == 0:
            break
    return dist


def label_propagation(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 5
) -> DataFrame:
    """Synchronous label propagation with deterministic tie-break.

    Each iteration every vertex adopts the most frequent label among its
    neighbours (ties broken by MIN label); vertices with no neighbours
    keep their label. Fixed synchronous iterations make the result
    deterministic (LPA famously oscillates — determinism here comes from
    the iteration bound, not convergence), so an unrolled SQL oracle
    replays it exactly. One groupBy + one window shuffle per iteration.
    ``edges`` must contain both directions for undirected graphs.
    """
    edges = edges.select("src", "dst").transform(pin, eager=False).transform(
        compact_pinned
    )
    labels = vertices.select("id").withColumn("label", F.col("id"))
    for _ in range(max_iter):
        votes = (
            edges.join(labels.withColumnRenamed("id", "src"), on="src")
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("label"))
        mode = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(mode, on="id", how="left")
            .select(
                "id", F.coalesce("new_label", "label").alias("label")
            )
            .transform(lineage_cut, eager=False)
        )
    return labels


def kcore_peel(
    edges: DataFrame, k: int, max_rounds: int = 8
) -> DataFrame:
    """Synchronous k-core peeling: repeatedly delete every vertex whose
    degree in the surviving subgraph is < k. Returns the surviving
    vertices with their final in-core degree.

    Fixed synchronous rounds (all sub-k vertices removed together) make
    each intermediate state deterministic, so an unrolled SQL oracle
    replays it exactly even if ``max_rounds`` stops short of the fixed
    point. Per round: one semi-join per endpoint to restrict edges to
    survivors + one groupBy-count — all shuffles on the vertex key, and
    the surviving set only shrinks, so per-round cost is monotonically
    decreasing. Early-exit when a round removes nothing (one count
    action per round, same discipline as sssp_weighted). ``edges`` must
    contain both directions for undirected graphs.
    """
    edges = edges.select("src", "dst").transform(pin, eager=False).transform(
        compact_pinned
    )
    alive = (
        edges.select(F.col("src").alias("id")).distinct().transform(lineage_cut, eager=False)
    )
    n_alive = alive.count()
    for _ in range(max_rounds):
        surviving = edges.join(
            alive.withColumnRenamed("id", "src"), on="src", how="left_semi"
        ).join(alive.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
        deg = surviving.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        alive = deg.filter(F.col("deg") >= k).select("id").transform(lineage_cut, eager=False)
        n_next = alive.count()
        if n_next == n_alive:
            break
        n_alive = n_next
    final = edges.join(
        alive.withColumnRenamed("id", "src"), on="src", how="left_semi"
    ).join(alive.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
    return final.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def bfs_distances(
    triples: DataFrame, source: str, max_depth: int = 6, undirected: bool = False
) -> DataFrame:
    """Single-source shortest hop-distance (frontier BFS, one join per
    level, frontier checkpointed)."""
    _, directed = graph_view(triples)
    edges = directed.select("src", "dst")
    if undirected:
        edges = edges.union(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    # one materialization; every BFS level joins the same edge frame
    edges = edges.transform(pin, eager=False).transform(
        compact_pinned
    )
    spark = triples.sparkSession
    visited = spark.createDataFrame([(source, 0)], ["id", "dist"])
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier.select(F.col("id").alias("src")), on="src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), on="id", how="left_anti")
            .withColumn("dist", F.lit(depth))
        )
        # lazy checkpoint + full count = one job per level (the count both
        # materialises the frontier and decides termination); limit(1)
        # would risk a partially-materialised checkpoint.
        nxt = nxt.transform(lineage_cut, eager=False)
        if nxt.count() == 0:
            break
        visited = visited.union(nxt)
        frontier = nxt
    return visited


def multi_source_bfs(
    edges: DataFrame, sources: DataFrame, max_hops: int = 4
) -> DataFrame:
    """Hop distances from EVERY source in one synchronized frontier:
    state is keyed by (source, id), so k sources cost one BFS's worth
    of supersteps, not k BFS runs — the standard trick behind sampled
    closeness/harmonic centrality (Eppstein-Wang style estimators).

    ``edges`` is (src, dst), both directions for undirected graphs;
    ``sources`` is a 1-column (source) frame. Returns (source, id,
    dist) with dist = min hops <= max_hops. Fixed iterations, no
    convergence action — every superstep is deterministic, which is
    what the unrolled-CTE oracle replays.
    """
    edges = edges.select("src", "dst").transform(pin, eager=False).transform(
        compact_pinned
    )
    dist = sources.select(
        F.col("source"), F.col("source").alias("id"), F.lit(0).cast("long").alias("dist")
    )
    for i in range(max_hops):
        cand = edges.join(dist.withColumnRenamed("id", "src"), on="src").select(
            "source", F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"))
        )
        # each intermediate state feeds the NEXT superstep twice
        # (frontier join + union) — checkpoint those; the final state
        # feeds only the caller's single aggregation, so skip it there
        if i < max_hops - 1:
            dist = dist.transform(lineage_cut, eager=False)
    return dist


def stress_path_counts(
    edges: DataFrame, sources: DataFrame, max_hops: int = 3
) -> DataFrame:
    """The two Brandes sweeps of sampled STRESS centrality, all-integer
    (the fractional pair-dependency of betweenness replaced by path
    COUNTS): forward level-synchronous BFS carrying σ(source, v) = the
    number of shortest source→v paths (new frontier = expansion
    grouped per node with σ summed, already-reached nodes anti-joined
    out), then a backward sweep over the shortest-path DAG computing
    ψ(source, v) = Σ_{w ∈ DAG-succ(v)} (1 + ψ(w)) — the number of
    shortest paths from v to every strictly-deeper target, which
    decomposes uniquely by first hop and therefore stays a BIGINT.
    Returns (source, id, dist, sigma, psi); stress(v) = Σ_source
    σ·ψ over rows with id ≠ source. Fixed supersteps (2·max_hops),
    state keyed by (source, id) so k sources cost one BFS — the
    multi_source_bfs discipline, and every step is deterministic for
    the unrolled-CTE oracle."""
    edges = edges.select("src", "dst").transform(pin, eager=True).transform(
        compact_pinned
    )
    frontier = sources.select(
        F.col("source"),
        F.col("source").alias("id"),
        F.lit(0).alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).transform(pin, eager=True)
    reached = frontier
    levels = [frontier]
    for i in range(1, max_hops + 1):
        expanded = (
            frontier.join(edges, frontier.id == edges.src)
            .groupBy("source", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("dst", "id")
        )
        frontier = (
            expanded.join(reached.select("source", "id"), ["source", "id"], "left_anti")
            .select("source", "id", F.lit(i).alias("dist"), "sigma")
            .transform(pin, eager=True)
        )
        levels.append(frontier)
        reached = reached.unionByName(frontier).transform(lineage_cut, eager=False)
    psi = levels[max_hops].select("source", "id", F.lit(0).cast("long").alias("psi"))
    psis = [psi]
    for i in range(max_hops - 1, -1, -1):
        succ = (
            levels[i].select("source", "id")
            .join(edges, F.col("id") == F.col("src"))
            .select("source", "id", F.col("dst").alias("wid"))
            .join(
                psi.select("source", F.col("id").alias("wid"), "psi"),
                ["source", "wid"],
            )
            .groupBy("source", "id")
            .agg(F.sum(F.col("psi") + F.lit(1)).alias("psi"))
        )
        psi = (
            levels[i].select("source", "id")
            .join(succ, ["source", "id"], "left")
            .fillna({"psi": 0})
            .transform(pin, eager=True)
        )
        psis.append(psi)
    all_psi = psis[0]
    for p in psis[1:]:
        all_psi = all_psi.unionByName(p)
    return reached.join(all_psi, ["source", "id"])
