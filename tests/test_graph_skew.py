"""Skewed-graph property tier (VERDICT r4 ask #5).

The sf0.1 co-purchase graph is near-uniform, so it cannot exercise the
skew arguments SCALE.md makes for the graph family. This tier
synthesizes a hub-heavy graph — one vertex of degree 1,000 over a
triangle-rich ring — and asserts, quantitatively:

1. the Ortmann/Brandes degree orientation caps every out-degree at
   O(sqrt(m)) even though the raw max degree is 1,000;
2. the per-edge adjacency-intersection work of the oriented plan is a
   tiny fraction of the un-oriented wedge volume (Σ deg² — what the
   pre-round-5 basket_ktruss support join paid);
3. triangle counts and k-truss edge supports on the skewed graph are
   exactly right (brute-force cross-check), so the orientation is an
   execution strategy only, never a semantics change.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

N_SPOKE = 1000  # hub degree


def _hub_graph_edges():
    """Canonical u<v edge list: hub 0 → every ring vertex, plus ring
    edges (i, i+1) and (i, i+2) so the graph is triangle-rich both at
    the hub and away from it."""
    edges = [(0, i) for i in range(1, N_SPOKE + 1)]
    for i in range(1, N_SPOKE + 1):
        if i + 1 <= N_SPOKE:
            edges.append((i, i + 1))
        if i + 2 <= N_SPOKE:
            edges.append((i, i + 2))
    return edges


def _brute_triangles(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    eset = {tuple(sorted(e)) for e in edges}
    tris = set()
    for u, v in eset:
        for w in adj[u] & adj[v]:
            tris.add(tuple(sorted((u, v, w))))
    support = {e: 0 for e in eset}
    for a, b, c in tris:
        for e in combinations((a, b, c), 2):
            support[tuple(sorted(e))] += 1
    return tris, support


def test_degree_orientation_bounds_hub_outdegree(spark):
    from degdb_spark.queries.coverage_queries import (
        _degree_oriented_edges,
        _degrees,
        _edge_intersections,
    )

    edges = _hub_graph_edges()
    m = len(edges)
    e = spark.createDataFrame(edges, "u long, v long")
    deg = _degrees(e)
    # raw skew is real: the hub dominates
    assert deg.agg(F.max("deg")).first()[0] == N_SPOKE
    oe = _degree_oriented_edges(e, deg)
    outdeg = oe.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    max_out = outdeg.agg(F.max("d")).first()[0]
    # Ortmann/Brandes bound: out-degree is O(sqrt(m)); with m ~ 3k the
    # cap sits near sqrt(2m) ~ 77 — three orders below the hub degree
    assert max_out <= int((2 * m) ** 0.5) + 5, max_out

    # quantitative skew argument: per-edge intersection work vs the
    # un-oriented wedge volume Σ deg(v)² (dominated by the hub's 10⁶)
    unoriented_wedges = deg.agg(F.sum(F.col("deg") * F.col("deg"))).first()[0]
    oriented_work = (
        _edge_intersections(oe)
        .select((F.size("common") + F.lit(0)).alias("w"))
        .agg(F.sum("w"))
        .first()[0]
    )
    # intersections touch each sorted neighbor array linearly; bound
    # the comparison volume by Σ(|na| + |nb|) per edge
    adj_sizes = (
        oe.join(
            outdeg.select(F.col("a"), F.col("d").alias("da")), on="a", how="left"
        )
        .join(
            outdeg.select(F.col("a").alias("b"), F.col("d").alias("db")),
            on="b",
            how="left",
        )
        .na.fill(0)
        .agg(F.sum(F.col("da") + F.col("db")))
        .first()[0]
    )
    assert adj_sizes < 0.05 * unoriented_wedges, (adj_sizes, unoriented_wedges)
    assert oriented_work is not None


def test_triangle_count_exact_on_hub_graph(spark):
    from degdb_spark.queries.coverage_queries import (
        _degree_oriented_edges,
        _degrees,
        _edge_intersections,
    )

    edges = _hub_graph_edges()
    tris, _ = _brute_triangles(edges)
    e = spark.createDataFrame(edges, "u long, v long")
    oe = _degree_oriented_edges(e, _degrees(e))
    got = (
        _edge_intersections(oe).agg(F.sum(F.size("common"))).first()[0]
    )
    assert got == len(tris) and len(tris) > 2500


def test_truss_support_exact_on_hub_graph(spark):
    """The oriented k-truss support counter is exact on the skewed
    graph — each edge's triangle count matches brute force, including
    the 1,000 hub edges a wedge-join formulation would have exploded
    on (this test predates-and-catches a revert to un-oriented
    support)."""
    from degdb_spark.queries.graph_adv_queries import _truss_support

    edges = _hub_graph_edges()
    _, support = _brute_triangles(edges)
    e = spark.createDataFrame(edges, "u long, v long")
    got = {(r.u, r.v): r.s for r in _truss_support(e).collect()}
    want = {e: s for e, s in support.items() if s > 0}
    assert got == want


def test_multi_source_bfs_exact_on_hub_graph(spark):
    """Hop distances through the hub (the skew pinch-point for the
    harmonic-centrality family: every frontier expansion crosses the
    degree-1,000 vertex) match brute-force BFS exactly."""
    from degdb_spark.graph.algorithms import multi_source_bfs

    edges = _hub_graph_edges()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def bfs(src, max_hops):
        dist = {src: 0}
        frontier = [src]
        for h in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = h
                        nxt.append(w)
            frontier = nxt
        return dist

    sources = [0, 500]
    both = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    e = spark.createDataFrame(both, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "source long")
    got = {
        (r.source, r.id): r.dist
        for r in multi_source_bfs(e, s, max_hops=3).collect()
    }
    want = {
        (src, node): d
        for src in sources
        for node, d in bfs(src, 3).items()
    }
    assert got == want


# ---- property tier: random graphs, any shape --------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def random_edge_lists(draw):
    """Arbitrary small simple graphs: up to 18 vertices, any density —
    hypothesis will find degenerate shapes (empty, stars, cliques,
    disconnected) that the fixtures never encode by hand."""
    n = draw(st.integers(min_value=2, max_value=18))
    pairs = [(u, v) for u in range(n) for v in range(u + 1, n)]
    picks = draw(st.lists(st.sampled_from(pairs), min_size=1, max_size=60))
    return sorted(set(picks))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=random_edge_lists())
def test_truss_support_matches_bruteforce_on_random_graphs(spark, edges):
    """Oriented support counting is exact on ARBITRARY graphs, not just
    the fixtures: per-edge triangle counts equal brute force for every
    random shape hypothesis throws at it."""
    from degdb_spark.queries.graph_adv_queries import _truss_support

    _, support = _brute_triangles(edges)
    e = spark.createDataFrame(edges, "u long, v long")
    got = {(r.u, r.v): r.s for r in _truss_support(e).collect()}
    assert got == {e_: s for e_, s in support.items() if s > 0}


def test_stress_path_counts_on_hub_graph_matches_replica(spark):
    """Skew tier for the stress sweeps: on the hub-heavy graph (hub
    degree 1,000) the all-integer σ/ψ recursion must equal a straight
    Python BFS-DAG replica from a hub source AND a ring source — the
    hub multiplies path counts (σ up to the hub degree), which is
    exactly where an implementation that lost a level or double-counted
    a frontier would diverge."""
    und = _hub_graph_edges()
    edges = spark.createDataFrame(
        [(u, v) for u, v in und] + [(v, u) for u, v in und], ["src", "dst"]
    )
    sources = spark.createDataFrame([(0,), (500,)], ["source"])

    from degdb_spark.graph.algorithms import stress_path_counts

    got = {
        (r.source, r.id): (r.dist, r.sigma, r.psi)
        for r in stress_path_counts(edges, sources, max_hops=3).collect()
    }

    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def replica(s, hops):
        dist, sigma = {s: 0}, {s: 1}
        frontier = [s]
        for d in range(1, hops + 1):
            nxt = {}
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[v]
            for w, sg in nxt.items():
                dist[w], sigma[w] = d, sg
            frontier = list(nxt)
        psi = {}
        for d in range(hops, -1, -1):
            for v, dv in dist.items():
                if dv != d:
                    continue
                psi[v] = sum(
                    1 + psi[w]
                    for w in adj[v]
                    if dist.get(w) == d + 1
                )
        return {(s, v): (dist[v], sigma[v], psi[v]) for v in dist}

    want = replica(0, 3) | replica(500, 3)
    assert got == want
    # skew sanity: every ring vertex is 1 hop from the hub, so the
    # hub's psi counts one path to each of the 1,000 spokes plus the
    # deeper ring continuations — and sigma through the hub stays exact
    assert got[(0, 0)][2] >= N_SPOKE
