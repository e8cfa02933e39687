"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force cosine top-k: exact; query set broadcast against the
  corpus, dot products via zip_with/aggregate (JVM codegen, no Python).
  At 100 TB this is the per-partition scan baseline — O(Q·N·d) but
  embarrassingly parallel and shuffle-free until the final top-k.
- LSH-bucketed (random hyperplane / SRP): sign-bit sketches over r
  hyperplanes → 2^r buckets; neighbors come from matching buckets only.
  The scale path: one shuffle on bucket id, cost ~ collisions.

An IVF variant (k-means coarse quantizer) would slot in the same shape
(assign → per-centroid buckets); SRP chosen because it needs no training
pass.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from degdb_spark.operators.balance import rebalance_for_compute
from degdb_spark.queries.rounding import dround
from degdb_spark.persistence import pin


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    """Cosine similarity between two array<float/double> columns, as a
    double expression (all JVM-side)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is assumed small (it is broadcast); the join is a
    broadcast-nested-loop producing Q·N rows that immediately collapse
    through the per-query top-k window. Self-matches are excluded.
    Similarity is rounded to ``round_dp`` and ties break on neighbor id,
    making the ranking fully deterministic (and oracle-comparable).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = rebalance_for_compute(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", dround(cosine(F.col("qvec"), F.col("cvec")), round_dp))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def srp_sketch(vec_col, hyperplanes: list[list[float]]):
    """Signed-random-projection bucket id: one bit per hyperplane."""
    return F.element_at(
        srp_buckets_all(vec_col, [hyperplanes], len(hyperplanes[0])), 1
    )


def srp_buckets_all(vec_col, tables: list[list[list[float]]], dim: int):
    """Bucket ids for ALL sketch tables in ONE pass over the vector.

    The hyperplane matrix is laid out position-major (one row of
    n_tables×n_planes coefficients per vector position); a single
    zip_with+aggregate computes every projection simultaneously, and the
    finish lambda turns sign bits into per-table bucket ids. Versus one
    fold per (table, plane) this evaluates the vector once and keeps the
    generated code linear in dim (measured ~4× on the 8×4 default).
    """
    n_tables = len(tables)
    n_planes = len(tables[0])
    width = n_tables * n_planes
    # position-major coefficient matrix: row i = plane coefficients at
    # vector position i, flattened across tables
    h2d = F.array(
        *[
            F.array(
                *[
                    F.lit(float(tables[t][p][i]))
                    for t in range(n_tables)
                    for p in range(n_planes)
                ]
            )
            for i in range(dim)
        ]
    )
    return F.aggregate(
        F.zip_with(
            vec_col, h2d, lambda x, hrow: F.transform(hrow, lambda h: h * x.cast("double"))
        ),
        F.array(*[F.lit(0.0)] * width),
        lambda acc, row: F.zip_with(acc, row, lambda a, b: a + b),
        lambda projs: F.transform(
            F.sequence(F.lit(0), F.lit(n_tables - 1)),
            lambda t: F.aggregate(
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                F.lit(0),
                lambda acc, p: acc
                + F.when(
                    F.element_at(projs, t * n_planes + p + 1) >= 0,
                    F.pow(F.lit(2.0), p).cast("int"),
                ).otherwise(F.lit(0)),
            ).cast("int"),
        ),
    )


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (Box-Muller over a seeded
    PRNG) — fixed across runs so sketches are reproducible."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            u1, u2 = rng.random(), rng.random()
            plane.append(math.sqrt(-2 * math.log(max(u1, 1e-12))) * math.cos(2 * math.pi * u2))
        planes.append(plane)
    return planes


def _buckets_from_matrix(vec_col, h2d_col, n_tables: int, n_planes: int):
    """srp_buckets_all with the coefficient matrix read from a COLUMN
    instead of inlined literals. Identical arithmetic (same position-major
    fold), but the hyperplanes travel as data — a dim×(tables·planes)
    literal matrix (64×32 = 2048 nodes) otherwise dominates whole-stage
    codegen compile time (~3 s per query at the default shape)."""
    width = n_tables * n_planes
    return F.aggregate(
        F.zip_with(
            vec_col, h2d_col, lambda x, hrow: F.transform(hrow, lambda h: h * x.cast("double"))
        ),
        F.array_repeat(F.lit(0.0), width),
        lambda acc, row: F.zip_with(acc, row, lambda a, b: a + b),
        lambda projs: F.transform(
            F.sequence(F.lit(0), F.lit(n_tables - 1)),
            lambda t: F.aggregate(
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                F.lit(0),
                lambda acc, p: acc
                + F.when(
                    F.element_at(projs, t * n_planes + p + 1) >= 0,
                    F.pow(F.lit(2.0), p).cast("int"),
                ).otherwise(F.lit(0)),
            ).cast("int"),
        ),
    )


def _sketched(
    df: DataFrame,
    side: str,
    tables: list[list[list[float]]],
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(side_id, side_vec, tbl, bucket) rows — all sketch tables in one
    pass. The hyperplane matrix rides in via a broadcast 1-row cross
    join (a length-dim array column), not as expression literals."""
    n_tables, n_planes = len(tables), len(tables[0])
    spark = df.sparkSession
    h2d = [
        [float(tables[t][p][i]) for t in range(n_tables) for p in range(n_planes)]
        for i in range(dim)
    ]
    mat = spark.createDataFrame([(h2d,)], "_h2d array<array<double>>")
    return (
        rebalance_for_compute(df)
        .crossJoin(F.broadcast(mat))
        .select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.posexplode(
                _buckets_from_matrix(F.col(vec_col), F.col("_h2d"), n_tables, n_planes)
            ).alias("tbl", "bucket"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    round_dp: int = 4,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates share an SRP bucket in ≥1 of
    n_tables sketch tables; exact cosine re-ranks candidates.

    Scale shape: corpus is sketched once per table (a projection, no
    shuffle), candidate generation is an equi-join on (table, bucket) —
    the only shuffle — and re-rank cost is proportional to collisions.

    ``broadcast_queries`` is the small-query-set fast path (shuffle-free
    candidate join). Pass False whenever the query side is corpus-sized
    — e.g. self-join near-dup — so the join shuffles both sides on
    (tbl, bucket) instead of replicating a full sketched corpus to every
    executor.
    """
    tables = [
        make_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)
    ]
    cq = _sketched(queries, "query", tables, dim, id_col, vec_col)
    cc = _sketched(corpus, "neighbor", tables, dim, id_col, vec_col)
    if broadcast_queries:
        cq = F.broadcast(cq)
    # Score in the join projection (vectors are colocated there), THEN
    # dedup multi-table collisions on bare (query_id, neighbor_id):
    # duplicates carry identical cosine, so max() == distinct, and the
    # dedup shuffle moves two ids + one double instead of two full
    # embedding vectors per candidate — at 100 TB the difference between
    # shuffling the corpus's vector payload and shuffling a pair list.
    scored = (
        cc.join(cq, on=["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            dround(cosine(F.col("query_vec"), F.col("neighbor_vec")), round_dp),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold, via SRP
    bucketing (no all-pairs).

    The query side IS the corpus here, so the candidate join must NOT
    broadcast it (that would replicate the whole sketched corpus to
    every executor at 100 TB) — both sides shuffle on (tbl, bucket),
    and the bucket key bounds the pair explosion."""
    topk = lsh_topk(
        corpus,
        corpus,
        k=20,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        round_dp=round_dp,
        broadcast_queries=False,
    )
    return (
        topk.filter(
            (F.col("cosine_sim") >= threshold)
            & (F.col("query_id") < F.col("neighbor_id"))
        )
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            "cosine_sim",
        )
        .distinct()
    )


def srp_bucket_table(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 4,
) -> DataFrame:
    """(vec_id, tbl, bucket) — the persistable SRP index (the embedding
    twin of dedup.band_table): write it out after each ingest so the
    next increment probes buckets instead of re-sketching the corpus."""
    tables = [make_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]
    return _sketched(corpus, "c", tables, dim, id_col, vec_col).select(
        F.col("c_id").alias(id_col), "tbl", "bucket"
    )


def incremental_embedding_neardups(
    new_vecs: DataFrame,
    existing_buckets: DataFrame,
    all_vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 4,
    round_dp: int = 4,
) -> DataFrame:
    """Near-dup pairs for an embedding INCREMENT: the new batch's
    bucket rows probe the persisted index (old vectors are never
    re-sketched; old-vs-old is never re-paired), plus a new-vs-new
    self-join; exact cosine verifies candidates only. Candidates are
    ALL bucket collisions (no per-query rank cut — the increment is
    the bounded side, so the collision set stays proportional to it).

    Returns (id_a, id_b, cosine_sim) with id_a < id_b, each pair
    touching at least one new vector.
    """
    nb = srp_bucket_table(
        new_vecs, id_col, vec_col, dim, n_tables, n_planes
    ).transform(pin, eager=False)
    probe = (
        existing_buckets.alias("l")
        .join(
            nb.alias("r"),
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket")),
        )
        .select(
            F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    new_new = (
        nb.alias("l")
        .join(
            nb.alias("r"),
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
    )
    cand = probe.unionByName(new_new).distinct()
    va = all_vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    vb = all_vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine_sim", dround(cosine(F.col("_va"), F.col("_vb")), round_dp))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
