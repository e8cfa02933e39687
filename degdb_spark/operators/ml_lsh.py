"""pyspark.ml LSH wrappers — the MLlib-native alternative paths for
near-dup and similarity search (SURVEY.md §7 Phase 6 named both).

These wrap the expression-based implementations' siblings from
pyspark.ml.feature:

- MinHashLSH over a sparse shingle-set vector (near-dup candidates via
  approxSimilarityJoin on Jaccard distance);
- BucketedRandomProjectionLSH over embeddings (Euclidean ANN).

When to choose which: the expression-based operators (operators/
dedup.py, operators/similarity.py) keep everything in whole-stage
codegen and need no fitted model, which suits streaming/incremental
jobs; the ml.feature versions integrate with Pipeline persistence and
give approxSimilarityJoin/approxNearestNeighbors APIs. Both are
banding-style: cost tracks collisions, never n².
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.linalg import Vectors, VectorUDT
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from degdb_spark.operators.text import shingle_fingerprints

#: dimensionality of the shingle-hash space for the sparse set vectors
SHINGLE_SPACE = 1 << 18


def _shingle_vector_udf():
    @F.udf(VectorUDT())
    def to_vec(hashes):
        idx = sorted({int(h) % SHINGLE_SPACE for h in (hashes or [])})
        return Vectors.sparse(SHINGLE_SPACE, idx, [1.0] * len(idx))

    return to_vec


def ml_minhash_neardups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hash_tables: int = 8,
    jaccard_distance: float = 0.6,
) -> DataFrame:
    """Near-dup pairs via pyspark.ml MinHashLSH approxSimilarityJoin.

    Returns (id_a, id_b, jaccard_dist) with id_a < id_b.
    """
    to_vec = _shingle_vector_udf()
    # Two-step materialization: shingle hashes are pure JVM expressions
    # (checkpoint 1); the vector UDF then runs over that trivial input
    # and is checkpointed too — MLlib's fit/join paths try to eval the
    # input expression tree directly, which an unextracted Python UDF
    # can't support (Spark INTERNAL_ERROR seen when the UDF sits over a
    # deep higher-order-function tree).
    hashes = df.select(
        F.col(id_col), shingle_fingerprints(text_col, shingle_k).alias("_hashes")
    ).localCheckpoint(eager=True)
    feats = hashes.select(
        F.col(id_col), to_vec(F.col("_hashes")).alias("features")
    ).localCheckpoint(eager=True)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    ).fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_distance, distCol="jaccard_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ml_brp_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Euclidean ANN via BucketedRandomProjectionLSH
    approxNearestNeighbors, one query at a time (MLlib's API shape), or
    approxSimilarityJoin for batch mode. Returns (query_id, neighbor_id,
    eucl_dist, rank)."""
    to_vec = F.udf(lambda a: Vectors.dense([float(x) for x in a]), VectorUDT())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_vec(F.col(vec_col)).alias("features")
    ).localCheckpoint(eager=True)
    q = queries.select(
        F.col(id_col).alias("query_id"), to_vec(F.col(vec_col)).alias("features")
    ).localCheckpoint(eager=True)
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(c)
    # batch mode: similarity join within a distance envelope, then top-k
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="eucl_dist")
    from pyspark.sql import Window

    scored = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        F.round("eucl_dist", 4).alias("eucl_dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("eucl_dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into centroid cells; each query probes its
    ``n_probe`` nearest cells and exact cosine re-ranks only those.

    The scale path beyond SRP when the corpus is clusterable: cell
    assignment is one fitted-model transform (a broadcast of k centroid
    vectors), candidate generation an equi-join on cell id — identical
    shuffle shape to the LSH paths, but data-adaptive. The training pass
    is the price SRP avoids.
    """
    from pyspark.ml.clustering import KMeans

    to_vec = F.udf(lambda a: Vectors.dense([float(x) for x in a]), VectorUDT())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        to_vec(F.col(vec_col)).alias("features"),
    ).localCheckpoint(eager=True)
    model = KMeans(k=n_centroids, seed=42, featuresCol="features").fit(c)
    assigned = model.transform(c).select(
        "neighbor_id", "cvec", F.col("prediction").alias("cell")
    )

    # Probe assignment stays IN-PLAN: the k centroid vectors (k·dim
    # floats — tiny) are embedded as an array-of-structs literal, each
    # query ranks them by squared distance with array_sort and keeps the
    # n_probe nearest. No driver collect — the query side can be a
    # full table.
    cent_lit = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(x)) for x in ctr]).alias("cv"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, ctr in enumerate(model.clusterCenters())
        ]
    )

    def _d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
        .withColumn(
            "_near",
            F.slice(
                F.array_sort(
                    F.transform(
                        cent_lit,
                        lambda ctr: F.struct(
                            _d2(F.col("qvec"), ctr["cv"]).alias("d2"),
                            ctr["cell"].alias("cell"),
                        ),
                    )
                ),
                1,
                n_probe,
            ),
        )
        .select("query_id", "qvec", F.explode("_near.cell").alias("cell"))
    )

    from degdb_spark.operators.similarity import cosine
    from degdb_spark.queries.rounding import dround
    from pyspark.sql import Window

    cand = assigned.join(F.broadcast(probes), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine_sim", dround(cosine(F.col("qvec"), F.col("cvec")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
