"""Sharded triple-store layout — degdb's keyspace routing as Spark
partition pruning.

The reference routes a rooted query to the peer owning
murmur3_64(subj) (/root/reference/query/query.go:24-47,
core/query.go:78-106). The Spark-native equivalent: persist the table
hive-partitioned by ``shard = pmod(xxhash64(subj), n_shards)`` and
derive the same shard expression from the query's subject constants at
read time — Catalyst's partition pruning then reads only the matching
directory, exactly as degdb contacts only the owning peer.

At 100 TB with n_shards≈4096 this gives: rooted point queries touch one
shard directory (plus row-group skipping inside it); bulk inserts
co-partition with the table so the anti-join dedup is shuffle-free on
the store side; and shard counts can be re-chosen without logic changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from degdb_spark.schemas import TRIPLE_SCHEMA

DEFAULT_SHARDS = 32

#: shard-hash algorithms: xxhash64 is the JVM-side default; murmur3_64
#: is byte-parity with the reference ring (core/http.go:70) via an
#: Arrow-batched UDF — a config switch for mixed degdb/Spark
#: deployments, not the hot path.
SHARD_ALGOS = ("xxhash64", "murmur3_64")


def shard_of(subj_col, n_shards: int = DEFAULT_SHARDS, algo: str = "xxhash64"):
    """The shard id expression (keyspace-hash analogue of core/http.go:70)."""
    if algo == "xxhash64":
        return F.pmod(F.xxhash64(subj_col), F.lit(n_shards)).cast("int")
    if algo == "murmur3_64":
        from degdb_spark.functions.murmur3 import murmur3_shard_udf

        return murmur3_shard_udf(n_shards)(subj_col)
    raise ValueError(f"unknown shard algo {algo!r}; expected one of {SHARD_ALGOS}")


def write_sharded(
    df: DataFrame, path: str, n_shards: int = DEFAULT_SHARDS, algo: str = "xxhash64"
) -> None:
    """Persist hive-partitioned by shard; one file per shard partition
    per write (repartition on the same key first so a shard's rows are
    written by one task, not sprayed across all of them). The shard
    count is recorded in the layout — readers must hash with the same
    modulus or silently miss rows."""
    (
        df.withColumn("shard", shard_of(F.col("subj"), n_shards, algo))
        .repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    import json
    import os

    with open(os.path.join(path, "_degdb_meta.json"), "w") as f:
        json.dump({"n_shards": n_shards, "algo": algo}, f)


def layout_meta(path: str) -> tuple[int, str] | None:
    """(n_shards, algo) recorded at write time (None for foreign layouts)."""
    import json
    import os

    meta = os.path.join(path, "_degdb_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            d = json.load(f)
        return int(d["n_shards"]), d.get("algo", "xxhash64")
    return None


def layout_shards(path: str) -> int | None:
    """The shard count recorded at write time (None for foreign layouts)."""
    meta = layout_meta(path)
    return meta[0] if meta else None


def read_sharded(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def rooted_query(
    spark: SparkSession,
    path: str,
    subjects: list[str],
    n_shards: int | None = None,
) -> DataFrame:
    """Rooted pattern query with shard routing: adds the shard-id filter
    derived from the subject constants, which Catalyst turns into
    partition pruning (the `ShardQueryByHash` equivalent — but the
    'routing table' is the directory layout, not a peer list).

    The modulus and hash algo come from the layout's own metadata;
    passing a mismatched n_shards would silently miss rows, so an
    explicit value is only honoured when the layout carries no metadata.
    """
    recorded = layout_meta(path)
    algo = "xxhash64"
    if recorded is not None:
        n_shards, algo = recorded
    elif n_shards is None:
        n_shards = DEFAULT_SHARDS
    df = read_sharded(spark, path)
    # compute the shard ids driver-side from the same hash expression
    shard_rows = (
        spark.createDataFrame([(s,) for s in subjects], ["subj"])
        .select(shard_of(F.col("subj"), n_shards, algo).alias("shard"))
        .distinct()
        .collect()
    )
    shards = sorted(r["shard"] for r in shard_rows)
    return df.filter(F.col("shard").isin(shards) & F.col("subj").isin(subjects)).drop(
        "shard"
    )
