"""Deterministic sampling & split operators for training pipelines.

All based on content/id hashing, not RNG: a row's split assignment is a
pure function of its key, so re-runs, retries, and incremental jobs
assign identically — the property that matters when a 100 TB corpus is
split across thousands of tasks (Spark's sample() is seed-stable only
per partition layout; hash splits survive repartitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key_col: Column | str, buckets: int = 100, seed: int = 42) -> Column:
    """Stable bucket in [0, buckets) from the key (xxhash64-based)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(buckets)).cast("int")


def md5_bucket(key_col: Column | str, buckets: int = 100) -> Column:
    """Portable stable bucket: first 8 hex chars of md5(key) as an int.

    Slower than xxhash64 (md5 + string slicing) but reproducible in any
    engine — used where the split assignment itself must be auditable
    outside Spark (DuckDB: ('0x' || substr(md5(k),1,8))::BIGINT).
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    ).cast("int")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction_pct: int, seed: int = 42
) -> DataFrame:
    """Keep ~fraction_pct% of rows, stable under re-runs/repartitioning."""
    return df.filter(hash_bucket(key_col, 100, seed) < fraction_pct)


def train_test_split(
    df: DataFrame, key_col: str, test_pct: int = 10, seed: int = 42
) -> DataFrame:
    """Add a ``split`` column ('train'/'test') by key hash."""
    return df.withColumn(
        "split",
        F.when(hash_bucket(key_col, 100, seed) < test_pct, "test").otherwise("train"),
    )


def stratified_counts(df: DataFrame, key_col: str, strata_col: str, test_pct: int = 10) -> DataFrame:
    """Split sizes per stratum — the QA check behind any split."""
    return (
        train_test_split(df, key_col, test_pct)
        .groupBy(strata_col, "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(strata_col, "split")
    )
