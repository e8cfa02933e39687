"""Explicit skew mitigation: salted joins and salted aggregations.

AQE's skew-join split (enabled in session.py) handles most runtime
skew, but two cases still need *planned* salting at 100 TB:

1. A shuffle join where one key holds a constant far-outlier share
   (power-law keys — one bestseller product, one bot user). AQE splits
   oversized partitions of the BUILT plan; pre-salting spreads the hot
   key across ``n_salt`` reducers in the first place and composes with
   bucketed layouts.
2. High-volume aggregation onto few groups (global or near-global
   distinct counts), where the final reducer is a single task. The
   two-phase salted form makes the heavy phase parallel.

Both transformations are RESULT-IDENTITIES: the salted plan returns
exactly the plain plan's rows, which is what the oracle-checked
contract query verifies (the oracle runs the unsalted SQL).

Salts are deterministic (xxhash64 of row content / of the distinct
key), never rand(): retries and speculative tasks must agree on
placement, and lineage re-computation must be stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
) -> DataFrame:
    """Inner equi-join with the left side salted and the right side
    replicated ``n_salt``x. Use when `right` is too large to broadcast
    but small enough to replicate, and `left` is skewed on the key.

    The left salt is xxhash64 over ALL left columns mod n_salt — rows
    of the hot key spread across reducers as long as any other column
    varies (true for fact rows), with no nondeterminism.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l = left.withColumn("_salt", lsalt.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l.join(r, on=keys + ["_salt"], how="inner")
    return out.drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT x) per group in two salted phases: phase 1
    dedups (group, x) within salt buckets chosen by hash(x) — so each
    distinct value lands in exactly ONE bucket — and phase 2 sums the
    per-bucket distinct counts. The heavy dedup runs at group x salt
    parallelism; the final merge handles n_salt rows per group.

    Returns group_cols + (n_distinct long).
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salt)).alias("_salt")
    phase1 = (
        df.select(*group_cols, F.col(distinct_col).alias("_d"), salt)
        .distinct()
        .groupBy(*group_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(*group_cols).agg(
        F.sum("_partial").alias("n_distinct")
    )
