"""Table profiling — per-column statistics in one pass (the ANALYZE /
data-quality primitive a pipeline runs before trusting a new drop).

The reference has a single stats surface (`Size()` — triple count + DB
file size, triplestore/triplestore.go:150-170); this is its
engine-grade generalisation: null counts, cardinalities, extremes, per
column, computed scan-once.

Scale notes (100 TB): ONE wide aggregation computes every column's
stats in a single job — never N scans for N columns. Count/min/max
partial-aggregate map-side to one row per task. Exact COUNT(DISTINCT
c1), COUNT(DISTINCT c2), ... makes Catalyst plan an Expand (one
duplicated stream per distinct column) — acceptable for oracle
checking, but at 100 TB pass ``exact_distinct=False`` to use
approx_count_distinct (HyperLogLog++, one stream, mergeable sketches),
the same trade the KMV sketch operator documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str).

    min/max are stringified via CAST AS STRING — callers needing
    cross-engine-stable rendering should pre-cast the column (e.g.
    double → DECIMAL(30,2), timestamp → DATE) before profiling.
    """
    cols = columns if columns is not None else df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).alias(f"__nd_{c}")
            )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(per_col).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )
