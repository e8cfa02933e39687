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


def correlation_matrix(
    df: DataFrame, cols: list[str], scale: int = 2, out_dp: int = 6
) -> DataFrame:
    """Pairwise Pearson correlations in ONE aggregation pass over exact
    decimal moments: sums, squared sums, and cross-products accumulate
    as DECIMAL (order-free integers under the hood), and only the final
    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))
    drops to double — a correctly-rounded conversion both engines
    share, unlike the native corr() aggregate whose float partials are
    merge-order-dependent. One shuffle of a single row regardless of
    data size; k columns cost k + k(k+1)/2 accumulators, all map-side
    combined.

    Returns (col_a, col_b, corr) for a < b in `cols` order.
    """
    from degdb_spark.queries.rounding import dround

    s2 = f"decimal(38,{scale})"
    s4 = f"decimal(38,{scale * 2})"
    aggs = [F.count(F.lit(1)).cast("decimal(20,0)").alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(s2)).alias(f"_s_{c}"))
        aggs.append(F.sum((F.col(c) * F.col(c)).cast(s4)).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.sum((F.col(a) * F.col(b)).cast(s4)).alias(f"_sp_{a}_{b}"))
    one = df.agg(*aggs)

    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            num = (F.col("_n") * F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")).cast("double")
            da = (F.col("_n") * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")).cast("double")
            db = (F.col("_n") * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")).cast("double")
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    dround(num / F.sqrt(da * db), out_dp).alias("corr"),
                )
            )
    return (
        one.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.*")
        .orderBy("col_a", "col_b")
    )


def correlation_matrix_sql(
    table: str, cols: list[str], scale: int = 2, out_dp: int = 6
) -> str:
    """DuckDB replay of correlation_matrix."""
    s2 = f"DECIMAL(38,{scale})"
    s4 = f"DECIMAL(38,{scale * 2})"
    sel = ["CAST(COUNT(*) AS DECIMAL(20,0)) AS _n"]
    for c in cols:
        sel.append(f"SUM(CAST({c} AS {s2})) AS _s_{c}")
        sel.append(f"SUM(CAST({c} * {c} AS {s4})) AS _ss_{c}")
    arms = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sel.append(f"SUM(CAST({a} * {b} AS {s4})) AS _sp_{a}_{b}")
            f10 = 10 ** out_dp
            expr = (
                f"FLOOR(CAST(_n * _sp_{a}_{b} - _s_{a} * _s_{b} AS DOUBLE) / "
                f"sqrt(CAST(_n * _ss_{a} - _s_{a} * _s_{a} AS DOUBLE) * "
                f"CAST(_n * _ss_{b} - _s_{b} * _s_{b} AS DOUBLE)) * {f10} + 0.5) / {f10}"
            )
            arms.append(f"SELECT '{a}' AS col_a, '{b}' AS col_b, {expr} AS corr FROM m")
    body = "\nUNION ALL\n".join(arms)
    return f"WITH m AS (SELECT {', '.join(sel)} FROM {table})\n{body}\nORDER BY col_a, col_b"
