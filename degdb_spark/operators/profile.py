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
    INTEGER moments. Inputs are fixed-scale (``scale`` dp, non-negative
    money-style measures); each value becomes a scaled long
    xi = floor(x*10^scale + .5), and because Pearson is scale-invariant
    the correlation of the scaled ints IS the correlation of the
    doubles — no rescaling ever happens.

    The second-moment sums (x*x, x*y) would overflow a long at
    warehouse row counts, and decimal(38) accumulation is the
    BigDecimal slow path (~6x wall on this suite). Instead each product
    splits into (hi, lo) = (p div 2^31, p mod 2^31); both parts sum as
    plain codegen longs (map-side combined), and the exact total
    2^31*Shi + Slo is reassembled in DECIMAL on the final 1-row
    projection. Headroom: lo-sums stay < 2^31 * n_rows — at 10^12 rows
    add one more split level. The DuckDB oracle sums the products
    directly into HUGEINT; both sides then round the exact integer to
    the nearest double, identically.

    Returns (col_a, col_b, corr) for a < b in `cols` order.
    """
    from degdb_spark.queries.rounding import dround

    f = 10 ** scale
    two31 = 2147483648  # 2^31

    def scaled(c: str):
        return F.floor(F.col(c) * f + F.lit(0.5)).cast("long")

    proj = [scaled(c).alias(f"_x_{c}") for c in cols]
    base = df.select(*proj)

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        x = F.col(f"_x_{c}")
        aggs.append(F.sum(x).alias(f"_s_{c}"))
        p = x * x
        # p / 2^31 is a power-of-two division: exact in a double (only
        # the exponent shifts, p < 2^53), so the long cast floors it
        aggs.append(F.sum((p / F.lit(two31)).cast("long")).alias(f"_ss_hi_{c}"))
        aggs.append(F.sum(p % F.lit(two31)).alias(f"_ss_lo_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            p = F.col(f"_x_{a}") * F.col(f"_x_{b}")
            aggs.append(F.sum((p / F.lit(two31)).cast("long")).alias(f"_sp_hi_{a}_{b}"))
            aggs.append(F.sum(p % F.lit(two31)).alias(f"_sp_lo_{a}_{b}"))
    one = base.agg(*aggs)

    dec = "decimal(38,0)"

    def reassemble(hi: str, lo: str):
        return (
            F.col(hi).cast(dec) * F.lit(two31).cast(dec) + F.col(lo).cast(dec)
        )

    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            n = F.col("_n").cast(dec)
            sa = F.col(f"_s_{a}").cast(dec)
            sb = F.col(f"_s_{b}").cast(dec)
            num = (n * reassemble(f"_sp_hi_{a}_{b}", f"_sp_lo_{a}_{b}") - sa * sb).cast("double")
            da = (n * reassemble(f"_ss_hi_{a}", f"_ss_lo_{a}") - sa * sa).cast("double")
            db = (n * reassemble(f"_ss_hi_{b}", f"_ss_lo_{b}") - sb * sb).cast("double")
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
    """DuckDB replay of correlation_matrix: same scaled-long values,
    but products sum straight into HUGEINT (no split needed) — the
    exact integers agree, so the double conversions agree."""
    f = 10 ** scale
    sel = ["COUNT(*) AS _n"]
    scl = lambda c: f"CAST(FLOOR({c} * {f} + 0.5) AS BIGINT)"
    for c in cols:
        sel.append(f"SUM({scl(c)}) AS _s_{c}")
        sel.append(f"SUM({scl(c)} * {scl(c)}) AS _ss_{c}")
    arms = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sel.append(f"SUM({scl(a)} * {scl(b)}) AS _sp_{a}_{b}")
            f10 = 10 ** out_dp
            expr = (
                f"FLOOR(CAST(_n * _sp_{a}_{b} - _s_{a} * _s_{b} AS DOUBLE) / "
                f"sqrt(CAST(_n * _ss_{a} - _s_{a} * _s_{a} AS DOUBLE) * "
                f"CAST(_n * _ss_{b} - _s_{b} * _s_{b} AS DOUBLE)) * {f10} + 0.5) / {f10}"
            )
            arms.append(f"SELECT '{a}' AS col_a, '{b}' AS col_b, {expr} AS corr FROM m")
    body = "\nUNION ALL\n".join(arms)
    return f"WITH m AS (SELECT {', '.join(sel)} FROM {table})\n{body}\nORDER BY col_a, col_b"


def ols_fit(
    df: DataFrame, x_col: str, y_col: str, scale: int = 2, out_dp: int = 6
) -> DataFrame:
    """Simple linear regression y = a + b*x in one aggregation pass
    over the same split-long exact moments as correlation_matrix
    (codegen long sums, no BigDecimal). Slope is invariant under the
    common 10^scale input scaling; the intercept is descaled once at
    the end. Returns one row (n, slope, intercept, r2), all
    FLOOR-rounded — deterministic cross-engine.
    """
    from degdb_spark.queries.rounding import dround

    f = 10 ** scale
    two31 = 2147483648

    def scaled(c: str):
        return F.floor(F.col(c) * f + F.lit(0.5)).cast("long")

    base = df.select(scaled(x_col).alias("_x"), scaled(y_col).alias("_y"))
    px = F.col("_x") * F.col("_x")
    py = F.col("_y") * F.col("_y")
    pxy = F.col("_x") * F.col("_y")
    agg = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum((px / F.lit(two31)).cast("long")).alias("_sxx_hi"),
        F.sum(px % F.lit(two31)).alias("_sxx_lo"),
        F.sum((py / F.lit(two31)).cast("long")).alias("_syy_hi"),
        F.sum(py % F.lit(two31)).alias("_syy_lo"),
        F.sum((pxy / F.lit(two31)).cast("long")).alias("_sxy_hi"),
        F.sum(pxy % F.lit(two31)).alias("_sxy_lo"),
    )
    dec = "decimal(38,0)"

    def re(hi, lo):
        return F.col(hi).cast(dec) * F.lit(two31).cast(dec) + F.col(lo).cast(dec)

    n = F.col("_n").cast(dec)
    sx, sy = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    cov = (n * re("_sxy_hi", "_sxy_lo") - sx * sy).cast("double")
    varx = (n * re("_sxx_hi", "_sxx_lo") - sx * sx).cast("double")
    vary = (n * re("_syy_hi", "_syy_lo") - sy * sy).cast("double")
    slope = cov / varx
    intercept = (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")) / F.col("_n") / f
    r2 = (cov * cov) / (varx * vary)
    return agg.select(
        F.col("_n").alias("n"),
        dround(slope, out_dp).alias("slope"),
        dround(intercept, out_dp).alias("intercept"),
        dround(r2, out_dp).alias("r2"),
    )


def ols_sql(
    table: str, x_col: str, y_col: str, scale: int = 2, out_dp: int = 6,
    where: str = "",
) -> str:
    """DuckDB replay of ols_fit (HUGEINT moments, same exact integers)."""
    f = 10 ** scale
    f10 = 10 ** out_dp
    sx = f"CAST(FLOOR({x_col} * {f} + 0.5) AS BIGINT)"
    sy = f"CAST(FLOOR({y_col} * {f} + 0.5) AS BIGINT)"
    w = f"WHERE {where}" if where else ""
    def r(e):
        return f"FLOOR(({e}) * {f10} + 0.5) / {f10}"
    return f"""
WITH m AS (
  SELECT COUNT(*) AS n, SUM({sx}) AS sx, SUM({sy}) AS sy,
         SUM({sx} * {sx}) AS sxx, SUM({sy} * {sy}) AS syy,
         SUM({sx} * {sy}) AS sxy
  FROM {table} {w}
), d AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
         CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
         CAST(n * syy - sy * sy AS DOUBLE) AS vary,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m
)
SELECT n,
       {r("cov / varx")} AS slope,
       {r("(syd - (cov / varx) * sxd) / n / " + str(f))} AS intercept,
       {r("(cov * cov) / (varx * vary)")} AS r2
FROM d
"""


def ols_fit_by(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 2,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group simple linear regression — ols_fit's moments keyed by
    ``group_cols`` (one shuffle to group granularity, the model math on
    the tiny per-group row). The distributed form of 'fit a model per
    segment' that needs no UDF and no per-group driver loop.

    Returns group_cols + (n, slope, intercept, r2).
    """
    from degdb_spark.queries.rounding import dround

    f = 10 ** scale
    two31 = 2147483648

    def scaled(c: str):
        return F.floor(F.col(c) * f + F.lit(0.5)).cast("long")

    base = df.select(*group_cols, scaled(x_col).alias("_x"), scaled(y_col).alias("_y"))
    px = F.col("_x") * F.col("_x")
    py = F.col("_y") * F.col("_y")
    pxy = F.col("_x") * F.col("_y")
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum((px / F.lit(two31)).cast("long")).alias("_sxx_hi"),
        F.sum(px % F.lit(two31)).alias("_sxx_lo"),
        F.sum((py / F.lit(two31)).cast("long")).alias("_syy_hi"),
        F.sum(py % F.lit(two31)).alias("_syy_lo"),
        F.sum((pxy / F.lit(two31)).cast("long")).alias("_sxy_hi"),
        F.sum(pxy % F.lit(two31)).alias("_sxy_lo"),
    )
    dec = "decimal(38,0)"

    def re(hi, lo):
        return F.col(hi).cast(dec) * F.lit(two31).cast(dec) + F.col(lo).cast(dec)

    n = F.col("_n").cast(dec)
    sx, sy = F.col("_sx").cast(dec), F.col("_sy").cast(dec)
    cov = (n * re("_sxy_hi", "_sxy_lo") - sx * sy).cast("double")
    varx = (n * re("_sxx_hi", "_sxx_lo") - sx * sx).cast("double")
    vary = (n * re("_syy_hi", "_syy_lo") - sy * sy).cast("double")
    slope = cov / varx
    intercept = (
        (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double"))
        / F.col("_n")
        / f
    )
    r2 = (cov * cov) / (varx * vary)
    return agg.select(
        *group_cols,
        F.col("_n").alias("n"),
        dround(slope, out_dp).alias("slope"),
        dround(intercept, out_dp).alias("intercept"),
        dround(r2, out_dp).alias("r2"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    scale: int = 2,
    out_dp: int = 6,
) -> DataFrame:
    """Two-sample Welch t-test (unequal variances) between two groups,
    in ONE aggregation pass: conditional split-long moments per group
    (same exact-integer machinery as correlation_matrix — codegen long
    sums, no float accumulation), then t and the Welch-Satterthwaite
    df as a fixed sequence of double ops on the 1-row aggregate —
    bit-replayable in SQL. Returns (n_a, n_b, mean_a, mean_b, t_stat,
    df_welch).

    Degenerate inputs: a group that is absent or has a single row has
    no sample variance, so t_stat/df_welch are NULL (not NaN) — the
    n_a/n_b columns in the same row say which side was too small
    (ADVICE r4). Like the rest of the split-long machinery, exactness
    holds while n·(f·x)² stays under 2^53 per 2^31-slice — i.e.
    |value_col| ≲ 10^(7−scale) at billions of rows (see
    correlation_matrix's scale bound, which value_col inherits)."""
    from degdb_spark.queries.rounding import dround

    f = 10 ** scale
    two31 = 2147483648
    x = F.floor(F.col(value_col) * f + F.lit(0.5)).cast("long")
    g = F.col(group_col)
    base = df.filter(g.isin([group_a, group_b])).select(
        g.alias("_g"), x.alias("_x")
    )
    px = F.col("_x") * F.col("_x")

    def side(tag: str, name: str):
        cond = F.col("_g") == name
        return [
            F.count(F.when(cond, F.lit(1))).alias(f"_n_{tag}"),
            F.sum(F.when(cond, F.col("_x"))).alias(f"_sx_{tag}"),
            F.sum(F.when(cond, (px / F.lit(two31)).cast("long"))).alias(
                f"_sxx_hi_{tag}"
            ),
            F.sum(F.when(cond, px % F.lit(two31))).alias(f"_sxx_lo_{tag}"),
        ]

    agg = base.agg(*side("a", group_a), *side("b", group_b))
    dec = "decimal(38,0)"

    def q(tag: str):
        n = F.col(f"_n_{tag}").cast(dec)
        sx = F.col(f"_sx_{tag}").cast(dec)
        sxx = (
            F.col(f"_sxx_hi_{tag}").cast(dec) * F.lit(two31).cast(dec)
            + F.col(f"_sxx_lo_{tag}").cast(dec)
        )
        var_num = (n * sxx - sx * sx).cast("double")  # n*(n-1)*s² (scaled²)
        nn = F.col(f"_n_{tag}").cast("double")
        # s²/n descaled: var_num / (n*(n-1)) / n / f²
        return var_num / (nn * (nn - F.lit(1.0))) / nn / F.lit(float(f * f))

    qa, qb = q("a"), q("b")
    se2 = qa + qb
    mean_a = F.col("_sx_a").cast("double") / F.col("_n_a") / f
    mean_b = F.col("_sx_b").cast("double") / F.col("_n_b") / f
    t = (mean_a - mean_b) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        qa * qa / (F.col("_n_a").cast("double") - F.lit(1.0))
        + qb * qb / (F.col("_n_b").cast("double") - F.lit(1.0))
    )
    # both sides need >= 2 rows for a sample variance; below that the
    # statistics are NULL (n_a/n_b identify the too-small side)
    enough = (F.col("_n_a") >= 2) & (F.col("_n_b") >= 2)
    return agg.select(
        F.col("_n_a").alias("n_a"),
        F.col("_n_b").alias("n_b"),
        dround(mean_a, out_dp).alias("mean_a"),
        dround(mean_b, out_dp).alias("mean_b"),
        dround(F.when(enough, t), out_dp).alias("t_stat"),
        dround(F.when(enough, dfw), out_dp).alias("df_welch"),
    )
