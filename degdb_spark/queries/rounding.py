"""Cross-engine deterministic arithmetic for oracle-checked queries.

Two sources of Spark↔DuckDB drift, and their antidotes:

1. **Float-sum order.** SUM(double) depends on partial-aggregation order,
   which differs run-to-run in Spark and engine-to-engine. Antidote:
   cast addends to DECIMAL at their exact scale (all testdata money
   columns are 2dp; products of 2dp×2dp are 4dp, ×3 are 6dp) and sum
   decimals — integer arithmetic, order-independent, bit-identical.

2. **ROUND semantics.** Spark's ROUND(double) goes through the shortest
   decimal string (HALF_UP on Double.toString); DuckDB rounds the raw
   binary value. For a double like 0.81295 (stored 0.81294999…) they
   disagree. Antidote: only ROUND decimals (both engines agree for
   positive HALF_UP), or use the same FLOOR(x·10ⁿ + 0.5)/10ⁿ formula on
   bit-identical doubles on both sides.

At 100 TB the decimal cast costs nothing extra: it rides the same
whole-stage-codegen projection, and decimal partial aggregation is still
map-side combined.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, n: int) -> Column:
    """Deterministic double rounding: FLOOR(x·10ⁿ + 0.5)/10ⁿ.

    Identical formula to sql_dround; given bit-identical input doubles,
    output is bit-identical across engines (never use F.round on
    doubles in oracle-checked queries).
    """
    f = float(10**n)
    return F.floor(col * f + F.lit(0.5)) / f


def sql_dround(expr: str, n: int) -> str:
    f = 10**n
    return f"FLOOR(({expr}) * {f} + 0.5) / {f}"


def dsum(col: Column, scale: int = 2, out_dp: int | None = None) -> Column:
    """Order-independent SUM: decimal(30,scale) accumulation, optionally
    ROUNDed in the decimal domain, returned as double."""
    s = F.sum(col.cast(f"decimal(30,{scale})"))
    if out_dp is not None:
        s = F.round(s, out_dp)
    return s.cast("double")


def sql_dsum(expr: str, scale: int = 2, out_dp: int | None = None) -> str:
    s = f"SUM(CAST(({expr}) AS DECIMAL(30,{scale})))"
    if out_dp is not None:
        s = f"ROUND({s}, {out_dp})"
    return f"CAST({s} AS DOUBLE)"


def davg(col: Column, scale: int = 2, out_dp: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count (identical double
    division both sides), then the deterministic floor-round."""
    return dround(dsum(col, scale) / F.count(F.lit(1)), out_dp)


def sql_davg(expr: str, scale: int = 2, out_dp: int = 4) -> str:
    return sql_dround(f"{sql_dsum(expr, scale)} / COUNT(*)", out_dp)
