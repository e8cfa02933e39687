"""Embedding quantization for storage/serving compression.

Symmetric per-vector int8 scalar quantization — the standard first step
when a 100 TB embedding corpus needs to fit serving memory: scale =
max|x|/127, q_i = round-half-up(x_i/scale), reconstruction x̂_i = q_i·s.

Everything is built-in array math (zip-free: one aggregate for the
scale, one transform for the codes) riding whole-stage codegen over the
scan; no shuffle at all. Error stats use the repo's cross-engine
discipline: round-half-up via the FLOOR formula (Spark ROUND(double)
diverges from DuckDB near representable boundaries) and order-free
decimal summation for the squared-error accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from degdb_spark.queries.rounding import dround


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def int8_scale(vec_col: Column) -> Column:
    """Per-vector quantization scale: max|x| / 127 (0.0 for the zero
    vector, making its codes all zero)."""
    mx = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    return F.coalesce(mx, F.lit(0.0)) / F.lit(127.0)


def int8_codes(vec_col: Column, scale_col: Column) -> Column:
    """Quantized codes: FLOOR(x/s + 0.5) — round-half-up, identical in
    both engines; zero scale short-circuits to all-zero codes."""
    return F.when(
        scale_col == 0.0,
        F.transform(vec_col, lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") / scale_col + F.lit(0.5)).cast("int"),
        )
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Adds ``scale`` (double) and ``codes`` (array<int>, range ±127)."""
    out = df.withColumn("scale", int8_scale(F.col(vec_col)))
    return out.withColumn("codes", int8_codes(F.col(vec_col), F.col("scale")))


def reconstruction_error(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_dp: int = 8,
) -> DataFrame:
    """Per-vector quantization error: (id_col, scale, mse, max_abs_err).

    The squared errors are cast to DECIMAL(30,20) before folding so the
    sum is order-independent (bit-identical across engines); max is
    order-free by nature. No shuffle — pure projection.
    """
    # the raw scale is renamed before the final projection: aliasing a
    # rounded column AS "scale" in the same select would otherwise
    # capture the err expression's F.col("scale") via Spark's lateral
    # column alias resolution — the rounded value would silently replace
    # the raw one inside the error arithmetic (observed: max_abs_err
    # drifted in the 6th significant digit)
    q = quantize_int8(df, vec_col, id_col).withColumnRenamed("scale", "_scale_raw")
    err = F.zip_with(
        _as_double(F.col(vec_col)),
        F.col("codes"),
        lambda x, c: x - c.cast("double") * F.col("_scale_raw"),
    )
    # the outer cast pins the accumulator type — decimal addition
    # otherwise widens precision each step and fails the fold's merge
    # type check
    sse = F.aggregate(
        err,
        F.lit(0).cast("decimal(30,20)"),
        lambda acc, e: (acc + (e * e).cast("decimal(30,20)")).cast("decimal(30,20)"),
    )
    dim = F.size(F.col(vec_col))
    return q.select(
        id_col,
        dround(F.col("_scale_raw"), round_dp).alias("scale"),
        dround(
            F.when(dim == 0, F.lit(0.0)).otherwise(sse.cast("double") / dim), round_dp
        ).alias("mse"),
        dround(
            F.coalesce(
                F.array_max(F.transform(err, lambda e: F.abs(e))), F.lit(0.0)
            ),
            round_dp,
        ).alias("max_abs_err"),
    )
