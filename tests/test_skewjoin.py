"""Salted join / salted aggregation (operators/skewjoin.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from degdb_spark.operators.skewjoin import salted_count_distinct, salted_join


def test_salted_join_is_result_identity(spark):
    # heavy skew: 900 of 1000 left rows share key 7
    left = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame([Row(k=7, v="hot"), Row(k=950, v="cold")])
    got = salted_join(left, right, on="k", n_salt=4).collect()
    want = left.join(right, on="k").collect()
    assert sorted((r.k, r.payload, r.v) for r in got) == sorted(
        (r.k, r.payload, r.v) for r in want
    )
    assert len(got) == 901


def test_salted_join_spreads_hot_key(spark):
    # the hot key's rows land in >1 salt bucket (varying payload)
    left = spark.range(0, 100).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    salts = (
        left.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(4))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1


def test_salted_count_distinct_matches_exact(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 321).alias("x")
    )
    got = {
        r.g: r.n_distinct
        for r in salted_count_distinct(df, ["g"], "x", n_salt=8).collect()
    }
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("x").alias("n")).collect()
    }
    assert got == want


def test_correlation_matrix_matches_native_corr(spark):
    """Exact-decimal corr agrees with Spark's native corr to 1e-5."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.profile import correlation_matrix

    df = spark.range(0, 2000).select(
        (F.col("id") % 100 / 7.0).alias("x"),
        ((F.col("id") % 100) * 0.5 + (F.col("id") % 7)).alias("y"),
    )
    # decimal path needs fixed-scale inputs: round to 2dp like money cols
    df = df.select(F.round("x", 2).alias("x"), F.round("y", 2).alias("y"))
    got = correlation_matrix(df, ["x", "y"]).collect()[0]
    want = df.agg(F.corr("x", "y")).collect()[0][0]
    assert abs(got.corr - want) < 1e-5


def test_ols_fit_recovers_known_line(spark):
    """y = 3 + 2x exactly -> slope 2, intercept 3, r2 1."""
    from pyspark.sql import functions as F

    from degdb_spark.operators.profile import ols_fit

    df = spark.range(1, 500).select(
        (F.col("id") / 4.0).alias("x"), (F.lit(3.0) + 2 * F.col("id") / 4.0).alias("y")
    )
    r = ols_fit(df, "x", "y").collect()[0]
    assert abs(r.slope - 2.0) < 1e-6
    assert abs(r.intercept - 3.0) < 1e-4
    assert abs(r.r2 - 1.0) < 1e-6


def test_table_diff_classification(spark):
    from pyspark.sql import Row

    from degdb_spark.operators.diff import table_diff

    a = spark.createDataFrame(
        [Row(k=1, v=10, w=None), Row(k=2, v=20, w="x"), Row(k=3, v=30, w="y")]
    )
    b = spark.createDataFrame(
        [Row(k=2, v=20, w="x"), Row(k=3, v=31, w="y"), Row(k=4, v=40, w=None)]
    )
    got = {r.k: r.change_type for r in table_diff(a, b, ["k"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    # null-safe: NULL == NULL is unchanged
    a2 = spark.createDataFrame([Row(k=1, v=None)], "k long, v string")
    b2 = spark.createDataFrame([Row(k=1, v=None)], "k long, v string")
    assert table_diff(a2, b2, ["k"]).collect()[0].change_type == "unchanged"
