"""Time-series operators Spark lacks as builtins: as-of join, range
join, hypertable-style multi-resolution rollup.

Each is expressed as a composition of DataFrame ops chosen for its
100 TB shuffle shape (no mapInPandas needed):

- as-of join: union the two streams, one window sort per key, carry the
  last left-row forward — O(n log n) per key, ONE shuffle, no
  range-explosion (the naive t1≤t2 join is quadratic per key).
- range join: bucketize time into interval-width buckets and join only
  adjacent buckets — the classic interval-join pattern; cost tracks
  actual pair density, not the cross product.
- hypertable rollup: finest-grain aggregate once, coarser grains
  re-aggregate FROM the finer one (TimescaleDB continuous-aggregate
  shape) — the big win at scale is that day/week/month never rescan raw
  data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each right row, attach the latest left row with
    left_ts <= right_ts (direction='backward'; 'forward' mirrors) within
    the same ``on`` key, optionally bounded by ``tolerance_seconds``.

    Union-and-carry implementation: tag sides, sort by (key, ts), carry
    the last-seen left timestamp forward with a window max — one shuffle
    on the key, linear after sort. Returns the right rows plus
    ``asof_ts`` (matched left timestamp, null if none/out of tolerance).
    """
    assert direction in ("backward", "forward")
    lt = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left")
    )
    rt = right.withColumn("_ts", F.col(right_ts)).withColumn(
        "_is_left", F.lit(0)
    )
    rcols = [c for c in rt.columns if c not in ("_ts", "_is_left")]
    lt_full = lt
    for c in rcols:
        if c not in lt_full.columns:
            lt_full = lt_full.withColumn(c, F.lit(None))
    merged = lt_full.select(rt.columns).unionByName(rt)

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").desc(), F.col("_is_left").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = merged.withColumn(
        "asof_ts",
        F.max(F.when(F.col("_is_left") == 1, F.col("_ts"))).over(w)
        if direction == "backward"
        else F.min(F.when(F.col("_is_left") == 1, F.col("_ts"))).over(w),
    )
    out = carried.filter(F.col("_is_left") == 0).drop("_is_left", "_ts")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_timestamp(F.col(right_ts)) - F.unix_timestamp(F.col("asof_ts"))
        )
        out = out.withColumn(
            "asof_ts", F.when(gap <= tolerance_seconds, F.col("asof_ts"))
        )
    return out


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    lookback_seconds: int,
) -> DataFrame:
    """Per probe row: count of build rows with
    probe_ts - lookback <= build_ts < probe_ts and matching key.

    Bucketized interval join: both sides bucket by
    floor(epoch/lookback); each probe joins its own + previous bucket
    only, then the exact range predicate filters. Shuffle is
    O(rows × 2), never the per-key cross product.
    """
    pb = probe.withColumn("_pe", F.unix_timestamp(F.col(probe_ts)))
    bb = build.select(
        F.col(on).alias("_bk"), F.unix_timestamp(F.col(build_ts)).alias("_be")
    ).withColumn("_bucket", (F.col("_be") / lookback_seconds).cast("long"))
    pb = pb.withColumn(
        "_buckets",
        F.array(
            (F.col("_pe") / lookback_seconds).cast("long"),
            (F.col("_pe") / lookback_seconds).cast("long") - 1,
        ),
    ).withColumn("_bucket", F.explode("_buckets"))
    joined = pb.join(
        bb,
        (pb["_bucket"] == bb["_bucket"])
        & (pb[on] == bb["_bk"])
        & (bb["_be"] >= pb["_pe"] - lookback_seconds)
        & (bb["_be"] < pb["_pe"]),
        "left",
    )
    group_cols = [c for c in probe.columns]
    return (
        joined.groupBy(*[pb[c] for c in group_cols])
        .agg(F.count(bb["_be"]).alias("n_in_range"))
        .select(*group_cols, "n_in_range")
    )


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dims: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Continuous-aggregate chain: hour from raw, day FROM hour, month
    FROM day. Sums/counts re-aggregate exactly; avg derives from
    sum/count at every grain (never an avg-of-avgs)."""
    dims = dims or []
    hour = (
        events.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"), *dims
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(30,2)")).alias("sum_value"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"), *dims)
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )
    month = (
        day.groupBy(F.date_trunc("month", F.col("bucket")).alias("bucket"), *dims)
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )

    def finish(df: DataFrame) -> DataFrame:
        return df.select(
            "bucket",
            *dims,
            "n",
            F.col("sum_value").cast("double").alias("sum_value"),
            (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
        )

    return {"hour": finish(hour), "day": finish(day), "month": finish(month)}
