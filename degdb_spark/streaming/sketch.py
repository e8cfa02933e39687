"""Streaming cardinality sketches: HyperLogLog over an unbounded stream.

The streaming twin of operators/sketch.hll_registers: a stateful
aggregation whose ENTIRE state is the 2^p-row register table — max
rho per register index — so state is bounded by construction (no
watermark needed for the global sketch; the per-window variant bounds
state by horizon x 2^p). Because register merge is exact sketch union
(max is idempotent/commutative/associative), the streamed registers
are bit-identical to the batch sketch over the same data — asserted in
tests/test_streaming.py — and the same hll_estimate() reads both.

This is the 100 TB pattern for "distinct users today, live": the
stream maintains registers in update mode; any consumer merges the
latest register rows with historical daily register tables by MAX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.operators.sketch import _HLL_BITS, _hash60


def hll_register_stream(
    events: DataFrame, key: str = "user_id", p: int = 8
) -> DataFrame:
    """Global register table over the whole stream (update mode):
    one row per register index, 2^p rows of state total."""
    kcol = F.col(key)
    m = 1 << p
    rmax = _HLL_BITS - p + 1
    h = _hash60(kcol)
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(rmax)).otherwise(
        F.bit_count(w.bitwiseXOR(w - F.lit(1)))
    )
    return (
        events.filter(kcol.isNotNull())
        .select(h.bitwiseAND(F.lit(m - 1)).alias("reg_idx"), rho.alias("rho"))
        .groupBy("reg_idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_register_window_stream(
    events: DataFrame,
    key: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
) -> DataFrame:
    """Per-window register tables (append mode once the watermark
    passes): the persisted form that merges with MAX across windows."""
    kcol = F.col(key)
    m = 1 << p
    rmax = _HLL_BITS - p + 1
    h = _hash60(kcol)
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(rmax)).otherwise(
        F.bit_count(w.bitwiseXOR(w - F.lit(1)))
    )
    return (
        events.withWatermark("ts", watermark)
        .filter(kcol.isNotNull())
        .select(
            "ts",
            h.bitwiseAND(F.lit(m - 1)).alias("reg_idx"),
            rho.alias("rho"),
        )
        .groupBy(F.window("ts", window).alias("win"), F.col("reg_idx"))
        .agg(F.max("rho").alias("reg"))
        .select(F.col("win.start").alias("window_start"), "reg_idx", "reg")
    )


def cms_cell_stream(
    events: DataFrame, key: str = "user_id", depth: int = 4, width: int = 64
) -> DataFrame:
    """Streaming Count-Min sketch: the cell table (row, bucket, cnt)
    maintained incrementally — state is depth*width rows by
    construction, never proportional to keys or events. Counts are
    additive, so the streamed cells equal the batch cms_build over the
    same data (asserted in tests), and any consumer can run point
    lookups / heavy-hitter thresholds / join-size inner products
    against the live cells with operators/sketch.py unchanged.
    """
    from degdb_spark.operators.sketch import _cell

    kcol = F.col(key)
    cells = events.filter(kcol.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), _cell(kcol, r, width).alias("bucket"))
                    for r in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def psi_bin_stream(
    events: DataFrame,
    reference_bounds,
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Streaming half of the PSI drift monitor: bin the live stream
    against STATIC reference decile bounds (a broadcast 1-row frame
    from operators/drift.psi_bins' boundary aggregate) and maintain
    per-bin counts — state is n_bins rows, bounded by construction.
    A consumer joins these counts with the reference shares to get a
    live PSI; counts are additive, so the streamed bins equal the
    batch binning over the same data (asserted in tests).
    """
    j = events.select(value_col).crossJoin(F.broadcast(reference_bounds))
    b = sum(
        (F.col(value_col) > F.col(f"_b{i}")).cast("int") for i in range(n_bins - 1)
    )
    return j.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_cur")
    )
