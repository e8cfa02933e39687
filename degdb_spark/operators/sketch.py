"""Count-Min sketch over DataFrames — the 'novel sketch' operator.

A CMS estimates per-key frequencies in sublinear space: depth d hash
rows × width w counters; estimate = min over rows of the bucketed
counts. Built entirely with groupBy aggregations:

    build:    explode each key to its d (row, bucket) cells, groupBy
              cell, sum — ONE shuffle of d·n rows into d·w cells.
    query:    compute the d cells for each probe key, min over the d
              looked-up counters — a broadcast join against the (tiny)
              sketch table.

The bucket hash is the engine-portable md5 bucket (operators/
sampling.py), so the whole sketch — build and estimate — replays in
DuckDB for the correctness oracle. At 100 TB the sketch table is
d·w rows regardless of input size; merging shards/sketches is a plain
groupBy-sum over the cell table (CMS is a linear sketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from degdb_spark.persistence import pin


def _cell(key: Column, row: int, width: int) -> Column:
    """Portable bucket for hash-row ``row``: md5 of (row:key)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(row)), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    ).cast("int")


def cms_build(
    df: DataFrame, key: Column | str, depth: int = 4, width: int = 64
) -> DataFrame:
    """The sketch table: (row, bucket, cnt) with depth·width cells."""
    k = F.col(key) if isinstance(key, str) else key
    # NULL keys diverge between engines (concat_ws skips NULLs, DuckDB's
    # '||' nulls the whole cell) — drop them identically on both sides
    # (cms_sql filters WHERE key IS NOT NULL).
    cells = df.filter(k.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cell(k, r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key: Column | str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-frequency estimates for the probe keys: min over the depth
    looked-up counters (overestimates only, never under)."""
    k = F.col(key) if isinstance(key, str) else key
    cells = probes.filter(k.isNotNull()).select(
        k.alias("probe_key"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), _cell(k, r, width).alias("bucket"))
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select("probe_key", "c.row", "c.bucket")
    looked = cells.join(F.broadcast(sketch), on=["row", "bucket"], how="left").na.fill(
        0, ["cnt"]
    )
    return looked.groupBy("probe_key").agg(F.min("cnt").alias("est_count"))


def cms_sql(source_expr: str, probe_expr: str, depth: int = 4, width: int = 64) -> str:
    """DuckDB replay of build+estimate for the oracle (same md5 cells).

    source_expr / probe_expr: SQL producing (key) rows, e.g.
    "SELECT event_type AS key FROM events".
    """

    def cell(row: int) -> str:
        return (
            f"CAST(CAST(('0x' || substr(md5('{row}:' || CAST(key AS VARCHAR(64))), 1, 8)) AS BIGINT) "
            f"% {width} AS INT)"
        )

    cells_src = " UNION ALL ".join(
        f"SELECT {r} AS row, {cell(r)} AS bucket FROM src" for r in range(depth)
    )
    cells_probe = " UNION ALL ".join(
        f"SELECT key AS probe_key, {r} AS row, {cell(r)} AS bucket FROM probes"
        for r in range(depth)
    )
    return f"""
WITH src AS MATERIALIZED (SELECT key FROM ({source_expr}) WHERE key IS NOT NULL),
probes AS MATERIALIZED (SELECT key FROM ({probe_expr}) WHERE key IS NOT NULL),
sketch AS MATERIALIZED (
  SELECT row, bucket, COUNT(*) AS cnt FROM ({cells_src}) GROUP BY row, bucket
),
pcells AS ({cells_probe}),
looked AS (
  SELECT probe_key, COALESCE(cnt, 0) AS cnt
  FROM pcells LEFT JOIN sketch USING (row, bucket)
)
SELECT probe_key, MIN(cnt) AS est_count FROM looked GROUP BY probe_key
"""


def _unit_hash(key: Column) -> Column:
    """Portable hash of key to a uniform double in [0, 1): md5 first 12
    hex chars / 16^12 (48 bits of mantissa — exact in a double)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast("double")
        / float(1 << 48)
    )


def kmv_distinct_estimate(
    df: DataFrame, key: Column | str, k: int = 256
) -> DataFrame:
    """K-Minimum-Values distinct-count estimate: keep the k smallest
    unit-hashes of the key; estimate = (k-1)/h_(k) (unbiased for the
    uniform order statistic). One groupBy-free pass: distinct hash,
    global sort, limit k — at scale the sort is a top-k (takeOrdered
    shape), not a full sort.

    Returns one row: (est_distinct double, k_used int). Exactly
    replayable in DuckDB (same md5-derived hashes), so the estimate —
    not just its error bound — is oracle-checkable.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    # NULL keys hash to NULL, and the engines disagree on NULL sort
    # placement (Spark NULLS FIRST asc, DuckDB NULLS LAST) — drop them
    # identically on both sides (kmv_sql filters WHERE key IS NOT NULL).
    hashes = df.filter(kcol.isNotNull()).select(_unit_hash(kcol).alias("h")).distinct()
    topk = hashes.orderBy("h").limit(k)
    return topk.agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )  # fewer distinct than k → exact count
        .otherwise((F.lit(float(k - 1))) / F.max("h"))
        .alias("est_distinct"),
        F.count(F.lit(1)).cast("int").alias("k_used"),
    )


def kmv_sql(source_expr: str, k: int = 256) -> str:
    """DuckDB replay of the KMV estimate over ``source_expr`` → (key)."""
    return f"""
WITH src AS MATERIALIZED (SELECT key FROM ({source_expr}) WHERE key IS NOT NULL),
hashes AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(key AS VARCHAR(64))), 1, 12)) AS BIGINT)::DOUBLE
      / {float(1 << 48)} AS h
  FROM src
),
topk AS (SELECT h FROM hashes ORDER BY h LIMIT {k})
SELECT CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE
            ELSE {float(k - 1)} / MAX(h) END AS est_distinct,
       CAST(COUNT(*) AS INT) AS k_used
FROM topk
"""


# ---------------------------------------------------------------- quantiles
def histogram_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_bins: int = 1000,
) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram sketch — the
    scalable alternative to exact percentiles (which need a global
    sort): two scans (bounds, then bin counts), a bin table of
    ``n_bins`` rows regardless of data size, and linear interpolation
    inside the target bin. Bin counts are integers and the bin table is
    trivially MERGEABLE across partitions/streams (sum by bin) — the
    same contract approx_percentile's GK sketch offers, but
    engine-portable so a DuckDB oracle replays it bit-for-bit.

    Error bound: ±(hi−lo)/n_bins on the value axis. Returns one row per
    requested q: (q, est) with est floor-rounded to 4 dp.
    """
    from degdb_spark.queries.rounding import dround

    bounds = df.agg(
        F.min(col).cast("double").alias("lo"), F.max(col).cast("double").alias("hi")
    )
    # degenerate-group guard (mirrored in every caller's oracle SQL):
    # a group whose values are all equal has hi == lo, so the raw
    # width is 0 and the bin expression would be 0/0 = NaN; width 1.0
    # sends every row to bin 0 and the estimate collapses to lo
    # (the est term multiplies by the UNguarded (hi-lo)/n = 0).
    width = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    )
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.least(
                F.greatest(
                    F.floor((F.col(col).cast("double") - F.col("lo")) / width),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).cast("long"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"), F.max("lo").alias("lo"), F.max("hi").alias("hi"))
    )
    # <= n_bins rows; checkpointed because total and EVERY per-q pick
    # read it - left lazy, each consumer replans the histogram build
    # and its corpus scans (measured 12 FileScans for a 5-quantile
    # report; 2 after)
    binned = binned.transform(pin)
    w = Window.orderBy("bin")
    cum = binned.withColumn("cum", F.sum("c").over(w)).withColumn(
        "prev_cum", F.coalesce(F.lag("cum").over(w), F.lit(0))
    )
    total = binned.agg(F.sum("c").alias("n"))
    out = None
    for q in qs:
        rank = F.col("n") * F.lit(float(q))
        hit = (
            cum.crossJoin(F.broadcast(total))
            .filter((F.col("cum") >= rank) & (F.col("prev_cum") < rank))
            .orderBy("bin")
            .limit(1)
        )
        wdt = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
        frac = (rank - F.col("prev_cum")) / F.col("c")
        est = F.col("lo") + (F.col("bin").cast("double") + frac) * wdt
        row = hit.select(
            F.lit(float(q)).alias("q"), dround(est, 4).alias("est")
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("q")


def histogram_quantiles_by(
    df: DataFrame,
    col: str,
    group_col: str,
    qs: list[float],
    n_bins: int = 200,
) -> DataFrame:
    """histogram_quantiles per group — the mergeability of the bin
    sketch is what makes the group-wise form cheap: the bin table is
    groups × n_bins rows, the cum/lag windows are PARTITIONED by the
    group (each group's bins sort in their own task), and the bounds
    join broadcasts one row per group. Returns (group_col, q, est)."""
    from degdb_spark.queries.rounding import dround

    bounds = df.groupBy(group_col).agg(
        F.min(col).cast("double").alias("lo"),
        F.max(col).cast("double").alias("hi"),
    )
    # degenerate-group guard (mirrored in every caller's oracle SQL):
    # a group whose values are all equal has hi == lo, so the raw
    # width is 0 and the bin expression would be 0/0 = NaN; width 1.0
    # sends every row to bin 0 and the estimate collapses to lo
    # (the est term multiplies by the UNguarded (hi-lo)/n = 0).
    width = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    )
    binned = (
        df.join(F.broadcast(bounds), on=group_col)
        .withColumn(
            "bin",
            F.least(
                F.greatest(
                    F.floor((F.col(col).cast("double") - F.col("lo")) / width),
                    F.lit(0),
                ),
                F.lit(n_bins - 1),
            ).cast("long"),
        )
        .groupBy(group_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )
    # groups x n_bins rows (bounded); same replanned-consumer fix as
    # histogram_quantiles
    binned = binned.transform(pin)
    w = Window.partitionBy(group_col).orderBy("bin")
    cum = binned.withColumn("cum", F.sum("c").over(w)).withColumn(
        "prev_cum", F.coalesce(F.lag("cum").over(w), F.lit(0))
    )
    total = binned.groupBy(group_col).agg(F.sum("c").alias("n"))
    out = None
    for q in qs:
        rank = F.col("n") * F.lit(float(q))
        pick = Window.partitionBy(group_col).orderBy("bin")
        hit = (
            cum.join(F.broadcast(total), on=group_col)
            .filter((F.col("cum") >= rank) & (F.col("prev_cum") < rank))
            .withColumn("rk", F.row_number().over(pick))
            .filter(F.col("rk") == 1)
        )
        wdt = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
        frac = (rank - F.col("prev_cum")) / F.col("c")
        est = F.col("lo") + (F.col("bin").cast("double") + frac) * wdt
        row = hit.select(
            F.col(group_col),
            F.lit(float(q)).alias("q"),
            dround(est, 4).alias("est"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy(group_col, "q")


# ---------------------------------------------------------------- hyperloglog
#: Hash width in bits (15 md5 hex chars — fits a signed BIGINT exactly).
_HLL_BITS = 60


def _hash60(key: Column) -> Column:
    """Portable 60-bit hash: md5 first 15 hex chars as a non-negative
    BIGINT — identical in DuckDB via CAST('0x'||substr(md5(..),1,15))."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, key: Column | str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """HyperLogLog register table: one row per (group, register index)
    with the max rank rho. This IS the sketch, in relational form — a
    fixed 2^p rows per group no matter the data size, MERGEABLE by
    elementwise MAX (register union == sketch of the set union), so it
    composes across partitions, days, or streams without rescanning.

    rho = (#trailing zeros of the remaining 60-p hash bits) + 1,
    computed with pure bit ops — bit_count(w XOR (w-1)) — because
    both engines' float log2 would be boundary-unstable.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    m = 1 << p
    rmax = _HLL_BITS - p + 1  # rho for w == 0
    h = _hash60(kcol)
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(rmax)).otherwise(
        F.bit_count(w.bitwiseXOR(w - F.lit(1)))
    )
    return (
        df.filter(kcol.isNotNull())
        .select(*group_cols, h.bitwiseAND(F.lit(m - 1)).alias("reg_idx"), rho.alias("rho"))
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Distinct-count estimate from a register table (standard HLL with
    the small-range linear-counting correction).

    Determinism: Z accumulates as an INTEGER sum of 2^(rmax-reg)
    (every term exact, order-free), divided once by 2^rmax; empty
    registers contribute 2^rmax each via (m - count). The only
    transcendental — ln(m/V) on the linear-counting branch — is
    FLOOR-rounded at 6 dp; the result at 2 dp.
    """
    from degdb_spark.queries.rounding import dround

    m = 1 << p
    rmax = _HLL_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        # shiftleft's bit-count arg must be a literal in the DSL — use
        # the SQL form for the per-row (rmax - reg) shift
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rmax} - reg)")).alias("_s"),
        F.count(F.lit(1)).alias("_nreg"),
    )
    z = (F.col("_s") + (F.lit(m) - F.col("_nreg")) * F.lit(1 << rmax).cast("long")) / F.lit(
        float(1 << rmax)
    )
    raw = F.lit(alpha * m * m) / z
    v = F.lit(m) - F.col("_nreg")  # zero registers
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * dround(F.log(F.lit(float(m)) / v), 6),
    ).otherwise(raw)
    return agg.select(*group_cols, dround(est, 2).alias("est_distinct"))


def hll_sql(source_expr: str, group_expr: str, p: int = 8) -> str:
    """DuckDB replay of hll_registers + hll_estimate over
    ``source_expr`` → (grp, key); returns (grp, est_distinct)."""
    m = 1 << p
    rmax = _HLL_BITS - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
WITH src AS (
  SELECT {group_expr} AS grp,
         CAST(('0x' || substr(md5(CAST(key AS VARCHAR(64))), 1, 15)) AS BIGINT) AS h
  FROM ({source_expr}) WHERE key IS NOT NULL
), regs AS (
  SELECT grp, h & {m - 1} AS reg_idx,
         MAX(CASE WHEN (h >> {p}) = 0 THEN {rmax}
                  ELSE bit_count(xor(h >> {p}, (h >> {p}) - 1)) END) AS reg
  FROM src GROUP BY grp, reg_idx
), agg AS (
  SELECT grp,
         SUM((CAST(1 AS BIGINT) << ({rmax} - reg))) AS s,
         COUNT(*) AS nreg
  FROM regs GROUP BY grp
), est AS (
  SELECT grp,
    (s + ({m} - nreg) * (CAST(1 AS BIGINT) << {rmax}))::DOUBLE / {float(1 << rmax)!r} AS z,
    {m} - nreg AS v
  FROM agg
)
SELECT grp,
  FLOOR((CASE WHEN ({alpha * m * m!r} / z) <= {2.5 * m!r} AND v > 0
              THEN {float(m)!r} * (FLOOR(ln({float(m)!r} / v) * 1000000 + 0.5) / 1000000)
              ELSE {alpha * m * m!r} / z END) * 100 + 0.5) / 100 AS est_distinct
FROM est
"""


def cms_join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    key_a: Column | str,
    key_b: Column | str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Equi-join cardinality estimation from CMS inner products: for
    each hash row, sum(cA[row,w] * cB[row,w]) over the width; the
    estimate is the MIN over rows (each row only over-counts). This is
    the optimizer-statistics primitive for planning joins you haven't
    run: |A join B on k| = sum_k fA(k)*fB(k), estimated from two
    depth*width sketches that never see each other's raw rows — sketch
    once per table, answer any join-size question later by multiplying
    sketches. Returns one row (est_join_size long).
    """
    sa = cms_build(a, key_a, depth, width)
    sb = cms_build(b, key_b, depth, width)
    prod = (
        sa.alias("a")
        .join(sb.alias("b"), on=["row", "bucket"], how="inner")
        .groupBy("row")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return prod.agg(F.min("ip").alias("est_join_size"))


def cms_join_size_sql(
    source_a: str, source_b: str, depth: int = 4, width: int = 64
) -> str:
    """DuckDB replay of cms_join_size_estimate."""

    def cell(row: int) -> str:
        return (
            f"CAST(CAST(('0x' || substr(md5('{row}:' || CAST(key AS VARCHAR(64))), 1, 8)) AS BIGINT) "
            f"% {width} AS INT)"
        )

    cells_a = " UNION ALL ".join(
        f"SELECT {r} AS row, {cell(r)} AS bucket FROM sa" for r in range(depth)
    )
    cells_b = " UNION ALL ".join(
        f"SELECT {r} AS row, {cell(r)} AS bucket FROM sb" for r in range(depth)
    )
    return f"""
WITH sa AS MATERIALIZED (SELECT key FROM ({source_a}) WHERE key IS NOT NULL),
sb AS MATERIALIZED (SELECT key FROM ({source_b}) WHERE key IS NOT NULL),
ska AS (SELECT row, bucket, COUNT(*) AS cnt FROM ({cells_a}) GROUP BY row, bucket),
skb AS (SELECT row, bucket, COUNT(*) AS cnt FROM ({cells_b}) GROUP BY row, bucket),
prod AS (
  SELECT ska.row, SUM(ska.cnt * skb.cnt) AS ip
  FROM ska JOIN skb ON ska.row = skb.row AND ska.bucket = skb.bucket
  GROUP BY ska.row
)
SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM prod
"""


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    key_a: Column | str,
    key_b: Column | str,
    k: int = 256,
) -> DataFrame:
    """Distinct-set algebra from KMV sketches (theta-sketch style):
    the k smallest hashes of A union B form the union sketch; the
    fraction of those present in BOTH input sketches estimates
    Jaccard, and |A intersect B| = J * |A union B|. Sketch each table
    once, answer union/intersection/overlap questions later without
    rescanning — the same md5 unit-hash domain as kmv_distinct_estimate,
    so every number here is deterministic and oracle-checkable.

    Returns one row (est_union double, est_intersection double).
    """
    ka = F.col(key_a) if isinstance(key_a, str) else key_a
    kb = F.col(key_b) if isinstance(key_b, str) else key_b
    ha = a.filter(ka.isNotNull()).select(_unit_hash(ka).alias("h")).distinct()
    hb = b.filter(kb.isNotNull()).select(_unit_hash(kb).alias("h")).distinct()
    union_sketch = ha.unionByName(hb).distinct().orderBy("h").limit(k)
    in_both = union_sketch.join(ha, on="h", how="left_semi").join(
        hb, on="h", how="left_semi"
    )
    u = union_sketch.agg(
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.max("h"))
        .alias("est_union"),
        F.count(F.lit(1)).alias("_ku"),
    )
    i = in_both.agg(F.count(F.lit(1)).alias("_shared"))
    return u.crossJoin(i).select(
        (F.floor(F.col("est_union") * 100 + F.lit(0.5)) / 100).alias("est_union"),
        (
            F.floor(
                (F.col("_shared") / F.col("_ku") * F.col("est_union")) * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("est_intersection"),
    )


def kmv_set_ops_sql(source_a: str, source_b: str, k: int = 256) -> str:
    """DuckDB replay of kmv_set_ops."""
    h = (
        "CAST(('0x' || substr(md5(CAST(key AS VARCHAR(64))), 1, 12)) AS BIGINT)::DOUBLE"
        f" / {float(1 << 48)}"
    )
    return f"""
WITH ha AS (SELECT DISTINCT {h} AS h FROM ({source_a}) WHERE key IS NOT NULL),
hb AS (SELECT DISTINCT {h} AS h FROM ({source_b}) WHERE key IS NOT NULL),
us AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) ORDER BY h LIMIT {k}),
u AS (
  SELECT CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE
              ELSE {float(k - 1)} / MAX(h) END AS est_union,
         COUNT(*) AS ku
  FROM us
), i AS (
  SELECT COUNT(*) AS shared FROM us
  WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)
)
SELECT FLOOR(u.est_union * 100 + 0.5) / 100 AS est_union,
       FLOOR((i.shared::DOUBLE / u.ku * u.est_union) * 100 + 0.5) / 100 AS est_intersection
FROM u CROSS JOIN i
"""
