"""Distribution-drift monitoring between two data snapshots.

The watchdog tier of a continuously-ingesting pipeline: yesterday's
corpus vs today's. Two classic detectors, both deterministic and
oracle-replayable:

- ``vocab_kl_drift``: per-token contribution to KL(current || reference)
  over add-1-smoothed token distributions — which words drove the
  shift. Vocabulary-sized aggregation; corpus scanned once per side.
- ``psi_bins``: Population Stability Index of a numeric column over
  the REFERENCE's decile bins (the industry-standard feature-drift
  score; >0.2 conventionally means investigate). Bin boundaries are a
  broadcast 1-row exact-percentile aggregate; each side then takes one
  assignment scan.

Determinism: logs FLOOR-round at 6 dp, shares are exact integer counts
over exact totals, zero-share bins clamp at 1e-6 on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from degdb_spark.queries.rounding import dround
from degdb_spark.persistence import pin


def vocab_kl_drift(
    reference: DataFrame,
    current: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Top-|contribution| tokens of KL(current || reference), add-1
    smoothed over the union vocabulary. Returns (token, p_ref, p_cur,
    kl_term) ordered by |kl_term| desc, token."""
    from degdb_spark.operators.text import tokens

    def counts(df, name):
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ref = counts(reference, "n_ref")
    cur = counts(current, "n_cur")
    vocab = ref.join(cur, on="token", how="full_outer").na.fill(
        0, ["n_ref", "n_cur"]
    )
    tot = vocab.agg(
        F.sum("n_ref").alias("_tr"),
        F.sum("n_cur").alias("_tc"),
        F.count(F.lit(1)).alias("_v"),
    )
    out = vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        dround((F.col("n_ref") + 1) / (F.col("_tr") + F.col("_v")), 6).alias("p_ref"),
        dround((F.col("n_cur") + 1) / (F.col("_tc") + F.col("_v")), 6).alias("p_cur"),
        dround(
            ((F.col("n_cur") + 1) / (F.col("_tc") + F.col("_v")))
            * dround(
                F.log(
                    ((F.col("n_cur") + 1) / (F.col("_tc") + F.col("_v")))
                    / ((F.col("n_ref") + 1) / (F.col("_tr") + F.col("_v")))
                ),
                6,
            ),
            6,
        ).alias("kl_term"),
    )
    return out.orderBy(F.abs(F.col("kl_term")).desc(), "token").limit(top_n)


def psi_bins(
    reference: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over the reference's quantile bins: per bin (bin, ref_share,
    cur_share, psi_term); sum of psi_term is the PSI. Boundaries come
    from exact interpolated percentiles of the REFERENCE (broadcast
    1-row), so both sides bin identically."""
    qs = [i / n_bins for i in range(1, n_bins)]
    # ONE array-argument percentile aggregate (a single sort-based pass)
    # instead of n_bins-1 separate ones
    arr = F.expr(f"percentile({col}, array({', '.join(str(q) for q in qs)}))")
    # The n_bins-1 boundaries are fetched once and baked as EXACT
    # double literals (the ml_lsh centroid-literal device: repr
    # round-trips the double bit-exactly). The old form pinned the
    # 1-row aggregate and crossJoin-broadcast it into both sides —
    # a checkpoint materialization plus two broadcast builds for
    # n_bins-1 scalars; the fetch is the same reference scan the
    # checkpoint paid anyway. Same comparisons, same bin ids.
    brow = reference.agg(
        *[
            dround(F.element_at(arr, i + 1), 2).alias(f"_b{i}")
            for i in range(len(qs))
        ]
    ).first()
    def _b(i: int) -> str:
        v = brow[f"_b{i}"]
        # empty/all-null reference: percentile is NULL and the old
        # broadcast form compared against NULL — mirror it
        return "CAST(NULL AS DOUBLE)" if v is None else f"CAST('{float(v)!r}' AS DOUBLE)"

    bin_sql = " + ".join(
        f"CAST(({col} > {_b(i)}) AS INT)" for i in range(len(qs))
    ) or "0"

    def binned(df, name):
        return (
            df.select(F.expr(bin_sql).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    r = binned(reference, "n_ref")
    c = binned(current, "n_cur")
    both = (
        r.join(c, on="bin", how="full_outer")
        .na.fill(0, ["n_ref", "n_cur"])
        # <= n_bins rows; read by the totals rollup AND the share
        # projection
        .transform(pin)
    )
    tot = both.agg(F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc"))
    rs = F.greatest(F.col("n_ref") / F.col("_tr"), F.lit(eps))
    cs = F.greatest(F.col("n_cur") / F.col("_tc"), F.lit(eps))
    return (
        both.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            dround(rs, 6).alias("ref_share"),
            dround(cs, 6).alias("cur_share"),
            dround((cs - rs) * dround(F.log(cs / rs), 6), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )
