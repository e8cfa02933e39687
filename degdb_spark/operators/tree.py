"""In-plan decision-tree training (exact integer split search).

The third trained-in-plan model family member (after the seeded-Lloyd
IVF in operators/ml_lsh.py and the BPE tokenizer in operators/text.py):
a depth-2 binary classification tree is learned INSIDE the query — the
standard quality-classifier shape of pretraining-data pipelines
(fastText/CART-style "is this document good" filters), expressed as
histogram-based split search like distributed GBDT implementations.

Everything is integer arithmetic, so the result is deterministic and a
DuckDB oracle replays the full data-dependent training loop:

- candidate splits are a FIXED literal grid per feature (the histogram
  device — at 100 TB you never sort features, you aggregate counts per
  (candidate, side));
- the split objective avoids float Gini entirely: maximize
  ``sc(L) + sc(R)`` with ``sc(pos, neg) = (pos² + neg²)·10⁶ div
  (pos + neg)`` (0 for an empty side) — the floor-scaled sum-of-squares
  form of impurity reduction (monotone in the usual Gini for a fixed
  node), computed in DECIMAL(38,0)/HUGEINT so both engines are exact;
- ties break by (score DESC, feature ASC, threshold ASC).

Plan shape per node: ONE pass over the node's rows crossed with the
broadcast candidate grid (|rows|·|candidates| intermediate, aggregated
to |candidates| rows), then a single-row argmax collect — the same
O(1)-driver-rows-per-round pattern as Lloyd centroids and BPE merges.
Depth 2 = 3 such rounds; node filters stack as plain predicates so
Catalyst keeps everything in one scan per round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000  # floor-scaled objective denominator (10^6)


def _score_expr() -> Column:
    """Split score over aggregated (l_pos, l_neg, r_pos, r_neg)."""

    def sc(p: str, n: str) -> str:
        return (
            f"CASE WHEN {p} + {n} = 0 THEN CAST(0 AS DECIMAL(38,0)) "
            f"ELSE (CAST({p} AS DECIMAL(38,0)) * {p} + CAST({n} AS DECIMAL(38,0)) * {n}) "
            f"* {_SCALE} div ({p} + {n}) END"
        )

    return F.expr(sc("l_pos", "l_neg") + " + " + sc("r_pos", "r_neg")).alias("score")


def train_depth2_tree(
    df: DataFrame,
    feature_grids: dict[str, list[int]],
    label_col: str = "label",
) -> DataFrame:
    """Learn a depth-2 tree over integer feature columns with a 0/1
    label. Splits are ``feature <= threshold``; left = true branch.
    Returns 7 rows — 3 split nodes ('root', 'L', 'R': feature,
    threshold, node counts) and 4 leaves ('LL', 'LR', 'RL', 'RR':
    majority prediction, pred = 1 iff 2·n_pos > n). Empty nodes emit
    n = 0 with the deterministic tie-break split (all-zero scores pick
    the first candidate)."""
    spark = df.sparkSession
    cand_rows = [
        (feat, int(t)) for feat in sorted(feature_grids) for t in feature_grids[feat]
    ]
    cands = F.array(
        *[
            F.struct(F.lit(feat).alias("feature"), F.lit(t).alias("threshold"))
            for feat, t in cand_rows
        ]
    )

    def best_split(node_df: DataFrame) -> tuple[str, int]:
        exploded = node_df.select(
            *[F.col(f).alias(f) for f in feature_grids],
            F.col(label_col).alias("label"),
        ).select(F.explode(cands).alias("c"), "*")
        # feature value of the candidate's feature, per row
        fval = None
        for feat in sorted(feature_grids):
            cond = F.col("c.feature") == feat
            fval = F.when(cond, F.col(feat)) if fval is None else fval.when(cond, F.col(feat))
        is_left = fval <= F.col("c.threshold")
        agg = (
            exploded.groupBy("c.feature", "c.threshold")
            .agg(
                F.sum(F.when(is_left & (F.col("label") == 1), 1).otherwise(0)).alias("l_pos"),
                F.sum(F.when(is_left & (F.col("label") == 0), 1).otherwise(0)).alias("l_neg"),
                F.sum(F.when(~is_left & (F.col("label") == 1), 1).otherwise(0)).alias("r_pos"),
                F.sum(F.when(~is_left & (F.col("label") == 0), 1).otherwise(0)).alias("r_neg"),
            )
            .select("feature", "threshold", _score_expr())
            .orderBy(F.col("score").desc(), "feature", "threshold")
            .limit(1)
        )
        row = agg.collect()
        # an empty node has NO aggregated rows: fall back to the
        # deterministic first candidate (matches the oracle's COALESCE)
        if not row:
            return cand_rows[0]
        return row[0]["feature"], int(row[0]["threshold"])

    base = df.select(
        *[F.col(f).cast("long").alias(f) for f in feature_grids],
        F.col(label_col).cast("int").alias(label_col),
    )
    f0, t0 = best_split(base)
    left0 = F.col(f0) <= t0
    f1, t1 = best_split(base.filter(left0))
    f2, t2 = best_split(base.filter(~left0))

    leaves = [
        ("LL", left0 & (F.col(f1) <= t1)),
        ("LR", left0 & ~(F.col(f1) <= t1)),
        ("RL", ~left0 & (F.col(f2) <= t2)),
        ("RR", ~left0 & ~(F.col(f2) <= t2)),
    ]
    stats = base.agg(
        F.count(F.lit(1)).alias("n_root"),
        F.sum(label_col).alias("p_root"),
        F.sum(F.when(left0, 1).otherwise(0)).alias("n_l"),
        F.sum(F.when(left0 & (F.col(label_col) == 1), 1).otherwise(0)).alias("p_l"),
        *[
            a
            for name, cond in leaves
            for a in (
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{name}"),
                F.sum(F.when(cond & (F.col(label_col) == 1), 1).otherwise(0)).alias(
                    f"p_{name}"
                ),
            )
        ],
    ).collect()[0]

    def pred(n: int, p: int) -> int:
        return 1 if 2 * p > n else 0

    # SUM over an empty frame is NULL — every sum-derived stat needs
    # the `or 0` (COUNT alone is 0 on empty)
    n_root, p_root = int(stats["n_root"]), int(stats["p_root"] or 0)
    n_l, p_l = int(stats["n_l"] or 0), int(stats["p_l"] or 0)
    out = [
        ("root", f0, t0, n_root, p_root, None),
        ("L", f1, t1, n_l, p_l, None),
        ("R", f2, t2, n_root - n_l, p_root - p_l, None),
    ]
    for name, _cond in leaves:
        n, p = int(stats[f"n_{name}"] or 0), int(stats[f"p_{name}"] or 0)
        out.append((name, None, None, n, p, pred(n, p)))
    return spark.createDataFrame(
        out,
        "node string, feature string, threshold long, n long, n_pos long, pred int",
    )
