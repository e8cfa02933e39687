"""In-plan boosted-stump training (integer-exact AdaBoost variant).

The sixth trained-in-plan model family member (Lloyd IVF, BPE merges,
depth-2 tree, multinomial NB, averaged perceptron — see
operators/{ml_lsh,text,tree,nb,linear}.py): ``rounds`` boosting
iterations of the depth-1 split search — the boosted-stumps shape real
pretraining-data quality gates use — learned entirely inside the
query, with every data-dependent choice exact in integers so a DuckDB
oracle replays the full training loop:

- candidate splits are the tree trainer's FIXED literal grid per
  feature, crossed with both stump polarities (predict 1 on the <=
  side, or on the > side), so each round's weak learner is the
  weighted-error argmin over (feature, threshold, polarity), ties by
  (err ASC, feature ASC, threshold ASC, polarity ASC);
- sample weights are INTEGER powers of two: a row's weight in round r
  is 2^(number of earlier stumps that misclassified it) — the
  weight-doubling boosting scheme. Weights are never materialized:
  round r computes them as shiftleft(1, sum of indicator exprs of the
  r-1 chosen stumps), pure codegen, one corpus scan per round;
- the stump's vote weight is the AdaBoost alpha = ln((W-err)/err)
  quantized to integer micronats (floor(ln·10⁶ + 0.5), the
  operators/nb.py discipline) with err floored at 1, so the final
  weighted-majority vote is an exact integer comparison.

Output: one row per round (feature, threshold, polarity, weighted
error, total weight, alpha in micronats) + a round-0 ensemble row
(unweighted misclassification count of the alpha-weighted vote). The
report pins the argmin sequence, the reweighting, AND the vote.

Plan shape per round: the corpus crossed with the broadcast candidate
grid, aggregated map-side to |grid|·2 rows, a 1-row argmin collect —
the BPE/Lloyd/tree O(1)-driver-rows-per-round pattern. At 100 TB each
round is one scan of the feature frame; boosting state is 3 scalars
per round on the driver.

Reference provenance: degdb has no ML surface; this is the
training-pipeline extension (SURVEY.md §2.6), companion to
operators/tree.py whose histogram split search it iterates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: micronat quantization scale for the stump vote weights
LOG_SCALE = 1_000_000


class Stump:
    __slots__ = ("feature", "threshold", "polarity", "err_w", "total_w", "alpha")

    def __init__(self, feature, threshold, polarity, err_w, total_w, alpha):
        self.feature = feature
        self.threshold = int(threshold)
        self.polarity = int(polarity)
        self.err_w = int(err_w)
        self.total_w = int(total_w)
        self.alpha = int(alpha)

    def predicts_one(self) -> Column:
        fv = F.col(self.feature)
        return fv <= self.threshold if self.polarity == 1 else fv > self.threshold


def train_boosted_stumps(
    df: DataFrame,
    feature_grids: dict[str, list[int]],
    label_col: str = "label",
    rounds: int = 3,
) -> DataFrame:
    """Learn ``rounds`` boosted stumps over integer feature columns
    with a 0/1 label; see the module docstring for the exact
    semantics. Returns rounds+1 rows:
    (round, feature, threshold, polarity, err_w, total_w, alpha_micro)
    with round 0 the ensemble summary (feature/threshold/polarity/
    alpha NULL, err_w = unweighted misvote count, total_w = n rows)."""
    spark = df.sparkSession
    cand_rows = [
        (feat, int(t)) for feat in sorted(feature_grids) for t in feature_grids[feat]
    ]
    if not cand_rows:
        # checked BEFORE any plan is built: an empty grid would
        # otherwise die inside F.array()/_cand.feature with an opaque
        # AnalysisException (ADVICE r11)
        raise ValueError("train_boosted_stumps needs a non-empty grid")
    cands = F.array(
        *[
            F.struct(F.lit(feat).alias("feature"), F.lit(t).alias("threshold"))
            for feat, t in cand_rows
        ]
    )
    base = df.select(
        *[F.col(f).cast("long").alias(f) for f in sorted(feature_grids)],
        F.col(label_col).cast("int").alias("label"),
    )

    stumps: list[Stump] = []
    for _ in range(rounds):
        # integer weight, in-plan: 2^(#previous stumps that
        # misclassified) — as a product of (1 + indicator) factors,
        # each in {1, 2}, so it stays integer codegen
        w = F.lit(1).cast("long")
        for s in stumps:
            m = (s.predicts_one().cast("int") != F.col("label")).cast("long")
            w = w * (F.lit(1) + m)
        exploded = base.withColumn("_w", w).select(
            F.explode(cands).alias("_cand"), "*"
        )
        fval = None
        for feat in sorted(feature_grids):
            cond = F.col("_cand.feature") == feat
            fval = (
                F.when(cond, F.col(feat))
                if fval is None
                else fval.when(cond, F.col(feat))
            )
        is_left = fval <= F.col("_cand.threshold")
        lbl1 = F.col("label") == 1
        agg = exploded.groupBy("_cand.feature", "_cand.threshold").agg(
            F.sum(F.when(is_left & lbl1, F.col("_w")).otherwise(0)).alias("l_pos"),
            F.sum(F.when(is_left & ~lbl1, F.col("_w")).otherwise(0)).alias("l_neg"),
            F.sum(F.when(~is_left & lbl1, F.col("_w")).otherwise(0)).alias("r_pos"),
            F.sum(F.when(~is_left & ~lbl1, F.col("_w")).otherwise(0)).alias("r_neg"),
        )
        # both polarities as rows, then the deterministic argmin
        both = agg.select(
            "feature",
            "threshold",
            (F.col("l_pos") + F.col("l_neg") + F.col("r_pos") + F.col("r_neg")).alias(
                "total_w"
            ),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("polarity"),
                        (F.col("l_neg") + F.col("r_pos")).alias("err_w"),
                    ),
                    F.struct(
                        F.lit(-1).alias("polarity"),
                        (F.col("l_pos") + F.col("r_neg")).alias("err_w"),
                    ),
                )
            ).alias("p"),
        ).select("feature", "threshold", "total_w", "p.polarity", "p.err_w")
        best = (
            both.select(
                "feature",
                "threshold",
                "polarity",
                "err_w",
                "total_w",
                F.when(F.col("total_w") == 0, F.lit(0))
                .otherwise(
                    F.floor(
                        F.log(
                            (F.col("total_w") - F.col("err_w")).cast("double")
                            / F.greatest(F.col("err_w"), F.lit(1))
                        )
                        * LOG_SCALE
                        + F.lit(0.5)
                    )
                )
                .cast("long")
                .alias("alpha_micro"),
            )
            .orderBy("err_w", "feature", "threshold", "polarity")
            .limit(1)
            .collect()
        )
        if not best:
            # an EMPTY corpus aggregates to no rows: fall back to the
            # deterministic first candidate with all-zero stats and
            # alpha 0 at polarity -1 — exactly what the oracle's
            # zero-count LEFT JOIN argmin picks (polarity ASC)
            stumps.append(Stump(cand_rows[0][0], cand_rows[0][1], -1, 0, 0, 0))
            continue
        r = best[0]
        stumps.append(
            Stump(
                r["feature"], r["threshold"], r["polarity"],
                r["err_w"], r["total_w"], r["alpha_micro"],
            )
        )

    # alpha-weighted majority vote, exact in integer micronats
    score = None
    for s in stumps:
        term = F.when(s.predicts_one(), F.lit(s.alpha)).otherwise(F.lit(-s.alpha))
        score = term if score is None else score + term
    pred = (score > 0).cast("int")
    ens = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((pred != F.col("label")).cast("int")).alias("mis"),
    ).collect()[0]

    out = [
        (
            i + 1, s.feature, s.threshold, s.polarity,
            s.err_w, s.total_w, s.alpha,
        )
        for i, s in enumerate(stumps)
    ]
    out.append((0, None, None, None, int(ens["mis"] or 0), int(ens["n"]), None))
    return spark.createDataFrame(
        out,
        "round int, feature string, threshold long, polarity int,"
        " err_w long, total_w long, alpha_micro long",
    )
