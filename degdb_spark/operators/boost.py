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

from pyspark.sql import DataFrame
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

    def predicts_one_sql(self) -> str:
        op = "<=" if self.polarity == 1 else ">"
        return f"({self.feature} {op} {self.threshold})"


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
    feats = sorted(feature_grids)
    cand_rows = [(feat, int(t)) for feat in feats for t in feature_grids[feat]]
    if not cand_rows:
        # checked BEFORE any plan is built: an empty grid would
        # otherwise die inside the explode/_cand.feature expression
        # with an opaque AnalysisException (ADVICE r11)
        raise ValueError("train_boosted_stumps needs a non-empty grid")
    # Every data-independent expression rides as ONE SQL string (the
    # operators/dedup.py simhash device, VERDICT r13 #1): the old
    # Column-built form paid ~6k py4j round trips per training call —
    # the 48-struct candidate array alone was ~150 — and construction
    # dominated the entry. Same Catalyst expressions, same integer
    # math; the oracle hash gates the rewrite.
    cand_sql = (
        "explode(array("
        + ", ".join(
            f"named_struct('feature', '{feat}', 'threshold', {t})"
            for feat, t in cand_rows
        )
        + ")) AS _cand"
    )
    # the candidate's feature value per row, then the left-side test —
    # chained WHENs with no ELSE, exactly the old Column chain
    fval_sql = (
        "CASE "
        + " ".join(f"WHEN _cand.feature = '{feat}' THEN {feat}" for feat in feats)
        + " END"
    )
    is_left = f"(({fval_sql}) <= _cand.threshold)"
    lbl1 = "(label = 1)"
    sum_sqls = [
        f"sum(CASE WHEN ({is_left} AND {lbl1}) THEN _w ELSE 0 END) AS l_pos",
        f"sum(CASE WHEN ({is_left} AND (NOT {lbl1})) THEN _w ELSE 0 END) AS l_neg",
        f"sum(CASE WHEN ((NOT {is_left}) AND {lbl1}) THEN _w ELSE 0 END) AS r_pos",
        f"sum(CASE WHEN ((NOT {is_left}) AND (NOT {lbl1})) THEN _w ELSE 0 END) AS r_neg",
    ]
    base = df.selectExpr(
        *[f"CAST({f} AS BIGINT) AS {f}" for f in feats],
        f"CAST({label_col} AS INT) AS label",
    )
    # every round (and the ensemble vote) re-scans this projection;
    # pinned so rounds 2+ read the materialized feature frame instead
    # of re-featurizing the corpus — lazy, round 1 materializes it
    from degdb_spark.persistence import pin

    base = pin(base)

    stumps: list[Stump] = []
    for _ in range(rounds):
        # integer weight, in-plan: 2^(#previous stumps that
        # misclassified) — as a product of (1 + indicator) factors,
        # each in {1, 2}, so it stays integer codegen
        w_sql = "CAST(1 AS BIGINT)" + "".join(
            " * (1 + CAST((CAST("
            + s.predicts_one_sql()
            + " AS INT) != label) AS BIGINT))"
            for s in stumps
        )
        exploded = base.withColumn("_w", F.expr(w_sql)).selectExpr(cand_sql, "*")
        agg = exploded.groupBy("_cand.feature", "_cand.threshold").agg(
            *[F.expr(s) for s in sum_sqls]
        )
        # both polarities as rows, then the deterministic argmin
        both = agg.selectExpr(
            "feature",
            "threshold",
            "(l_pos + l_neg + r_pos + r_neg) AS total_w",
            "explode(array("
            "named_struct('polarity', 1, 'err_w', l_neg + r_pos), "
            "named_struct('polarity', -1, 'err_w', l_pos + r_neg))) AS p",
        ).selectExpr("feature", "threshold", "total_w", "p.polarity", "p.err_w")
        best = (
            both.selectExpr(
                "feature",
                "threshold",
                "polarity",
                "err_w",
                "total_w",
                "CAST(CASE WHEN total_w = 0 THEN 0 ELSE "
                f"FLOOR(LN(CAST(total_w - err_w AS DOUBLE) / GREATEST(err_w, 1))"
                f" * {LOG_SCALE} + 0.5D) END AS BIGINT) AS alpha_micro",
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
    score_sql = " + ".join(
        f"(CASE WHEN {s.predicts_one_sql()} THEN {s.alpha} ELSE {-s.alpha} END)"
        for s in stumps
    )
    ens = base.agg(
        F.expr("count(1) AS n"),
        F.expr(
            f"sum(CAST((CAST(({score_sql}) > 0 AS INT) != label) AS INT)) AS mis"
        ),
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
