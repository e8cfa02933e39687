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
    feats = sorted(feature_grids)
    cand_rows = [(feat, int(t)) for feat in feats for t in feature_grids[feat]]
    # Every data-independent expression rides as ONE SQL string (the
    # operators/{dedup,boost}.py device, VERDICT r13 #1): the old
    # Column-built form paid thousands of py4j round trips per
    # training call — the candidate-struct array alone was ~150, and
    # it was rebuilt for EACH of the three split searches. Same
    # Catalyst expressions, same integer math; the oracle hash gates
    # the rewrite.
    cand_sql = (
        "explode(array("
        + ", ".join(
            f"named_struct('feature', '{feat}', 'threshold', {t})"
            for feat, t in cand_rows
        )
        + ")) AS c"
    )
    fval_sql = (
        "CASE "
        + " ".join(f"WHEN c.feature = '{feat}' THEN {feat}" for feat in feats)
        + " END"
    )
    is_left = f"(({fval_sql}) <= c.threshold)"
    sum_sqls = [
        f"sum(CASE WHEN ({is_left} AND (label = 1)) THEN 1 ELSE 0 END) AS l_pos",
        f"sum(CASE WHEN ({is_left} AND (label = 0)) THEN 1 ELSE 0 END) AS l_neg",
        f"sum(CASE WHEN ((NOT {is_left}) AND (label = 1)) THEN 1 ELSE 0 END) AS r_pos",
        f"sum(CASE WHEN ((NOT {is_left}) AND (label = 0)) THEN 1 ELSE 0 END) AS r_neg",
    ]

    def best_split(node_df: DataFrame) -> tuple[str, int]:
        agg = (
            node_df.selectExpr(*feats, f"{label_col} AS label")
            .selectExpr(cand_sql, "*")
            .groupBy("c.feature", "c.threshold")
            .agg(*[F.expr(s) for s in sum_sqls])
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

    base = df.selectExpr(
        *[f"CAST({f} AS BIGINT) AS {f}" for f in feats],
        f"CAST({label_col} AS INT) AS {label_col}",
    )
    # all three split searches and the stats pass re-scan this
    # projection; pinned so only the root search featurizes the
    # corpus — lazy, the root collect materializes it
    from degdb_spark.persistence import pin

    base = pin(base)
    f0, t0 = best_split(base)
    left0_sql = f"({f0} <= {t0})"
    # The two child split searches are data-INDEPENDENT jobs (guide
    # §2.6: actions are only sequential because the driver calls them
    # sequentially) — overlap them so the right child's tasks
    # back-fill the executors the left child's tail frees. Results
    # are unaffected: each collect is a deterministic argmax.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut1 = pool.submit(best_split, base.filter(F.expr(left0_sql)))
        fut2 = pool.submit(best_split, base.filter(F.expr(f"NOT {left0_sql}")))
        f1, t1 = fut1.result()
        f2, t2 = fut2.result()

    leaves = [
        ("LL", f"({left0_sql} AND ({f1} <= {t1}))"),
        ("LR", f"({left0_sql} AND (NOT ({f1} <= {t1})))"),
        ("RL", f"((NOT {left0_sql}) AND ({f2} <= {t2}))"),
        ("RR", f"((NOT {left0_sql}) AND (NOT ({f2} <= {t2})))"),
    ]
    stats = base.agg(
        F.expr("count(1) AS n_root"),
        F.expr(f"sum({label_col}) AS p_root"),
        F.expr(f"sum(CASE WHEN {left0_sql} THEN 1 ELSE 0 END) AS n_l"),
        F.expr(
            f"sum(CASE WHEN ({left0_sql} AND ({label_col} = 1))"
            " THEN 1 ELSE 0 END) AS p_l"
        ),
        *[
            F.expr(s)
            for name, cond in leaves
            for s in (
                f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS n_{name}",
                f"sum(CASE WHEN ({cond} AND ({label_col} = 1))"
                f" THEN 1 ELSE 0 END) AS p_{name}",
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
