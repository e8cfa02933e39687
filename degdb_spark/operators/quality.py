"""Data-contract validation — declarative row-level expectations plus
referential-integrity checks, evaluated in one pass, reported as a
violations table (the Great-Expectations/dbt-test primitive a pipeline
runs before promoting a new data drop).

Scale notes (100 TB): all row-level rules evaluate as one wide
aggregation over a single scan (each rule is a SUM(CASE …) — no rule
adds a pass). Referential checks are left-anti joins keyed on the FK —
one shuffle each, and broadcastable when the parent side is a
dimension. The report is rule-count-sized, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_contract(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    fk_checks: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate expectations; returns (rule, n_rows, n_violations).

    ``rules``: (name, condition) — the condition states what SHOULD
    hold per row; NULL conditions count as violations (unknown is not
    compliant, matching SQL CHECK semantics would instead pass them —
    we are stricter on purpose for pipeline gating).
    ``fk_checks``: (name, fk_col, parent_df, parent_col) — rows whose
    fk value has no parent row (NULL fk values are skipped: nullable
    FKs are a rules-level decision).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules:
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__v_{name}").cast("long").alias("n_violations"),
                    )
                    for name, _ in rules
                ]
            )
        ).alias("r")
    ).select("r.*")
    for name, fk_col, parent, parent_col in fk_checks or []:
        orphans = (
            df.select(fk_col)
            .filter(F.col(fk_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(fk_col)).distinct(),
                on=fk_col,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        n_rows = df.agg(F.count(F.lit(1)).alias("n_rows"))
        row = n_rows.crossJoin(orphans).select(
            F.lit(name).alias("rule"),
            F.col("n_rows").cast("long"),
            F.col("n_violations").cast("long"),
        )
        report = report.unionByName(row)
    return report.orderBy("rule")


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy audit for a release candidate: group rows by the
    quasi-identifier tuple and report, per equivalence-class size
    bucket, how many classes/rows would violate k-anonymity, plus the
    minimum l-diversity (distinct sensitive values) among them. One
    aggregation to the class level (the only shuffle), then a 2-key
    rollup; at 100 TB the class table is the cardinality of the
    quasi-identifier space, not the data.

    Returns (violates_k, n_classes, n_rows, min_l_diversity,
    max_class_size) with violates_k in {0,1}.
    """
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(F.col(sensitive_col)).alias("_l"),
    )
    return (
        classes.groupBy(
            (F.col("_n") < k).cast("int").alias("violates_k")
        )
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("_n").alias("n_rows"),
            F.min("_l").alias("min_l_diversity"),
            F.max("_n").alias("max_class_size"),
        )
        .orderBy("violates_k")
    )
