"""Path traversal — degdb's step chaining, generalised.

The reference's only join: for step i>0, wrap the step in
AND(step, OR(subj = prev.obj ...)) — i.e. equi-join previous results' obj
onto the next step's subj, one hop per step
(/root/reference/core/query.go:14-28). It builds the OR list by collecting
the previous step's objects on the coordinator; we express the same
semantics as a distributed self-equi-join, and add the dedup the reference
acknowledges it is missing (core/query.go:58 TODO).

Scale design: each hop is a shuffle-on-key equi-join — the direct analogue
of degdb's shard fan-out by murmur3(subj) (query/query.go:24-47), except
Spark parallelises the per-shard requests that the reference issues
sequentially (core/query.go:97 TODO "Parallelize"). For deep traversals the
frontier is re-partitioned on the join key and checkpointed every few hops
to cut lineage; with a subj-bucketed store the hop join is shuffle-free on
the store side.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from degdb_spark.plans.pattern import ArrayOp, compile_array_op
from degdb_spark.persistence import lineage_cut


def chain_steps(
    store_df: DataFrame,
    steps: Sequence[ArrayOp | Mapping | Iterable[Mapping]],
    deduplicate: bool = True,
) -> DataFrame:
    """Execute a multi-step query; returns the triples matched by the FINAL
    step, constrained hop-by-hop (ExecuteQuery's loop, core/query.go:14-28).

    Each element of ``steps`` is an ArrayOp (or pattern dict / list of
    pattern dicts, wrapped OR-mode as the HTTP layer does).
    """
    current: DataFrame | None = None
    for step in steps:
        op = _as_op(step)
        matched = store_df.filter(compile_array_op(op))
        if current is not None:
            # join prev.obj -> this.subj (the AND(step, OR(subj=prev.obj...))
            # rewrite, core/query.go:19-27), distributed instead of
            # coordinator-collected.
            frontier = current.select(F.col("obj").alias("subj")).distinct()
            matched = matched.join(frontier, on="subj", how="left_semi")
        current = matched
    assert current is not None, "at least one step required"
    if deduplicate:
        current = current.dropDuplicates(["subj", "pred", "obj"])
    return current


def k_hop(
    store_df: DataFrame,
    start_subjects: DataFrame | Sequence[str],
    k: int,
    pred: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """All nodes reachable in exactly k hops along ``pred`` edges.

    Iterative frontier expansion; lineage is truncated with lineage_cut()
    every ``checkpoint_every`` hops (risk §7.1 of SURVEY.md).
    """
    spark = store_df.sparkSession
    if not isinstance(start_subjects, DataFrame):
        frontier = spark.createDataFrame([(s,) for s in start_subjects], ["subj"])
    else:
        frontier = start_subjects.toDF("subj")
    edges = store_df.select("subj", "pred", "obj")
    if pred is not None:
        edges = edges.filter(F.col("pred") == pred)
    edges = edges.select("subj", "obj")
    for i in range(k):
        frontier = (
            edges.join(frontier.hint("broadcast") if i == 0 else frontier, on="subj")
            .select(F.col("obj").alias("subj"))
            .distinct()
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            frontier = frontier.transform(lineage_cut, eager=True)
    return frontier.select(F.col("subj").alias("node"))


def _as_op(step) -> ArrayOp:
    if isinstance(step, ArrayOp):
        return step
    if isinstance(step, Mapping):
        if "mode" in step or "triples" in step or "arguments" in step:
            return ArrayOp.from_dict(step)
        return ArrayOp(mode="OR", triples=[step])
    return ArrayOp(mode="OR", triples=list(step))
