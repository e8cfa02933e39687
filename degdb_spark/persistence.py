"""Pluggable intermediate-result pinning.

Several query paths materialize a small intermediate frame that more
than one downstream consumer reads (DSIR bucket counts, SemDeDup
assignments, verified near-dup pairs) so Catalyst doesn't plan the
producing aggregation — and its corpus scan — once per consumer.
Locally the cheapest pin is ``localCheckpoint()``; on a real cluster
executor-LOCAL checkpoints die with a lost executor, which turns a
recoverable task failure into a job failure. The right 100×-scale
choice (replicated persist, or a reliable checkpoint to the cluster
checkpoint dir) depends on deployment, so it is a session knob rather
than a hard-coded call (SCALE.md "Pinning intermediates"):

    spark.conf.set("spark.degdb.pin", "persist")   # MEMORY_AND_DISK_2
    spark.conf.set("spark.degdb.pin", "checkpoint")  # reliable, needs
                                                     # setCheckpointDir
    spark.conf.set("spark.degdb.pin", "local")       # default

All three produce bit-identical results (the pin only cuts lineage /
dedups computation); the default keeps local behavior unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize ``df`` for multi-consumer reuse per the
    ``spark.degdb.pin`` session conf (default: executor-local
    checkpoint). ``eager`` forces computation now (only meaningful for
    checkpoint flavors; ``persist`` is always lazy-then-cached)."""
    mode = df.sparkSession.conf.get("spark.degdb.pin", "local")
    if mode == "persist":
        from pyspark import StorageLevel

        # replicated so a single lost executor doesn't force recompute
        out = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        if eager:
            out.count()
        return out
    if mode == "checkpoint":
        return df.checkpoint(eager=eager)
    if mode != "local":
        # a typo'd knob must FAIL, not silently fall back to the
        # cluster-unsafe executor-local flavor the knob exists to avoid
        raise ValueError(
            f"spark.degdb.pin={mode!r}: expected 'local', 'persist', or 'checkpoint'"
        )
    return df.localCheckpoint(eager=eager)
