"""Skew-aware join helper: key salting.

AQE's skew-join handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled is on in session.py); explicit
salting remains the tool when one side must be *pre*-shuffled (iterative
jobs reusing a partitioning) or when the skewed key set is known (e.g. a
handful of celebrity subjects in a triple graph — exactly degdb's hot
subj problem).

Mechanics: the build side replicates each row ``salt`` times with a salt
suffix; the probe side salts randomly-but-deterministically (hash of a
tiebreaker column), so a hot key's rows spread over ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 16,
    tiebreak_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with ``salt``-way key splitting.

    probe: the large/skewed side; build: the side small enough to
    replicate ``salt``× (still far cheaper than one straggler reducer).
    tiebreak_col picks the deterministic salt for probe rows (defaults
    to the key itself combined with monotonically varying partition id
    — any column with per-row variety works better).
    """
    tb = (
        F.col(tiebreak_col)
        if tiebreak_col
        else F.spark_partition_id() + F.monotonically_increasing_id()
    )
    p = probe.withColumn("_salt", F.pmod(F.xxhash64(tb), F.lit(salt)).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = p.join(b, on=[key, "_salt"], how=how)
    return out.drop("_salt")
