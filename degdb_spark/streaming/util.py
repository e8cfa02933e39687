"""Shared plumbing for the streaming index twins."""

from __future__ import annotations


def has_committed_parquet(spark, path: str) -> bool:
    """True iff ``path`` holds at least one COMMITTED parquet data file
    (any depth, non-underscore/non-hidden name).

    The index twins branch on "does the index exist yet" before probing
    it. A bare ``fs.exists`` check wedges permanently if the FIRST index
    write crashed mid-commit: the directory exists holding only
    ``_temporary`` files, schema inference throws on every replay, and
    the stream never recovers. Requiring a committed data file makes
    that replay take the first-batch branch instead — which overwrites
    its own ``batch=N`` partition and converges (the same replay
    discipline the twins already rely on)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return False
    stack = [root]
    while stack:
        p = stack.pop()
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            elif st.getLen() > 0:
                return True
    return False


def merged_additive(spark, path: str, schema: str, keys: list[str], val: str):
    """The additive merge every index twin performs: read all committed
    ``batch=N`` partitions with an explicit schema (schema inference on
    a crashed first write would wedge replays — see
    has_committed_parquet) and sum ``val`` per ``keys``. Returns an
    empty frame of ``schema`` when nothing has committed yet. One
    shared implementation so the crashed-first-write read discipline
    can't silently diverge across twins."""
    from pyspark.sql import functions as F

    if not has_committed_parquet(spark, path):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema + ", batch int")
        .option("basePath", path)
        .parquet(path)
        .groupBy(*keys)
        .agg(F.sum(val).alias(val))
    )
