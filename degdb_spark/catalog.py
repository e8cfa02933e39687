"""Table registration over the driver-generated parquet testdata.

At 100 TB the same code path applies: ``spark.read.parquet`` against a
partitioned table root — Catalyst handles column pruning, predicate
pushdown, and partition pruning; nothing here materialises data on the
driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from degdb_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Event-time columns across the testdata tables; any of these read as
#: long means the parquet carried TIMESTAMP(NANOS) (see load_table).
_TS_COLUMNS = {"ts", "l_shipdate", "o_orderdate", "created"}


#: Session-scoped DataFrame cache: a suite run calls load_table a few
#: hundred times, and each miss costs two conf round trips plus a
#: parquet footer/listing read (~0.1 s of driver time). Keyed by the
#: OWNING SESSION identity (a frame from a stopped session must never
#: be served to its successor), the absolute path, and a content
#: signature over the table's part files (name, mtime, size — so a
#: regeneration that rewrites parts in place without touching the
#: directory entry invalidates too). Bounded FIFO — a long-lived
#: process scanning many sf dirs can't grow it without limit.
#: DataFrames are lazy, so caching the frame caches schema + file
#: listing, never data.
_TABLE_CACHE: dict[tuple, DataFrame] = {}
_TABLE_CACHE_MAX = 64


def _table_signature(path: str) -> tuple:
    """(name, mtime_ns, size) of every part entry — cheap (one
    scandir, one stat per entry) and changes whenever any file is
    rewritten in place. FLAT-DIRECTORY assumption: the driver testdata
    writes all part files directly under ``<table>.parquet/`` (no Hive
    partition subdirectories), so one level is enough — a rewrite
    inside a nested subdir would only surface via that subdir's own
    mtime, which POSIX does not guarantee to change for in-place file
    rewrites. If nested layouts ever appear here, recurse instead."""
    if os.path.isdir(path):
        sig = []
        for e in os.scandir(path):
            st = e.stat()
            sig.append((e.name, st.st_mtime_ns, st.st_size))
        return tuple(sorted(sig))
    st = os.stat(path)
    return (st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    try:
        key = (
            id(spark),
            spark.sparkContext.applicationId,
            path,
            _table_signature(path),
        )
    except Exception:
        key = None
    if key is not None and key in _TABLE_CACHE:
        cached = _TABLE_CACHE[key]
        # id() can recycle after GC: serve only frames whose session
        # object IS this session
        if cached.sparkSession is spark:
            return cached
        del _TABLE_CACHE[key]
    # The driver may hand us a session built without our factory; the
    # TIMESTAMP(NANOS) reader conf is runtime-settable, so pin it here —
    # otherwise any events read throws PARQUET_TYPE_ILLEGAL.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # events.ts becomes TIMESTAMP_LTZ after conversion; date_trunc
        # etc. are session-timezone-dependent, and the DuckDB oracle is
        # timezone-naive — pin UTC so buckets agree in any session.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(path)
    # TIMESTAMP(NANOS) columns arrive as long nanos under
    # spark.sql.legacy.parquet.nanosAsLong; truncate to micros — the same
    # thing DuckDB does when reading nanos parquet — so oracle comparisons
    # agree to the microsecond. The driver has regenerated testdata with
    # different physical timestamp types between rounds (events.ts was
    # NANOS in round 1, MICROS in round 2), so convert ONLY when the
    # column actually surfaces as long, for every known timestamp column.
    for field in df.schema.fields:
        if field.name in _TS_COLUMNS and isinstance(field.dataType, T.LongType):
            # integer DIV keeps full precision (a double division of an
            # ~1.7e18 nanos value is off by ±1 µs); DuckDB's ns→us cast
            # truncates identically.
            df = df.withColumn(
                field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
            )
    if key is not None:
        while len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:  # FIFO bound
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[key] = df
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
