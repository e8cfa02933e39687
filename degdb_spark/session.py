"""SparkSession factory with scale-oriented defaults.

Defaults target local[N] testing but are chosen so the same plans hold on a
multi-executor cluster: AQE on (runtime coalesce + skew-join), broadcast
threshold generous enough for all dimension tables, Arrow enabled for every
pandas-UDF boundary, UTC session timezone so timestamp semantics match the
DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "degdb_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism;
    shuffle partitions default to the same so a local run doesn't pay
    200-partition scheduling overhead, while a cluster deployment would
    override both.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)

    # Python workers unpickle our pandas-UDF closures by module reference;
    # make the package importable there even when the driver script runs
    # from elsewhere. (On a real cluster this is the --py-files step.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.default.parallelism", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter semi-join pruning (the Spark-native analogue of
        # the reference's bloom sync, triplestore/bloom.go:13-73)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS), which the Spark reader
        # rejects by default; read as long and convert in catalog.load_table
        # (micro truncation — matching DuckDB's own nanos→micros behaviour).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # ContextCleaner only frees shuffle/checkpoint/broadcast state when
        # driver GC runs; under light driver heap pressure that can lag a
        # long-lived session into multi-second per-query aging (measured on
        # the 26-query bench suite). Tighten the periodic-GC fallback.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # Long-lived analytics sessions compile thousands of distinct
        # generated classes (per-stage whole-stage codegen); the default
        # 100-entry compile cache thrashes across a multi-query session
        # and re-pays ~50-150 ms of janino compilation per stage on the
        # DRIVER (the per-stage floor every iterative operator multiplies).
        # Cached classes are KBs each, so a larger cache is cheap driver
        # memory at any scale. Measured on the loop-heavy suite entries:
        # ~5-10% off construction-bound queries.
        .config("spark.sql.codegen.cache.maxEntries", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
