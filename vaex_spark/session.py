"""SparkSession bootstrap tuned for the vaex-like interactive workload.

The reference engine (vaex) is a single-node, multithreaded, streaming
executor over mmap'd columns.  Our equivalent "fast interactive loop" on
Spark comes from:

* Arrow-accelerated Python<->JVM transfer (``toPandas``/``toArrow`` and
  pandas UDFs),
* AQE (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast decisions) — this is what makes one config work from
  sf0.001 on a laptop to 100 TB on a 1000-executor cluster,
* a shuffle-partition default that AQE can coalesce *down* from, rather
  than a tiny constant it can never raise.

Nothing here is cluster-specific: on a real cluster the same settings
apply, only ``master`` comes from the environment (spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: runtime re-planning is the scale story.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all Python-boundary transfers (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Arrow-optimized row Python UDFs (Spark 4): batches the transfer for
    # the df.apply(vectorize=False) escape hatch too.
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
    # Timestamps in parquet as micros (matches pyarrow/duckdb expectations).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Read tz-less parquet timestamps as plain `timestamp` (LTZ, session tz
    # UTC), not timestamp_ntz: keeps one timestamp type across batch,
    # streaming, and the DuckDB oracle regardless of writer metadata.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # ANSI off: vaex semantics are permissive (overflow wraps, bad casts
    # -> null), matching numpy more closely than ANSI SQL.
    "spark.sql.ansi.enabled": "false",
    # Partition sizing: 128MB input splits is the parquet sweet spot.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def get_session(app_name: str = "vaex_spark", master: str | None = None,
                shuffle_partitions: int | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) the SparkSession.

    ``master`` defaults to ``local[N]`` with N from ``$SPARK_GRAFT_CPUS``
    (driver contract) or all cores.  On a cluster, pass ``master=None``
    with ``spark.master`` preset in the environment and it is honored.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None:
        master = "local[*]"
    builder = builder.master(master)
    if shuffle_partitions is None:
        # Local mode: match core count so one wave of reducers suffices;
        # AQE coalesces further for small inputs.  On a cluster you want
        # ~2-3x total cores; set explicitly there.
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master.startswith("local"):
        # Local mode: the driver JVM IS the executor — Spark's 1g default
        # heap on a many-core box starves 32 task threads plus broadcast
        # builds (first seen: a high-dup-rate near_dup_pairs corpus dying
        # in BroadcastExchange).  On a cluster this is spark-submit's
        # job; only the local bootstrap sets it, and only if the JVM is
        # not already up (driver memory is start-time-only).
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
