"""SparkSession builder with engine-wide conventions.

Conventions (SURVEY §7 step 1):
- UTC session timezone (reproducible date/timestamp arithmetic).
- ANSI off: the reference's ``strict=False`` casts / lenient parses mean
  *null-on-failure*; non-ANSI ``cast`` matches that. Where possible the
  expression library still uses ``try_cast`` / ``try_to_timestamp``
  explicitly so the code stays correct even under ANSI mode.
- AQE on (runtime join re-planning, partition coalescing, skew splits).
- Arrow enabled for the pandas-UDF slow path.
- ``spark.sql.shuffle.partitions`` sized from the local parallelism for
  tests; on a real cluster leave AQE's coalescing to right-size it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fbs_data_pipelines_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. On a cluster, pass ``master=None`` with a spark-submit
    managed session and the builder only applies conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom filters (off by default in OSS Spark): inject a
        # might-contain predicate on the big side of a shuffle join when
        # the other side carries a selective filter. Never changes
        # results; default thresholds (creation side ≤10MB post-filter,
        # application side ≥10GB scan) mean it only fires at the scale
        # where the saved shuffle I/O dwarfs the bloom build.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet TIMESTAMP(NANOS) (e.g. pandas-written event streams)
        # is read as long nanos; sources normalize to micros explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
