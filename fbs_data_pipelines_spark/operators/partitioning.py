"""Partitioning utilities.

``ensure_parallelism``: small single-file inputs (one parquet row
group ⇒ one scan partition) serialize heavy per-row work (shingling,
vector math) onto one core. Repartitioning such inputs to the
cluster's default parallelism costs one tiny shuffle and unlocks every
core. At real scale the input already has ≥ parallelism partitions and
this is a no-op — the check happens at plan time, no job is run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    target = min_partitions
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
