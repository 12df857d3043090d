"""Sink operators (SURVEY §2.2 K1–K3).

- ``export_payload`` — K1: the sheet-overwrite shape ([header]+rows
  after export normalization). Driver-bound by contract; capped.
- ``write_parquet`` / ``save_table`` — the scale sinks.
- export normalization (K3) lives in functions.dates
  (``format_dates_for_export``) + functions.cleaning (``nan_to_null_all``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from fbs_data_pipelines_spark.functions.cleaning import nan_to_null_all
from fbs_data_pipelines_spark.functions.dates import format_dates_for_export

#: hard cap for driver-bound row payloads (the reference's 10 MB
#: anxiety, made explicit): refuse to collect bigger edges.
MAX_PAYLOAD_ROWS = 200_000


def normalize_for_export(df: DataFrame) -> DataFrame:
    """K3 (transformation_layer.py:101-119): dates → ISO strings,
    NaN → null. JSON-safe payload, stable across engines."""
    return format_dates_for_export(nan_to_null_all(df))


def export_payload(df: DataFrame, max_rows: int = MAX_PAYLOAD_ROWS) -> list[list]:
    """K1: normalized [header]+rows payload for API sinks
    (gsheets_handler.py:119-171). Guarded collect — a single job: the
    limit(cap+1) collect both enforces the cap and IS the payload
    (a separate count() would scan the input twice)."""
    normalized = normalize_for_export(df)
    rows = normalized.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"export_payload is a driver-bound edge: input exceeds cap "
            f"{max_rows}; use write_parquet/save_table for data-scale sinks"
        )
    return [list(normalized.columns)] + [list(r) for r in rows]


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Scale sink: parquet with optional partition columns."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    salt: str = "",
) -> None:
    """The last-mile trainer export: N balanced parquet shards in a
    DETERMINISTIC pseudo-random order.

    Trainers want (a) a global shuffle of the corpus that is
    reproducible run-to-run (data ordering is part of the training
    recipe), (b) shards of near-equal size for data-parallel workers,
    (c) a stable doc→shard assignment for resumption. All three fall
    out of ordering by the portable md5 hash of the document key:
    `repartitionByRange` on the hash splits the uniform hash space
    into ``n_shards`` contiguous, balanced ranges (range boundaries
    from Spark's reservoir sample of the hash column — the assignment
    is hash-determined, boundaries approximate), and the
    within-shard sort fixes the intra-shard order exactly.

    One shuffle; each shard lands as one sorted parquet file. Change
    ``salt`` to get an independent epoch-level reshuffle.
    """
    from pyspark.sql import functions as F

    okey = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))
    )
    (
        df.withColumn("__shuffle_order", okey)
        .repartitionByRange(n_shards, "__shuffle_order")
        .sortWithinPartitions("__shuffle_order")
        .drop("__shuffle_order")
        .write.mode("overwrite")
        .parquet(path)
    )
