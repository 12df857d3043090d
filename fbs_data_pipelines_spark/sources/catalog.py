"""Catalog / snapshot resolution (SURVEY §2.1 S5–S8).

The reference resolves datasets by walking Drive folder metadata and
picking the newest ``{date}_{name}.csv`` (gdrive_handler.py:169-217;
extraction_layer.py:35-36). Spark-first: a *listing DataFrame* over
file metadata + declarative latest-snapshot selection, plus the real
``spark.catalog`` for registered tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fbs_data_pipelines_spark.operators.joins import latest_snapshot

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("layer", T.StringType()),
        T.StructField("entity", T.StringType()),
        T.StructField("created_time", T.TimestampType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def entity_from_filename(name: str) -> str:
    """``{date}_{entity}.csv`` → entity (etl.py:34,70-71)."""
    return name.split("_")[1].split(".")[0]


def list_layer(spark: SparkSession, root: str, layer: str) -> DataFrame:
    """Listing DF for ``root/layer/*`` — the Drive-walk analogue.

    Driver-side os.scandir (metadata-only, like the API listing); the
    result is a small DataFrame that downstream ops treat
    declaratively (filter = the reference's ``q=`` pushdown).
    """
    rows = []
    layer_dir = os.path.join(root, layer)
    if os.path.isdir(layer_dir):
        for e in os.scandir(layer_dir):
            if not e.is_file():
                continue
            st = e.stat()
            import datetime as _dt

            rows.append(
                (
                    e.path,
                    e.name,
                    layer,
                    entity_from_filename(e.name) if "_" in e.name else e.name,
                    _dt.datetime.utcfromtimestamp(st.st_mtime),
                    st.st_size,
                )
            )
    return spark.createDataFrame(rows, schema=LISTING_SCHEMA)


def latest_files(listing: DataFrame) -> DataFrame:
    """Newest file per (layer, entity) — S8 as a window op."""
    return latest_snapshot(listing, ["layer", "entity"], "created_time")


def save_table(df: DataFrame, name: str, mode: str = "overwrite") -> None:
    """K2: table materialization (CREATE OR REPLACE TABLE ... AS,
    db_manager.py:35-40) → managed table via saveAsTable."""
    df.write.mode(mode).saveAsTable(name)


def table_list(spark: SparkSession) -> list[str]:
    """S6: SHOW TABLES (db_manager.py:70-76)."""
    return [t.name for t in spark.catalog.listTables()]


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """S5: SELECT * FROM t (db_manager.py:55-68)."""
    return spark.table(name)


def save_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize a table bucketed (and optionally sorted) on its
    join/agg key — the co-location contract that lets repeated joins
    and aggregations on ``bucket_cols`` run with ZERO shuffle: both
    sides of a bucketed equi-join read matching buckets directly.

    At 100 TB this is the difference between shuffling the fact table
    on every join vs once at write time. Requires saveAsTable (bucket
    metadata lives in the catalog).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Materialize with directory partitioning on coarse keys (date,
    layer, entity): reads that filter on ``partition_cols`` touch only
    matching directories (partition pruning — the Drive folder-walk
    S7 analogue, but enforced by the planner, not convention).

    Partition columns must be low-cardinality (days, not ids): each
    value is a directory, and at 100 TB over-partitioning shatters the
    table into small files.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
