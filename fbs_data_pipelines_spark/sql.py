"""SQL front door (SURVEY §2.10 / EP3).

The reference embedded DuckDB SQL strings for staging
(/root/reference/src/db_manager.py:26-76). Here the whole engine is
behind ``spark.sql`` for free — this module just standardizes the two
conventions the embedded-SQL path needs: registering the engine's
tables as views, and a passthrough that keeps the lazy DataFrame
contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: the engine's standard table set (TESTDATA layout)
STANDARD_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_tables(
    spark: SparkSession,
    data_dir: str,
    tables: tuple[str, ...] = STANDARD_TABLES,
    prefix: str = "",
) -> list[str]:
    """Register ``{data_dir}/{t}.parquet`` as temp views — the SQL
    namespace over a parquet directory layout. Missing files are
    skipped (partial layouts are fine). Returns registered names."""
    registered = []
    for t in tables:
        path = os.path.join(data_dir, f"{t}.parquet")
        if os.path.exists(path):
            if t == "events":
                # TIMESTAMP(NANOS) parquet needs this on vanilla
                # Spark 4 sessions; runtime-settable.
                spark.conf.set(
                    "spark.sql.legacy.parquet.nanosAsLong", "true"
                )
            name = f"{prefix}{t}"
            spark.read.parquet(path).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Passthrough to ``spark.sql`` (parse → analyze → optimize →
    codegen all Catalyst). Exists so engine callers have one obvious
    SQL entry point; returns the lazy DataFrame, never collects."""
    return spark.sql(query)
