"""Data-distribution diagnostics — the planning tools a 100 TB join
needs BEFORE it runs.

Skewed join/agg keys are the classic large-cluster failure mode: one
hot key → one straggler task → the stage runs at single-task speed
(the repo's salted_join/bloom_join operators are the cures; this
module is the diagnosis). ``key_skew_stats`` profiles a key column
with one map-side-combined aggregate: heavy hitters, their share of
all rows, and the cumulative share — the numbers that decide whether
to salt, broadcast, or bucket.

Plan shape: groupBy(key) count (ONE corpus shuffle, combiner-
reduced), a scalar total broadcast back over the tiny aggregated
relation, and a top-k LIMIT (tree-reduced) — the window that ranks
and accumulates runs over top_k rows only, never the full key set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.cleaning import round_half_up


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter profile of ``key_col``: the ``top_k`` most
    frequent keys with (rank, key, cnt, share, cum_share), shares
    rounded to 6dp. Ties on count break toward the smaller key, so
    the output is fully deterministic."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_cnt",
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(
            "rank",
            "key",
            "cnt",
            round_half_up(F.col("cnt") / F.col("__total"), 6).alias(
                "share"
            ),
            round_half_up(F.col("cum_cnt") / F.col("__total"), 6).alias(
                "cum_share"
            ),
        )
    )
