"""Robust numeric treatments for training-data feature columns.

``winsorize`` clamps a value column to its per-group exact
percentile bounds — the standard outlier treatment before scaling /
quality scoring (a handful of corrupt documents with absurd lengths
or scores must not dominate a mean). Exact ``percentile``
(sort-based, linear interpolation — the same definition as DuckDB's
``quantile_cont``, which the oracle replays) rather than an
approximate sketch: the bounds feed a correctness gate, and one
exact percentile per group is one combiner-reduced aggregate.

Plan shape at 100 TB: the bounds relation is ONE ROW PER GROUP —
broadcast back to the corpus (no second corpus shuffle); the clamp
itself is a narrow projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp ``value_col`` into its per-group [lower, upper] exact
    percentile interval. Adds ``out_col`` (default
    ``{value_col}_w``); input columns pass through unchanged."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    gcols = list(group_cols)
    out_col = out_col or f"{value_col}_w"
    bounds = df.groupBy(*gcols).agg(
        F.percentile(F.col(value_col), F.lit(lower)).alias("__lo"),
        F.percentile(F.col(value_col), F.lit(upper)).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), gcols)
        .withColumn(
            out_col,
            F.least(
                F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")
            ),
        )
        .drop("__lo", "__hi")
    )
