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


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 3.5,
    z_col: str = "robust_z",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Median-absolute-deviation outlier detection (the
    Iglewicz–Hoaglin modified z-score) — the DETECTION counterpart of
    ``winsorize``'s treatment: ``z = 0.6745 * (x - median) / MAD``
    per group, flagged when ``|z| > k`` (3.5 is the published
    default). Median/MAD resist the very outliers a mean/stddev
    z-score would absorb.

    MAD depends on the median, so this is inherently TWO exact
    aggregates; both are per-group single rows broadcast back — the
    corpus itself is scanned twice but never reshuffled. A degenerate
    group (MAD = 0, i.e. >50% of values identical) yields a null
    ``z`` and flags nothing — deterministic, documented, and exactly
    replayable in SQL (no epsilon fudge).

    Exact ``percentile(x, 0.5)`` matches DuckDB ``quantile_cont`` —
    same sort-interpolated definition, so oracles replay bit-for-bit
    on both the median and the MAD.
    """
    gcols = list(group_cols)
    med = df.groupBy(*gcols).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med")
    )
    # the MAD aggregate CARRIES the median forward (min over a
    # per-group constant), so the stats relation needs no second
    # reference to `med` — three corpus scans total (median, MAD,
    # final projection), the minimum for an uncached exact-MAD
    # pipeline (a med⋈mad stats join would re-evaluate med's scan)
    stats = (
        df.join(F.broadcast(med), gcols)
        .groupBy(*gcols)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)
            ).alias("__mad"),
            F.min("__med").alias("__med"),
        )
    )
    z = F.when(
        F.col("__mad") > 0,
        F.lit(0.6745)
        * (F.col(value_col) - F.col("__med"))
        / F.col("__mad"),
    )
    return (
        df.join(F.broadcast(stats), gcols)
        .withColumn(z_col, z)
        .withColumn(
            flag_col,
            F.coalesce(F.abs(F.col(z_col)) > k, F.lit(False)),
        )
        .drop("__med", "__mad")
    )
