"""Distributed model training as aggregation: fixed-iteration batch
gradient descent for a logistic-regression quality classifier.

A 100 TB curation pipeline scores documents with a cheap learned
classifier (the fastText-style quality filter of the GPT-3/CCNet
lineage: train on "good corpus vs raw web" labels, keep by score).
The Spark-native way to train a small linear model on huge data is
NOT a UDF loop — it is the sufficient-statistics pattern used by
MLlib itself: each GD iteration is ONE map-side-combined aggregation
producing the d+1 gradient components (d = feature count, tiny), the
weight update happens driver-side on those scalars (control-plane,
like k-means centroids in ``clustering.py``), and scoring is a pure
column expression. Iterations are FIXED so runs are deterministic
and an unrolled-SQL oracle can replay training bit-for-bit.

Scale shape per iteration: one scan + one d+1-column aggregate —
no shuffle beyond the aggregation's scalar merge, nothing collected
but the gradient vector itself. Cache the feature projection once
(`.persist`) so K iterations don't re-read the corpus at 100 TB —
callers own that choice; at sf-test scale the re-scan is free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _margin(weights: Sequence[float], feature_cols: Sequence[str]) -> Column:
    z: Column = F.lit(float(weights[0]))
    for wi, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(wi)) * F.col(c)
    return z


def logistic_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 3,
) -> list[float]:
    """Batch-GD logistic regression; returns [bias, w1, ..., wd].

    Weights start at 0 and update ``w ← w − lr·∇``, with
    ∇ = mean((σ(w·x) − y)·[1, x]) — one distributed aggregation per
    iteration; only the d+1 gradient scalars ever reach the driver.
    """
    w = [0.0] * (len(feature_cols) + 1)
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        err = _sigmoid(_margin(w, feature_cols)) - y
        aggs = [F.avg(err).alias("g0")] + [
            F.avg(err * F.col(c)).alias(f"g{i + 1}")
            for i, c in enumerate(feature_cols)
        ]
        g = df.agg(*aggs).first()
        w = [wi - lr * gi for wi, gi in zip(w, g)]
    return w


def logistic_score(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    score_col: str = "score",
) -> DataFrame:
    """Attach σ(w·x) as ``score_col`` — a pure codegen'd expression
    (zero shuffle; pushes through the scan with the projection)."""
    return df.withColumn(score_col, _sigmoid(_margin(weights, feature_cols)))
