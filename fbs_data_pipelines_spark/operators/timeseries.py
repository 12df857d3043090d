"""Time-series gap filling — the hypertable ``time_bucket_gapfill``
family (TimescaleDB's public API shape: gapfill + ``locf()`` +
``interpolate()``), Spark-first.

A sensor/event stream aggregated to a time grid has HOLES (buckets
with no rows); downstream consumers (charts, models, joins on time)
need a dense grid. The operator:

1. buckets events to a ``step_seconds`` grid and aggregates per
   (group, bucket) — one map-side-combined shuffle;
2. densifies each group's [min, max] bucket range with
   ``sequence`` + ``explode`` — rows appear only for REAL gaps, and
   the grid is bounded by span/step per group, never a cross join;
3. fills: ``locf`` (last observation carried forward — a running
   ``last(ignorenulls)`` window) and ``lerp`` (linear interpolation
   between the surrounding observations — the same LOCF machinery
   forward and backward plus one arithmetic blend).

Everything is built-in expressions over two shuffles (the bucket agg
and the per-group ordered window); both fills are deterministic and
mirrored exactly by the SQL oracle (``generate_series`` +
``last_value IGNORE NULLS`` windows).

At 100 TB: the aggregate is the only corpus-sized pass; the dense
grid is (groups x span/step) rows — a property of the TIME RANGE,
not the input volume — and the fill windows partition by group, so
no single task sees more than one group's grid.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.cleaning import round_half_up
from fbs_data_pipelines_spark.functions.dates import ts_lit


def time_bucket(ts_col: str, step_seconds: int):
    """Epoch-aligned bucket timestamp (the hypertable time_bucket)."""
    return F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("long")
        * step_seconds
    )


def _bound_bucket(bound, step_seconds: int):
    """A caller-supplied range bound (datetime or epoch seconds)
    snapped DOWN to its bucket, as a timestamp literal expression —
    the same epoch arithmetic ``time_bucket`` applies to data rows,
    so bounds and observations always land on the same grid."""
    if isinstance(bound, (int, float)):
        return F.timestamp_seconds(
            F.lit(int(bound // step_seconds) * step_seconds)
        )
    if isinstance(bound, _dt.datetime):
        # ts_lit, NOT F.lit(datetime): the plain literal converts via
        # the Python process's LOCAL timezone (host-TZ-dependent).
        lit = ts_lit(bound)
    else:
        lit = F.lit(bound).cast("timestamp")
    return F.timestamp_seconds(
        (F.unix_timestamp(lit) / step_seconds).cast("long") * step_seconds
    )


def gapfill(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    agg: str = "avg",
    start=None,
    end=None,
) -> DataFrame:
    """Dense per-group time grid with LOCF and linear-interpolation
    fills. Output: (group…, bucket, value, value_locf, value_lerp,
    is_gap) where ``value`` is the bucket aggregate (null in gaps),
    ``value_locf`` carries the last observation forward (leading
    gaps stay null), and ``value_lerp`` linearly interpolates between
    the surrounding observations (gaps before the first / after the
    last observation fall back to LOCF semantics). Aggregates are
    rounded to 6dp BEFORE filling so both fills are cross-engine
    deterministic.

    ``start`` / ``end`` (datetime or epoch seconds, each optional)
    pin the grid bounds explicitly — TimescaleDB's
    ``time_bucket_gapfill(width, time, start, finish)`` shape — so
    callers can densify LEADING/TRAILING gaps beyond the observed
    span, or window into it. Each bound snaps down to its bucket and
    replaces the per-group min/max it covers; observations outside
    [start, end] are excluded from the grid (and therefore from the
    fills — LOCF does not reach back before ``start``). Groups still
    come from the data: a group with no rows at all never appears. A
    group whose observations all fall outside an explicit range
    yields that group's fully-null dense grid (every bucket a gap)."""
    gcols = list(group_cols)
    agg_fn = getattr(F, agg)
    bucketed_all = (
        df.select(
            *gcols,
            time_bucket(ts_col, step_seconds).alias("bucket"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(*gcols, "bucket")
        .agg(round_half_up(agg_fn("__v"), 6).alias("value"))
    )
    # observations outside an explicit range are excluded from the
    # fills (LOCF never reaches back before ``start``)
    bucketed = bucketed_all
    if start is not None:
        bucketed = bucketed.filter(
            F.col("bucket") >= _bound_bucket(start, step_seconds)
        )
    if end is not None:
        bucketed = bucketed.filter(
            F.col("bucket") <= _bound_bucket(end, step_seconds)
        )
    # per-group dense grid: sequence over the observed [min, max],
    # each side overridden by an explicit bound when supplied. The
    # GROUP LIST comes from the unfiltered aggregate, so with both
    # bounds explicit an out-of-range group still yields its
    # fully-null grid; with a one-sided bound, a group whose observed
    # bound inverts the range (mn > mx) drops via the guard.
    bounds = bucketed_all.groupBy(*gcols).agg(
        F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
    )
    if start is not None:
        bounds = bounds.withColumn(
            "__mn", _bound_bucket(start, step_seconds)
        )
    if end is not None:
        bounds = bounds.withColumn(
            "__mx", _bound_bucket(end, step_seconds)
        )
    grid = (
        bounds.filter(F.col("__mn") <= F.col("__mx"))
        .select(
            *gcols,
            F.explode(
                F.sequence(
                    F.col("__mn"),
                    F.col("__mx"),
                    F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
                )
            ).alias("bucket"),
        )
    )
    dense = grid.join(bucketed, [*gcols, "bucket"], "left").withColumn(
        "is_gap", F.col("value").isNull()
    )
    fwd = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    epoch = F.unix_timestamp(F.col("bucket")).cast("double")
    prev_v = F.last("value", ignorenulls=True).over(fwd)
    next_v = F.first("value", ignorenulls=True).over(bwd)
    prev_t = F.last(
        F.when(F.col("value").isNotNull(), epoch), ignorenulls=True
    ).over(fwd)
    next_t = F.first(
        F.when(F.col("value").isNotNull(), epoch), ignorenulls=True
    ).over(bwd)
    # lerp: prev + (next-prev) * (t-prev_t)/(next_t-prev_t); where one
    # side is missing (leading/trailing gaps) coalesce to the other
    frac = (epoch - prev_t) / (next_t - prev_t)
    lerp = F.when(
        prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t),
        round_half_up(prev_v + (next_v - prev_v) * frac, 6),
    ).otherwise(F.coalesce(prev_v, next_v))
    return dense.select(
        *gcols,
        "bucket",
        "value",
        prev_v.alias("value_locf"),
        lerp.alias("value_lerp"),
        "is_gap",
    )


def ohlc(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Per-bucket open/high/low/close downsampling — the other half
    of the hypertable pair (gapfill densifies, OHLC summarizes; the
    classic ``candlestick`` rollup for any metric stream, not just
    prices). ONE map-side-combined shuffle: open/close are ``min_by``
    / ``max_by`` over struct(ts, value) (earliest row wins open,
    latest wins close; exact ts ties break toward the smaller /
    larger value respectively, so the result is deterministic on any
    row layout), high/low/n are plain aggregates. Values pass
    through UNTOUCHED (no arithmetic, no rounding) — cross-engine
    exact. Output: (group…, bucket, open, high, low, close, n)."""
    gcols = list(group_cols)
    v = F.col("__v")
    key = F.struct(F.col("__ts"), v)
    return (
        df.select(
            *gcols,
            time_bucket(ts_col, step_seconds).alias("bucket"),
            F.col(ts_col).alias("__ts"),
            F.col(value_col).alias("__v"),
        )
        .groupBy(*gcols, "bucket")
        .agg(
            F.min_by(v, key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, key).alias("close"),
            F.count("*").alias("n"),
        )
    )


def ewma(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    lookback: int = 20,
    tiebreak_col: str | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per group — the
    classic time-series smoother (y_t = α·x_t + (1−α)·y_{t−1},
    seeded with the frame's first observation, the pandas
    ``ewm(adjust=False)`` recurrence).

    Computed as an EXPLICIT left fold over a bounded trailing frame
    (``lookback`` rows): ``collect_list`` over the ordered window
    preserves frame order, and ``F.aggregate`` folds it
    deterministically — NOT a windowed float sum, whose engine-
    internal summation tree (segment trees in some engines) would
    make cross-engine bit-equality unattainable. The bounded frame
    also bounds both memory and the O(lookback) per-row fold: with
    α·(1−α)^k decaying geometrically, a 20-row tail carries the
    full-precision value to ~1e-3 at α=0.3 — the standard truncation.

    Scale shape: ONE per-group window (exchange + sort), a narrow
    fold projection on top. No driver participation, no second pass.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("need 0 < alpha <= 1")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(-(lookback - 1), Window.currentRow)
    )
    lst = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
        F.element_at(lst, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return df.withColumn(out_col, folded)
