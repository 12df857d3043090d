"""Behavioral event-sequence analytics (funnel, retention cohorts).

The event-stream counterparts of the relational surface: both
operators are pure DataFrame compositions whose shuffles are bounded
by |users| + |events of the referenced types|, never all-pairs.

``funnel`` follows the ordered-window semantics of the public
windowFunnel aggregators (ClickHouse / Snowplow): a user converts
step i only with an event of type i strictly AFTER their step-(i-1)
time and (optionally) within ``window`` of their STEP-1 anchor time;
per step the user's EARLIEST qualifying timestamp is the one carried
forward. The implementation is a chain of filter→groupBy-min→join
stages — k steps cost k map-side-combined aggregates and k
user-keyed joins (co-partitioned on the user key; no per-user arrays,
so one hyper-active user cannot blow a task's memory the way a
collect_list-based funnel can).

``retention_cohorts`` is the classic triangle: cohort = the week of a
user's first anchor event, activity bucketed by whole weeks since
that first event — two aggregates and one user-keyed join.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_seconds: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel → (step_idx, step, n_users).

    ``n_users`` at step i counts users with a qualifying ordered
    chain through steps 1..i; it is non-increasing by construction.
    """
    from fbs_data_pipelines_spark.caching import CacheScope

    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    # each stage feeds BOTH the next stage's join and its own count
    # row, and the final union would otherwise re-execute stage i for
    # every later step (k scans of the event table instead of one
    # chain) — persist the users-sized stage tables, scope-attached to
    # the result for release_cache()
    scope = CacheScope()
    stages: list[DataFrame] = []
    cur: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            u.alias("u"), t.alias("ts")
        )
        if cur is None:
            cur = ev.groupBy("u").agg(F.min("ts").alias("t_cur"))
            # the step-1 time anchors the optional conversion window
            cur = cur.withColumn("t_anchor", F.col("t_cur"))
        else:
            q = ev.join(cur, "u").filter(F.col("ts") > F.col("t_cur"))
            if window_seconds is not None:
                q = q.filter(
                    F.col("ts")
                    <= F.col("t_anchor")
                    + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
                )
            cur = q.groupBy("u", "t_anchor").agg(
                F.min("ts").alias("t_cur")
            )
        cur = scope.persist(cur)
        stages.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col("n_users"),
            )
        )
    return scope.attach(reduce(lambda a, b: a.unionByName(b), stages))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle → (cohort_week, week_offset, n_active).

    cohort_week = Monday-truncated week of the user's first event;
    week_offset = whole weeks between that first event and each
    active day; n_active = distinct users from the cohort active at
    that offset.
    """
    u, t = F.col(user_col), F.col(ts_col)
    firsts = events.groupBy(u.alias("u")).agg(F.min(t).alias("first_ts"))
    acts = events.select(u.alias("u"), t.alias("ts")).join(firsts, "u")
    return (
        acts.select(
            "u",
            F.date_trunc("week", F.col("first_ts")).cast("date").alias(
                "cohort_week"
            ),
            # explicit floor: a bare double→int cast truncates in
            # Spark but rounds in DuckDB — floor is the portable form
            F.floor(
                F.datediff(
                    F.col("ts").cast("date"), F.col("first_ts").cast("date")
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("u").alias("n_active"))
    )


def sliding_topk(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window_duration: str = "6 hours",
    slide_duration: str = "1 hour",
    k: int = 3,
) -> DataFrame:
    """Sliding-window heavy hitters ("trending"): per sliding window,
    the top-k keys by event count — the batch twin of a streaming
    trending-topics job, and the one window shape the existing
    surface lacked (tumbling rollup: windowed_event_rollup; range
    frame: window_range_30d; this: overlapping F.window slides).

    Scale shape: ``F.window(ts, W, S)`` replicates each event into
    W/S windows JVM-side (explode factor = W/S — the documented,
    bounded cost of sliding semantics; pick S accordingly), then ONE
    map-side-combined (window, key) aggregation. The final top-k rank
    partitions by window over an already-aggregated frame whose
    per-window row count is bounded by |distinct keys| — not event
    volume — so the rank window cannot see skew the aggregation
    didn't already absorb.

    Returns (window_start, window_end, key, n, rank), rank 1..k with
    a deterministic (count desc, key asc) tiebreak.
    """
    from pyspark.sql import Window

    agg = (
        events.groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration).alias(
                "__w"
            ),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n"))
    )
    rw = Window.partitionBy("__w").orderBy(
        F.col("n").desc(), F.col(key_col).asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            F.col(key_col),
            "n",
            F.col("rank").cast("long").alias("rank"),
        )
    )
