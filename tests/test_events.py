"""Funnel ordering/window semantics and retention cohort math."""

from datetime import datetime

from fbs_data_pipelines_spark.operators.events import (
    funnel,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def _t(s):
    return datetime.fromisoformat(s)


def test_funnel_requires_order(spark):
    df = _ev(
        spark,
        [
            # u1 converts in order
            (1, _t("2024-01-01T10:00:00"), "view"),
            (1, _t("2024-01-01T11:00:00"), "click"),
            (1, _t("2024-01-01T12:00:00"), "purchase"),
            # u2 clicked BEFORE viewing — stops at step 1
            (2, _t("2024-01-02T09:00:00"), "click"),
            (2, _t("2024-01-02T10:00:00"), "view"),
            # u3 views only
            (3, _t("2024-01-03T10:00:00"), "view"),
            # u4 never views — not even step 1
            (4, _t("2024-01-04T10:00:00"), "purchase"),
        ],
    )
    out = {
        r.step: r.n_users
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_uses_earliest_qualifying_times(spark):
    # u1's first click precedes the view; the SECOND click qualifies,
    # and the purchase must follow that second click
    df = _ev(
        spark,
        [
            (1, _t("2024-01-01T10:00:00"), "view"),
            (1, _t("2024-01-01T09:00:00"), "click"),
            (1, _t("2024-01-01T12:00:00"), "click"),
            (1, _t("2024-01-01T11:00:00"), "purchase"),  # before click #2
        ],
    )
    out = {
        r.step: r.n_users
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_funnel_window_anchored_at_step_one(spark):
    df = _ev(
        spark,
        [
            (1, _t("2024-01-01T00:00:00"), "view"),
            (1, _t("2024-01-01T01:00:00"), "click"),   # inside 2h window
            (1, _t("2024-01-01T03:00:00"), "purchase"),  # 3h after anchor
            (2, _t("2024-01-02T00:00:00"), "view"),
            (2, _t("2024-01-02T01:00:00"), "click"),
            (2, _t("2024-01-02T01:30:00"), "purchase"),
        ],
    )
    out = {
        (r.step_idx, r.step): r.n_users
        for r in funnel(
            df, ["view", "click", "purchase"], window_seconds=7200
        ).collect()
    }
    assert out[(1, "view")] == 2
    assert out[(2, "click")] == 2
    assert out[(3, "purchase")] == 1  # u1's purchase misses the window


def test_retention_cohorts_triangle(spark):
    df = _ev(
        spark,
        [
            # u1 first active Mon Jan 1, returns 10 days later (wk 1)
            (1, _t("2024-01-01T10:00:00"), "view"),
            (1, _t("2024-01-11T10:00:00"), "view"),
            # u2 first active Tue Jan 2 (same Monday cohort), wk 0 only
            (2, _t("2024-01-02T10:00:00"), "view"),
            # u3 first active Mon Jan 8 cohort, returns 21 days later
            (3, _t("2024-01-08T10:00:00"), "view"),
            (3, _t("2024-01-29T10:00:00"), "view"),
        ],
    )
    out = {
        (str(r.cohort_week), r.week_offset): r.n_active
        for r in retention_cohorts(df).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 3): 1,
    }
