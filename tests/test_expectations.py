"""Declarative data-quality expectations (single-pass validation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.operators import expectations as X


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "A", 10.0, "ok-1"),
        (2, "B", -5.0, "ok-2"),      # out of range
        (3, "Z", 20.0, "bad"),       # bad category + bad pattern
        (3, "A", 30.0, "ok-3"),      # duplicate id
        (None, "A", None, None),     # nulls
    ]
    return spark.createDataFrame(rows, "id long, cat string, x double, tag string")


def test_validate_counts_each_violation_kind(spark, messy):
    report = {
        r.check_name: (r.violations, r.passed)
        for r in X.validate(
            messy,
            [
                X.not_null("id"),
                X.unique("id"),
                X.in_set("cat", ["A", "B"]),
                X.in_range("x", 0, 100),
                X.matches("tag", "^ok-"),
            ],
        ).collect()
    }
    assert report["not_null(id)"] == (1, False)
    # 5 rows, 4 distinct ids (3 dup + null counts distinct-nonnull=3 →
    # count(*)-count_distinct = 5-3 = 2: the dup AND the null row)
    assert report["unique(id)"][0] == 2
    assert report["in_set(cat)"] == (1, False)       # 'Z'
    assert report["in_range(x,0,100)"] == (1, False)  # -5.0 (null ignored)
    assert report["matches(tag)"] == (1, False)       # 'bad'


def test_validate_single_job_plan(spark, messy):
    df = X.validate(messy, [X.not_null("id"), X.in_range("x", 0, 100)])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # one aggregation pass over the input — no joins, no extra scans
    assert plan.count("Scan") <= 1
    assert "Join" not in plan


def test_satisfies_and_enforce(spark, messy):
    clean = messy.filter(F.col("id").isNotNull() & (F.col("x") > 0))
    out = X.enforce(clean, [X.not_null("id"), X.in_range("x", 0, 100)])
    assert out is clean  # passthrough on success

    with pytest.raises(ValueError, match="in_range"):
        X.enforce(messy, [X.in_range("x", 0, 100)])

    rep = {
        r.check_name: r.violations
        for r in X.validate(
            messy, [X.satisfies("x_below_25", F.col("x") < 25)]
        ).collect()
    }
    # violations: x=30 plus the null row (null ⇒ violation, SQL CHECK)
    assert rep["x_below_25"] == 2


def test_empty_input_passes(spark):
    empty = spark.createDataFrame([], "id long, x double")
    rep = X.validate(
        empty, [X.not_null("id"), X.unique("id"), X.in_range("x", 0, 1)]
    ).collect()
    assert all(r.violations == 0 and r.passed for r in rep)
