"""ANSI-mode regression sweep.

The driver evaluates the contract under a VANILLA Spark 4 session,
where ``spark.sql.ansi.enabled`` defaults to true — so any cast or
arithmetic that is only legal in legacy mode (a stray non-try cast, a
string→number coercion) fails there first. This suite flips the
runtime conf and executes every registered query at sf0.001, so such
a regression can never land silently.

Value correctness stays the job of tools/check_oracle.py + the driver
gate; this sweep asserts EXECUTABILITY (and schema stability) under
ANSI semantics.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def _query_names():
    return list(entry_mod.queries())


@pytest.fixture(scope="module")
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", _query_names())
def test_query_runs_under_ansi(ansi_spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df = fn(ansi_spark, sf_dir)
    assert df.columns  # stable, non-empty schema
    df.collect()  # full execution, not just analysis
    # piggybacked plan guard: no query may execute a CartesianProduct
    # (1-row scalar crosses plan as BroadcastNestedLoopJoin, which is
    # fine — an actual cartesian of data-scale inputs is never OK)
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan, f"{name} planned a cartesian"


def test_entry_runs_under_ansi(ansi_spark):
    assert entry_mod.entry(ansi_spark).collect()
