"""Declarative data-quality expectations (single-pass validation).

The reference's only QA is driver-side row-width sampling
(/root/reference/src/utils_.py:5-15). A 100 TB pipeline needs
contract checks that run INSIDE the engine: declare constraints,
compile them into ONE aggregation pass over the table, get a tidy
(check, violations, passed) report back — the deequ/expectations
pattern re-expressed as plain Spark aggregates.

Scale design: every row-level constraint becomes a conditional-sum
aggregate (map-side combined, zero extra passes); uniqueness becomes
``count(*) - count(distinct …)`` inside the same aggregation (Catalyst
plans distinct aggregates via a single expand). One job, one shuffle,
regardless of how many checks are declared. The report explode is
over a K-element literal array (K = number of checks) — driver-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declared constraint. ``violation`` counts offending rows;
    ``distinct_cols`` switches to the uniqueness formulation."""

    name: str
    violation: Column | None = None
    distinct_cols: tuple[str, ...] = field(default_factory=tuple)


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNull())


def unique(*cols: str) -> Expectation:
    return Expectation(f"unique({','.join(cols)})", distinct_cols=tuple(cols))


def in_set(col: str, values: list) -> Expectation:
    """Non-null values must be in ``values`` (null-ness is its own
    check — compose with not_null)."""
    return Expectation(
        f"in_set({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col},{lo},{hi})",
        F.col(col).isNotNull() & ((F.col(col) < lo) | (F.col(col) > hi)),
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def satisfies(name: str, condition: Column) -> Expectation:
    """Custom row contract: ``condition`` must hold (null ⇒ violation,
    like SQL CHECK under ANSI)."""
    return Expectation(name, ~F.coalesce(condition, F.lit(False)))


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Compile all expectations into one aggregation pass. Returns a
    DataFrame (check_name, violations, passed) with one row per
    expectation, in declaration order."""
    aggs = []
    for i, e in enumerate(expectations):
        if e.distinct_cols:
            agg = F.count(F.lit(1)) - F.count_distinct(
                *[F.col(c) for c in e.distinct_cols]
            )
        else:
            agg = F.sum(e.violation.cast("long"))
        aggs.append(F.coalesce(agg, F.lit(0)).cast("long").alias(f"__c{i}"))
    row = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("check_name"),
                F.col(f"__c{i}").alias("violations"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return (
        row.select(F.explode(report).alias("r"))
        .select(
            "r.check_name",
            "r.violations",
            (F.col("r.violations") == 0).alias("passed"),
        )
    )


def enforce(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Gate a pipeline stage: raise if any expectation fails, else
    return ``df`` unchanged. The report is K rows — a driver-bound
    control decision, not a data collect."""
    failed = [
        (r.check_name, r.violations)
        for r in validate(df, expectations).collect()
        if not r.passed
    ]
    if failed:
        detail = ", ".join(f"{n}: {v} violations" for n, v in failed)
        raise ValueError(f"data-quality contract failed — {detail}")
    return df
