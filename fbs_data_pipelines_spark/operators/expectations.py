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


def observed(
    df: DataFrame, expectations: list[Expectation], name: str = "expectations"
):
    """Instrument the MAIN job with the contract instead of running a
    second validation pass: attaches a Spark ``Observation`` carrying
    every expectation's violation count (and ``__rows``), evaluated
    as the data streams through whatever action the caller runs next.

    ``validate`` costs one extra scan of the input; at 100 TB that is
    the difference between reading the corpus once or twice.
    ``observed`` rides the existing action — zero extra I/O, exact
    counts (observations are accumulator-backed and task-retry-safe
    for deterministic expressions).

    Returns (instrumented_df, observation). After ANY action on the
    returned frame, ``observation.get`` yields the metrics dict;
    ``check(observation, expectations)`` turns it into the same
    (check_name, violations, passed) report ``validate`` produces.

    Streaming twin: the same metric expressions attach via
    ``df.observe("name", *aggs)`` and arrive per-batch in
    ``QueryProgressEvent.observedMetrics`` — one contract definition
    serves batch and stream.
    """
    from pyspark.sql import Observation

    aggs = []
    for i, e in enumerate(expectations):
        if e.distinct_cols:
            # observed metrics are accumulator-backed — Spark rejects
            # DISTINCT aggregates there (INVALID_OBSERVED_METRICS).
            # Uniqueness genuinely needs a shuffle; keep it in
            # ``validate``'s aggregation pass.
            raise ValueError(
                f"expectation '{e.name}' uses count-distinct, which "
                "observed metrics cannot express — check uniqueness "
                "via validate()/enforce() instead"
            )
        agg = F.sum(e.violation.cast("long"))
        aggs.append(F.coalesce(agg, F.lit(0)).cast("long").alias(f"__c{i}"))
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("__rows"), *aggs), obs


def check(observation, expectations: list[Expectation]) -> list[dict]:
    """Decode an ``observed`` metrics payload into the standard
    report: [{check_name, violations, passed}, ...] in declaration
    order. Call only after an action ran on the instrumented frame
    (``Observation.get`` blocks until then)."""
    metrics = observation.get
    return [
        {
            "check_name": e.name,
            "violations": int(metrics[f"__c{i}"]),
            "passed": int(metrics[f"__c{i}"]) == 0,
        }
        for i, e in enumerate(expectations)
    ]
