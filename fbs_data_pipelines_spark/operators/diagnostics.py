"""Data-distribution diagnostics — the planning tools a 100 TB join
needs BEFORE it runs.

Skewed join/agg keys are the classic large-cluster failure mode: one
hot key → one straggler task → the stage runs at single-task speed
(the repo's salted_join/bloom_join operators are the cures; this
module is the diagnosis). ``key_skew_stats`` profiles a key column
with one map-side-combined aggregate: heavy hitters, their share of
all rows, and the cumulative share — the numbers that decide whether
to salt, broadcast, or bucket.

Plan shape: groupBy(key) count (ONE corpus shuffle, combiner-
reduced), a scalar total broadcast back over the tiny aggregated
relation, and a top-k LIMIT (tree-reduced) — the window that ranks
and accumulates runs over top_k rows only, never the full key set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fbs_data_pipelines_spark.functions.cleaning import round_half_up


def key_skew_stats(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter profile of ``key_col``: the ``top_k`` most
    frequent keys with (rank, key, cnt, share, cum_share), shares
    rounded to 6dp. Ties on count break toward the smaller key, so
    the output is fully deterministic."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_cnt",
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(
            "rank",
            "key",
            "cnt",
            round_half_up(F.col("cnt") / F.col("__total"), 6).alias(
                "share"
            ),
            round_half_up(F.col("cum_cnt") / F.col("__total"), 6).alias(
                "cum_share"
            ),
        )
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Pearson chi-square test of independence between two
    categorical columns — the EDA step before trusting a stratified
    sample or a per-segment model: are the two dimensions actually
    related? Returns ONE row: ``chi2``, ``dof``, ``cramers_v``
    (effect size, chi2 normalized to [0,1]), ``n``.

    chi2 = Σ_cells (observed − expected)² / expected with
    expected = row_total · col_total / n. The cell sum is an
    EXPLICIT fold over the (a, b)-sorted cell list — cell counts are
    categorical-small, and a written-out fold is the only float sum
    two engines reproduce bit-for-bit (same rationale as
    ``timeseries.ewma``).

    Plan shape: ONE corpus scan and ONE corpus shuffle (the
    combiner-reduced cell count); margins are WINDOW sums over the
    |A|·|B|-cell relation (integer sums — order-independent), so the
    corpus is never rescanned per margin; then a single-row agg.
    """
    cells = df.groupBy(col_a, col_b).agg(F.count("*").alias("__o"))
    ra = F.sum("__o").over(Window.partitionBy(col_a))
    rb = F.sum("__o").over(Window.partitionBy(col_b))
    n = F.sum("__o").over(Window.partitionBy(F.lit(1)))
    e = ra.cast("double") * rb.cast("double") / n.cast("double")
    contrib = (
        (F.col("__o").cast("double") - e)
        * (F.col("__o").cast("double") - e)
        / e
    )
    scored = cells.withColumn("__c", contrib)
    summary = scored.agg(
        F.array_sort(
            F.collect_list(F.struct(col_a, col_b, F.col("__c")))
        ).alias("__cells"),
        F.countDistinct(col_a).alias("__ka"),
        F.countDistinct(col_b).alias("__kb"),
        F.sum("__o").alias("n"),
    )
    contribs = F.transform(F.col("__cells"), lambda s: s["__c"])
    chi2 = F.aggregate(
        F.slice(
            contribs, 2, F.greatest(F.size(contribs) - 1, F.lit(0))
        ),
        F.element_at(contribs, 1),
        lambda acc, x: acc + x,
    )
    dof = (F.col("__ka") - 1) * (F.col("__kb") - 1)
    return summary.select(
        chi2.alias("chi2"),
        dof.cast("long").alias("dof"),
        F.sqrt(
            chi2
            / (
                F.col("n").cast("double")
                * F.least(F.col("__ka") - 1, F.col("__kb") - 1).cast(
                    "double"
                )
            )
        ).alias("cramers_v"),
        F.col("n"),
    )


_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "long",
    "float", "double", "decimal",
)


def table_profile(
    df: DataFrame, approx_distinct: bool = False, rsd: float = 0.05
) -> DataFrame:
    """One-pass per-column table profile — the data-catalog summary
    (row count, null count, distinct count, min/max, mean) computed
    for EVERY column in a single scan: one wide aggregation row, then
    one output row per column via inline (never one job per column).

    Numeric columns report ``min_num``/``max_num``/``avg`` (doubles);
    string/temporal/other columns report ``min_str``/``max_str``
    (temporal stringified — the repo's tz-free edge rule). Distinct
    counts are EXACT by default (Spark expands the aggregate: one
    shuffle, map output ×(n_cols+1) — fine into the tens of columns);
    ``approx_distinct=True`` swaps in HLL ``approx_count_distinct``
    (no expand, one combiner-reduced pass) for wide tables at 100 TB
    where exactness isn't worth the expand factor. Mode/top-value is
    deliberately NOT here — that's one full groupBy per column; use
    ``key_skew_stats`` on the columns that matter.
    """
    cols = df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__cnt{i}"))
        aggs.append(
            (
                F.approx_count_distinct(col, rsd)
                if approx_distinct
                else F.countDistinct(col)
            ).alias(f"__nd{i}")
        )
        t = dtypes[c]
        if t.startswith(_NUMERIC_PREFIXES):
            aggs.append(F.min(col.cast("double")).alias(f"__mn{i}"))
            aggs.append(F.max(col.cast("double")).alias(f"__mx{i}"))
            aggs.append(F.avg(col.cast("double")).alias(f"__av{i}"))
        elif t.startswith("timestamp"):
            aggs.append(
                F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss").alias(
                    f"__mns{i}"
                )
            )
            aggs.append(
                F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss").alias(
                    f"__mxs{i}"
                )
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"__mns{i}"))
            aggs.append(F.max(col).cast("string").alias(f"__mxs{i}"))
    row = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for i, c in enumerate(cols):
        t = dtypes[c]
        numeric = t.startswith(_NUMERIC_PREFIXES)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(t).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt{i}")).alias("n_nulls"),
                F.col(f"__nd{i}").alias("n_distinct"),
                (F.col(f"__mn{i}") if numeric else null_d).alias(
                    "min_num"
                ),
                (F.col(f"__mx{i}") if numeric else null_d).alias(
                    "max_num"
                ),
                (F.col(f"__av{i}") if numeric else null_d).alias(
                    "avg"
                ),
                (null_s if numeric else F.col(f"__mns{i}")).alias(
                    "min_str"
                ),
                (null_s if numeric else F.col(f"__mxs{i}")).alias(
                    "max_str"
                ),
            )
        )
    return row.select(F.inline(F.array(*structs)))


_FLOAT_PREFIXES = ("float", "double")


def table_profile_hll(df: DataFrame) -> DataFrame:
    """Wide-table profile with engine-PORTABLE HyperLogLog distinct
    counts — the 100 TB catalog-profile path under an exact
    cross-engine oracle.

    ``table_profile(approx_distinct=True)`` (Spark's built-in HLL++)
    is one pass and production-fine, but its register layout is
    engine-private: another engine cannot reproduce the estimate, so
    a correctness harness could only tolerance-check it. This variant
    spends a SECOND combiner-reduced pass to buy exact verifiability
    and mergeable state: the base stats (count / nulls / min / max /
    avg) stay ONE wide aggregation (same skeleton as
    ``table_profile``, and still no exact-distinct expand — that
    expand is the cost this mode exists to avoid), and distinct
    counts come from ``operators/sketches`` portable HLL over a
    ``stack()`` unpivot of the profiled columns: (column,
    value-string) → md5 register state → estimate. State is
    ≤ n_cols × 4096 rows, map-side combined, and mergeable across
    batches (union + max per register — the incremental-catalog
    contract).

    Float/double columns fall back to EXACT ``countDistinct`` inside
    the wide aggregate: their double→string rendering is
    engine-private (Java vs C scientific-notation thresholds), so
    hashing the rendered string would not be portable. Ints, bools,
    strings, dates, and zero-fraction timestamps render identically
    in Spark and DuckDB. ``n_distinct`` is a double in this mode
    (HLL estimates are continuous; the float-exact fallback is
    cast).

    Plan-shape caveat (r11 advisor): "no exact-distinct expand" holds
    only when every profiled column is HLL-covered. Each float/double
    column's ``countDistinct`` fallback reintroduces one Expand in the
    wide aggregate — bounded by the number of float columns, not by
    n_cols, and still one pass; an all-HLL schema plans with zero
    Expand (asserted in tests)."""
    from fbs_data_pipelines_spark.operators.sketches import approx_distinct

    cols = df.columns
    dtypes = dict(df.dtypes)
    is_float = {c: dtypes[c].startswith(_FLOAT_PREFIXES) for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__cnt{i}"))
        if is_float[c]:
            aggs.append(
                F.countDistinct(col).cast("double").alias(f"__nd{i}")
            )
        t = dtypes[c]
        if t.startswith(_NUMERIC_PREFIXES):
            aggs.append(F.min(col.cast("double")).alias(f"__mn{i}"))
            aggs.append(F.max(col.cast("double")).alias(f"__mx{i}"))
            aggs.append(F.avg(col.cast("double")).alias(f"__av{i}"))
        elif t.startswith("timestamp"):
            aggs.append(
                F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss").alias(
                    f"__mns{i}"
                )
            )
            aggs.append(
                F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss").alias(
                    f"__mxs{i}"
                )
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"__mns{i}"))
            aggs.append(F.max(col).cast("string").alias(f"__mxs{i}"))
    row = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for i, c in enumerate(cols):
        t = dtypes[c]
        numeric = t.startswith(_NUMERIC_PREFIXES)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(t).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt{i}")).alias("n_nulls"),
                (F.col(f"__nd{i}") if is_float[c] else null_d).alias(
                    "nd_exact"
                ),
                (F.col(f"__mn{i}") if numeric else null_d).alias(
                    "min_num"
                ),
                (F.col(f"__mx{i}") if numeric else null_d).alias(
                    "max_num"
                ),
                (F.col(f"__av{i}") if numeric else null_d).alias(
                    "avg"
                ),
                (null_s if numeric else F.col(f"__mns{i}")).alias(
                    "min_str"
                ),
                (null_s if numeric else F.col(f"__mxs{i}")).alias(
                    "max_str"
                ),
            )
        )
    prof = row.select(F.inline(F.array(*structs)))
    hll_cols = [c for c in cols if not is_float[c]]
    if hll_cols:
        # stack(0) is an analysis error — only unpivot when there is
        # at least one HLL-covered (non-float) column.
        pairs: list = []
        for c in hll_cols:
            pairs.extend([F.lit(c), F.col(c).cast("string")])
        stacked = df.select(
            F.stack(F.lit(len(hll_cols)), *pairs).alias("column", "pval")
        )
        est = approx_distinct(stacked, ["column"], "pval")
        out = prof.join(F.broadcast(est), "column", "left")
    else:
        out = prof.withColumn(
            "approx_distinct", F.lit(None).cast("double")
        )
    # An all-NULL non-float column has no HLL group row AND a null
    # nd_exact — its distinct count is 0, not unknown.
    return out.select(
        "column",
        "dtype",
        "n_rows",
        "n_nulls",
        F.coalesce(
            F.col("approx_distinct"), F.col("nd_exact"), F.lit(0.0)
        ).alias("n_distinct"),
        "min_num",
        "max_num",
        "avg",
        "min_str",
        "max_str",
    )


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law conformance profile — the forensic-audit screen
    for fabricated or truncated numeric data: the observed leading-
    digit distribution of ``value_col`` against Benford's expectation
    p(d) = log10(1 + 1/d), one row per digit 1–9 with the observed
    share, expected share, deviation, and the digit's χ² term.

    The leading digit is extracted ARITHMETICALLY
    (⌊|x| / 10^⌊log10|x|⌋⌋) rather than via string formatting —
    double→string rendering differs across engines, double math does
    not. Zero/null values are excluded (they have no leading digit).

    Plan shape: one narrow projection + ONE 9-group combiner-reduced
    aggregate; the χ² terms are per-digit expressions over the
    9-row relation. Conformance thresholds (Nigrini's MAD bands)
    are a judgment call left to the caller — the profile returns the
    numbers, not a verdict.
    """
    x = F.abs(F.col(value_col).cast("double"))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x))))
    cells = (
        df.filter(F.col(value_col).isNotNull() & (x > 0))
        .select(digit.cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy(F.lit(1)))
    obs = F.col("n").cast("double") / total.cast("double")
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    chi2_term = (
        (obs - exp_p) * (obs - exp_p) / exp_p
    )
    return cells.select(
        "digit",
        "n",
        obs.alias("obs_p"),
        exp_p.alias("exp_p"),
        (obs - exp_p).alias("dev"),
        chi2_term.alias("chi2_term"),
    )
