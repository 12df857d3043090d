"""Grouped pandas operators (`applyInPandas`) — the escape hatch for
per-group logic Spark expressions can't state (model fits, custom
solvers). Arrow-batched: each group arrives as one pandas DataFrame.

Scale notes: applyInPandas shuffles on the group key and materializes
EACH GROUP in one task's memory — right for many medium groups
(models per customer/category), wrong for a handful of giant groups
(use the partial-aggregable JVM form then; cf. regr_slope which this
module's OLS is validated against).
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401  (doc parity)

import pandas as pd
from pyspark.sql import DataFrame


def grouped_ols(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group simple linear regression via pandas: returns
    (group, slope, intercept, r2, n). Same math as SQL's
    regr_slope/regr_intercept/regr_r2 (cov/var form) so a JVM or
    DuckDB oracle reproduces the values to rounding precision."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        n = len(pdf)
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum() / n
        varx = ((x - mx) ** 2).sum() / n
        vary = ((y - my) ** 2).sum() / n
        slope = cov / varx if varx else float("nan")
        intercept = my - slope * mx
        r2 = (cov * cov) / (varx * vary) if varx and vary else float("nan")
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "slope": [slope],
                "intercept": [intercept],
                "r2": [r2],
                "n": [n],
            }
        )

    out_schema = (
        f"{group_col} string, slope double, intercept double, r2 double, n long"
    )
    return df.groupBy(group_col).applyInPandas(fit, schema=out_schema)
