"""Capture .explain("formatted") output for named queries to files.

Optimization-round evidence tool (guide §1.1/§7.2): the judge checks
plan claims (Exchange counts, join strategies, PushedFilters,
BatchEvalPython nodes) against these files.

Usage:
    PYTHONPATH=/root/repo python tools/capture_plans.py OUTDIR SUFFIX [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query (default: the bench
HEADLINE set). SPARK_GRAFT_SF_DIR picks the data (default sf0.1).
"""

from __future__ import annotations

import os
import sys


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from fbs_data_pipelines_spark.caching import release_cache
    from fbs_data_pipelines_spark.session import get_spark

    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    queries = entry_mod.queries()
    names = sys.argv[3:] or [
        "pricing_summary", "datediff", "groupby_having", "window_rank",
        "merge_upsert", "text_stats", "dedup_minhash_lsh", "ann_topk",
        "windowed_rollup", "sessionize",
    ]
    for name in names:
        df = queries[name](spark, sf_dir)
        try:
            text = formatted_plan(df)
        finally:
            release_cache(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
