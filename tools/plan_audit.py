"""Physical-plan audit: verify the scale-critical plan properties.

For each query: does the parquet scan carry PushedFilters, is the
ReadSchema pruned to the needed columns, which join strategies fire,
how many shuffles (Exchange) appear, and is whole-stage codegen
active. Usage:

    PYTHONPATH=/root/repo python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import re
import sys

SF_DIR = "/root/testdata/sf0.01"


def audit(name: str, df) -> dict:
    df.collect()  # materialize so AQE's final plan (with codegen stages) exists
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # executed AQE plans print Final + Initial sections; audit the final only
    plan = plan.split("== Initial Plan ==")[0]
    formatted = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", formatted)
    return {
        "name": name,
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "smj": plan.count("SortMergeJoin"),
        # codegen stages print as '*(N) Operator' in plan strings
        "codegen": "*(" in plan or "WholeStageCodegen" in plan,
        "cartesian": "CartesianProduct" in plan,
        "pushed_filters": [p for p in pushed if p.strip()],
        "scan_cols": [len(s.split(",")) for s in schemas],
    }


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from fbs_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    queries = entry_mod.queries()
    only = set(sys.argv[1:]) or {
        "pricing_summary", "filter_project", "multi_join_topn", "join_5way",
        "lookup_join", "merge_upsert", "text_stats", "dedup_minhash_lsh",
        "ann_topk", "windowed_rollup", "sessionize", "monthly_rollup",
        "asof_join", "scalar_subquery", "range_join", "window_range_30d",
        # (cascading_rollup consolidated into rollup r17)
        "dedup_clusters", "ann_ivf", "simhash_pairs", "rollup",
        "array_ops", "tfidf", "gopher_quality", "top_ngram", "pii_scrub",
        "stratified_sample", "sequence_packing", "decontaminate",
        "corpus_stats", "histogram", "quality_pipeline",
        "embedding_neardup_lsh", "dedup_ngram_jaccard",
        "salted_join", "bloom_join", "incremental_rollup", "pagerank",
        "hll_distinct", "cms_counts", "funnel", "retention",
    }
    for name, fn in queries.items():
        if name not in only:
            continue
        try:
            info = audit(name, fn(spark, SF_DIR))
            print(
                f"{info['name']:>18}: exch={info['exchanges']} "
                f"bcast={info['broadcast_joins']} smj={info['smj']} "
                f"codegen={'Y' if info['codegen'] else 'N'} "
                f"cartesian={'Y' if info['cartesian'] else 'N'} "
                f"scan_cols={info['scan_cols']} "
                f"pushed={info['pushed_filters'][:2]}"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"{name:>18}: ERROR {ex}")


if __name__ == "__main__":
    main()
