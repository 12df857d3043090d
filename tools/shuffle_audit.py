"""Measured shuffle-volume scaling audit — the 100 TB evidence tool.

For each headline query, execute at two scale factors and read the
ACTUAL SQLMetrics off the AQE final physical plan: rows scanned,
bytes shuffled (sum of every Exchange's shuffleBytesWritten), rows
out. A query whose shuffle bytes grow linearly (or better) with input
and stay well below input volume has a plan that survives scale-up;
super-linear shuffle growth is the thing that kills a 1000-executor
job. "Measure, don't guess" sibling of tools/plan_audit.py (static
plan shape) — this one reads the runtime counters.

Usage:
    PYTHONPATH=/root/repo python tools/shuffle_audit.py [small_sf big_sf]
        [--names q1,q2,...]   # default: the bench HEADLINE set

Prints one JSON line per query:
  {"query": ..., "sf_small": .., "sf_big": ..,
   "scan_rows": [s, b], "shuffle_bytes": [s, b], "out_rows": [s, b],
   "input_scale": r1, "shuffle_scale": r2, "linear_ok": bool}
where linear_ok = shuffle_scale <= input_scale * 1.5 (slack for
banding/candidate effects at tiny SFs).

Caveat: queries whose scans sit beneath persisted subtrees (the LSH
family's scoped caches) report their cached branches as
InMemoryTableScan — scan/shuffle counters under those persists are
not visible in the final plan and show as 0 here; plan_audit.py's
static shape check still covers them.
"""

from __future__ import annotations

import json
import sys


def plan_metrics(df) -> dict:
    """Sum interesting SQLMetrics over the executed (AQE-final) plan."""
    fp = df._jdf.queryExecution().executedPlan()
    try:
        fp = fp.finalPhysicalPlan()
    except Exception:
        pass
    totals = {"scan_rows": 0, "shuffle_bytes": 0, "exchanges": 0}

    def walk(node):
        name = node.nodeName()
        mets = node.metrics()
        it = mets.keysIterator()
        found = {}
        while it.hasNext():
            k = it.next()
            found[k] = mets.apply(k).value()
        if name.startswith("Scan"):
            totals["scan_rows"] += found.get("numOutputRows", 0)
        if name == "Exchange":
            totals["shuffle_bytes"] += found.get("shuffleBytesWritten", 0)
            totals["exchanges"] += 1
        if "QueryStage" in name:
            walk(node.plan())
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(fp)
    return totals


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from bench import HEADLINE
    from fbs_data_pipelines_spark import get_spark
    from fbs_data_pipelines_spark.caching import release_cache

    args = sys.argv[1:]
    names = list(HEADLINE)
    if "--names" in args:
        i = args.index("--names")
        names = args[i + 1].split(",")
        del args[i : i + 2]
    small = args[0] if args else "/root/testdata/sf0.01"
    big = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="shuffle-audit")
    queries = entry_mod.queries()

    bad = []
    for name in names:
        stats = []
        for sf_dir in (small, big):
            df = queries[name](spark, sf_dir)
            out_rows = df.count() if False else len(df.collect())
            m = plan_metrics(df)
            m["out_rows"] = out_rows
            stats.append(m)
            release_cache(df)
        s, b = stats
        input_scale = (b["scan_rows"] / s["scan_rows"]) if s["scan_rows"] else None
        shuffle_scale = (
            (b["shuffle_bytes"] / s["shuffle_bytes"]) if s["shuffle_bytes"] else None
        )
        linear_ok = (
            shuffle_scale is None
            or input_scale is None
            or shuffle_scale <= input_scale * 1.5
        )
        if not linear_ok:
            bad.append(name)
        print(json.dumps({
            "query": name,
            "scan_rows": [s["scan_rows"], b["scan_rows"]],
            "shuffle_bytes": [s["shuffle_bytes"], b["shuffle_bytes"]],
            "out_rows": [s["out_rows"], b["out_rows"]],
            "exchanges": b["exchanges"],
            "input_scale": round(input_scale, 2) if input_scale else None,
            "shuffle_scale": round(shuffle_scale, 2) if shuffle_scale else None,
            "linear_ok": linear_ok,
        }))
    print(json.dumps({"superlinear_shuffle": bad, "all_linear": not bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
