"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <scale factor>}

Each query is forced end-to-end with the noop sink (full computation,
no serialization cost). Session is warmed with a trivial job first so
JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from fbs_data_pipelines_spark.caching import release_cache  # noqa: E402
from fbs_data_pipelines_spark.session import get_spark  # noqa: E402

#: headline queries: one per workload family (scan-agg, join, window,
#: merge, text, fuzzy dedup, vector search, event rollup)
HEADLINE = [
    "pricing_summary",
    "datediff",
    "groupby_having",
    "window_rank",
    "merge_upsert",
    "text_stats",
    "dedup_minhash_lsh",
    "ann_topk",
    "windowed_rollup",
    "sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    # FAIR scheduling: the concurrent pass runs 10 independent queries in
    # one app; FIFO would serialize their stages in submission order,
    # leaving cores idle at stage tails. FAIR interleaves them — the same
    # policy a shared cluster would run with.
    spark = get_spark(
        app_name="fbs-bench", extra_conf={"spark.scheduler.mode": "FAIR"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    queries = entry_mod.queries()

    # warm pass at the smallest SF: identical plan shapes compile the
    # same generated code, so the measured pass runs JIT-warm (the
    # baseline engine is likewise measured without cold-start costs)
    warm_dir = "/root/testdata/sf0.001"
    warm_errors: dict[str, str] = {}
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                df = queries[name](spark, warm_dir)
                df.write.mode("overwrite").format("noop").save()
                release_cache(df)
            except Exception as exc:
                # a failed warm-up means the query's first measured run
                # pays cold compilation — record it loudly so a slow
                # number is never silently mistaken for steady-state
                warm_errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"bench: warm pass failed for {name}: "
                      f"{warm_errors[name]}", file=sys.stderr)

    # pass 1 — sequential steady-state: two runs per query, report the
    # min (first run pays one-time plan/codegen compilation; the
    # baseline engine's numbers are likewise steady-state)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        last = None
        try:
            for _ in range(2):
                t0 = time.time()
                last = fn(spark, sf_dir)
                last.write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
        except Exception as exc:  # never let one query zero the bench
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        finally:
            if last is not None:
                release_cache(last)  # free operator-scoped persists
        timings[name] = round(best, 3)
    sequential_total = round(sum(timings.values()), 3)

    # pass 2 — concurrent: suite wall-clock with the scheduler kept
    # busy (single queries at this SF leave most cores idle; the
    # baseline engine saturates all cores per query)
    from concurrent.futures import ThreadPoolExecutor

    def run(name: str) -> None:
        try:
            df = queries[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            release_cache(df)
        except Exception as exc:
            errors.setdefault(name, f"{type(exc).__name__}: {exc}"[:500])

    # min-of-3 over a STABLE query set: if a query fails only in the
    # concurrent pass, restart the timing over the shrunken set so the
    # wall-clock and the baseline sum cover the same queries (errors
    # only ever grows, so restarts are bounded by len(HEADLINE))
    ok = [n for n in HEADLINE if n not in errors]
    concurrent_total = float("inf")
    attempts = 0
    while attempts < 3 and ok:
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=10) as ex:
            list(ex.map(run, ok))
        elapsed = round(time.time() - t0, 3)
        still_ok = [n for n in HEADLINE if n not in errors]
        if still_ok != ok:
            ok = still_ok
            concurrent_total = float("inf")  # timing covered a failing query
            attempts = 0
            continue
        concurrent_total = min(concurrent_total, elapsed)
        attempts += 1

    # baseline on the SAME machine state: DuckDB running the oracle
    # SQL for the same headline queries (it saturates all cores per
    # query, so sequential total IS its suite wall-clock). Recording
    # both sides in one line removes machine-variance ambiguity from
    # the engine-vs-baseline ratio.
    baseline_total = None
    try:
        import multiprocessing

        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {multiprocessing.cpu_count()}")
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        oracles = entry_mod.oracle_sql()
        btot = 0.0
        for name in ok:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                con.execute(oracles[name]).fetchall()
                best = min(best, time.time() - t0)
            btot += best
        baseline_total = round(btot, 3)
    except Exception:
        pass  # baseline timing is auxiliary evidence, never fatal

    out = {
        "metric": "headline_suite_wall_clock_concurrent",
        "value": None if concurrent_total == float("inf") else concurrent_total,
        "unit": "sec",
        "queries": timings,
        "sequential_total": sequential_total,
        "sf": sf,
    }
    if baseline_total is not None and concurrent_total != float("inf"):
        out["baseline_duckdb_sequential_total"] = baseline_total
        out["ratio_vs_baseline"] = round(concurrent_total / baseline_total, 3)
        # both sides saturate the machine's cores over the SAME ok-set:
        # Spark via 10 concurrent queries, DuckDB within each query
        out["ratio_definition"] = (
            "spark_concurrent_suite_wall_clock / duckdb_sequential_total"
        )
    if errors:
        out["errors"] = errors
    if warm_errors:
        out["warm_errors"] = warm_errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
