"""Targeted sf1 warm probe for the r15 judge's bench watch item
(VERDICT r15 "What's wrong" #3 / directive #3): the driver's r15
sf1 reading for `dedup_minhash_lsh` jumped to 8.70 s Spark-side
(r13: 2.77, r14: 3.21) and `ann_topk` to 1.41 s, on bench-path code
byte-identical to r14. This probe reproduces exactly the bench.py
sf1 protocol — Spark min-of-2 warm, JVM fully stopped, then DuckDB
min-of-2 — but ONLY for the two flagged queries, so two quiet-machine
readings cost ~2 min instead of a full bench run.

Usage:
    PYTHONPATH=/root/repo python tools/sf1_dedup_probe.py

Prints one JSON line:
    {"load1": ..., "spark": {...}, "duck": {...}, "ratio": {...}}
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

PROBES = ["dedup_minhash_lsh", "ann_topk"]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    load1 = os.getloadavg()[0]
    import __spark_entry__ as entry
    from make_sf1 import make_sf1

    from fbs_data_pipelines_spark.caching import release_cache
    from fbs_data_pipelines_spark.session import get_spark

    sf1_dir = make_sf1(
        src="/root/testdata/sf0.1",
        dst=os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.localdata/sf1"),
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="sf1-probe", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    spark_s: dict[str, float] = {}
    for name in PROBES:
        fn = queries[name]
        best = float("inf")
        last = None
        for _ in range(2):
            t0 = time.time()
            last = fn(spark, sf1_dir)
            last.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        if last is not None:
            release_cache(last)
        spark_s[name] = round(best, 3)
    # JVM fully down before DuckDB is timed (r11 co-residency lesson)
    spark.stop()
    time.sleep(2.0)

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {multiprocessing.cpu_count()}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf1_dir}/{t}.parquet')"
        )
    duck_s: dict[str, float] = {}
    for name in PROBES:
        dbest = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            dbest = min(dbest, time.time() - t0)
        duck_s[name] = round(dbest, 3)
    print(json.dumps({
        "load1_at_start": round(load1, 2),
        "spark": spark_s,
        "duck": duck_s,
        "ratio": {
            n: round(spark_s[n] / duck_s[n], 3) if duck_s[n] else None
            for n in PROBES
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
